package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates every query group into the driver-facing maps
  * (SparkEntry.queries / SparkEntry.oracleSql).
  */
object Registry {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] =
    EtlQueries.queries ++ TrainingDataQueries.queries ++
      SqlQueries.queries ++ PipelineQueries.queries ++
      ExtensionQueries.queries ++ CorpusQueries.queries ++
      StorageQueries.queries

  def oracleSql: Map[String, String] =
    EtlQueries.oracleSql ++ TrainingDataQueries.oracleSql ++
      SqlQueries.oracleSql ++ PipelineQueries.oracleSql ++
      ExtensionQueries.oracleSql ++ CorpusQueries.oracleSql ++
      StorageQueries.oracleSql
}
