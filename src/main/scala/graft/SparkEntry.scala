package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Catalog, EtlProcess}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's star-schema ETL pipeline end-to-end on
    * sf0.001 — extract (delegated SQL) → transform chain → exact dimension
    * link → ignore natural key → load with surrogate ids → read back.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val src = new Catalog(spark, "/root/testdata/sf0.001")
    val tgt = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-entry").toString)

    val dim = new EtlProcess(src, tgt, "customer_dim")
    dim.idOrder = Seq("c_custkey")
    dim.extract("SELECT c_custkey, c_name, c_mktsegment FROM customer")
    dim.load()

    val p = new EtlProcess(src, tgt, "order_cube")
    p.idOrder = Seq("o_orderkey")
    p.extract(
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_totalprice > 1000""".stripMargin)
    p.transform("o_orderpriority").lower().replace("-", "_")
    p.link("customer_id", target = "o_custkey", tableName = "customer_dim",
      childField = "c_custkey")
    p.ignore("o_custkey")
    p.load()
    p.result()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
