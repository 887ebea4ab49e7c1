package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extract source — the reference's one real source type is a SQL
  * database (`dataset.connect`, /root/reference/easy_etl/__init__.py:8-10;
  * MySQL in CI, /root/reference/bootstrap.sh:7-18). Spark-first: the query
  * executes IN the database (`query` pushdown option), and large tables
  * read partition-parallel with range predicates per task.
  *
  * Driver availability: this container ships Derby (embedded) on the Spark
  * classpath; any other database works the same way once its driver jar is
  * on `spark.jars` — the code path is driver-agnostic.
  */
object JdbcSource {

  /** One-shot pushdown query: the whole `sql` runs in the database and
    * Spark reads the result set. Single-partition by design — correct for
    * dimension-sized extracts; use [[partitionedTable]] to parallelize a
    * big fact scan.
    */
  def query(spark: SparkSession, url: String, sql: String,
            props: java.util.Properties = new java.util.Properties): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
    props.stringPropertyNames().forEach(k => r.option(k, props.getProperty(k)))
    r.load()
  }

  /** Partition-parallel table read: `numPartitions` tasks each scan one
    * range of `partitionCol` (the database sees `numPartitions` range
    * queries — an index on the column makes them cheap). The 100 TB shape
    * for ingesting a large RDBMS table.
    */
  def partitionedTable(spark: SparkSession, url: String, table: String,
                       partitionCol: String, lower: Long, upper: Long,
                       numPartitions: Int,
                       props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)
}
