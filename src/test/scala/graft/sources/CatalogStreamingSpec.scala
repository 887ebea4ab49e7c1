package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger // AvailableNow for the tail

/** Streaming through the CATALOG surface — `readStream.table` and
  * `writeStream.toTable` against `g.default.t` identifiers, no
  * format()/option() plumbing: the capabilities the table already
  * carries (MICRO_BATCH_READ append tail, STREAMING_WRITE epoch-keyed
  * sink) compose with Spark's catalog resolution.
  */
class CatalogStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gstrcat")
  spark.conf.set("spark.sql.catalog.gs", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gs.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("writeStream.toTable lands epochs as versions; readStream.table tails them") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE gs.default.ev (k BIGINT, s STRING)")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "s")
      .writeStream
      .option("checkpointLocation", tmpDir("gstrck"))
      .toTable("gs.default.ev")
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    // CREATE was v1; the epoch committed v2 with loader semantics
    assert(VersionedTable.versions(lib, "ev") == Seq(1L, 2L))
    assert(spark.sql("SELECT k FROM gs.default.ev").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    // tail the table back out as a stream, by identifier
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = spark.readStream.table("gs.default.ev")
      .writeStream
      .option("checkpointLocation", tmpDir("gstrck2"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("k").as[Long].collect().foreach(got.add)
      }
      .start()
    q2.awaitTermination()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq == Seq(1L, 2L),
      "readStream.table must bootstrap the snapshot")
  }
}
