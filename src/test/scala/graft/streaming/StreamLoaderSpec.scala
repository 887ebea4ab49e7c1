package graft.streaming

import graft.SparkSpec
import graft.etl.Catalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sink → Loader-managed target: micro-batches land through the
  * same write path as batch loads (surrogate ids continue across batches,
  * upsert merges replayed data).
  */
class StreamLoaderSpec extends SparkSpec {

  test("streamInto appends micro-batches with contiguous ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt"))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("k", "v")

    val q = StreamLoader.streamInto(stream, tgt, "t",
      checkpointDir = tmpDir("graft-stream-ckpt"), idOrder = Seq("k"))
    try {
      input.addData((3L, "c"), (1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((5L, "e"), (4L, "d"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = tgt.table("t").select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // batch 1 ids 1..3 in k order; batch 2 continues 4..5 — contiguous
    assert(rows.toSeq == Seq(
      (1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c"), (4L, 4L, "d"), (5L, 5L, "e")))
  }

  test("streamInto with upsertFields merges replayed rows instead of duplicating") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt2"))

    def run(data: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      val q = StreamLoader.streamInto(input.toDF().toDF("k", "v"), tgt, "t",
        checkpointDir = tmpDir("graft-stream-ckpt2"), idOrder = Seq("k"),
        upsertFields = Seq("k"))
      try { input.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    run(Seq((1L, "a"), (2L, "b")))
    // replay batch with one changed value (simulates at-least-once redelivery)
    run(Seq((1L, "a2"), (2L, "b")))

    val rows = tgt.table("t").select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // same keys keep their ids; values updated; no duplicate rows
    assert(rows.toSeq == Seq((1L, 1L, "a2"), (2L, 2L, "b")))
  }
}
