package graft.streaming

import scala.util.Random

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized crash-replay fuzz of the native streaming sink: a seeded
  * sequence of keyed micro-batches drains through
  * `writeStream.format("graft")` with CRASHES injected between the sink's
  * commit and the engine's (the engine commit record deleted, forcing an
  * epoch replay on restart) — the final table must equal a control built
  * by applying the same batches through plain `VersionedTable.load`
  * upserts, and the version count must equal the number of DISTINCT
  * epochs (every replay skipped).
  */
class StreamSinkFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("seeded crash-replay fuzz converges to the batch-upsert control") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(20260814L)
    val tgt = new Catalog(spark, tmpDir("fuzzsink"))
    val ctl = new Catalog(spark, tmpDir("fuzzctl"))
    val ckpt = tmpDir("fuzzck")
    val input = MemoryStream[(Long, Long)]
    def start() = input.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("dir", tgt.dir).option("table", "t")
      .option("idOrder", "k").option("upsertKeys", "k")
      .option("bucketBy", "k").option("numBuckets", "4")
      .option("checkpointLocation", ckpt)
      .start()

    val nEpochs = 6
    var committedEpochs = 0
    (0 until nEpochs).foreach { epoch =>
      // 1-8 rows per epoch, keys from a small domain so upserts collide
      val rows = (0 until (1 + rnd.nextInt(8)))
        .map(_ => (rnd.nextInt(12).toLong, rnd.nextLong(1000L)))
        .distinctBy(_._1) // one row per key within a batch (loader contract)
      val q = start()
      try {
        input.addData(rows: _*)
        q.processAllAvailable()
      } finally { q.stop(); q.awaitTermination() }
      committedEpochs += 1
      // the same batch lands in the control through the plain batch path
      VersionedTable.load(ctl, "t", rows.toDF("k", "v"),
        upsertFields = Seq("k"), idOrder = Seq("k"),
        bucketBy = Some((Seq("k"), 4)))
      // ~half the epochs: crash AFTER the sink committed but BEFORE the
      // engine recorded it — the restart replays the epoch
      if (rnd.nextBoolean()) {
        val commits = new java.io.File(s"$ckpt/commits")
        val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
          .maxBy(_.getName.toLong)
        assert(latest.delete())
        new java.io.File(commits, s".${latest.getName}.crc").delete()
        val q2 = start()
        try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
      }
    }

    assert(VersionedTable.versions(tgt, "t").size == committedEpochs,
      "every replayed epoch must be skipped — one version per distinct epoch")
    val got = VersionedTable.read(tgt, "t").select("k", "v")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val want = VersionedTable.read(ctl, "t").select("k", "v")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want,
      s"fuzzed stream state must equal the batch-upsert control\n got=$got\nwant=$want")
  }
}
