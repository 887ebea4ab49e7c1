package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The APPEND-TAIL streaming read `spark.readStream.format("graft")`:
  * plain table rows (no op column), bootstrap snapshot then per-append
  * batches, refusal (or skip) on change commits, startingVersion tails
  * without a snapshot — the Delta-default stream shape over versioned
  * tables.
  */
class AppendTailStreamSpec extends SparkSpec {
  import spark.implicits._

  private def reader(src: Catalog, extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft")
      .option("dir", src.dir).option("table", "t")
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  private def drain(df: DataFrame, ckpt: String,
                    log: ConcurrentLinkedQueue[Long], out: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { log.add(n); b.write.mode("append").parquet(out) }
      }
      .start()
    q.awaitTermination()
  }

  test("bootstrap snapshot, then per-append batches; restart continues the tail") {
    val src = new Catalog(spark, tmpDir("atsrc"))
    val out = tmpDir("atout") + "/rows"
    val ckpt = tmpDir("atck")
    val log = new ConcurrentLinkedQueue[Long]()
    VersionedTable.load(src, "t", (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(src, "t", Seq((11L, "v11"), (12L, "v12")).toDF("k", "s"),
      idOrder = Seq("k"))
    drain(reader(src, Map("maxVersionsPerTrigger" -> "1")), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(10L, 2L),
      s"bootstrap snapshot then the append batch, got ${log.asScala.toSeq}")
    // restart: only NEW appends flow
    VersionedTable.load(src, "t", Seq((13L, "v13")).toDF("k", "s"),
      idOrder = Seq("k"))
    drain(reader(src), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(10L, 2L, 1L))
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq ==
      (1L to 13L), "tail must reconstruct the table exactly")
  }

  test("a DV'd bootstrap replays exactly across a compaction on restart") {
    // the round-13 crash-loop worry, pinned: a batch PLANNED over a DV'd
    // snapshot must replay bit-identically after a compaction
    // materializes the DVs — replay plans from the batch's own immutable
    // manifests (DV sidecars intact until vacuum), never the new head.
    val src = new Catalog(spark, tmpDir("atmor"))
    val out = tmpDir("atmorout") + "/rows"
    val ckpt = tmpDir("atmorck")
    val log = new ConcurrentLinkedQueue[Long]()
    VersionedTable.load(src, "t",
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "s"), idOrder = Seq("k"),
      extraProps = Map(VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead))
    VersionedTable.load(src, "t", (21L to 25L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.delete(src, "t", col("k") === 3L || col("k") === 12L) // v3: DVs
    assert(VersionedTable.deletionVectors(src, "t", 3L).nonEmpty, "fixture: DV'd head")
    // bootstrap snapshot OF the DV'd head: 23 live rows
    drain(reader(src, Map("admissionFilter" -> "k >= 1")), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(23L),
      s"DV'd snapshot must emit exactly the live rows, got ${log.asScala.toSeq}")
    // force REDELIVERY of the planned batch: drop its commit marker, so
    // the restart replays offsets the engine already planned...
    val commit0 = new org.apache.hadoop.fs.Path(s"$ckpt/commits/0")
    commit0.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(commit0, false)
    // ...and move the table PAST the batch meanwhile: compaction
    // materializes the DVs (a change commit — skipped on the tail)
    VersionedTable.compact(src, "t", 128L * 1024 * 1024)
    assert(VersionedTable.deletionVectors(src, "t", 4L).isEmpty)
    drain(reader(src, Map("admissionFilter" -> "k >= 1",
      "skipChangeCommits" -> "true")), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(23L, 23L),
      s"the replayed batch must re-emit the same 23 rows, got ${log.asScala.toSeq}")
    // the two drains' outputs are identical row sets (replay ≡ original)
    val rows = spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq
    val live = (1L to 25L).filterNot(k => k == 3L || k == 12L)
    assert(rows == (live ++ live).sorted,
      "replay must reproduce the DV-filtered snapshot exactly")
    // and the stream continues cleanly past the compaction with new appends
    VersionedTable.load(src, "t", Seq((26L, "v26")).toDF("k", "s"),
      idOrder = Seq("k"))
    drain(reader(src, Map("admissionFilter" -> "k >= 1",
      "skipChangeCommits" -> "true")), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(23L, 23L, 1L))
  }

  test("a change commit refuses loudly; skipChangeCommits skips it and continues") {
    val src = new Catalog(spark, tmpDir("atc"))
    VersionedTable.load(src, "t", (1L to 5L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val ckpt1 = tmpDir("atcck1")
    val log = new ConcurrentLinkedQueue[Long]()
    drain(reader(src), ckpt1, log, tmpDir("atcout1") + "/rows") // at v1
    // v2 = upsert rewrite (flat table → full rewrite: files removed)
    VersionedTable.load(src, "t", Seq((3L, "UP")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(reader(src), ckpt1, log, tmpDir("atcout2") + "/rows")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m =>
      m.contains("tails APPENDS") && m.contains("graft-cdc")),
      s"expected the append-only refusal pointing at graft-cdc: ${messages(err)}")
    // with skipChangeCommits the rewrite commit is skipped wholesale and
    // later appends still flow
    VersionedTable.load(src, "t", Seq((6L, "v6")).toDF("k", "s"),
      idOrder = Seq("k"))
    val out3 = tmpDir("atcout3") + "/rows"
    val log3 = new ConcurrentLinkedQueue[Long]()
    drain(reader(src, Map("skipChangeCommits" -> "true")), ckpt1, log3, out3)
    assert(log3.asScala.toSeq == Seq(1L),
      s"the rewrite commit skips; only the append lands: ${log3.asScala.toSeq}")
    assert(spark.read.parquet(out3).select("k").as[Long].collect().toSeq == Seq(6L))
  }

  test("equality tombstones: resolved bootstrap; eq-upsert is a change commit") {
    val src = new Catalog(spark, tmpDir("ateqsrc"))
    val out = tmpDir("ateqout") + "/rows"
    val ckpt = tmpDir("ateqck")
    val log = new ConcurrentLinkedQueue[Long]()
    VersionedTable.load(src, "t",
      (1L to 30L).map(i => (i, s"v$i")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.upsertEqualityDelete(src, "t",
      (10L to 14L).map(i => (i, "EQ")).toDF("k", "s"), keys = Seq("k"))
    // BOOTSTRAP over the live tombstone: the snapshot is the RESOLVED
    // state — 30 rows, the tombstoned keys at their upserted values,
    // never the dead originals
    drain(reader(src), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(30L), log.asScala.toSeq.toString)
    val got = spark.read.parquet(out).select("k", "s")
      .as[(Long, String)].collect().toMap
    assert(got.size == 30 && got(12L) == "EQ" && got(5L) == "v5", got(12L))
    // an eq-upsert MID-TAIL deletes rows from files it never touched —
    // an invisible-to-file-walk change commit: refuse loudly
    VersionedTable.upsertEqualityDelete(src, "t",
      Seq((20L, "EQ2")).toDF("k", "s"), keys = Seq("k"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(reader(src), ckpt, log, out))
    assert(e.getCause.getMessage.contains("equality tombstone"),
      e.getCause.getMessage)
    // skipChangeCommits skips that commit wholesale and the tail lives
    VersionedTable.load(src, "t", Seq((31L, "v31")).toDF("k", "s"),
      idOrder = Seq("k"))
    log.clear()
    drain(reader(src, Map("skipChangeCommits" -> "true")), ckpt, log, out)
    assert(log.asScala.toSeq == Seq(1L),
      s"the append after the skipped eq commit flows: ${log.asScala.toSeq}")
  }

  test("maxBytesPerTrigger paces by manifest-recorded appended bytes") {
    val src = new Catalog(spark, tmpDir("atby"))
    (1 to 4).foreach { i =>
      VersionedTable.load(src, "t",
        (1L to 50L).map(j => (i * 1000L + j, s"v$i-$j")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    val log = new ConcurrentLinkedQueue[Long]()
    // budget of 1 byte: every batch still admits at least one version —
    // so the drain lands one version per trigger after the bootstrap
    drain(reader(src, Map("maxBytesPerTrigger" -> "1",
      "startingVersion" -> "2")), tmpDir("atbyck"), log,
      tmpDir("atbyout") + "/rows")
    assert(log.asScala.toSeq == Seq(50L, 50L, 50L),
      s"byte pacing must admit one oversized commit per trigger: ${log.asScala.toSeq}")
  }

  test("startingVersion=1 walks from v1's appends — never a head snapshot") {
    val src = new Catalog(spark, tmpDir("atsv1"))
    VersionedTable.load(src, "t", (1L to 5L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(src, "t", Seq((3L, "UP")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))    // v2: full rewrite
    VersionedTable.load(src, "t", Seq((6L, "v6")).toDF("k", "s"),
      idOrder = Seq("k"))                              // v3: append
    // WITHOUT skipChangeCommits the v2 change commit must fail the
    // stream (a head snapshot would silently fold it away)
    val log0 = new ConcurrentLinkedQueue[Long]()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(reader(src, Map("startingVersion" -> "1")), tmpDir("atsv1ck0"),
        log0, tmpDir("atsv1out0") + "/rows")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("tails APPENDS")),
      s"change detection must apply from v1, got: ${messages(err)}")
    // WITH skipChangeCommits: v1's ORIGINAL appends + v3's append — the
    // rewritten k=3 value must NOT appear (that would be the snapshot)
    val out = tmpDir("atsv1out") + "/rows"
    val log = new ConcurrentLinkedQueue[Long]()
    drain(reader(src, Map("startingVersion" -> "1",
      "skipChangeCommits" -> "true")), tmpDir("atsv1ck"), log, out)
    val got = spark.read.parquet(out).select("k", "s")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v3", 4L -> "v4",
      5L -> "v5", 6L -> "v6"),
      s"walk semantics: original v1 rows + v3 append, no rewrite fold: $got")
  }

  test("startingTimestamp resolves to the first commit the instant covers") {
    val src = new Catalog(spark, tmpDir("atst"))
    (1 to 3).foreach { i =>
      VersionedTable.commitClock.withValue(() => i * 100000L) {
        VersionedTable.load(src, "t", Seq((i.toLong, s"v$i")).toDF("k", "s"),
          idOrder = Seq("k"))
      }
    }
    val out = tmpDir("atstout") + "/rows"
    val log = new ConcurrentLinkedQueue[Long]()
    // 150000 falls between v1 (100000) and v2 (200000): the tail begins
    // at v2's appends — no snapshot, v1's row never flows
    drain(reader(src, Map("startingTimestamp" -> "150000")),
      tmpDir("atstck"), log, out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L),
      "the tail must begin at the earliest commit at-or-after the instant")
    // a timestamp past every retained commit starts an empty tail
    val log2 = new ConcurrentLinkedQueue[Long]()
    drain(reader(src, Map("startingTimestamp" -> "999999999")),
      tmpDir("atstck2"), log2, tmpDir("atstout2") + "/rows")
    assert(log2.isEmpty, "future timestamp = empty tail until new commits")
  }

  test("startingVersion tails without a snapshot; projections apply post-scan") {
    val src = new Catalog(spark, tmpDir("atsv"))
    (1 to 3).foreach { i =>
      VersionedTable.load(src, "t",
        Seq((i.toLong * 10, s"v$i", i.toLong * 100)).toDF("k", "s", "x"),
        idOrder = Seq("k"))
    }
    val got = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = reader(src, Map("startingVersion" -> "2"))
      .select("k", "x")
      .writeStream
      .option("checkpointLocation", tmpDir("atsvck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.as[(Long, Long)].collect().foreach(got.add)
      }
      .start()
    q.awaitTermination()
    assert(got.asScala.toSet == Set((20L, 200L), (30L, 300L)),
      s"startingVersion=2 tails v2+v3 appends only, no snapshot: ${got.asScala}")
  }
}
