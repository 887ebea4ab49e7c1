package graft.streaming

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The NATIVE streaming sink `writeStream.format("graft")`: each epoch is
  * ONE versioned commit stamped with its epoch id, so checkpoint-replayed
  * epochs are skipped (no duplicate versions), and `upsertKeys` gives
  * keyed merge semantics per micro-batch — the engine-managed twin of
  * [[StreamLoader.streamInto]].
  */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def sink(df: org.apache.spark.sql.DataFrame, tgt: Catalog,
                   table: String, ckpt: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("graft")
      .option("dir", tgt.dir).option("table", table)
      .option("idOrder", "k")
      .option("checkpointLocation", ckpt)

  test("each micro-batch commits one version; ids continue across epochs") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsink"))
    val input = MemoryStream[(Long, String)]
    val q = sink(input.toDF().toDF("k", "v"), tgt, "t", tmpDir("gsinkck")).start()
    try {
      input.addData((3L, "c"), (1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((5L, "e"), (4L, "d"))
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.versions(tgt, "t") == Seq(1L, 2L),
      "one versioned commit per non-empty epoch")
    val rows = VersionedTable.read(tgt, "t").select("id", "k", "v")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c"),
      (4L, 4L, "d"), (5L, 5L, "e")),
      "surrogate ids continue across epochs, same as batch loads")
  }

  test("a replayed epoch commits NO duplicate version (crash between sink and engine commit)") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinkr"))
    val ckpt = tmpDir("gsinkrck")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("k", "v")
    val q1 = sink(stream, tgt, "t", ckpt).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    assert(VersionedTable.versions(tgt, "t") == Seq(1L))
    // CRASH INJECTION: drop the engine's commit record for batch 0 — on
    // restart the offset WAL says batch 0 ran but the commit log doesn't,
    // so the engine REPLAYS it with the same epoch id. The sink must find
    // its epoch stamp in the manifest and skip.
    val committed = new java.io.File(s"$ckpt/commits/0")
    assert(committed.exists() && committed.delete(),
      "test setup: engine commit record removed")
    new java.io.File(s"$ckpt/commits/.0.crc").delete() // its checksum twin too
    val q2 = sink(stream, tgt, "t", ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    assert(VersionedTable.versions(tgt, "t") == Seq(1L),
      "the replayed epoch must not commit a duplicate version")
    assert(VersionedTable.read(tgt, "t").select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L),
      "no duplicate rows after the replay")
    // and the stream keeps going: a NEW batch commits normally
    val q3 = sink(stream, tgt, "t", ckpt).start()
    try {
      input.addData((3L, "c"))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(VersionedTable.versions(tgt, "t") == Seq(1L, 2L))
    assert(VersionedTable.read(tgt, "t").count() == 3L)
  }

  test("epoch idempotence survives an interleaved batch load") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinkmix"))
    val ckpt = tmpDir("gsinkmixck")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("k", "v")
    val q1 = sink(stream, tgt, "t", ckpt).start()
    try {
      input.addData((1L, "a"))
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    // a BATCH writer commits between the sink's commit and the replay —
    // its manifest must CARRY the sink's epoch stamp forward, or the
    // replay below would re-commit epoch 0 as a duplicate
    VersionedTable.load(tgt, "t", Seq((2L, "batch")).toDF("k", "v"),
      idOrder = Seq("k"))
    assert(VersionedTable.versions(tgt, "t") == Seq(1L, 2L))
    val committed = new java.io.File(s"$ckpt/commits/0")
    assert(committed.delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = sink(stream, tgt, "t", ckpt).start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
    assert(VersionedTable.versions(tgt, "t") == Seq(1L, 2L),
      "the replayed epoch must skip even after an interleaved batch commit")
    assert(VersionedTable.read(tgt, "t").select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("upsertKeys merges re-emitted keys; staging self-cleans") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinku"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream.format("graft")
      .option("dir", tgt.dir).option("table", "t")
      .option("idOrder", "k").option("upsertKeys", "k")
      .option("bucketBy", "k").option("numBuckets", "4")
      .option("checkpointLocation", tmpDir("gsinkuck"))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((2L, "B2"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = VersionedTable.read(tgt, "t").select("k", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (2L, "B2"), (3L, "c")),
      "re-emitted key must merge, not duplicate")
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 4)),
      "the declared bucket layout is recorded from the first epoch")
    // recorded upsert keys feed the CDC default too
    assert(VersionedTable.recordedUpsertKeys(tgt, "t").contains(Seq("k")))
    // committed epochs' staging is swept
    val stage = new java.io.File(s"${tgt.dirPath("t")}.__vstage")
    def parquets(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) parquets(f) else Seq(f).filter(_.getName.endsWith(".parquet")))
    assert(!stage.exists() || parquets(stage).isEmpty,
      "committed epochs must leave no staged files behind")
  }

  test("keyed epochs into a MERGE-ON-READ table commit DVs, files verbatim") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinkm"))
    // pre-create the MOR table with a base state
    VersionedTable.load(tgt, "t",
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), idOrder = Seq("k"),
      extraProps = Map(
        VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead))
    val pre = VersionedTable.files(tgt, "t", 1L).toSet
    val input = MemoryStream[(Long, String)]
    val q = sink(input.toDF().toDF("k", "v"), tgt, "t", tmpDir("gsinkmck"))
      .option("upsertKeys", "k").start()
    try {
      input.addData((7L, "UP"), (101L, "NEW"))
      q.processAllAvailable()
      input.addData((8L, "UP8"))
      q.processAllAvailable()
    } finally q.stop()
    // each epoch: DV for the matched key + appended merged/fresh rows;
    // every pre-existing data file carried verbatim, epoch stamps intact
    assert(pre.subsetOf(VersionedTable.files(tgt, "t", 3L).toSet),
      "streamed MOR upserts must never rewrite a pre-existing file")
    assert(VersionedTable.deletionVectors(tgt, "t", 3L)
      .values.map(_._2).sum == 2L,
      "the two matched keys' old rows must be DV'd")
    val rows = VersionedTable.read(tgt, "t").select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(rows.size == 101 && rows(7L) == "UP" && rows(8L) == "UP8" &&
      rows(101L) == "NEW" && rows(9L) == "v9",
      s"streamed keyed merge over MOR: ${rows.toSeq.sortBy(_._1).take(10)}")
  }

  test("outputMode Update WITHOUT upsertKeys is refused, not silently duplicated") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinknokeys"))
    val input = MemoryStream[Long]
    val agg = input.toDF().toDF("k").groupBy("k").agg(count(lit(1)).as("n"))
    // keyless Update would append every trigger's re-emitted rows as
    // duplicates — the builder only opts into update-as-append when
    // upsertKeys is declared, so the engine's own mode check refuses
    val err = intercept[Exception] {
      val q = agg.writeStream.format("graft")
        .outputMode("update")
        .option("dir", tgt.dir).option("table", "t")
        .option("checkpointLocation", tmpDir("gsinknokeysck"))
        .start()
      try { input.addData(1L); q.processAllAvailable() } finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.toLowerCase.contains("update")),
      s"expected the engine's update-mode refusal, got: ${messages(err)}")
  }

  test("outputMode Update streams through upsertKeys (update-as-append)") {
    implicit val sqlCtx = spark.sqlContext
    val tgt = new Catalog(spark, tmpDir("gsinkagg"))
    val input = MemoryStream[Long]
    // a running aggregate re-emits updated rows each trigger — with
    // upsertKeys on the group key they merge onto their row
    val agg = input.toDF().toDF("k")
      .withColumn("grp", col("k") % 2)
      .groupBy("grp").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("graft")
      .outputMode("update")
      .option("dir", tgt.dir).option("table", "t")
      .option("idOrder", "grp").option("upsertKeys", "grp")
      .option("checkpointLocation", tmpDir("gsinkaggck"))
      .start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()
    val got = VersionedTable.read(tgt, "t").select("grp", "n")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 3L),
      s"updated aggregate rows must merge onto their group key, got $got")
  }

  test("stale foreign epoch stamps are GC'd: N dead queries leave at most K props") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graft.GraftStreamWrite
    val tgt = new Catalog(spark, tmpDir("gsinkgc"))
    // simulate 25 historical streaming queries' stamps (aged, stamped
    // format) plus one legacy unstamped value — the accretion this GC caps
    val old = (1 to 25).map(i =>
      s"stream_epoch_dead-$i" -> s"$i@${1000L * i}").toMap +
      ("stream_epoch_legacy" -> "7")
    VersionedTable.load(tgt, "t", Seq((1L, "a")).toDF("k", "v"),
      idOrder = Seq("k"), extraProps = old)
    assert(VersionedTable.tableProps(tgt, "t")
      .count(_._1.startsWith("stream_epoch_")) == 26)
    val input = MemoryStream[(Long, String)]
    val q = sink(input.toDF().toDF("k", "v"), tgt, "t", tmpDir("gsinkgcck")).start()
    try {
      input.addData((2L, "b"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    val stamps = VersionedTable.tableProps(tgt, "t")
      .filter(_._1.startsWith("stream_epoch_"))
    assert(stamps.size <= GraftStreamWrite.MaxForeignEpochs + 1,
      s"epoch stamps must stay capped, got ${stamps.size}")
    // the live query's own stamp survives, and the drop order is
    // oldest-first: the legacy unstamped value and the oldest dead
    // queries go, the newest dead ones stay
    assert(stamps.keys.exists(!_.startsWith("stream_epoch_dead-")),
      "the live query's own stamp must survive the GC")
    assert(!stamps.contains("stream_epoch_legacy"),
      "legacy unstamped values sort oldest and are dropped first")
    assert(stamps.contains("stream_epoch_dead-25") &&
      !stamps.contains("stream_epoch_dead-1"),
      "drop order is oldest stamp first")
    // rows were still committed normally
    assert(VersionedTable.read(tgt, "t").count() == 2L)
  }

  test("epoch GC age floor: young over-cap stamps survive (live writers keep idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graft.GraftStreamWrite
    val tgt = new Catalog(spark, tmpDir("gsinkfloor"))
    // 25 foreign stamps, all YOUNG (stamped now): over the count cap,
    // but every one could belong to a live concurrent query — the age
    // floor must keep them all
    val now = System.currentTimeMillis()
    val young = (1 to 25).map(i =>
      s"stream_epoch_live-$i" -> s"$i@${now - i}").toMap
    VersionedTable.load(tgt, "t", Seq((1L, "a")).toDF("k", "v"),
      idOrder = Seq("k"), extraProps = young)
    val input = MemoryStream[(Long, String)]
    val q = sink(input.toDF().toDF("k", "v"), tgt, "t", tmpDir("gsinkfloorck")).start()
    try {
      input.addData((2L, "b"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    val stamps = VersionedTable.tableProps(tgt, "t")
      .filter(_._1.startsWith("stream_epoch_"))
    assert((1 to 25).forall(i => stamps.contains(s"stream_epoch_live-$i")),
      s"no stamp younger than the age floor may drop, got ${stamps.size}")
    assert(GraftStreamWrite.ForeignStampAgeFloorMs >= 60L * 60 * 1000,
      "the floor must be generous enough to cover real trigger gaps")
  }

  test("epoch stamp parsing: both formats, ages order correctly") {
    import org.apache.spark.sql.graft.GraftStreamWrite._
    assert(epochOf("17@123456") == 17L && epochOf("17") == 17L)
    assert(stampedAt("17@123456") == 123456L)
    assert(stampedAt("17") == Long.MinValue, "legacy stamps sort oldest")
    assert(epochOf("junk") == -1L)
  }
}
