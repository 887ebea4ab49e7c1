package graft.streaming

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._

class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def snap(tgt: Catalog, t: String): Seq[(Long, String)] =
    VersionedTable.read(tgt, t).select("k", "s").orderBy("k")
      .as[(Long, String)].collect().toSeq

  test("mirrorOnce streams each committed version into a state-identical mirror") {
    val src = new Catalog(spark, tmpDir("cdcsrc"))
    val dst = new Catalog(spark, tmpDir("cdcdst"))
    val ckpt = tmpDir("cdcckpt")
    VersionedTable.load(src, "t", (1L to 30L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(src, "t", (31L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    // first drain: bootstrap from v1, then the v1→v2 batch
    val applied1 = CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt)
    assert(applied1 == Seq(1L, 2L))
    assert(snap(dst, "m") == snap(src, "t"))
    // caught up: a second drain applies nothing
    assert(CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt).isEmpty)
    // v3 upsert (update + insert), v4 delete — drained incrementally
    VersionedTable.load(src, "t", Seq((7L, "UP"), (41L, "NEW")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.delete(src, "t", col("k") <= 3L)
    val applied2 = CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt)
    assert(applied2 == Seq(3L, 4L))
    assert(snap(dst, "m") == snap(src, "t"))
    assert(snap(dst, "m").size == 38)
    // at-least-once replay is idempotent: rewind the watermark one version
    // and re-drain — the mirror must reconverge, not double-apply
    val p = new org.apache.hadoop.fs.Path(ckpt, "version-watermark")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(p, true)
    try out.write("3".getBytes("UTF-8")) finally out.close()
    assert(CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt) == Seq(4L))
    assert(snap(dst, "m") == snap(src, "t"))
  }

  test("a bucketed mirror takes scoped writes per drained version") {
    val src = new Catalog(spark, tmpDir("cdcsrcb"))
    val dst = new Catalog(spark, tmpDir("cdcdstb"))
    val ckpt = tmpDir("cdcckptb")
    VersionedTable.load(src, "t", (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt,
      bucketBy = Some((Seq("k"), 4)))
    val before = VersionedTable.files(dst, "m",
      VersionedTable.currentVersion(dst, "m").get).toSet
    // a 1-key source update drains into a 1-bucket mirror rewrite
    VersionedTable.load(src, "t", Seq((7L, "UP")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt)
    val after = VersionedTable.files(dst, "m",
      VersionedTable.currentVersion(dst, "m").get).toSet
    val buckets = ((before -- after) ++ (after -- before))
      .flatMap(_.split('/').find(_.startsWith("__gbucket=")))
    assert(buckets.size == 1,
      s"the drained 1-key update must rewrite one mirror bucket, got $buckets")
    assert(snap(dst, "m") == snap(src, "t"))
  }

  test("maintainView keeps an aggregate view consistent across drained versions") {
    val src = new Catalog(spark, tmpDir("cdcmv"))
    val viewTgt = new Catalog(spark, tmpDir("cdcmvv"))
    val ckpt = tmpDir("cdcmvc")
    import graft.etl.MaterializedAgg
    val aggs = Seq(
      MaterializedAgg.AggCol("count", "", "n"),
      MaterializedAgg.AggCol("sum", "v", "sv"),
      MaterializedAgg.AggCol("min", "v", "mn"))
    def freshAgg() = VersionedTable.read(src, "t").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    def viewState() = MaterializedAgg.read(viewTgt, "vw", Seq("g"), aggs)
      .where(col("n") > 0).orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    VersionedTable.load(src, "t",
      Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L)).toDF("k", "g", "v"),
      idOrder = Seq("k"))
    VersionedTable.load(src, "t", Seq((4L, "g2", 5L)).toDF("k", "g", "v"),
      idOrder = Seq("k"))
    val d1 = CdcSource.maintainView(src, "t", Seq("k"), viewTgt, "vw",
      Seq("g"), aggs, ckpt)
    assert(d1 == Seq(1L, 2L))
    assert(viewState() == freshAgg())
    // delete g2's minimum AND update a row out of g1 — min must recover
    // via the snapshot splice, counts/sums via retraction
    VersionedTable.load(src, "t", Seq((2L, "g2", 25L)).toDF("k", "g", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.delete(src, "t", col("k") === 4L)
    val d2 = CdcSource.maintainView(src, "t", Seq("k"), viewTgt, "vw",
      Seq("g"), aggs, ckpt)
    assert(d2 == Seq(3L, 4L))
    assert(viewState() == freshAgg())
    // caught up: nothing to drain
    assert(CdcSource.maintainView(src, "t", Seq("k"), viewTgt, "vw",
      Seq("g"), aggs, ckpt).isEmpty)
  }

  test("maintainView stays exact over a MERGE-ON-READ source (DV deletes + upserts)") {
    // the CDC diff over DV'd manifests feeds the view: a shared file
    // whose DV changed enters both diff sides, so retraction semantics
    // must hold exactly as they do over copy-on-write commits
    val src = new Catalog(spark, tmpDir("cdcmvm"))
    val viewTgt = new Catalog(spark, tmpDir("cdcmvmv"))
    val ckpt = tmpDir("cdcmvmc")
    import graft.etl.MaterializedAgg
    val aggs = Seq(
      MaterializedAgg.AggCol("count", "", "n"),
      MaterializedAgg.AggCol("sum", "v", "sv"),
      MaterializedAgg.AggCol("min", "v", "mn"))
    def freshAgg() = VersionedTable.read(src, "t").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    def viewState() = MaterializedAgg.read(viewTgt, "vw", Seq("g"), aggs)
      .where(col("n") > 0).orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    VersionedTable.load(src, "t",
      (1L to 40L).map(i => (i, s"g${i % 3}", i * 10L)).toDF("k", "g", "v"),
      idOrder = Seq("k"),
      extraProps = Map(
        VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead))
    CdcSource.maintainView(src, "t", Seq("k"), viewTgt, "vw",
      Seq("g"), aggs, ckpt)
    assert(viewState() == freshAgg())
    // MOR delete (DV commit) including a group minimum, then a MOR
    // keyed upsert (DV + merged append) — both drain through the feed
    VersionedTable.delete(src, "t", col("k") <= 3L)
    VersionedTable.load(src, "t",
      Seq((7L, "g1", -7L), (99L, "g0", 990L)).toDF("k", "g", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val drained = CdcSource.maintainView(src, "t", Seq("k"), viewTgt, "vw",
      Seq("g"), aggs, ckpt)
    assert(drained == Seq(2L, 3L), s"both MOR versions drain: $drained")
    assert(viewState() == freshAgg(),
      "the view must equal a fresh aggregation after DV-backed changes")
  }

  test("mirrorOnce refuses to resume from a vacuumed watermark") {
    val src = new Catalog(spark, tmpDir("cdcsrcv"))
    val dst = new Catalog(spark, tmpDir("cdcdstv"))
    val ckpt = tmpDir("cdcckptv")
    VersionedTable.load(src, "t", Seq((1L, "a")).toDF("k", "s"), idOrder = Seq("k"))
    CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt)
    // source moves on twice and vacuums v1 (the mirror's watermark) away
    VersionedTable.load(src, "t", Seq((2L, "b")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.load(src, "t", Seq((3L, "c")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.vacuum(src, "t", keepLast = 2)
    val e = intercept[IllegalArgumentException] {
      CdcSource.mirrorOnce(src, "t", Seq("k"), dst, "m", ckpt)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("deleteKeys prunes to the files containing matches and never collects keys") {
    val tgt = new Catalog(spark, tmpDir("delk"))
    VersionedTable.load(tgt, "t", (1L to 50L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", (51L to 60L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val v1Files = VersionedTable.files(tgt, "t", 1L).toSet
    VersionedTable.deleteKeys(tgt, "t", Seq(55L, 57L).toDF("k"), Seq("k"))
    val v3Files = VersionedTable.files(tgt, "t", 3L).toSet
    assert(v1Files.subsetOf(v3Files),
      "files without matching keys must carry forward untouched")
    assert(VersionedTable.read(tgt, "t").count() == 58L)
    assert(VersionedTable.read(tgt, "t")
      .where(col("k").isin(55L, 57L)).count() == 0L)
    // no-match keyed delete = metadata-only commit
    VersionedTable.deleteKeys(tgt, "t", Seq(999L).toDF("k"), Seq("k"))
    assert(VersionedTable.files(tgt, "t", 4L).toSet == v3Files)
  }
}
