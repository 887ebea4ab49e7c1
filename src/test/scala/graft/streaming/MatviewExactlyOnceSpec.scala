package graft.streaming

import graft.SparkSpec
import graft.etl.{Catalog, MaterializedAgg, VersionedTable}
import org.apache.spark.sql.functions._

/** EXACTLY-ONCE CDC view maintenance: every stamped apply records its
  * source version per GROUP, so the crash shapes that used to silently
  * double-count — the watermark write lost after a successful apply, or a
  * partial multi-bucket apply — now replay the version and land
  * hash-identical to an uninterrupted run. The three injected crashes:
  *
  *   1. apply succeeded, watermark lost → full-version replay skipped;
  *   2. apply reached only SOME groups before dying → replay applies the
  *      missed groups and skips the stamped ones;
  *   3. bootstrap refresh succeeded, watermark lost → bootstrap replay
  *      skipped (a re-aggregated snapshot would otherwise double-fold).
  */
class MatviewExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  private val gb = Seq("grp")
  private val aggs = Seq(
    MaterializedAgg.AggCol("count", "", "n_rows"),
    MaterializedAgg.AggCol("sum", "v", "sum_v"),
    MaterializedAgg.AggCol("min", "v", "min_v")) // min → snapshot-splice path

  private def baseRows(hi: Long) =
    (1L to hi).map(i => (i, s"g${i % 3}", i * 10L)).toDF("k", "grp", "v")

  /** Build the 3-version source: v1 load, v2 update of a slice, v3
    * delete of a slice. */
  private def buildSource(): Catalog = {
    val src = new Catalog(spark, tmpDir("xsrc"))
    VersionedTable.load(src, "t", baseRows(30L), idOrder = Seq("k"))
    VersionedTable.load(src, "t",
      baseRows(30L).where(col("k") <= 10L).withColumn("v", col("v") * 100L),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.delete(src, "t", col("k") > 25L)
    src
  }

  private def viewRows(tgt: Catalog): Seq[(String, Long, Long, Long)] =
    MaterializedAgg.read(tgt, "v", gb, aggs)
      .where(col("n_rows") > 0)
      .select(col("grp"), col("n_rows").cast("long"), col("sum_v").cast("long"),
        col("min_v").cast("long"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq

  private def control(src: Catalog): Seq[(String, Long, Long, Long)] = {
    val tgt = new Catalog(spark, tmpDir("xctl"))
    CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs,
      tmpDir("xctlck"))
    viewRows(tgt)
  }

  test("a replayed version's deltas are skipped, not double-counted") {
    val src = buildSource()
    val want = control(src)
    val tgt = new Catalog(spark, tmpDir("xa"))
    val ckpt = tmpDir("xack")
    // drain everything, then CRASH SHAPE 1: v3 re-applied (stamped) while
    // the watermark claims only v2 — exactly a lost watermark write
    CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs, ckpt)
    val feed3 = VersionedTable.changes(src, "t", 2L, 3L, Seq("k"),
      includeOld = true)
    val snap3 = VersionedTable.readVersion(src, "t", 3L)
    MaterializedAgg.applyChanges(tgt, "v", feed3, snap3, gb, aggs,
      sourceVersion = Some(3L))
    val p = new org.apache.hadoop.fs.Path(ckpt, "version-watermark")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(p, true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    // re-drain: replays v3, which every group already carries
    assert(CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs,
      ckpt) == Seq(3L))
    assert(viewRows(tgt) == want,
      "a replayed stamped version must not change the view")
  }

  test("a PARTIALLY applied version replays only its missed groups") {
    val src = buildSource()
    val want = control(src)
    val tgt = new Catalog(spark, tmpDir("xb"))
    val ckpt = tmpDir("xbck")
    // drain v1..v2 only: build the source to v2 first in a twin table
    val src2 = new Catalog(spark, tmpDir("xsrc2"))
    VersionedTable.load(src2, "t", baseRows(30L), idOrder = Seq("k"))
    VersionedTable.load(src2, "t",
      baseRows(30L).where(col("k") <= 10L).withColumn("v", col("v") * 100L),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    CdcSource.maintainView(src2, "t", Seq("k"), tgt, "v", gb, aggs, ckpt)
    VersionedTable.delete(src2, "t", col("k") > 25L) // now v3 exists
    // CRASH SHAPE 2: v3's apply died after reaching group g0 only
    val feed3 = VersionedTable.changes(src2, "t", 2L, 3L, Seq("k"),
      includeOld = true)
    val snap3 = VersionedTable.readVersion(src2, "t", 3L)
    MaterializedAgg.applyChanges(tgt, "v", feed3.where(col("grp") === "g0"),
      snap3, gb, aggs, sourceVersion = Some(3L))
    // re-drain from the (still v2) watermark: g0 skips, g1/g2 catch up
    assert(CdcSource.maintainView(src2, "t", Seq("k"), tgt, "v", gb, aggs,
      ckpt) == Seq(3L))
    assert(viewRows(tgt) == want,
      "stamped groups skip, unstamped groups apply — exactly once each")
  }

  test("a replayed bootstrap refresh is skipped") {
    val src = buildSource()
    val want = control(src)
    val tgt = new Catalog(spark, tmpDir("xc"))
    val ckpt = tmpDir("xcck")
    // CRASH SHAPE 3: bootstrap (v1 snapshot) landed, watermark write lost
    MaterializedAgg.refresh(tgt, "v",
      VersionedTable.readVersion(src, "t", 1L), gb, aggs,
      sourceVersion = Some(1L))
    // full drain from scratch: bootstrap replays (skipped), v2/v3 apply
    assert(CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs,
      ckpt) == Seq(1L, 2L, 3L))
    assert(viewRows(tgt) == want,
      "a replayed bootstrap must not double the sums")
  }

  test("watermark loss plus vacuum re-bases the bootstrap instead of double-counting") {
    // CRASH SHAPE 4: the view's stamps point into versions that were
    // VACUUMED away and the watermark file is gone — the bootstrap's
    // snapshot refresh would additively fold the earliest retained
    // snapshot onto state that already counts part of it. The re-base
    // guard detects stamps < the earliest retained version and rebuilds
    // the view from the snapshot, which reconverges exactly.
    val src = new Catalog(spark, tmpDir("xd"))
    VersionedTable.load(src, "t", baseRows(30L), idOrder = Seq("k"))
    VersionedTable.load(src, "t",
      baseRows(30L).where(col("k") <= 10L).withColumn("v", col("v") * 100L),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val tgt = new Catalog(spark, tmpDir("xdt"))
    val ckpt = tmpDir("xdck")
    CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs, ckpt)
    VersionedTable.delete(src, "t", col("k") > 25L)   // v3
    VersionedTable.vacuum(src, "t", keepLast = 1)     // only v3 retained
    val wm = new org.apache.hadoop.fs.Path(ckpt, "version-watermark")
    wm.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wm, false)
    CdcSource.maintainView(src, "t", Seq("k"), tgt, "v", gb, aggs, ckpt)
    val want = VersionedTable.read(src, "t").groupBy("grp")
      .agg(count(lit(1)).cast("long"), sum("v").cast("long"),
        min("v").cast("long"))
      .orderBy("grp").as[(String, Long, Long, Long)].collect().toSeq
    assert(viewRows(tgt) == want,
      "re-based bootstrap must equal a fresh recompute of the snapshot")
  }
}
