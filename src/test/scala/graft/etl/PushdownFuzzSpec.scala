package graft.etl

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SEEDED PROPERTY SUITE for the pushdown + zone-map surfaces: random
  * table layouts (append / keyed-delete / range-delete histories, flat
  * and bucketed, null mixes, Long.MinValue/MaxValue extremes, all-null
  * columns, empty tables, stats-stripped legacy manifests) checked at
  * multiple retained versions against an INDEPENDENT in-memory model —
  * pushed plans must equal unpushed semantics for:
  *
  *   - full scans and zone-pruned filters (eq / range / IS [NOT] NULL /
  *     AND / OR shapes — the one-sided skipping can drop files, never
  *     rows);
  *   - LIMIT n (the truncation must never return short);
  *   - ORDER BY c LIMIT n, both directions (the top-N file walk's
  *     threshold reasoning, including the null-voiding rule);
  *   - global count(*) / count(c) / min / max (manifest-answered when
  *     safe, scan-answered otherwise — identical either way).
  *
  * The soundness claims these exercise are hand-reasoned one-sided
  * guards (GraftScanBuilder, VersionedTable.batchSlices top-N walk);
  * this suite is the cheap insurance that a layout nobody hand-wrote
  * can't slip past them. Seed printed on failure for replay.
  */
class PushdownFuzzSpec extends SparkSpec {
  import spark.implicits._

  private case class R(k: Long, c: Option[Long], s: String,
                       d2: Option[Long] = None)

  /** Build a random multi-version table; returns (catalog, snapshots —
    * snapshot(i) is the expected state of version i+1). With `mor` the
    * table is merge-on-read: every delete/deleteKeys commits DELETION
    * VECTORS instead of rewrites, so the checked versions carry DV'd
    * manifests — zone filters, LIMIT's live-row counting, top-N, and the
    * manifest-aggregate decline rule all get fuzzed over DVs. */
  private def buildTable(rnd: Random, bucketed: Boolean, extremes: Boolean,
                         allNullC: Boolean,
                         mor: Boolean = false,
                         mapped: Boolean = false,
                         defaulted: Boolean = false,
                         widened: Boolean = false,
                         transformed: Boolean = false)
      : (Catalog, Vector[(Long, Vector[R])]) = {
    val tgt = new Catalog(spark, tmpDir("fuzz"))
    var nextK = 0L
    var state = Vector.empty[R]
    val snaps = Vector.newBuilder[(Long, Vector[R])]
    val nCommits = 3 + rnd.nextInt(3)
    var committed = 0
    var deletes = 0
    def genD2(): Option[Long] =
      if (rnd.nextDouble() < 0.2) None // explicit NULL: must STAY null
      else Some(rnd.nextInt(20).toLong) // includes 7 — collides with the default
    def genC(): Option[Long] =
      if (allNullC) None
      else if (rnd.nextDouble() < 0.1) None
      else if (extremes && rnd.nextDouble() < 0.05)
        Some(if (rnd.nextBoolean()) Long.MaxValue else Long.MinValue)
      else Some(rnd.nextInt(1000).toLong)
    def doDelete(): Unit = if (rnd.nextBoolean()) {
      val victims = state.filter(_ => rnd.nextDouble() < 0.2).map(_.k)
      VersionedTable.deleteKeys(tgt, "t", victims.toDF("k"), Seq("k"))
      val vs = victims.toSet
      state = state.filterNot(r => vs(r.k))
    } else {
      val x = rnd.nextInt(1000).toLong
      VersionedTable.delete(tgt, "t", col("c") <= x)
      // Spark WHERE semantics: NULL c does not match, survives
      state = state.filterNot(r => r.c.exists(_ <= x))
    }
    // KEYED upsert: update a random subset of live keys + insert fresh
    // ones — on MOR tables this drives the DV-upsert path against the
    // same model that checks the copy-on-write merge
    def doUpsert(): Unit = {
      val updates = state.filter(_ => rnd.nextDouble() < 0.15)
        .map(r => R(r.k, genC(), s"u${r.k}c$committed",
          if (defaulted) genD2() else None))
      val inserts = (0 to rnd.nextInt(30)).map { _ =>
        nextK += 1
        R(nextK, genC(), s"s$nextK", if (defaulted) genD2() else None)
      }.toVector
      val batch = updates ++ inserts // keys unique by construction
      val bdf =
        if (defaulted)
          batch.map(r => (r.k, r.c, r.s, r.d2)).toDF("k", "c", "s", "d2")
        else batch.map(r => (r.k, r.c, r.s)).toDF("k", "c", "s")
      VersionedTable.load(tgt, "t", bdf,
        upsertFields = Seq("k"), idOrder = Seq("k"))
      val byK = batch.map(r => r.k -> r).toMap
      state = state.map(r => byK.getOrElse(r.k, r)) ++ inserts
    }
    while (committed < nCommits) {
      val op =
        if (state.isEmpty) 0
        // a MOR case must actually exercise DVs: force the last commit
        // to a delete when the random walk produced none
        else if (mor && deletes == 0 && committed == nCommits - 1) 9
        else rnd.nextInt(10)
      if (op < 5) {
        val n = rnd.nextInt(120)
        val rows = (0 until n).map { _ =>
          nextK += 1
          R(nextK, genC(), s"s$nextK")
        }.toVector
        // the MAPPED dimension: the table is born with column 'c0' plus
        // a junk column 'd'; right after the first commit 'c0' RENAMES
        // to 'c' and 'd' DROPS — every later commit and every checked
        // read then runs under a NON-IDENTITY column mapping (files
        // carry physical 'c0' and dead 'd' bytes forever)
        val rowsD =
          if (defaulted && committed > 0) rows.map(_.copy(d2 = genD2()))
          else rows
        val df0 =
          if (mapped && committed == 0)
            rowsD.map(r => (r.k, r.c, r.s, "junk"))
              .toDF("k", "c0", "s", "d")
          else if (widened && committed == 0)
            // the WIDENED dimension: the table is born with c as INT
            // (values fit by genC construction — the extremes knob is
            // off for widened runs) and widens to LONG right after —
            // every later commit and check runs over mixed-era files
            rowsD.map(r => (r.k, r.c.map(_.toInt), r.s))
              .toDF("k", "c", "s")
          else if (defaulted && committed > 0)
            rowsD.map(r => (r.k, r.c, r.s, r.d2)).toDF("k", "c", "s", "d2")
          else rowsD.map(r => (r.k, r.c, r.s)).toDF("k", "c", "s")
        VersionedTable.load(tgt, "t", df0,
          idOrder = Seq("k"),
          bucketBy = if (bucketed && committed == 0) Some((Seq("k"), 4)) else None,
          extraProps = (if (mor && committed == 0)
            Map(VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead)
          else Map.empty[String, String]) ++
            // the TRANSFORMED dimension: the table declares an identity
            // partition transform on k at birth — every write then
            // range-clusters its files on k, and every checked read
            // (filters, LIMIT, top-N, aggregates, DVs) runs over the
            // arranged layout; results must be IDENTICAL to the flat
            // model (the arrangement may only move file boundaries)
            (if (transformed && committed == 0)
              Map(VersionedTable.PartitionSpecProp ->
                VersionedTable.partSpecJson(Seq(
                  VersionedTable.PartTransform("identity", "k"))))
            else Map.empty[String, String]))
        if (mapped && committed == 0) {
          VersionedTable.renameColumn(tgt, "t", "c0", "c")
          VersionedTable.dropColumn(tgt, "t", "d")
        }
        // the DEFAULTED dimension: after the first commit, ADD a column
        // with a frozen existence default — every pre-ADD row reads 7
        // from files that physically lack the column, every later write
        // materializes explicit values (including NULLs, which must stay
        // NULL: a file that HAS the column never fills the default)
        if (widened && committed == 0)
          VersionedTable.widenColumnType(tgt, "t", "c",
            org.apache.spark.sql.types.LongType)
        if (defaulted && committed == 0) {
          val meta = new org.apache.spark.sql.types.MetadataBuilder()
            .putString(org.apache.spark.sql.graft.DefaultColumns.ExistsKey, "7")
            .putString(org.apache.spark.sql.graft.DefaultColumns.CurrentKey, "7")
            .build()
          VersionedTable.widenSchema(tgt, "t", Seq(
            org.apache.spark.sql.types.StructField("d2",
              org.apache.spark.sql.types.LongType, nullable = true, meta)))
          state = state.map(_.copy(d2 = Some(7L)))
        }
        state = state ++ (if (defaulted && committed == 0)
          rowsD.map(_.copy(d2 = Some(7L))) else rowsD)
      } else if (op < 7) {
        doUpsert()
      } else {
        doDelete()
        deletes += 1
      }
      committed += 1
      snaps += (VersionedTable.currentVersion(tgt, "t").get -> state)
    }
    (tgt, snaps.result())
  }

  private def reader(tgt: Catalog, v: Long) =
    spark.read.format("graft")
      .option("dir", tgt.dir).option("table", "t")
      .option("versionAsOf", v.toString).load()

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long], String)] =
    df.select("k", "c", "s").collect().toSeq.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))

  private def checkVersion(tgt: Catalog, v: Long, truth: Vector[R],
                           rnd: Random, tag: String): Unit = {
    val df = reader(tgt, v)
    val truthT = truth.map(r => (r.k, r.c, r.s))
    // full scan
    assert(rowsOf(df).sorted == truthT.sorted, s"[$tag v$v] full scan")
    // zone-pruned filters vs model semantics (pred true keeps the row)
    val x = rnd.nextInt(1000).toLong
    val y = rnd.nextInt(1000).toLong
    val k0 = if (truth.nonEmpty) truth(rnd.nextInt(truth.size)).k else 7L
    val preds: Seq[(org.apache.spark.sql.Column, R => Boolean)] = Seq(
      (col("c") >= x, r => r.c.exists(_ >= x)),
      (col("c") < y, r => r.c.exists(_ < y)),
      (col("k") === k0, r => r.k == k0),
      (col("c").isNull, r => r.c.isEmpty),
      (col("c").isNotNull, r => r.c.nonEmpty),
      (col("c") >= x && col("k") < k0, r => r.c.exists(_ >= x) && r.k < k0),
      (col("c") < y || col("c").isNull, r => r.c.forall(_ < y)))
    preds.foreach { case (p, model) =>
      assert(rowsOf(df.where(p)).sorted ==
        truth.filter(model).map(r => (r.k, r.c, r.s)).sorted,
        s"[$tag v$v] filter $p")
    }
    // the DEFAULTED dimension: pre-ADD rows read the frozen 7 from
    // files that lack the column; explicit NULLs written after the ADD
    // stay NULL — and filters on the defaulted column stay exact
    if (df.columns.contains("d2")) {
      def rows4(d: org.apache.spark.sql.DataFrame) =
        d.select("k", "c", "s", "d2").collect().toSeq.map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      def t4(rs: Vector[R]) = rs.map(r => (r.k, r.c, r.s, r.d2))
      assert(rows4(df).sorted == t4(truth).sorted, s"[$tag v$v] d2 full scan")
      assert(rows4(df.where(col("d2") === 7L)).sorted ==
        t4(truth.filter(_.d2.contains(7L))).sorted, s"[$tag v$v] d2 = 7")
      assert(rows4(df.where(col("d2").isNull)).sorted ==
        t4(truth.filter(_.d2.isEmpty)).sorted, s"[$tag v$v] d2 IS NULL")
    }
    // LIMIT: never short, always a subset
    Seq(0, 1, 7, truth.size, truth.size + 3).foreach { n =>
      val got = rowsOf(df.limit(n))
      assert(got.size == math.min(n, truth.size), s"[$tag v$v] limit $n size")
      assert(got.toSet.subsetOf(truthT.toSet), s"[$tag v$v] limit $n subset")
    }
    // ORDER BY c LIMIT n: the c-value sequence must be exact (rows may
    // tie; values cannot differ). Spark defaults: ASC NULLS FIRST,
    // DESC NULLS LAST.
    val asc = truth.map(_.c).sorted(Ordering.by((o: Option[Long]) =>
      (o.nonEmpty, o.getOrElse(Long.MinValue))))
    val desc = asc.reverse // DESC NULLS LAST is exactly the reversal
    def cVals(d: org.apache.spark.sql.DataFrame): Seq[Option[Long]] =
      d.select("c").collect().toSeq.map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    Seq(1, 5, truth.size + 2).foreach { n =>
      assert(cVals(df.orderBy(col("c")).limit(n)) == asc.take(n),
        s"[$tag v$v] top-$n asc")
      assert(cVals(df.orderBy(col("c").desc).limit(n)) == desc.take(n),
        s"[$tag v$v] top-$n desc")
    }
    // global aggregates (manifest-answered when safe — identical either way)
    val agg = df.agg(count(lit(1)).as("n"), count(col("c")).as("nc"),
      min(col("k")).as("mink"), max(col("k")).as("maxk"),
      min(col("c")).as("minc"), max(col("c")).as("maxc")).head()
    assert(agg.getLong(0) == truth.size, s"[$tag v$v] count(*)")
    assert(agg.getLong(1) == truth.count(_.c.nonEmpty), s"[$tag v$v] count(c)")
    def lopt(i: Int) = if (agg.isNullAt(i)) None else Some(agg.getLong(i))
    assert(lopt(2) == truth.map(_.k).minOption, s"[$tag v$v] min(k)")
    assert(lopt(3) == truth.map(_.k).maxOption, s"[$tag v$v] max(k)")
    assert(lopt(4) == truth.flatMap(_.c).minOption, s"[$tag v$v] min(c)")
    assert(lopt(5) == truth.flatMap(_.c).maxOption, s"[$tag v$v] max(c)")
  }

  private def runCase(seed: Long, bucketed: Boolean, extremes: Boolean,
                      allNullC: Boolean, mor: Boolean = false,
                      mapped: Boolean = false,
                      defaulted: Boolean = false,
                      widened: Boolean = false,
                      transformed: Boolean = false): Unit = {
    require(!(widened && extremes), "widened runs need int-sized c values")
    val rnd = new Random(seed)
    val (tgt, snaps) = buildTable(rnd, bucketed, extremes, allNullC, mor,
      mapped, defaulted, widened, transformed)
    val tag = s"seed=$seed b=$bucketed x=$extremes n=$allNullC m=$mor " +
      s"p=$mapped f=$defaulted w=$widened t=$transformed"
    // first, last, and one random middle snapshot (mapped/defaulted
    // histories skip the first — its schema predates the ALTER)
    val checkable =
      if (mapped || defaulted || widened) snaps.drop(1) else snaps
    val is = Set(0, checkable.size - 1, rnd.nextInt(checkable.size)).toSeq.sorted
    is.foreach { i =>
      val (v, truth) = checkable(i)
      checkVersion(tgt, v, truth, rnd, tag)
    }
    // legacy emulation: strip the head's per-file metadata — every
    // pushdown must VOID (and still answer exactly), never guess
    VersionedTable.stripFileMeta(tgt, "t")
    val (hv, htruth) = snaps.last
    checkVersion(tgt, hv, htruth, rnd, s"$tag stripped")
  }

  test("random flat layouts: pushed plans equal unpushed semantics") {
    runCase(20260815L, bucketed = false, extremes = false, allNullC = false)
    runCase(20260816L, bucketed = false, extremes = false, allNullC = false)
  }

  test("random bucketed layouts: bucket pruning + pushdowns stay exact") {
    runCase(20260817L, bucketed = true, extremes = false, allNullC = false)
  }

  test("Long.MinValue/MaxValue extremes never missort a truncation") {
    runCase(20260818L, bucketed = false, extremes = true, allNullC = false)
  }

  test("all-null sort column voids top-N truncation, results exact") {
    runCase(20260819L, bucketed = false, extremes = false, allNullC = true)
  }

  test("merge-on-read histories: every pushdown stays exact over deletion vectors") {
    runCase(20260820L, bucketed = false, extremes = false, allNullC = false,
      mor = true)
    runCase(20260821L, bucketed = false, extremes = true, allNullC = false,
      mor = true)
  }

  test("bucketed merge-on-read: bucket pruning composes with deletion vectors") {
    runCase(20260822L, bucketed = true, extremes = false, allNullC = false,
      mor = true)
  }

  test("column-mapped histories: every pushdown stays exact under rename+drop") {
    runCase(20260823L, bucketed = false, extremes = false, allNullC = false,
      mapped = true)
    runCase(20260824L, bucketed = false, extremes = true, allNullC = false,
      mor = true, mapped = true)
    runCase(20260825L, bucketed = true, extremes = false, allNullC = false,
      mapped = true)
  }

  test("existence-defaulted histories: pushdowns exact over mixed-era files") {
    runCase(20260826L, bucketed = false, extremes = false, allNullC = false,
      defaulted = true)
    runCase(20260827L, bucketed = false, extremes = false, allNullC = false,
      mor = true, defaulted = true)
  }

  test("type-widened histories: pushdowns exact over mixed int/long-era files") {
    runCase(20260828L, bucketed = false, extremes = false, allNullC = false,
      widened = true)
    runCase(20260829L, bucketed = false, extremes = false, allNullC = false,
      mor = true, widened = true)
  }

  test("partition-transformed histories: the arranged layout never changes results") {
    runCase(20260830L, bucketed = false, extremes = false, allNullC = false,
      transformed = true)
    runCase(20260831L, bucketed = false, extremes = true, allNullC = false,
      mor = true, transformed = true)
    runCase(20260832L, bucketed = false, extremes = false, allNullC = false,
      defaulted = true, transformed = true)
  }

  test("empty table: zero partitions, zero rows, null extrema") {
    val tgt = new Catalog(spark, tmpDir("fuzzempty"))
    VersionedTable.load(tgt, "t", spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType)))))
    checkVersion(tgt, 1L, Vector.empty, new Random(1L), "empty")
  }
}
