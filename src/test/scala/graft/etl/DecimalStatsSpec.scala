package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DECIMAL ZONE MAPS: int-backed decimal columns (precision ≤ 18)
  * record per-file UNSCALED ranges tagged with the file's own scale —
  * predicates rescale into each file's recorded domain, so pruning,
  * whole-file delete coverage, and precision-only widenings all work on
  * the money columns finance schemas filter by. Float/double literals
  * never prune (Spark widens the COLUMN to double there — an
  * exact-domain skip could be wrong); integral/decimal literals do. */
class DecimalStatsSpec extends SparkSpec {
  import spark.implicits._

  private val lib = new Catalog(spark, tmpDir("gdec"))

  private def decDf(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id").as("k"),
      (col("id") + 0.25).cast(DecimalType(12, 2)).as("amt"))

  test("decimal predicates prune files; results stay exact") {
    // three appends with disjoint amt ranges → per-batch files disjoint
    VersionedTable.load(lib, "t", decDf(0, 1000))
    VersionedTable.load(lib, "t", decDf(1000, 2000))
    VersionedTable.load(lib, "t", decDf(2000, 3000))
    val v = VersionedTable.currentVersion(lib, "t").get
    val all = VersionedTable.files(lib, "t", v)
    // decimal literal: prunes
    val skipped = VersionedTable.skippedFiles(lib, "t", v,
      col("amt") >= new java.math.BigDecimal("2000.00"))
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"decimal zone maps must prune: ${skipped.size}/${all.size}")
    // integral literal against the decimal column: prunes too
    assert(VersionedTable.skippedFiles(lib, "t", v,
      col("amt") >= 2000L).nonEmpty)
    // double literal: Spark widens the COLUMN to double — never prunes
    assert(VersionedTable.skippedFiles(lib, "t", v,
      col("amt") >= 2000.0).isEmpty,
      "double literals must not prune a decimal column")
    // exactness through the prune
    assert(VersionedTable.readWhere(lib, "t",
      col("amt") >= new java.math.BigDecimal("2000.00")).count() == 1000L)
    assert(VersionedTable.readWhere(lib, "t",
      col("amt") < new java.math.BigDecimal("0.30")).count() == 1L)
  }

  test("WIDE decimals (p > 18, FLBA-backed) prune too") {
    // decimal(25, 2): unscaled values deliberately beyond 64 bits —
    // parquet stores FIXED_LEN_BYTE_ARRAY, stats decode as BigIntegers
    val big = new java.math.BigDecimal("10000000000000000000") // 1e19 > Long.Max
    def wideDf(lo: Int, hi: Int) =
      spark.range(lo, hi).select(col("id").as("k"),
        (col("id").cast(DecimalType(25, 2)) +
          lit(big).cast(DecimalType(25, 2))).cast(DecimalType(25, 2)).as("amt"))
    VersionedTable.load(lib, "wide", wideDf(0, 1000))
    VersionedTable.load(lib, "wide", wideDf(1000, 2000))
    VersionedTable.load(lib, "wide", wideDf(2000, 3000))
    val v = VersionedTable.currentVersion(lib, "wide").get
    val all = VersionedTable.files(lib, "wide", v)
    val cut = new java.math.BigDecimal("10000000000000002000.00")
    val skipped = VersionedTable.skippedFiles(lib, "wide", v, col("amt") >= cut)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"wide-decimal zone maps must prune: ${skipped.size}/${all.size}")
    // exactness through the prune, at full precision
    assert(VersionedTable.readWhere(lib, "wide", col("amt") >= cut).count()
      == 1000L)
    assert(VersionedTable.readWhere(lib, "wide",
      col("amt") === new java.math.BigDecimal("10000000000000000007.00"))
      .count() == 1L)
    // double literals keep refusing to prune (column widens to double)
    assert(VersionedTable.skippedFiles(lib, "wide", v,
      col("amt") >= 1.0e19).isEmpty)
  }

  test("whole-file delete coverage proves on decimal ranges") {
    VersionedTable.load(lib, "d", decDf(0, 1000))
    VersionedTable.load(lib, "d", decDf(1000, 2000))
    val v1 = VersionedTable.currentVersion(lib, "d").get
    val before = VersionedTable.files(lib, "d", v1).toSet
    // covers the first batch's files entirely: they must DROP, not rewrite
    VersionedTable.delete(lib, "d",
      col("amt") < new java.math.BigDecimal("1000.00"))
    val v2 = VersionedTable.currentVersion(lib, "d").get
    val after = VersionedTable.files(lib, "d", v2).toSet
    assert(after.subsetOf(before),
      "a fully-covered decimal delete must drop files metadata-only " +
        s"(new files appeared: ${(after -- before).size})")
    assert(after.size < before.size)
    assert(VersionedTable.read(lib, "d").count() == 1000L)
  }

  test("seeded fuzz: random decimal histories ≡ the in-memory model") {
    // the decimal twin of PushdownFuzzSpec's insurance: random
    // append/range-delete histories over a DECIMAL(12,2) column, every
    // retained version checked against an exact BigDecimal model for
    // the filter shapes decimal pruning serves
    import scala.util.Random
    for (seed <- Seq(11L, 42L, 99L)) {
      val rnd = new Random(seed)
      val cat = new Catalog(spark, tmpDir("gdecf"))
      var state = Vector.empty[(Long, BigDecimal)]
      var nextK = 0L
      for (_ <- 0 until (3 + rnd.nextInt(2))) {
        if (state.isEmpty || rnd.nextDouble() < 0.7) {
          val rows = (0 until 50 + rnd.nextInt(100)).map { _ =>
            nextK += 1
            // cents-grained values, some negative
            (nextK, BigDecimal(rnd.nextInt(200000) - 50000) / 100)
          }.toVector
          VersionedTable.load(cat, "f", rows.map { case (k, a) =>
            (k, a.bigDecimal) }.toDF("k", "amt")
            .select(col("k"), col("amt").cast(DecimalType(12, 2)).as("amt")),
            idOrder = Seq("k"))
          state = state ++ rows
        } else {
          val cut = BigDecimal(rnd.nextInt(200000) - 50000) / 100
          VersionedTable.delete(cat, "f", col("amt") <= cut.bigDecimal)
          state = state.filterNot(_._2 <= cut)
        }
        val v = VersionedTable.currentVersion(cat, "f").get
        val df = VersionedTable.readVersion(cat, "f", v)
        val x = BigDecimal(rnd.nextInt(200000) - 50000) / 100
        def got(p: org.apache.spark.sql.Column): Seq[(Long, BigDecimal)] =
          df.where(p).select("k", "amt").collect().toSeq
            .map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)))).sorted
        assert(got(col("amt") >= x.bigDecimal) ==
          state.filter(_._2 >= x).sorted, s"seed $seed v$v >= $x")
        assert(got(col("amt") < x.bigDecimal) ==
          state.filter(_._2 < x).sorted, s"seed $seed v$v < $x")
        if (state.nonEmpty) {
          val pick = state(rnd.nextInt(state.size))._2
          assert(got(col("amt") === pick.bigDecimal) ==
            state.filter(_._2 == pick).sorted, s"seed $seed v$v == $pick")
        }
      }
    }
  }

  test("precision-only widening keeps pruning; scale change strips it") {
    VersionedTable.load(lib, "w", decDf(0, 1000))
    VersionedTable.load(lib, "w", decDf(1000, 2000))
    VersionedTable.widenColumnType(lib, "w", "amt", DecimalType(18, 2))
    val v = VersionedTable.currentVersion(lib, "w").get
    assert(VersionedTable.skippedFiles(lib, "w", v,
      col("amt") >= new java.math.BigDecimal("1000.00")).nonEmpty,
      "(12,2)→(18,2) keeps the unscaled domain — ranges must survive")
    // scale change: conservative strip, correctness unaffected
    VersionedTable.widenColumnType(lib, "w", "amt", DecimalType(20, 4))
    val v2 = VersionedTable.currentVersion(lib, "w").get
    assert(VersionedTable.readWhere(lib, "w",
      col("amt") >= new java.math.BigDecimal("1000.0000")).count() == 1000L)
    assert(VersionedTable.skippedFiles(lib, "w", v2,
      col("amt") >= new java.math.BigDecimal("1000.0000")).isEmpty,
      "a scale change strips carried ranges (conservative)")
  }
}
