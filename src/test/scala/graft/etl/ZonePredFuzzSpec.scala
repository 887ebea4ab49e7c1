package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.Random

/** Seeded fuzz over the zone-map predicate algebra: random AND/OR trees
  * of comparisons, null checks, IN-lists, and DELIBERATELY HOSTILE
  * literals (doubles and numeric strings against long columns — the
  * shapes Spark widens; values beyond 2^53) evaluated three ways over a
  * table whose files carry nulls, NaNs, and non-ASCII strings:
  *
  *   - `readWhere(pred)` must equal `readVersion().where(pred)` (the
  *     eager pruning path can only skip, never change answers);
  *   - the Catalyst path (a plain `.where` over the zone-map FileIndex)
  *     must agree too;
  *   - `delete(pred)` must leave exactly the `!pred` rows (the
  *     whole-file coverage fast path can only drop files that are
  *     entirely matched).
  *
  * Any unsound admit/cover decision shows up as a missing or surviving
  * row against the oracle evaluation. */
class ZonePredFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def buildTable(tgt: Catalog, rnd: Random): Unit = {
    // six appended batches with varied shapes: disjoint-ish k ranges (so
    // zone maps have something to do), a nullable v, a double x with one
    // NaN batch, strings with one non-ASCII batch
    for (b <- 0 until 6) {
      val rows = (0 until 40).map { j =>
        val k = b * 50L + j
        val v: java.lang.Long =
          if (rnd.nextInt(4) == 0) null else java.lang.Long.valueOf(rnd.nextInt(300).toLong)
        val x: Double =
          if (b == 3 && j == 7) Double.NaN else rnd.nextDouble() * 400
        val s = if (b == 4) s"é${rnd.nextInt(100)}" else s"s${rnd.nextInt(300)}"
        (k, v, x, s)
      }
      VersionedTable.load(tgt, "t", rows.toDF("k", "v", "x", "s"),
        idOrder = Seq("k"))
    }
  }

  private def leaf(rnd: Random): Column = rnd.nextInt(10) match {
    case 0 => col("k") >= lit(rnd.nextInt(320).toLong)
    case 1 => col("k") < lit(rnd.nextInt(320).toLong)
    // hostile: fractional / huge / string literals on the LONG column —
    // Spark widens; pruning must refuse, results must still be exact
    case 2 => col("k") === lit(rnd.nextInt(320).toDouble + (if (rnd.nextBoolean()) 0.0 else 0.5))
    case 3 => col("k") <= lit(rnd.nextInt(320).toString)
    case 4 => col("v").isNull
    case 5 => col("v").isNotNull
    case 6 => col("x") > lit(rnd.nextDouble() * 400)
    case 7 => col("s") === lit((if (rnd.nextBoolean()) "s" else "é") + rnd.nextInt(300))
    case 8 => col("k").isin((1 to 3).map(_ => rnd.nextInt(320).toLong): _*)
    case 9 => col("v") === lit((1L << 60) + rnd.nextInt(3)) // beyond 2^53
  }

  /** Collection-side projection: Scala's cooperative equality unboxes
    * doubles, so a boxed NaN never equals itself in a Set — normalize
    * NaN to a sentinel AFTER predicate evaluation, purely for compare. */
  private val cmpCols = Seq(col("id"), col("k"), col("v"),
    nanvl(col("x"), lit(-999.0)).as("x"), col("s"))

  private def predTree(rnd: Random, depth: Int): Column =
    if (depth <= 0) leaf(rnd)
    else rnd.nextInt(4) match {
      case 0 => predTree(rnd, depth - 1) && predTree(rnd, depth - 1)
      case 1 => predTree(rnd, depth - 1) || predTree(rnd, depth - 1)
      case _ => leaf(rnd)
    }

  for (seed <- Seq(11, 202)) {
    test(s"random predicate trees: pruned reads and deletes are exact (seed=$seed)") {
      val rnd = new Random(seed)
      val tgt = new Catalog(spark, tmpDir("zfuzz"))
      buildTable(tgt, rnd)
      val head = VersionedTable.currentVersion(tgt, "t").get
      val full = VersionedTable.readVersion(tgt, "t", head)
        .select(cmpCols: _*).collect().map(_.toSeq).toSet

      var skippedSomething = false
      for (i <- 1 to 30) {
        val p = predTree(rnd, 2)
        skippedSomething ||= VersionedTable.skippedFiles(tgt, "t", head, p).nonEmpty
        val pruned = VersionedTable.readWhere(tgt, "t", head, p)
          .select(cmpCols: _*).collect().map(_.toSeq).toSet
        val oracle = VersionedTable.readVersion(tgt, "t", head).where(p)
          .select(cmpCols: _*).collect().map(_.toSeq).toSet
        assert(pruned == oracle,
          s"readWhere diverged on predicate #$i (seed=$seed): $p\n" +
            s"  missing=${(oracle -- pruned).take(5)}\n" +
            s"  extra=${(pruned -- oracle).take(5)}")
      }
      assert(skippedSomething,
        "the generator must produce at least one actually-pruning predicate")

      // delete fuzz: each round removes a random tree's matches; the head
      // must land exactly on the survivors of a full-scan evaluation
      // (covered files dropping as metadata included)
      for (round <- 1 to 5) {
        val p = predTree(rnd, 1)
        val before = VersionedTable.read(tgt, "t")
        val want = before.where(!coalesce(p, lit(false)))
          .select(cmpCols: _*).collect().map(_.toSeq).toSet
        VersionedTable.delete(tgt, "t", p)
        val got = VersionedTable.read(tgt, "t")
          .select(cmpCols: _*).collect().map(_.toSeq).toSet
        assert(got == want, s"delete diverged in round $round (seed=$seed): $p\n" +
          s"  missing=${(want -- got).take(5)}\n  extra=${(got -- want).take(5)}")
      }
      // nothing above disturbed older versions
      assert(VersionedTable.readVersion(tgt, "t", head)
        .select(cmpCols: _*).collect().map(_.toSeq).toSet == full)
    }
  }
}
