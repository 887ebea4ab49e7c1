package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact heavy hitters: the Misra-Gries candidate pass must never lose a
  * true heavy hitter (the exactness guarantee rests on it), and the full
  * operator must equal the brute-force aggregation on skewed data —
  * through both the broadcast-verify path and the fallback.
  */
class FrequentItemsSpec extends SparkSpec {

  /** Zipf-ish skewed items: value v appears ~ max(1, 3000/v) times,
    * v in 1..400 — a heavy head and a long tail, deterministic. */
  private def zipfDf = {
    val rows = (1 to 400).flatMap(v => Seq.fill(math.max(1, 3000 / v))(s"item_$v"))
    // seeded shuffle so partition layout isn't sorted by frequency
    val shuffled = new scala.util.Random(42).shuffle(rows)
    spark.createDataFrame(shuffled.map(Tuple1(_))).toDF("item").repartition(7)
  }

  private def brute(minCount: Long) =
    zipfDf.groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("misraGries summary is a superset of every local heavy hitter") {
    val items = Seq.fill(500)("hot") ++ (1 to 900).map(i => s"rare_$i")
    val shuffled = new scala.util.Random(7).shuffle(items)
    // k = 10 counters over 1400 rows: anything with count > 1400/11 must survive
    val out = FrequentItems.misraGries(shuffled.iterator, 10).toSet
    assert(out.contains("hot"), "a 36% item must survive a k=10 sketch")
    assert(out.size <= 10, s"sketch must hold at most k keys: ${out.size}")
  }

  test("heavyHitters equals the brute-force aggregation (broadcast path)") {
    val minCount = 100L
    val got = FrequentItems.heavyHitters(zipfDf, "item", minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute(minCount), "two-pass result must be exactly the brute force")
    assert(got.nonEmpty && got.values.forall(_ >= minCount))
  }

  test("heavyHitters equals brute force through the fallback (tiny broadcastCap)") {
    val minCount = 100L
    val got = FrequentItems.heavyHitters(zipfDf, "item", minCount, broadcastCap = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute(minCount), "fallback path must stay exact")
  }

  test("heavyHittersBySupport matches the equivalent absolute threshold") {
    val n = zipfDf.count()
    val support = 0.01
    val minCount = math.max(1L, math.ceil(support * n).toLong)
    val bySupport = FrequentItems.heavyHittersBySupport(zipfDf, "item", support)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySupport == brute(minCount))
  }

  test("a minCount too small for the counter budget is rejected, nulls ignored") {
    intercept[IllegalArgumentException] {
      FrequentItems.heavyHitters(zipfDf, "item", minCount = 2, maxCounters = 100)
    }
    val withNulls = spark.createDataFrame(
      Seq(Tuple1("a"), Tuple1("a"), Tuple1(null.asInstanceOf[String]), Tuple1("b"))
    ).toDF("item")
    val got = FrequentItems.heavyHitters(withNulls, "item", minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L), s"nulls must be ignored: $got")
  }
}
