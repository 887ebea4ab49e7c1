package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters (frequent items) over arbitrarily large columns —
  * the vocabulary/hot-key analysis a training-data pipeline runs constantly
  * (dominant tokens, hot dedup keys, over-represented domains). Extension
  * scope beyond the reference (cf. /root/reference/easy_etl/__init__.py —
  * no aggregation surface at all).
  *
  * A plain `GROUP BY item HAVING count >= t` is exact but shuffles one row
  * per DISTINCT item per partition after partial aggregation — for a
  * token column at 100 TB that is billions of sketch-free shuffle rows,
  * almost all of them for items nowhere near the threshold. This operator
  * keeps the answer exact while shuffling almost nothing:
  *
  *  1. CANDIDATES — one scan; each partition summarizes its rows with a
  *     Misra-Gries sketch of k counters (k = ⌈N/minCount⌉, O(k) state,
  *     amortized O(1) per row). MG's guarantee: an item absent from a
  *     partition's summary has local count ≤ n_p/(k+1); absent from ALL
  *     summaries ⇒ global count ≤ Σ n_p/(k+1) = N/(k+1) < minCount. So the
  *     union of summaries is a SUPERSET of every true heavy hitter — no
  *     recall loss, ever.
  *  2. VERIFY — one more scan counting ONLY candidate-matching rows
  *     (broadcast semi-join, map-side partial agg): shuffle volume is
  *     ≤ |candidates| rows per partition instead of the full vocabulary.
  *
  * If the candidate set is too large to broadcast (minCount set near the
  * noise floor), the operator falls back to the plain exact aggregation —
  * same answer, more shuffle — and logs the decision.
  */
object FrequentItems {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Per-partition Misra-Gries summary: the keys of a k-counter decrement
    * sketch — every item with local count > n/(k+1) is guaranteed present. */
  private[operators] def misraGries(iter: Iterator[String], k: Int): Iterator[String] = {
    val m = new java.util.HashMap[String, Long](k * 2)
    while (iter.hasNext) {
      val x = iter.next()
      val prev = m.getOrDefault(x, 0L)
      if (prev > 0L || m.size < k) m.put(x, prev + 1L)
      else {
        // decrement-all: pays one unit per live counter; amortized against
        // the insertions that filled them, so the scan stays O(1)/row
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    // copy out: the HashMap must not outlive the iterator contract
    m.keySet().asScala.toVector.iterator
  }

  /** All items of `itemCol` (nulls ignored) with exact count ≥ `minCount`,
    * as (item: string, cnt: long) — exact, in two scans and a near-empty
    * shuffle. `maxCounters` bounds per-task sketch memory; a `minCount` so
    * small that ⌈N/minCount⌉ exceeds it is rejected (the result would not
    * be a guaranteed superset). `broadcastCap` bounds the candidate
    * broadcast; beyond it the exact one-pass aggregation runs instead. */
  def heavyHitters(df: DataFrame, itemCol: String, minCount: Long,
                   maxCounters: Int = 1 << 20,
                   broadcastCap: Int = 200000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val n = items.count()
    heavyHittersKnownN(items, n, minCount, maxCounters, broadcastCap)
  }

  /** [[heavyHitters]] with the threshold as a fraction of the (non-null)
    * row count: items occurring in ≥ `support` of rows. */
  def heavyHittersBySupport(df: DataFrame, itemCol: String, support: Double,
                            maxCounters: Int = 1 << 20,
                            broadcastCap: Int = 200000): DataFrame = {
    require(support > 0.0 && support <= 1.0, s"support out of range: $support")
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val n = items.count()
    val minCount = math.max(1L, math.ceil(support * n).toLong)
    heavyHittersKnownN(items, n, minCount, maxCounters, broadcastCap)
  }

  private def heavyHittersKnownN(items: DataFrame, n: Long, minCount: Long,
                                 maxCounters: Int, broadcastCap: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val exact = items.groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    if (n == 0L) return exact // empty input: nothing to sketch
    val k = math.max(1L, n / minCount + (if (n % minCount == 0) 0 else 1))
    require(k <= maxCounters,
      s"minCount=$minCount needs $k Misra-Gries counters over $n rows " +
        s"(> maxCounters=$maxCounters); raise minCount or maxCounters")
    val ds: Dataset[String] = items.as[String]
    // bounded collect: the sketch emits <= k items per partition, and we
    // stop reading at broadcastCap + 1 — the driver never holds more
    val candRows = ds.mapPartitions(it => misraGries(it, k.toInt))
      .distinct().limit(broadcastCap + 1).collect()
    if (candRows.length > broadcastCap) {
      log.warn(s"heavyHitters: over $broadcastCap candidates at minCount=$minCount — " +
        "falling back to the plain exact aggregation (same answer, full shuffle)")
      exact
    } else {
      val cands = spark.createDataset(candRows.toIndexedSeq).toDF("item")
      items.join(broadcast(cands), Seq("item"), "left_semi")
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
    }
  }
}
