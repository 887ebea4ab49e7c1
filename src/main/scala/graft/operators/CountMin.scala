package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Count-min sketch (Cormode & Muthukrishnan 2005) over a key stream, as
  * pure declarative aggregation — no UDAF needed: the sketch IS a tiny
  * keyed table.
  *
  * A d×w counter matrix: row r counts keys in bucket hash_r(key) mod w;
  * a key's frequency estimate is the MINIMUM of its d counters — always
  * ≥ the true count, within ε·N (ε = e/w) with probability 1 − δ
  * (δ = e^−d).
  *
  * Scale shape (the reason to sketch at all): the BUILD is one explode(×d)
  * over the stream followed by a partial aggregation whose key domain is
  * AT MOST d·w (thousands) — map-side combine collapses every task's
  * stream to ≤ d·w rows regardless of input size, so a 100 TB token
  * stream shuffles kilobytes. Exact per-key counting shuffles the full
  * vocabulary. The sketch table then broadcasts for probe joins, merges
  * across corpora by summing matching (r, bucket) cells, and supports
  * point estimates without touching the stream again.
  *
  * Determinism: bucket indices come from the portable md5 hash with the
  * row index folded into the hashed string, so the DuckDB oracle computes
  * the identical matrix cell by cell ([[bucketSql]]).
  */
object CountMin {

  /** Bucket of `item` in sketch row `r`: portable hash of "r␁item" mod w. */
  def bucketCol(item: Column, r: Int, w: Int): Column =
    PortableHash.hmod(concat_ws("\u0001", lit(r.toString), item)) % w

  /** DuckDB twin of [[bucketCol]] over SQL fragment `itemSql`. */
  def bucketSql(itemSql: String, r: Int, w: Int): String =
    s"(${PortableHash.hmodSql(s"'$r' || chr(1) || ($itemSql)")} % $w)"

  private def rowBuckets(item: Column, d: Int, w: Int): Column =
    explode(array((0 until d).map(r =>
      struct(lit(r).as("r"), bucketCol(item, r, w).as("bucket"))): _*))

  /** Build the sketch from `items(itemCol)`: a DataFrame (r, bucket, cnt)
    * with ≤ d·w rows. One pass over the stream; partial aggregation
    * bounds per-task state at d·w counters. */
  def sketch(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1 and w >= 1: d=$d w=$w")
    items.select(rowBuckets(col(itemCol), d, w).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of the SAME (d, w): cell-wise sum — the property
    * that lets per-corpus / per-day sketches roll up without re-scanning
    * any stream. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for the (distinct) keys in `probes(itemCol)`:
    * min over the key's d cells; keys hitting only empty cells estimate 0.
    * The sketch side is ≤ d·w rows — the join broadcasts; cost is
    * O(probes·d), independent of the stream size. */
  def estimates(sk: DataFrame, probes: DataFrame, itemCol: String,
                d: Int, w: Int): DataFrame = {
    val pb = probes
      .select(col(itemCol), rowBuckets(col(itemCol), d, w).as("rb"))
      .select(col(itemCol), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    pb.join(broadcast(sk), Seq("r", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
