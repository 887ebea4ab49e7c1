package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch as a custom typed
  * [[Aggregator]] (UDAF) — the deterministic alternative to HLL
  * (`approx_count_distinct`), whose engine-private hashing can never match
  * a cross-engine oracle.
  *
  * State: the k smallest DISTINCT portable hashes seen. Estimator (for
  * hashes uniform on [0, P)): the k-th smallest hash h_k divides the range
  * into k gaps of expected size h_k/(k−1), so
  *
  *   distinct ≈ (k−1) · P / h_k        (exact count when < k distinct seen)
  *
  * Determinism: "k smallest of a multiset" is order-insensitive, so
  * shuffle/merge order can't change the result — integer-exact across
  * engines (the DuckDB oracle sorts the same hashes and applies the same
  * integer division).
  *
  * Scale: the sketch is O(k) memory per group, merges associatively
  * (partial aggregation map-side), and one pass — the shape that works for
  * billions of rows per group where exact count(DISTINCT) shuffles every
  * distinct value.
  */
object KmvSketch {

  /** Returns the final sorted buffer (≤ k smallest distinct hashes);
    * [[estimate]] turns it into a count. Exposing the buffer keeps the
    * aggregator reusable (union of sketches, quantile diagnostics). */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.contains(h)) buf
      else {
        val merged = (buf :+ h).sorted
        if (merged.length > k) merged.take(k) else merged
      }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val merged = (a ++ b).distinct.sorted
      if (merged.length > k) merged.take(k) else merged
    }
    def finish(buf: Seq[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** The sketch as a column aggregate over a pre-hashed column
    * ([[PortableHash.hmod]] of the key). */
  def kmv(hashCol: Column, k: Int): Column = udaf(new KmvAgg(k)).apply(hashCol)

  /** Distinct-count estimate from a KMV buffer column (by name): exact
    * when the buffer never filled; (k−1)·P DIV h_k (integer division —
    * portable) when it did. */
  def estimate(bufColName: String, k: Int): Column =
    when(size(col(bufColName)) < k, size(col(bufColName)).cast("long"))
      .otherwise(expr(
        s"CAST(${(k - 1).toLong * PortableHash.P} DIV element_at($bufColName, $k) AS BIGINT)"))

  /** DuckDB twin: `hs` = a SQL fragment for the grouped list of hashes
    * (e.g. `list(h)`). 1-indexed lists, `//` integer division. */
  def estimateSql(hs: String, k: Int): String =
    s"""CAST(CASE WHEN len(list_distinct($hs)) < $k THEN len(list_distinct($hs))
       |     ELSE ${(k - 1).toLong * PortableHash.P} // list_sort(list_distinct($hs))[$k]
       |END AS BIGINT)""".stripMargin.replace("\n", "")
}
