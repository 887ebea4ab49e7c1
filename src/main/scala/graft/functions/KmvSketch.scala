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
    * aggregator reusable (union of sketches, quantile diagnostics).
    *
    * The buffer is a sorted array maintained incrementally: the hot path
    * (billions of rows per group, buffer long since full) is a single
    * compare against the current k-th minimum — O(1), no allocation.
    * Inserts use binary search + an in-place shift when full; merges are a
    * linear two-pointer pass. Never sorts, never scans for membership.
    */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 1, s"KMV sketch size k must be >= 1: $k")
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val len = buf.length
      if (len == k && h >= buf(len - 1)) buf // common case: not a new minimum
      else {
        val pos = java.util.Arrays.binarySearch(buf, h)
        if (pos >= 0) buf // already present
        else {
          val ins = -pos - 1
          if (len < k) {
            val out = new Array[Long](len + 1)
            System.arraycopy(buf, 0, out, 0, ins)
            out(ins) = h
            System.arraycopy(buf, ins, out, ins + 1, len - ins)
            out
          } else {
            // full: shift (ins .. k-2) right, dropping the old maximum —
            // in-place, zero allocation (arraycopy handles the overlap)
            System.arraycopy(buf, ins, buf, ins + 1, len - 1 - ins)
            buf(ins) = h
            buf
          }
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      var last = 0L; var seen = false
      while (n < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) { val x = a(i); i += 1; x } else { val x = b(j); j += 1; x }
        if (!seen || v != last) { out(n) = v; n += 1; last = v; seen = true }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** The sketch as a column aggregate over a pre-hashed column
    * ([[PortableHash.hmod]] of the key). */
  def kmv(hashCol: Column, k: Int): Column = udaf(new KmvAgg(k)).apply(hashCol)

  /** Distinct-count estimate from a KMV buffer given as a SQL expression
    * (a column name, or any array-typed fragment like a `filter(...)` over
    * one): exact when the buffer never filled; (k−1)·P DIV h_k (integer
    * division — (k−1)·P exceeds 2^53, so this must NEVER go through double
    * division) when it did. The single estimator implementation — Profile
    * and the sketch query both route here.
    */
  def estimate(bufSql: String, k: Int): Column =
    when(size(expr(bufSql)) < k, size(expr(bufSql)).cast("long"))
      .otherwise(expr(
        s"CAST(${(k - 1).toLong * PortableHash.P} DIV element_at($bufSql, $k) AS BIGINT)"))

  /** DuckDB twin: `hs` = a SQL fragment for the grouped list of hashes
    * (e.g. `list(h)`). 1-indexed lists, `//` integer division. */
  def estimateSql(hs: String, k: Int): String =
    s"""CAST(CASE WHEN len(list_distinct($hs)) < $k THEN len(list_distinct($hs))
       |     ELSE ${(k - 1).toLong * PortableHash.P} // list_sort(list_distinct($hs))[$k]
       |END AS BIGINT)""".stripMargin.replace("\n", "")

  // ---- sketch set operations ---------------------------------------------
  // KMV sketches are mergeable into SET-OPERATION estimates without
  // re-scanning the data (Beyer et al. 2007): the k smallest hashes of
  // A ∪ B are computable from the two buffers alone, and the fraction of
  // that union sketch present in BOTH buffers estimates Jaccard(A, B).
  // Everything below is integer arithmetic over the buffers — deterministic
  // across engines, like the estimator itself. Spark-SQL fragments over
  // buffer column names, so they compose with [[estimate]].

  /** Spark fragment: the union sketch — k smallest distinct hashes across
    * two buffers. `estimate(unionBufExpr(a, b, k), k)` estimates |A ∪ B|. */
  def unionBufExpr(a: String, b: String, k: Int): String =
    s"slice(array_sort(array_union($a, $b)), 1, $k)"

  /** Spark fragment: how many union-sketch hashes occur in BOTH buffers —
    * the KMV Jaccard numerator (÷ the union-sketch size for the ratio). */
  def overlapCountExpr(a: String, b: String, k: Int): String =
    s"size(filter(${unionBufExpr(a, b, k)}, " +
      s"h -> array_contains($a, h) AND array_contains($b, h)))"

  /** DuckDB twins over buffer fragments (sorted distinct lists). */
  def unionBufSql(a: String, b: String, k: Int): String =
    s"list_sort(list_distinct(list_concat($a, $b)))[1:$k]"
  def overlapCountSql(a: String, b: String, k: Int): String =
    s"len(list_filter(${unionBufSql(a, b, k)}, " +
      s"h -> list_contains($a, h) AND list_contains($b, h)))"
}
