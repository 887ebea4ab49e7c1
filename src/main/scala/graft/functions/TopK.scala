package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k (score, id) aggregate — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(query))` ranking when the
  * candidate set per group is unbounded (brute-force / full-corpus ADC
  * scans: every corpus row is a candidate for every query, so a window
  * routes the ENTIRE corpus through one reducer per query).
  *
  * As a typed [[Aggregator]] (Spark runs it as a `TypedImperativeAggregate`
  * via ObjectHashAggregate), each task keeps only k (score, id) pairs per
  * group and partial-aggregates MAP-SIDE: the shuffle carries O(groups · k)
  * rows, never O(candidates), and no single reducer sees more than the
  * already-reduced partials. "Top-k of a multiset by a strict total order"
  * is merge-order-insensitive, so the result is deterministic regardless of
  * partitioning — ids are unique within a group, making (score, id) a
  * strict total order with the same tie-break the window version used
  * (score, then id asc).
  *
  * Buffer: a sorted array, best first. The hot path (buffer full, candidate
  * no better than the current k-th) is one compare — O(1), no allocation.
  */
object TopK {

  /** `asc = true` ranks smallest score first (distances);
    * `asc = false` ranks largest first (similarities). Ties → lowest id.
    * NaN orders after +Infinity (java.lang.Double.compare), matching
    * Spark's window-sort NaN placement for the asc case.
    */
  final class TopKAgg(k: Int, asc: Boolean)
      extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"top-k size must be >= 1: $k")

    /** Strict "a ranks before b". Zeros are normalized first: the window
      * sort this aggregate replaces (and the DuckDB oracle) treat -0.0 and
      * +0.0 as EQUAL and fall through to the id tie-break — Spark's
      * NormalizeFloatingNumbers rewrites -0.0 to 0.0 in sort keys — while
      * java.lang.Double.compare ranks -0.0 strictly first. */
    private def before(as: Double, ai: Long, bs: Double, bi: Long): Boolean = {
      val an = if (as == 0.0) 0.0 else as
      val bn = if (bs == 0.0) 0.0 else bs
      val c = java.lang.Double.compare(an, bn)
      if (c != 0) { if (asc) c < 0 else c > 0 } else ai < bi
    }

    def zero: Array[(Double, Long)] = Array.empty

    def reduce(buf: Array[(Double, Long)],
               x: (Double, Long)): Array[(Double, Long)] = {
      val len = buf.length
      if (len == k && !before(x._1, x._2, buf(len - 1)._1, buf(len - 1)._2)) buf
      else {
        // position = count of entries ranking before x (k is small: linear)
        var ins = 0
        while (ins < len && before(buf(ins)._1, buf(ins)._2, x._1, x._2)) ins += 1
        val outLen = math.min(k, len + 1)
        val out = new Array[(Double, Long)](outLen)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        val tail = math.min(len - ins, outLen - ins - 1)
        if (tail > 0) System.arraycopy(buf, ins, out, ins + 1, tail)
        out
      }
    }

    def merge(a: Array[(Double, Long)],
              b: Array[(Double, Long)]): Array[(Double, Long)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[(Double, Long)](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length) {
        val takeA = j >= b.length ||
          (i < a.length && before(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
        if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
        n += 1
      }
      out
    }

    def finish(buf: Array[(Double, Long)]): Seq[(Double, Long)] = buf.toSeq
    def bufferEncoder: Encoder[Array[(Double, Long)]] =
      ExpressionEncoder[Array[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The aggregate as a column: array of (score `_1`, id `_2`) structs,
    * best first, length ≤ k. */
  def topK(scoreCol: Column, idCol: Column, k: Int, asc: Boolean): Column =
    udaf(new TopKAgg(k, asc)).apply(scoreCol, idCol)
}
