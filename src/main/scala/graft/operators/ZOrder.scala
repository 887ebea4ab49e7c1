package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Z-order (Morton) multi-column clustering value — the layout behind
  * OPTIMIZE ZORDER BY: interleave the bits of each column's normalized
  * rank so that files written in z-value order are simultaneously local in
  * EVERY clustered dimension. A 1-D range sort (`clusterBy`) gives the
  * first column perfect file-level min/max pruning and the second column
  * none; z-order gives every dimension ~1/2^(bits/k) selectivity per file.
  *
  * Normalization: linear min/max bucketing into 2^bitsPerCol levels, the
  * bounds taken from ONE aggregation pass over the frame (collected to the
  * driver as plan literals — a handful of doubles). Linear bucketing is
  * rank-faithful for roughly uniform columns; heavily skewed columns
  * cluster worse but never incorrectly (the z-value only shapes the file
  * LAYOUT — query results never depend on it).
  *
  * STRING dimensions rank by a 7-byte UTF-8 window taken AFTER the
  * min/max common prefix: every value between the column's min and max
  * shares their common prefix (the lexicographic-interval property), so
  * skipping it spends the window's 56 bits on the bytes that actually
  * differ — a URL column whose every value starts `http://` clusters by
  * host, not by the constant scheme. Within the window, hex is
  * RIGHT-padded so shorter strings sort before their extensions
  * ("a" < "ab" < "b" — unpadded, "ab"'s longer hex would outrank "b"
  * numerically). UTF-8 byte order equals code-point order, and Spark's
  * string min/max is the same binary order, so the proxy is
  * order-consistent end to end.
  *
  * Scale: the stats pass is one partial aggregation; the z-value itself is
  * a pure codegen projection (k·bits shift/mask terms); the write is the
  * same range-repartition + in-partition sort as `clusterBy`.
  */
object ZOrder {

  /** Max total bits (fits comfortably in a positive signed 64-bit). */
  private val MaxBits = 60

  /** Common prefix length of two strings in UTF-8 BYTES. */
  private def commonPrefixBytes(a: String, b: String): Int = {
    val xa = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val xb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < xa.length && i < xb.length && xa(i) == xb(i)) i += 1
    i
  }

  /** JVM twin of the string rank expression: the 7-byte window after
    * `skip` bytes as an unsigned big-endian integer (zero-padded), used
    * to turn the collected min/max STRINGS into double bounds that are
    * bit-identical to what the column expression computes per row. */
  private def windowValue(s: String, skip: Int): Double = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .drop(skip).take(7).padTo(7, 0.toByte)
    b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)).toDouble
  }

  /** The per-row rank expression for a string dimension: hex of the
    * UTF-8 bytes, windowed past the `skip`-byte common prefix
    * (2 hex chars per byte), right-padded to 7 bytes. */
  private def stringRank(c: String, skip: Int): Column =
    conv(rpad(substring(hex(encode(col(c), "UTF-8")), 2 * skip + 1, 14),
      14, "0"), 16, 10).cast(DoubleType)

  /** The z-value column for `cols` of `df` (numeric, or string — see the
    * class doc). Collects per-column min/max from one aggregation. */
  def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 10): Column = {
    require(cols.size >= 2, s"z-order needs >= 2 columns: $cols")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= MaxBits,
      s"bitsPerCol * cols must fit $MaxBits bits: $bitsPerCol x ${cols.size}")
    // any other type would cast to all-NULL and silently contribute a
    // constant dimension (no locality, no error) — reject it eagerly
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == StringType,
        s"z-order column '$c' must be numeric or string, got ${dt.simpleString}")
    }
    def isStr(c: String) = df.schema(c).dataType == StringType
    // one pass: numeric bounds as doubles, string bounds as the RAW
    // min/max strings (the common prefix is computed driver-side)
    val aggs = cols.flatMap { c =>
      if (isStr(c)) Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
      else Seq(min(col(c).cast(DoubleType)).as(s"__min_$c"),
        max(col(c).cast(DoubleType)).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val levels = (1L << bitsPerCol) - 1L
    def bucket(expr: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else {
        val scaled = (expr - lit(lo)) * lit(levels.toDouble / (hi - lo))
        // clamp: floating scaling can graze levels+1 at the max edge;
        // nulls bucket to 0 (they cluster together at the low corner)
        coalesce(least(greatest(floor(scaled).cast(LongType), lit(0L)),
          lit(levels)), lit(0L))
      }
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // an all-NULL column (or empty frame) aggregates NULL bounds — that
      // dimension contributes a constant 0, like a zero-range column
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else if (isStr(c)) {
        val loS = row.getString(2 * i); val hiS = row.getString(2 * i + 1)
        val skip = commonPrefixBytes(loS, hiS)
        bucket(stringRank(c, skip), windowValue(loS, skip), windowValue(hiS, skip))
      } else
        bucket(col(c).cast(DoubleType), row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    // interleave: output bit (b*k + j) = bit b of column j's bucket
    val k = cols.size
    (0 until bitsPerCol).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, j) =>
        shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * k + j)
      }
    }.reduce(_ + _)
  }
}
