package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  * Scale: the stats pass is one partial aggregation; the z-value itself is
  * a pure codegen projection (k·bits shift/mask terms); the write is the
  * same range-repartition + in-partition sort as `clusterBy`.
  */
object ZOrder {

  /** Max total bits (fits comfortably in a positive signed 64-bit). */
  private val MaxBits = 60

  /** The z-value column for `cols` of `df` (numeric or castable to
    * double). Collects per-column min/max from one aggregation. */
  def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 10): Column = {
    require(cols.size >= 2, s"z-order needs >= 2 columns: $cols")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= MaxBits,
      s"bitsPerCol * cols must fit $MaxBits bits: $bitsPerCol x ${cols.size}")
    // a non-numeric column would cast to all-NULL and silently contribute
    // a constant dimension (no locality, no error) — reject it eagerly
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column '$c' must be numeric, got ${dt.simpleString}")
    }
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"__min_$c"),
      max(col(c).cast(DoubleType)).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val levels = (1L << bitsPerCol) - 1L
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // an all-NULL column (or empty frame) aggregates NULL bounds — that
      // dimension contributes a constant 0, like a zero-range column
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else {
      val lo = row.getDouble(2 * i); val hi = row.getDouble(2 * i + 1)
      if (hi <= lo) lit(0L)
      else {
        val scaled = (col(c).cast(DoubleType) - lit(lo)) * lit(levels.toDouble / (hi - lo))
        // clamp: floating scaling can graze levels+1 at the max edge;
        // nulls bucket to 0 (they cluster together at the low corner)
        coalesce(least(greatest(floor(scaled).cast(LongType), lit(0L)), lit(levels)),
          lit(0L))
      }
      }
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
