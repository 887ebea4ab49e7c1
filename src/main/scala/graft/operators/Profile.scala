package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.functions.{KmvSketch, PortableHash}

/** One-pass table profiling — the ANALYZE-equivalent a pipeline runs to
  * size joins, pick broadcast sides, and sanity-check ingests. For each
  * requested column: non-null count, null count, min/max (string-rendered),
  * and a KMV distinct-count estimate.
  *
  * Scale design: ONE aggregation job over the table for all columns
  * together (map-side partial aggregation; the KMV buffer is O(k) per
  * column, so executor memory is columns × k longs). No per-column passes,
  * no driver state beyond the final one-row collect. The distinct estimate
  * is the deterministic KMV sketch ([[KmvSketch]]) — reproducible across
  * engines, unlike HLL.
  *
  * Nulls hash as a reserved marker inside the sketch and are subtracted
  * from the estimate when present — deterministic (the oracle reproduces
  * the same multiset → same buffer → same estimate).
  */
object Profile {

  val NullMarker = "__null__"

  /** Profile `cols` of `df` in one aggregation; returns one row per column:
    * (column, n, nulls, min_s, max_s, ndv_est), ordered by column name.
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      val h = PortableHash.hmod(coalesce(col(c).cast(StringType), lit(NullMarker)))
      Seq(
        count(col(c)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"),
        KmvSketch.kmv(h, k).as(s"__buf_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").cast(LongType).as("n"),
        col(s"__nulls_$c").cast(LongType).as("nulls"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"),
        (KmvSketch.estimate(s"__buf_$c", k) -
          when(col(s"__nulls_$c") > 0, 1L).otherwise(0L)).cast(LongType).as("ndv_est"))
    }
    one.select(explode(array(perCol: _*)).as("__p"))
      .select("__p.column", "__p.n", "__p.nulls", "__p.min_s", "__p.max_s", "__p.ndv_est")
      .orderBy("column")
  }
}
