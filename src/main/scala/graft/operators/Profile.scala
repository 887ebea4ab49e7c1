package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, LongType, StringType}

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
  * Nulls hash to the sentinel value P — above every genuine portable hash
  * (hmod < P), so it can never collide with real data (a column literally
  * containing "__null__" stays distinct) — and the estimate is computed
  * over the sentinel-stripped buffer: exact whenever the genuine hashes
  * fit the sketch, estimator otherwise, deterministic in both engines.
  *
  * Floating-point columns are rejected: min/max and the ndv hash render
  * through cast-to-string, and double formatting differs across engines
  * (Spark "1.0E7" vs DuckDB "10000000.0"). Profile a fixed-point
  * projection (e.g. cents, or PortableHash.e9) instead.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregation; returns one row per column:
    * (column, n, nulls, min_s, max_s, ndv_est), ordered by column name.
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val floating = cols.filter(c => df.schema(c).dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    })
    require(floating.isEmpty,
      s"profile of floating-point column(s) ${floating.mkString(", ")}: string rendering " +
        "is engine-specific; profile a fixed-point projection instead")
    val P = PortableHash.P
    val aggs = cols.flatMap { c =>
      val h = when(col(c).isNull, lit(P))
        .otherwise(PortableHash.hmod(col(c).cast(StringType)))
      Seq(
        count(col(c)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        min(col(c)).cast(StringType).as(s"__min_$c"),
        max(col(c)).cast(StringType).as(s"__max_$c"),
        KmvSketch.kmv(h, k).as(s"__buf_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      // strip the null sentinel before estimating: P is the global maximum,
      // so it sits in the buffer iff the genuine hashes didn't fill it —
      // in which case the stripped buffer is the exact genuine set
      val ndv = KmvSketch.estimate(s"filter(__buf_$c, x -> x < ${P}L)", k)
      struct(
        lit(c).as("column"),
        col(s"__n_$c").cast(LongType).as("n"),
        col(s"__nulls_$c").cast(LongType).as("nulls"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"),
        ndv.as("ndv_est"))
    }
    one.select(explode(array(perCol: _*)).as("__p"))
      .select("__p.column", "__p.n", "__p.nulls", "__p.min_s", "__p.max_s", "__p.ndv_est")
      .orderBy("column")
  }
}
