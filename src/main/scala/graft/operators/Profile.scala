package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Floating-point columns are profiled on their e9 FIXED-POINT projection
  * (floor(x·1e9) as BIGINT, [[PortableHash.e9]]): min/max/ndv render and
  * hash through cast-to-string, and double formatting differs across
  * engines (Spark "1.0E7" vs DuckDB "10000000.0") where a long renders
  * identically. The projection is monotone and injective to 1e-9, so
  * min/max order and (to that resolution) distinct counts carry over;
  * min_s/max_s for such columns read as nano-units of the original value.
  */
object Profile {

  /** Float/double/decimal columns switch to the e9 domain. */
  private def isFloating(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }

  /** Profile `cols` of `df` in one aggregation; returns one row per column:
    * (column, n, nulls, min_s, max_s, ndv_est), ordered by column name.
    * Floating-point columns are profiled on their e9 projection (see
    * class doc); all other columns on their native values.
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val P = PortableHash.P
    val aggs = cols.flatMap { c =>
      val v: Column =
        if (isFloating(df, c)) PortableHash.e9(col(c).cast(DoubleType)) else col(c)
      val h = when(v.isNull, lit(P))
        .otherwise(PortableHash.hmod(v.cast(StringType)))
      Seq(
        count(v).as(s"__n_$c"),
        (count(lit(1)) - count(v)).as(s"__nulls_$c"),
        min(v).cast(StringType).as(s"__min_$c"),
        max(v).cast(StringType).as(s"__max_$c"),
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

  /** EXACT discrete quantiles of numeric columns on the e9 fixed-point
    * domain: for each column and each q, the smallest value v with
    * |{x ≤ v}| ≥ ⌈q·n⌉ — computed over ALL rows (multiplicity counts),
    * nulls excluded, deterministically in integer arithmetic end-to-end
    * (the threshold is (q_ppm·n + 999999) div 10⁶, never a libm ceil).
    * e9 is monotone, so these ARE the e9 images of the raw-value
    * quantiles. Returns (column, q_ppm, value_e9), one row per
    * (column, q); a column with no non-null values contributes no rows.
    *
    * Scale design — the textbook single-partition cumulative window is
    * exactly what this avoids: quantiles need a GLOBAL running count over
    * the value order, and `sum() OVER (ORDER BY v)` with no partition key
    * buffers the whole value domain (≈ row count for a double column at
    * 100 TB) on one task. Instead, the classic distributed prefix sum:
    *   1. one hash aggregation to the (column, v, count) table
    *      (partial map-side — the shuffle carries distinct values only);
    *   2. range-repartition by (column, v) — Spark's sampled range
    *      exchange, the same machinery as any global orderBy;
    *   3. per-partition cumsums via a window keyed on the PARTITION ID
    *      (bounded by maxRecordsPerBatch within one range split);
    *   4. per-partition totals (one tiny aggregation, ≤ numPartitions
    *      rows per column) cumsum'd into offsets and broadcast back.
    * The partition-id keyed frame is persisted so steps 3 and 4 read the
    * SAME physical partitioning (range-exchange split points are sampled;
    * recomputation could legally resample), then released after the
    * result materializes. No step holds more than one range split or the
    * offsets table in memory.
    */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty, "quantiles of zero columns")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          PortableHash.e9(col(c).cast(DoubleType)).as("v"))): _*)).as("__p"))
      .select(col("__p.column").as("__key"), col("__p.v").as("v"))
      .where(col("v").isNotNull)
    quantilesByKey(pairs, qs)
      .withColumnRenamed("__key", "column")
      .orderBy("column", "q_ppm")
  }

  /** Exact PER-GROUP discrete quantiles of one numeric column on the e9
    * domain — the per-domain / per-language threshold table of a CCNet
    * bucket-and-sample step. Same definition, machinery, and scale shape
    * as [[quantiles]], keyed by the group instead of the column name.
    * Returns (groupCol (string-rendered), q_ppm, value_e9). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    val pairs = df.select(col(groupCol).cast("string").as("__key"),
        PortableHash.e9(col(valueCol).cast(DoubleType)).as("v"))
      .where(col("__key").isNotNull && col("v").isNotNull)
    quantilesByKey(pairs, qs)
      .withColumnRenamed("__key", groupCol)
      .orderBy(groupCol, "q_ppm")
  }

  /** Shared core over (__key, v) pairs — see [[quantiles]] for the
    * distributed-prefix-sum design discussion. */
  private def quantilesByKey(pairs: DataFrame, qs: Seq[Double]): DataFrame = {
    val (result, caches) = quantilesByKeyRaw(pairs, qs)
    Dedup.materializeAndRelease(result, caches: _*)
  }

  /** [[quantilesByKey]] with the intermediates exposed: returns
    * (quantile result, persisted (__key, v, c, pid) value census, caches to
    * release once the caller's result is materialized). [[outlierSummary]]
    * computes its fence-violation counts from the SAME census instead of a
    * second corpus scan — exact multiplicities, so the counts are identical
    * to a re-scan (guide §1.2: never recompute what a prior pass already
    * aggregated).
    *
    * The base aggregation is persisted BEFORE the range repartition:
    * Spark's range exchange runs a sampling pass over its child first, so
    * an unpersisted census executed the whole corpus scan + aggregation
    * twice (once to pick split points, once to shuffle).
    */
  private def quantilesByKeyRaw(pairs: DataFrame,
                                qs: Seq[Double]): (DataFrame, Seq[DataFrame]) = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1]: $qs")
    val qPpms = qs.map(q => math.round(q * 1e6))
    require(qPpms.distinct.size == qPpms.size, s"duplicate quantiles at ppm resolution: $qs")
    val counts = pairs.groupBy("__key", "v").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (Right-sizing the range exchange DOWN to census volume was measured
    // 3× SLOWER here — a single split serializes the cumsum window's sort;
    // the ambient split count keeps the window parallel and is already
    // proportional to cores. Left at the session default.)
    val parted = counts.repartitionByRange(col("__key"), col("v"))
      .withColumn("pid", spark_partition_id().cast(LongType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = parted.withColumn("lcum",
      sum(col("c")).over(Window.partitionBy("pid", "__key").orderBy("v")))
    val offsets = parted.groupBy("__key", "pid").agg(sum(col("c")).as("pc"))
      .withColumn("off", coalesce(
        sum(col("pc")).over(Window.partitionBy("__key").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__key"), col("pid"), col("off"))
    // derive per-key totals from the PERSISTED frame — an unpersisted
    // `counts` would re-run the whole base aggregation a second time
    val ns = parted.groupBy("__key").agg(sum(col("c")).as("n"))
    val thresholds = ns.select(col("__key"), col("n"),
        explode(array(qPpms.map(lit): _*)).as("q_ppm"))
      .select(col("__key"), col("q_ppm"),
        expr("CAST((q_ppm * n + 999999) DIV 1000000 AS BIGINT)").as("t"))
    val result = local.join(broadcast(offsets), Seq("__key", "pid"))
      .withColumn("cum", col("lcum") + col("off"))
      .join(broadcast(thresholds), Seq("__key"))
      .where(col("cum") >= col("t"))
      .groupBy(col("__key"), col("q_ppm"))
      .agg(min(col("v")).as("value_e9"))
    (result, Seq(parted, counts))
  }

  /** The DuckDB spelling of [[quantiles]] for one column `c` of table
    * `src`: a complete SELECT yielding ("column", q_ppm, value_e9) — the
    * caller UNION ALLs one per column. The cumulative window the Spark
    * side refuses at scale is fine in the single-node oracle — both
    * compute the same integer-threshold definition.
    */
  def quantilesSql(src: String, c: String, qs: Seq[Double]): String = {
    quantilesSqlImpl(src, c, qs)
  }

  /** Tukey-fence outlier summary per numeric column: the 1.5×IQR rule in
    * exact integer arithmetic on the e9 domain — lo = q1 − (3·IQR) DIV 2,
    * hi = q3 + (3·IQR) DIV 2, with [[quantiles]]' exact discrete q1/q3
    * (never an approximate sketch: a fence moved by sketch error flags
    * different rows on different runs, and an audit gate must not).
    * Returns one row per column: (column, n, lo_e9, hi_e9, n_below,
    * n_above) — the post-load audit that catches fat-finger uploads and
    * unit-mismatch batches (cents vs dollars shifts min/max 100×) without
    * materializing per-row flags.
    *
    * Scale: ONE corpus scan total — the quantile pass's distributed
    * prefix-sum census (see [[quantiles]]) is persisted as a (column,
    * value, multiplicity) table, and the fence-violation counts aggregate
    * that census (Σ c per side of each fence — exact multiplicities, so
    * the counts are identical to a row-level re-scan) with the O(columns)
    * fence frame broadcast. Nothing driver-side.
    */
  def outlierSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "outlier summary of zero columns")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          PortableHash.e9(col(c).cast(DoubleType)).as("v"))): _*)).as("__p"))
      .select(col("__p.column").as("__key"), col("__p.v").as("v"))
      .where(col("v").isNotNull)
    val (qres, caches) = quantilesByKeyRaw(pairs, Seq(0.25, 0.75))
    val fences = qres
      .groupBy(col("__key"))
      .agg(
        max(when(col("q_ppm") === 250000L, col("value_e9"))).as("__q1"),
        max(when(col("q_ppm") === 750000L, col("value_e9"))).as("__q3"))
      .select(col("__key"),
        expr("CAST(__q1 - (3 * (__q3 - __q1)) DIV 2 AS BIGINT)").as("lo_e9"),
        expr("CAST(__q3 + (3 * (__q3 - __q1)) DIV 2 AS BIGINT)").as("hi_e9"))
    // count fence violations from the persisted census (caches.head is the
    // range-parted (__key, v, c) table): sum multiplicities per side
    val result = caches.head.join(broadcast(fences), Seq("__key"))
      .groupBy(col("__key").as("column"))
      .agg(sum(col("c")).cast("long").as("n"),
        first(col("lo_e9")).as("lo_e9"), first(col("hi_e9")).as("hi_e9"),
        sum(when(col("v") < col("lo_e9"), col("c")).otherwise(0L))
          .cast("long").as("n_below"),
        sum(when(col("v") > col("hi_e9"), col("c")).otherwise(0L))
          .cast("long").as("n_above"))
      .orderBy("column")
    Dedup.materializeAndRelease(result, caches: _*)
  }

  /** DuckDB twin of [[outlierSummary]] for one column of `src`. */
  def outlierSummarySql(src: String, c: String): String = {
    val q = quantilesSqlImpl(src, c, Seq(0.25, 0.75))
    s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n,
       |  any_value(f.lo_e9) AS lo_e9, any_value(f.hi_e9) AS hi_e9,
       |  CAST(sum(CASE WHEN v.v < f.lo_e9 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       |  CAST(sum(CASE WHEN v.v > f.hi_e9 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
       |FROM (SELECT ${PortableHash.e9Sql(s"CAST($c AS DOUBLE)")} AS v
       |      FROM $src WHERE $c IS NOT NULL) v
       |CROSS JOIN (
       |  SELECT CAST(q1 - (3 * (q3 - q1)) // 2 AS BIGINT) AS lo_e9,
       |         CAST(q3 + (3 * (q3 - q1)) // 2 AS BIGINT) AS hi_e9
       |  FROM (SELECT max(CASE WHEN q_ppm = 250000 THEN value_e9 END) AS q1,
       |               max(CASE WHEN q_ppm = 750000 THEN value_e9 END) AS q3
       |        FROM ($q))) f
       |GROUP BY 1""".stripMargin
  }

  private def quantilesSqlImpl(src: String, c: String, qs: Seq[Double]): String = {
    val qPpms = qs.map(q => math.round(q * 1e6))
    s"""SELECT '$c' AS "column", CAST(q_ppm AS BIGINT) AS q_ppm,
       |  (SELECT min(v) FROM
       |    (SELECT v, sum(cn) OVER (ORDER BY v) AS cum FROM
       |      (SELECT ${PortableHash.e9Sql(s"CAST($c AS DOUBLE)")} AS v, count(*) AS cn
       |       FROM $src WHERE $c IS NOT NULL GROUP BY 1))
       |   WHERE cum >= (q_ppm * nn.n + 999999) // 1000000) AS value_e9
       |FROM (SELECT unnest([${qPpms.mkString(", ")}]) AS q_ppm)
       |CROSS JOIN (SELECT CAST(count($c) AS BIGINT) AS n FROM $src) nn
       |WHERE nn.n > 0""".stripMargin
  }
}
