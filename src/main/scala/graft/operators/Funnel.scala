package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Funnel analysis over an event stream: how far each user progresses
  * through an ordered sequence of step types (subsequence semantics — each
  * step must occur strictly after the previously matched one, other events
  * freely interleaved). The ClickHouse-`windowFunnel`-shaped operator a
  * product-analytics workload runs; extension scope beyond the reference.
  *
  * Scale: one shuffle on the user key into a per-user sorted event-type
  * array (bounded by that user's event count), then the subsequence walk is
  * a fixed chain of `array_position`/`slice` expressions — no joins, no
  * windows over shared keys, no driver state. A time-bounded variant
  * composes by pre-filtering the event frame to the window of interest.
  */
object Funnel {

  /** Per-user funnel depth: (userCol, depth) where depth ∈ [0, steps.size]
    * counts how many leading steps the user's (tsCol, tieCol)-ordered event
    * sequence matches as a subsequence. `tieCol` must make the ordering
    * total (e.g. a unique event id) — determinism of ties is on the caller.
    */
  /** Per-user (tsCol, tieCol)-ordered type + epoch-us arrays. */
  private def sortedArrays(df: DataFrame, userCol: String, tsCol: String,
                           tieCol: String, typeCol: String): DataFrame =
    df.groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol))))
        .as("__evs"))
      .select(col(userCol),
        transform(col("__evs"), e => e.getField(typeCol)).as("__tps"),
        // tolerant of integer epoch columns, like AsOfJoin: cast first so
        // funnelDepth (which never reads __tss) keeps its wider input domain
        transform(col("__evs"),
          e => graft.functions.TimeCols.usec(e.getField(tsCol)))
          .as("__tss"))

  /** idx_k = 1-based position of the k-th matched step in `__tps`, 0 when
    * the chain broke; each step searches only the suffix after the
    * previous match. */
  private def stepIdxs(steps: Seq[String]): Seq[Column] =
    steps.zipWithIndex.foldLeft(List.empty[Column]) {
      case (acc, (s, k)) =>
        val idx =
          if (k == 0) array_position(col("__tps"), s)
          else {
            val prev = acc.head
            val rel = array_position(
              slice(col("__tps"), (prev + 1).cast("int"), size(col("__tps"))), s)
            when(prev > 0 && rel > 0, prev + rel).otherwise(lit(0L))
          }
        idx :: acc
    }.reverse

  def funnelDepth(df: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val depth = stepIdxs(steps).map(i => when(i > 0, 1L).otherwise(0L)).reduce(_ + _)
    sortedArrays(df, userCol, tsCol, tieCol, typeCol)
      .select(col(userCol), depth.cast(LongType).as("depth"))
  }

  /** Anchored time-windowed funnel: like [[funnelDepth]], but a step only
    * counts while it lands within `spanSeconds` of the FIRST matched step
    * (the anchor). This is the "convert within N days" question; event
    * times are monotone along the sequence, so once the window closes the
    * chain is over — depth is still a prefix count. (windowFunnel-style
    * re-anchoring to the best window is deliberately not implemented: the
    * anchored form is one expression chain; re-anchoring is quadratic.)
    */
  def funnelDepthWithin(df: DataFrame, userCol: String, tsCol: String,
                        tieCol: String, typeCol: String, steps: Seq[String],
                        spanSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(spanSeconds >= 0, s"spanSeconds must be >= 0: $spanSeconds")
    val idxs = stepIdxs(steps)
    val anchor = idxs.head
    val spanUs = spanSeconds * 1000000L
    val depth = idxs.zipWithIndex.map { case (i, k) =>
      if (k == 0) when(i > 0, 1L).otherwise(0L)
      else {
        // the element_at lookups live INSIDE the when-branch: ANSI mode
        // throws on index 0, and i > 0 implies the anchor matched too
        val delta = element_at(col("__tss"), i.cast("int")) -
          element_at(col("__tss"), anchor.cast("int"))
        when(i > 0, when(delta <= spanUs, 1L).otherwise(0L)).otherwise(0L)
      }
    }.reduce(_ + _)
    sortedArrays(df, userCol, tsCol, tieCol, typeCol)
      .select(col(userCol), depth.cast(LongType).as("depth"))
  }

  /** Weekly retention cohorts: users grouped by their first active week
    * (the cohort), counted in every week they return — the classic
    * retention triangle. A "week" is integer epoch-microseconds div 7
    * days: pure integer arithmetic with no calendar/timezone/WEEKSTART
    * semantics to diverge between engines (Monday-aligned calendar weeks
    * would hang cross-engine equality on each engine's WEEK rules).
    * Returns (cohort_week, week_offset, n_users), offset 0 = the cohort's
    * own week. Scale: one distinct over (user, week) — partial-aggregating
    * — a per-user min, a join back, and one count aggregation.
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // FLOOR division (not DIV's truncate-toward-zero): pre-1970 timestamps
    // would otherwise merge the two epoch-adjacent weeks. The double detour
    // is exact: epoch-us magnitudes sit far below 2^53, and an integer
    // quotient boundary is never within 1 ulp of a non-multiple (the
    // remainder is >= 1 whole microsecond). Column-based (no SQL-string
    // splicing), so unusual column names resolve like everywhere else.
    val us = graft.functions.TimeCols.usec(col(tsCol))
    val uw = df.select(col(userCol).as("__u"),
        floor(us / lit(weekUs.toDouble)).cast(LongType).as("__w"))
      .distinct()
    val cohort = uw.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    uw.join(cohort, Seq("__u"))
      .groupBy(col("__cw").as("cohort_week"),
        (col("__w") - col("__cw")).as("week_offset"))
      .agg(count(lit(1)).cast(LongType).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * one row per (prev_type, event_type) with the transition count and the
    * conditional probability P(next | prev) in integer ppm — the "what do
    * users do after X" matrix behind next-action analytics and anomaly
    * flags. Each user's events order by (ts, tieCol) — the same explicit
    * total order the funnel operators use — and only within-user
    * consecutive pairs count (no cross-user phantom transitions).
    *
    * Scale: one shuffle on the user key for the lag window (per-user
    * streams are small), then a partial-aggregating count on the
    * (prev, next) pair domain — bounded by #types², broadcast-sized.
    * Integer ppm (count · 10⁶ DIV row-total) keeps the matrix
    * bit-portable; no double division.
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(totals, Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        expr("CAST(n * 1000000 DIV __tot AS BIGINT)").as("p_ppm"))
  }

  /** The funnel summary: users reaching at least each depth (the classic
    * conversion table). One row per step d ∈ [1, steps.size] ALWAYS —
    * a step nobody reaches reports n_users = 0 rather than vanishing
    * (the suffix-sum frame left-joins onto the full step range). */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, typeCol: String,
                   steps: Seq[String]): DataFrame = {
    val d = funnelDepth(df, userCol, tsCol, tieCol, typeCol, steps)
    val byDepth = d.groupBy(col("depth")).agg(count(lit(1)).as("__n"))
    // suffix-sum over at most steps.size+1 rows — a broadcastable frame
    val steps_ = steps.indices.map(i => i + 1)
    val reached = byDepth.select(col("depth"), col("__n"),
      explode(array(steps_.map(lit): _*)).as("at_least"))
      .where(col("depth") >= col("at_least"))
      .groupBy(col("at_least")).agg(sum(col("__n")).as("__users"))
    val allSteps = d.sparkSession.range(1, steps.size + 1L).toDF("at_least")
    allSteps.join(reached, Seq("at_least"), "left")
      .select(col("at_least").cast(LongType).as("step"),
        coalesce(col("__users"), lit(0L)).cast(LongType).as("n_users"))
  }
}
