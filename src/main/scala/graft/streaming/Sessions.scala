package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators for the event stream: session windows,
  * watermarked tumbling aggregation, and a custom-state sessionizer.
  * Extension scope beyond the reference (batch-only by design,
  * /root/reference/README.md:3); these are the streaming shapes a
  * training-data ingest pipeline needs, written so the SAME code runs on a
  * batch DataFrame (spark.read) and a stream (spark.readStream) — Spark's
  * unified Dataset API.
  *
  * Scale notes: session_window + watermark is fully distributed state —
  * keys shard across executors, and the watermark bounds state size (late
  * events beyond the threshold drop instead of accumulating). The
  * mapGroupsWithState variant shows arbitrary per-key state for semantics
  * session_window can't express (e.g. value-dependent gaps).
  */
object Sessions {

  /** Per-user session aggregation with a fixed inactivity gap, using the
    * native session_window operator. Works on batch and streaming inputs;
    * on streams, set a watermark first (see [[withEventTimeWatermark]]).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count("*").as("n_events"), min("ts").as("first_ts"), max("ts").as("last_ts"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("first_ts"), col("last_ts"))

  /** Watermarked tumbling-window counts per event type — the canonical
    * streaming aggregation (late data beyond `lateness` is dropped, state
    * is evicted as the watermark advances).
    */
  def windowedCounts(events: DataFrame, window: String = "10 minutes",
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(count("*").as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  def withEventTimeWatermark(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts", lateness)

  /** Event-time interval join — the stream-stream join shape (attribution:
    * each left event matches right events of the same key whose timestamp
    * falls in (leftTs, leftTs + within]). The SAME code runs batch and
    * streaming; on streams, watermark BOTH inputs first — the time bound
    * plus the watermarks is what lets Spark evict join state, so state
    * stays O(events inside the interval window) per key instead of
    * unbounded. Output columns: key, left ts as `l_ts`, right ts as
    * `r_ts`, plus the given payload columns.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String, within: String,
                   leftPayload: Seq[String] = Nil,
                   rightPayload: Seq[String] = Nil): DataFrame = {
    val l = left.select((col(keyCol) +: col(tsCol).as("l_ts") +:
      leftPayload.map(col)): _*)
    val r = right.select((col(keyCol).as("__rk") +: col(tsCol).as("r_ts") +:
      rightPayload.map(col)): _*)
    l.join(r,
        col(keyCol) === col("__rk") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .drop("__rk")
  }

  // ---- custom-state sessionizer -----------------------------------------

  case class SessionEvent(user_id: Long, event_id: Long, us: Long)
  case class SessionState(startUs: Long, endUs: Long, n: Long)
  case class SessionUpdate(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  /** Arbitrary-stateful sessionization via mapGroupsWithState: one state
    * object per user, updated per micro-batch; emits the user's CURRENT
    * open session each trigger (Update mode). Demonstrates the custom
    * per-key-state shape; prefer [[sessionAgg]] when the built-in
    * semantics fit.
    */
  def statefulSessions(events: Dataset[SessionEvent], gapUs: Long)
                      (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.us, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, Long.MinValue, 0L))
          sorted.foreach { e =>
            // >= matches session_window semantics: an event exactly one gap
            // after the previous one starts a NEW session (a session window
            // is the half-open [start, last+gap)), keeping this operator and
            // sessionAgg/the SQL sessionizer split-compatible.
            st =
              if (st.n == 0L || e.us - st.endUs >= gapUs) SessionState(e.us, e.us, 1L)
              else SessionState(st.startUs, e.us, st.n + 1L)
          }
          state.update(st)
          SessionUpdate(userId, st.startUs, st.endUs, st.n)
      }
  }
}
