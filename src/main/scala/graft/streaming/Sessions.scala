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

  /** Ingest-time exact dedup with BOUNDED state — the streaming face of
    * [[graft.operators.Dedup.exact]]: duplicates of a key arriving within
    * the watermark delay are dropped, and the key's state evicts once the
    * event-time watermark passes (`dropDuplicatesWithinWatermark`), so
    * state holds one entry per DISTINCT key seen in the lateness window
    * instead of every key ever ingested. The trade is explicit: a
    * duplicate arriving LATER than `lateness` after the original is
    * re-emitted — size the watermark to the source's real redelivery
    * horizon. Batch-replayed, this degenerates to a plain dropDuplicates
    * (global exact dedup), which is what the oracle checks.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     tsCol: String, lateness: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keyCols)
    else // Spark rejects the watermarked variant on batch plans outright
      events.dropDuplicates(keyCols)

  // ---- custom-state sessionizer -----------------------------------------

  case class SessionEvent(user_id: Long, event_id: Long, us: Long)
  // package-private, not `private`: the Dataset encoder's generated code
  // needs JVM-level access to the class (Scala private compiles to a
  // private member; private[streaming] stays public in bytecode)
  private[streaming] case class SessionEventTs(user_id: Long, event_id: Long,
                                               us: Long, ts: java.sql.Timestamp)
  case class SessionState(startUs: Long, endUs: Long, n: Long)
  case class SessionUpdate(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long)

  /** Arbitrary-stateful sessionization via mapGroupsWithState: one state
    * object per user, updated per micro-batch; emits the user's CURRENT
    * open session each trigger (Update mode). Demonstrates the custom
    * per-key-state shape; prefer [[sessionAgg]] when the built-in
    * semantics fit.
    *
    * State EVICTS: each update arms `GroupStateTimeout.EventTimeTimeout`
    * at session end + gap, so once the event-time watermark (event time −
    * `lateness`) passes that point the key's closed session is emitted one
    * final time and its state is REMOVED. Without this, every user ever
    * seen holds state for the lifetime of the stream — the unbounded-state
    * leak that kills long-running deployments. Batch replays never time
    * out (no watermark), matching the reference's batch semantics.
    */
  def statefulSessions(events: Dataset[SessionEvent], gapUs: Long,
                       lateness: String = "1 hour")
                      (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    // EventTimeTimeout needs an event-time watermark in the query: derive
    // the timestamp column from the event micros and watermark it here so
    // callers keep the plain SessionEvent contract
    val withTs = events.toDF()
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", lateness)
      .as[SessionEventTs]
    withTs.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEventTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session end + gap with no new events: emit
            // the closed session once more and evict the key's state
            val st = state.get
            state.remove()
            SessionUpdate(userId, st.startUs, st.endUs, st.n)
          } else {
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
            // arm eviction at session close. A late event can arrive with
            // end + gap already behind the watermark — clamp forward (the
            // session closes at the next trigger instead of throwing).
            // Batch execution has no watermark: getCurrentWatermarkMs is
            // unsupported there and timeouts never fire, so skip arming.
            scala.util.Try(state.getCurrentWatermarkMs()).toOption.foreach { wm =>
              state.setTimeoutTimestamp(math.max(st.endUs / 1000L + gapUs / 1000L, wm + 1L))
            }
            SessionUpdate(userId, st.startUs, st.endUs, st.n)
          }
      }
  }
}
