package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("user", "eid", "tp")
      .selectExpr("user", "timestamp_micros(eid * 1000000) AS ts", "eid", "tp")

  private def depths(df: org.apache.spark.sql.DataFrame) =
    Funnel.funnelDepth(df, "user", "ts", "eid", "tp", steps)
      .as[(Long, Long)].collect().toMap

  test("subsequence matching with interleaved noise") {
    val d = depths(ev(
      (1L, 1L, "view"), (1L, 2L, "error"), (1L, 3L, "click"), (1L, 4L, "buy"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "click"), (3L, 2L, "buy"),       // no view: depth 0
      (4L, 1L, "error")))
    assert(d === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 0L))
  }

  test("steps must occur strictly after the previous match") {
    // click BEFORE the first view must not count toward depth
    val d = depths(ev(
      (1L, 1L, "click"), (1L, 2L, "view"), (1L, 3L, "buy"),
      (2L, 1L, "buy"), (2L, 2L, "click"), (2L, 3L, "view")))
    assert(d === Map(1L -> 1L, 2L -> 1L))
  }

  test("repeated step types match the earliest eligible occurrence") {
    val d = depths(ev(
      (1L, 1L, "view"), (1L, 2L, "view"), (1L, 3L, "click"),
      (1L, 4L, "click"), (1L, 5L, "buy")))
    assert(d === Map(1L -> 3L))
  }

  test("windowed funnel: steps beyond the anchored span stop counting") {
    // eid doubles as seconds; span 10s
    val df = ev(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 8L, "buy"),    // all inside
      (2L, 0L, "view"), (2L, 5L, "click"), (2L, 30L, "buy"),   // buy outside
      (3L, 0L, "view"), (3L, 20L, "click"), (3L, 25L, "buy"))  // click outside
    val d = Funnel.funnelDepthWithin(df, "user", "ts", "eid", "tp", steps,
        spanSeconds = 10L)
      .as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("windowed funnel anchors at the FIRST step-1 match (no re-anchoring)") {
    // second view at t=100 would open a valid window, but the anchor is t=0
    val df = ev(
      (1L, 0L, "view"), (1L, 100L, "view"), (1L, 101L, "click"), (1L, 102L, "buy"))
    val d = Funnel.funnelDepthWithin(df, "user", "ts", "eid", "tp", steps,
        spanSeconds = 10L)
      .as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 1L))
  }

  test("retentionCohorts: cohort = first week, offsets count return weeks") {
    val week = 7L * 86400L
    // user 1 active weeks 0,1,3; user 2 weeks 1,2; user 3 week 0 only
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), (1L, 1L), // duplicate week collapses
      (2L, 1L), (2L, 2L), (3L, 0L))
    val df = rows.toDF("user", "wk")
      .selectExpr("user", "timestamp_seconds(wk * " + week + " + 60) AS ts")
    val got = Funnel.retentionCohorts(df, "user", "ts")
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => ((c, o), n) }.toMap
    // weeks here are absolute epoch weeks starting at 0 (1970-01-01)
    assert(got === Map(
      (0L, 0L) -> 2L, // users 1 and 3 in their cohort week
      (0L, 1L) -> 1L, (0L, 3L) -> 1L, // user 1 returns
      (1L, 0L) -> 1L, (1L, 1L) -> 1L)) // user 2
  }

  test("funnelCounts is the suffix-sum conversion table") {
    val df = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "buy"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "view"),
      (4L, 1L, "error"))
    val got = Funnel.funnelCounts(df, "user", "ts", "eid", "tp", steps)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("funnelCounts keeps zero-conversion steps (n_users = 0)") {
    // nobody buys: step 3 must still appear with 0, not vanish
    val df = ev(
      (1L, 1L, "view"), (1L, 2L, "click"),
      (2L, 1L, "view"))
    val got = Funnel.funnelCounts(df, "user", "ts", "eid", "tp", steps)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }
}
