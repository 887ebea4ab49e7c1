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
}
