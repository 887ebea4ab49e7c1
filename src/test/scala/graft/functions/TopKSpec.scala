package graft.functions

import graft.SparkSpec
import graft.operators.VectorSimilarity

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int, asc: Boolean) = new TopK.TopKAgg(k, asc)

  test("reduce keeps the k best, sorted best-first, ties to lowest id") {
    val a = agg(3, asc = false)
    val buf = Seq((0.5, 10L), (0.9, 7L), (0.9, 3L), (0.1, 1L), (0.7, 2L))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) === Seq((0.9, 3L), (0.9, 7L), (0.7, 2L)))
  }

  test("ascending mode ranks smallest distance first") {
    val a = agg(2, asc = true)
    val buf = Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (1.0, 0L))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) === Seq((1.0, 0L), (1.0, 2L)))
  }

  test("merge equals reducing the concatenation, regardless of split") {
    val a = agg(4, asc = false)
    val xs = (0 until 40).map(i => ((i * 37 % 23).toDouble, i.toLong))
    val whole = xs.foldLeft(a.zero)(a.reduce)
    for (cut <- Seq(0, 1, 13, 39, 40)) {
      val (l, r) = xs.splitAt(cut)
      val m = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
      assert(a.finish(m) === a.finish(whole), s"cut=$cut")
    }
  }

  test("-0.0 and +0.0 tie (window/oracle semantics): id breaks the tie") {
    val a = agg(2, asc = false)
    // id 5 arrives first with -0.0; id 3 with +0.0 must rank BEFORE it
    val buf = Seq((-0.0, 5L), (0.0, 3L), (-1.0, 9L)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).map(_._2) === Seq(3L, 5L))
    val d = agg(2, asc = true)
    val bufD = Seq((0.0, 7L), (-0.0, 8L), (1.0, 1L)).foldLeft(d.zero)(d.reduce)
    assert(d.finish(bufD).map(_._2) === Seq(7L, 8L))
  }

  test("buffer shorter than k when fewer candidates") {
    val a = agg(5, asc = true)
    val buf = Seq((2.0, 1L), (1.0, 2L)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) === Seq((1.0, 2L), (2.0, 1L)))
  }

  test("bruteForceTopK plan uses the bounded aggregate, not a per-query window") {
    val corpus = (0L until 30L).map(i => (i, Seq((i % 7).toFloat, 1.0f)))
      .toDF("id", "v")
    val queries = Seq((100L, Seq(1.0f, 0.5f))).toDF("id", "v")
    val df = VectorSimilarity.bruteForceTopK(corpus, queries, "id", "v", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"top-k must not route all candidates through a per-query window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the typed bounded-heap aggregate in the plan:\n$plan")
    // partial (map-side) aggregation present → shuffle carries O(q·k) rows
    assert(plan.contains("partial_topkagg") || plan.contains("partial"),
      s"expected a partial aggregation phase:\n$plan")
    // and the ranking itself still matches the window semantics
    val rows = df.select("rank", "neighbor_id")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 3 && rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
  }
}
