package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int = 5) =
    Graph.pageRankE9(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("the hub of a star graph outranks its spokes") {
    val r = ranksOf(Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "hub" -> "a"))
    assert(r("hub") > r("a") && r("hub") > r("b") && r("hub") > r("c"))
  }

  test("a cycle distributes rank evenly") {
    val r = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(r("a") == r("b") && r("b") == r("c"))
  }

  test("ranks are deterministic across runs") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
    assert(ranksOf(edges) == ranksOf(edges))
  }

  test("total rank never exceeds the injected mass") {
    val r = ranksOf(Seq("a" -> "b", "b" -> "a", "c" -> "a"))
    assert(r.values.sum <= 1000000000L)
  }

  test("trustrank gives zero to nodes unreachable from the seeds") {
    // two disconnected 2-cycles; seeds only in the first
    val edges = Seq("a" -> "b", "b" -> "a", "x" -> "y", "y" -> "x")
      .toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = Graph.trustRankE9(edges, "src", "dst", seeds, "node", iters = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") > 0 && r("b") > 0)
    assert(r("x") == 0 && r("y") == 0)
  }

  test("an empty seed set yields all-zero trust, not a division error") {
    val edges = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val seeds = Seq.empty[String].toDF("node")
    val r = Graph.trustRankE9(edges, "src", "dst", seeds, "node", iters = 2)
      .collect().map(x => x.getLong(1))
    assert(r.forall(_ == 0L))
  }

  test("degree profile counts parallel edges and distinct neighbors apart") {
    val edges = Seq("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "a")
      .toDF("src", "dst")
    val p = Graph.degreeProfile(edges, "src", "dst")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p("a") == ((3L, 2L, 1L, 1L)))   // out: 3 edges to 2 hosts; in: 1 from b
    assert(p("b") == ((1L, 1L, 2L, 1L)))   // out: 1; in: 2 parallel edges from a
    assert(p("c") == ((0L, 0L, 1L, 1L)))
  }
}
