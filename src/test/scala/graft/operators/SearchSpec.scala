package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "rare word here"),          // matches "rare" (df 1)
    (2L, "common common common x"),  // matches "common" (df 3), tf 3
    (3L, "common y z"),
    (4L, "common rare q"),           // both terms
    (5L, "nothing relevant at all")
  ).toDF("id", "text")

  private def bm25(tf: Long, df: Long, dl: Long, n: Long, sumdl: Long,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val avgdl = sumdl.toDouble / n.toDouble
    idf * (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
  }

  test("scores match the hand-computed BM25-shaped formula exactly") {
    val got = Search.keywordTopK(corpus, "id", "text", Seq("rare", "common"), k = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val (n, sumdl) = (5L, 3L + 4L + 3L + 3L + 4L)
    assert(got(1L) === bm25(tf = 1, df = 2, dl = 3, n = n, sumdl = sumdl))
    assert(got(2L) === bm25(tf = 3, df = 3, dl = 4, n = n, sumdl = sumdl))
    assert(got(4L) ===
      bm25(tf = 1, df = 2, dl = 3, n = n, sumdl = sumdl) +
        bm25(tf = 1, df = 3, dl = 3, n = n, sumdl = sumdl))
    assert(!got.contains(5L)) // score 0 rows are excluded
  }

  test("a rare term outranks a common one; the double-match doc wins overall") {
    val got = Search.keywordTopK(corpus, "id", "text", Seq("rare", "common"), k = 10)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.head._1 === 4L)            // rare + common
    val rankOf = got.map(r => r._1 -> r._2).toMap
    assert(rankOf(1L) < rankOf(3L))       // rare-only beats common-only (same dl)
  }

  test("k truncates and ranks are contiguous from 1") {
    val got = Search.keywordTopK(corpus, "id", "text", Seq("common"), k = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq === Seq(1L, 2L))
    assert(got.length === 2)
  }

  test("NULL text scores as an empty doc and leaves other scores intact") {
    val withNull = corpus.union(
      Seq((6L, null.asInstanceOf[String])).toDF("id", "text"))
    val got = Search.keywordTopK(withNull, "id", "text", Seq("rare", "common"), k = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(!got.contains(6L)) // empty doc: score 0, excluded
    // corpus stats now include the empty doc (n=6, sumdl unchanged)
    val (n, sumdl) = (6L, 17L)
    assert(got(1L) === bm25(tf = 1, df = 2, dl = 3, n = n, sumdl = sumdl))
  }

  test("tied scores break by id ascending") {
    val tied = Seq((10L, "alpha beta"), (7L, "alpha beta"), (9L, "alpha beta"))
      .toDF("id", "text")
    val got = Search.keywordTopK(tied, "id", "text", Seq("alpha"), k = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq === Seq(7L, 9L, 10L))
  }
}
