package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "hello"), (2L, "world"), (3L, "spark"), (4L, "ab")
  ).toDF("lid", "ls")

  test("editDistanceJoin finds deletion, insertion, and substitution typos at d = 1") {
    val right = Seq(
      (10L, "hell"),   // deletion of 'o'
      (11L, "worlds"), // insertion of 's'
      (12L, "spork"),  // substitution a->o
      (13L, "xyzzy")   // no match
    ).toDF("rid", "rs")
    val got = FuzzyJoin.editDistanceJoin(left, "lid", "ls", right, "rid", "rs", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 10L, 1L), (2L, 11L, 1L), (3L, 12L, 1L)))
  }

  test("exact-equal strings match at dist 0; d = 2 reaches two-edit pairs") {
    val right = Seq((20L, "hello"), (21L, "wld")).toDF("rid", "rs")
    val d1 = FuzzyJoin.editDistanceJoin(left, "lid", "ls", right, "rid", "rs", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(d1 === Set((1L, 20L, 0L)))
    val d2 = FuzzyJoin.editDistanceJoin(left, "lid", "ls", right, "rid", "rs", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(d2 === Set((1L, 20L, 0L), (2L, 21L, 2L))) // world -> wld: 2 deletions
  }

  test("strings below minLength never participate (degenerate-variant guard)") {
    val right = Seq((30L, "a"), (31L, "abc")).toDF("rid", "rs")
    // "ab" (len 2 < minLength 3) must not match "a" or "abc" despite dist 1
    val got = FuzzyJoin.editDistanceJoin(left, "lid", "ls", right, "rid", "rs", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.isEmpty)
  }

  test("row multiplicity: duplicate strings on either side multiply matches") {
    val l = Seq((1L, "alpha"), (2L, "alpha")).toDF("lid", "ls")
    val r = Seq((10L, "alpah"), (11L, "alpah")).toDF("rid", "rs")
    val got = FuzzyJoin.editDistanceJoin(l, "lid", "ls", r, "rid", "rs", maxDist = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 4 && got.forall(_._3 == 2L))
  }

  test("bestMatch picks closest, then most frequent, then lexicographic") {
    val bad = Seq((1L, "helo"), (2L, "wrld"), (3L, "zzzzz")).toDF("bid", "bs")
    val vocab = Seq(
      ("helo", 1L),    // exact match at dist 0 beats everything
      ("hello", 99L),
      ("world", 10L),  // dist 1 from wrld (insert o)
      ("wrle", 80L),   // dist 1 from wrld (sub d->e), higher weight wins
      ("wrla", 80L)    // dist 1, same weight: lexicographic -> wrla
    ).toDF("word", "cnt")
    val got = FuzzyJoin.bestMatch(bad, "bid", "bs", vocab, "word", "cnt", maxDist = 1)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "helo", 0L, 1L)), "dist 0 beats higher-weight dist 1")
    assert(got(2L) === ((2L, "wrla", 1L, 80L)),
      "highest weight among dist-1 candidates, lexicographic on weight ties")
    assert(!got.contains(3L), "no candidate within the radius")
  }

  test("deletion-neighborhood blocking is lossless vs brute force at d = 1") {
    val words = Seq("paris", "pairs", "parks", "spark", "sparks", "park",
      "lemon", "melon", "money", "monet").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "s")
    val fast = FuzzyJoin.editDistanceJoin(df, "id", "s",
        df.toDF("id2", "s2"), "id2", "s2", maxDist = 1)
      .where($"id" < $"id2").as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (i, a) <- words.map { case (i, w) => (i.toLong, w) }
      (j, b) <- words.map { case (i, w) => (i.toLong, w) }
      if i < j && lev(a, b) <= 1
    } yield (i, j, lev(a, b).toLong)).toSet
    assert(fast === brute)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
