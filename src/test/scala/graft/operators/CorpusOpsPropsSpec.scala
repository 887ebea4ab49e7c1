package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Property-style checks over seeded random inputs for the corpus-
  * construction operators: invariants that must hold for ANY input, not
  * just the hand-picked spec examples.
  */
class CorpusOpsPropsSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  for (seed <- Seq(11, 42)) {
    test(s"FastSS blocking is lossless for random strings at d = 1 and d = 2 (seed=$seed)") {
      val rnd = new Random(seed)
      // short strings over a 3-letter alphabet: dense edit-distance space,
      // the adversarial regime for blocking recall
      val words = (0 until 60).map { i =>
        (i.toLong, (0 until (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }.distinct
      val df = words.toDF("id", "s")
      for (d <- Seq(1, 2)) {
        val fast = FuzzyJoin.editDistanceJoin(df, "id", "s",
            df.toDF("id2", "s2"), "id2", "s2", maxDist = d)
          .where($"id" < $"id2").as[(Long, Long, Long)].collect().toSet
        val brute = (for {
          (i, a) <- words; (j, b) <- words
          if i < j && a.length >= 3 && b.length >= 3 && lev(a, b) <= d
        } yield (i, j, lev(a, b).toLong)).toSet
        assert(fast === brute, s"d=$d mismatch")
      }
    }

    test(s"packing invariants hold for random token counts (seed=$seed)") {
      val rnd = new Random(seed)
      val budget = 64L
      val rows = (1L to 300L).map(i => (i, 1L + rnd.nextInt(100))) // some > budget
      val got = Chunking.packSequences(rows.toDF("id", "n"), "id", "n",
          budget, numShards = 5)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(got.length === rows.length, "every doc assigned exactly once")
      assert(got.map(_._1).distinct.length === rows.length)
      val byPack = got.groupBy(r => (r._3, r._4))
      byPack.foreach { case ((sh, p), docs) =>
        assert(docs.map(_._2).sum <= budget || docs.length == 1,
          s"pack ($sh,$p) over budget with ${docs.length} docs")
        // pack positions are 1..n in id order
        assert(docs.sortBy(_._1).map(_._5).toSeq === (1L to docs.length).toSeq)
      }
      // greedy tightness: consecutive packs can't be merged — the first doc
      // of pack p+1 must not fit in pack p's remaining budget
      got.groupBy(_._3).foreach { case (_, shardDocs) =>
        val packs = shardDocs.groupBy(_._4).toSeq.sortBy(_._1)
        packs.sliding(2).foreach {
          case Seq((_, a), (_, b)) =>
            val firstNext = b.minBy(_._1)._2
            assert(a.map(_._2).sum + firstNext > budget,
              "greedy walk left mergeable adjacent packs")
          case _ =>
        }
      }
    }

    test(s"chunk coverage: every token appears, starts stride-aligned (seed=$seed)") {
      val rnd = new Random(seed)
      val docs = (1L to 40L).map { i =>
        (i, (1 to rnd.nextInt(50)).map(k => s"w$k").mkString(" "))
      }
      val (size, stride) = (7, 5)
      val got = Chunking.tokenChunks(docs.toDF("id", "text"), "id", "text", size, stride)
        .as[(Long, Long, Long, String)].collect().groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        val chunks = got(id).sortBy(_._2)
        // reconstruct: chunk c starts at c*stride (0-based)
        val rebuilt = Array.fill[Option[String]](toks.length)(None)
        chunks.foreach { case (_, cid, _, ctext) =>
          val start = (cid * stride).toInt
          ctext.split(" ").filter(_.nonEmpty).zipWithIndex.foreach { case (t, k) =>
            assert(rebuilt(start + k).forall(_ == t), "overlap disagreement")
            rebuilt(start + k) = Some(t)
          }
        }
        assert(rebuilt.flatten.toSeq === toks, s"doc $id coverage")
      }
    }
  }
}
