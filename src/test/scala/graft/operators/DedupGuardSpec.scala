package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hot-bucket star-cap guard: behavior on a dup-heavy corpus (the case
  * the guard exists for) and plan shape of the pair pipelines.
  */
class DedupGuardSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** A corpus where ONE page is duplicated `copies` times (plus distinct
    * filler docs) — every band bucket for the hot page holds `copies` rows.
    */
  private def hotCorpus(copies: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val hot = (0 until copies).map(i =>
      (1000L + i, "the same boilerplate page body repeated verbatim across the corpus"))
    val filler = (0 until 20).map(i =>
      (i.toLong, s"distinct filler document number $i with its own words ${i * 7} ${i * 13}"))
    (hot ++ filler).toDF("doc_id", "text")
  }

  test("minHashPairs: capped hot bucket keeps every copy linked to the canonical doc") {
    val pairs = Dedup.minHashPairs(hotCorpus(50), "doc_id", "text",
      n = 3, numPerms = 16, bands = 4, threshold = 0.6, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // star capping: the canonical (min id 1000) links to all 49 other copies,
    // and no quadratic 50*49/2 pair set materializes
    assert(pairs.length == 49)
    assert(pairs.forall { case (a, b) => a == 1000L && b > 1000L })
    assert(pairs.map(_._2).distinct.length == 49)
  }

  test("dropNearDuplicates keeps exactly one copy of the hot page under capping") {
    val kept = Dedup.dropNearDuplicates(hotCorpus(50), "doc_id", "text",
      n = 3, numPerms = 16, bands = 4, threshold = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // minHashPairs' default maxBucket (4096) doesn't trigger here, but the
    // star-capped variant must drop the same rows:
    val pairsCapped = Dedup.minHashPairs(hotCorpus(50), "doc_id", "text",
      n = 3, numPerms = 16, bands = 4, threshold = 0.6, maxBucket = 10)
    val keptCapped = Dedup.connectedComponentsAuto(
        hotCorpus(50).select(col("doc_id")), "doc_id", pairsCapped)
      .where(col("id") === col("comp")).select(col("id"))
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == ((0L until 20L) :+ 1000L))
    assert(keptCapped.toSeq == kept.toSeq)
  }

  test("guarded pairs are always a subset of exact pairs (capping never invents pairs)") {
    val corpus = hotCorpus(30)
    val exact = Dedup.simHashPairs(corpus, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b")
    val capped = Dedup.simHashPairs(corpus, "doc_id", "text", maxDist = 3, maxBucket = 5)
      .select("id_a", "id_b")
    assert(capped.except(exact).count() == 0)
    assert(capped.count() > 0)
  }

  test("pair pipelines plan as equi-joins: no cartesian / nested-loop join") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = (0L until 40L).map(i => (i, s"document $i shares some words ${i % 5}"))
      .toDF("doc_id", "text")
    val plans = Seq(
      Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5),
      Dedup.minHashPairs(corpus, "doc_id", "text", 3, 16, 4, 0.6),
      Dedup.simHashPairs(corpus, "doc_id", "text", 3)
    ).map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct"), "cartesian product in pair pipeline")
      assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join in pair pipeline")
    }
  }

  test("jaccard prefix filter lossless across a threshold sweep (seeded corpus)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(2026)
    val vocab = (0 until 25).map(i => s"w$i")
    val corpus = (0L until 40L).map { i =>
      val len = 6 + rnd.nextInt(8)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sets = corpus.select(col("doc_id"), Dedup.shingleHashes(col("text"), 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (t <- Seq(0.3, 0.45, 0.62, 0.75, 0.9)) {
      val fast = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 2, threshold = t)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = sets(a).intersect(sets(b)).size
        union = sets(a).size + sets(b).size - inter
        if union > 0 && inter.toDouble / union >= t
      } yield (a, b)).toSet
      assert(fast == brute, s"threshold $t: prefix filter diverged " +
        s"(missing=${(brute -- fast).take(3)}, extra=${(fast -- brute).take(3)})")
    }
  }

  test("minHashPairsAgainst plans as equi-joins and matches the self-join subset") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = (0L until 30L).map(i => (i, s"document number $i about topic ${i % 4} words"))
      .toDF("doc_id", "text")
    val fresh = (100L until 110L).map(i =>
      (i, s"document number ${i - 100} about topic ${(i - 100) % 4} words"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashPairsAgainst(fresh, corpus, "doc_id", "text",
      n = 2, numPerms = 16, bands = 4, threshold = 0.8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val got = pairs.select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // each fresh doc duplicates corpus doc (id-100) verbatim
    assert((100L until 110L).forall(i => got.contains((i, i - 100L))))
    assert(got.forall { case (n, c) => n - 100L == c }, s"unexpected pairs: $got")
  }

  test("cosineNearDupPairsAgainst: batch-vs-corpus only, guard caps hot corpus buckets") {
    val spark0 = spark
    import spark0.implicits._
    def vec(seed: Int): Seq[Float] =
      (0 until 8).map(i => (math.sin(seed * 31 + i) * 10).toFloat)
    // corpus: 40 identical copies of one embedding (a mass-dup cluster,
    // ids 0-39, so the cluster's min id is also its bucket's min) plus 10
    // distinct vectors (ids 1000-1009)
    val corpus = ((0 until 40).map(i => (i.toLong, vec(999))) ++
      (0 until 10).map(i => (1000L + i, vec(i)))).toDF("vec_id", "embedding")
    // batch: one probe equal to the hot embedding, one equal to vector
    // vec(3) (corpus id 1003), one matching nothing
    val batch = Seq((5000L, vec(999)), (5001L, vec(3)), (5002L, vec(777)))
      .toDF("vec_id", "embedding")
    val pairs = VectorSimilarity.cosineNearDupPairsAgainst(batch, corpus,
      "vec_id", "embedding", threshold = 0.999, numPlanes = 6, dim = 8,
      maxBucket = 5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot cluster (40 > maxBucket=5) capped to its canonical min id:
    // probe 5000 links ONCE, to id 0 — never 40 edges
    assert(got.count(_._1 == 5000L) === 1)
    assert(got.contains((5000L, 0L)))
    // the distinct match survives; the no-match probe emits nothing;
    // and NO corpus-corpus pair ever appears (new_id is always batch-side)
    assert(got.contains((5001L, 1003L)))
    assert(got.forall(_._1 >= 5000L), s"corpus-corpus pair leaked: $got")
  }

  test("jaccardPairs size-ratio prefilter sits inside the join, not after the aggregate") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = (0L until 10L).map(i => (i, s"doc $i alpha beta gamma ${i % 3}"))
      .toDF("doc_id", "text")
    val plan = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .queryExecution.optimizedPlan.toString
    // the least/greatest size predicate must appear as a join condition /
    // pre-aggregation filter so mismatched pairs never reach the shuffle
    assert(plan.contains("least") && plan.contains("greatest"))
    val aggIdx = plan.indexOf("Aggregate")
    val predIdx = plan.indexOf("least")
    assert(aggIdx >= 0 && predIdx > aggIdx,
      "size-ratio predicate should be below the pair aggregate in the optimized plan")
  }

  test("dedupReport totals: groups, members, dropped, ppm") {
    val spark0 = spark
    import spark0.implicits._
    // 10 ids; pairs link {1,2,3} and {7,8}: 2 groups, 5 members, 3 dropped
    val ids = (1L to 10L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Dedup.dedupReport(ids, "id", pairs).head()
    assert(r.getLong(0) == 10L) // n_total
    assert(r.getLong(1) == 2L)  // n_dup_groups
    assert(r.getLong(2) == 5L)  // n_dup_members
    assert(r.getLong(3) == 3L)  // n_dropped
    assert(r.getLong(4) == 300000L) // drop_ppm
    // no pairs -> all singletons, zero everywhere
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val r0 = Dedup.dedupReport(ids, "id", empty).head()
    assert(r0.getLong(0) == 10L && r0.getLong(3) == 0L && r0.getLong(4) == 0L)
  }
}
