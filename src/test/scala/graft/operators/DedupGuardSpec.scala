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
}
