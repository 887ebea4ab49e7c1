package graft.operators

import graft.SparkSpec

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def cents = VectorSimilarity.centroidFrame(spark,
    Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))

  test("semDeDupPairs only pairs vectors inside the same cluster") {
    // 1,2 near centroid 0 and near-identical; 3 near centroid 1 but ALSO
    // cosine ~1 with nothing — and 4 parallel to 3 in cluster 1
    val df = Seq(
      (1L, Seq(1.0f, 0.01f)),
      (2L, Seq(2.0f, 0.02f)),  // same direction as 1 → same cluster, cos 1
      (3L, Seq(0.01f, 1.0f)),
      (4L, Seq(0.02f, 2.0f))   // same direction as 3
    ).toDF("vec_id", "v")
    val pairs = VectorSimilarity.semDeDupPairs(df, "vec_id", "v",
        cents, "cid", "cv", threshold = 0.99)
      .select("id_a", "id_b", "cluster_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 0L), (3L, 4L, 1L)))
  }

  test("cross-cluster near-dups are not candidates (cluster-scoped recall)") {
    // two vectors on the 45° diagonal, one assigned to each cluster by the
    // tiny perturbation: cosine ~1 but different clusters → no pair
    val df = Seq(
      (1L, Seq(1.0f, 0.999f)),
      (2L, Seq(0.999f, 1.0f))
    ).toDF("vec_id", "v")
    val pairs = VectorSimilarity.semDeDupPairs(df, "vec_id", "v",
      cents, "cid", "cv", threshold = 0.99)
    assert(pairs.count() === 0)
  }

  test("semDeDup keeps the group member least similar to its centroid") {
    // cluster 0: ids 1,2,3 mutually near-dup (same direction, cos = 1);
    // centroid cosine identical → tie-break keeps min id 1.
    // cluster 0: id 5 is a singleton (30° off, not within 0.99 of 1/2/3)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(0.5f, 0.0f)),
      (5L, Seq(1.0f, 0.5f))
    ).toDF("vec_id", "v")
    val kept = VectorSimilarity.semDeDup(df, "vec_id", "v",
        cents, "cid", "cv", threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 5L))
  }

  test("semDeDup keep rule prefers the least prototypical member, not min id") {
    // 6 is closer to the centroid than 7; both near-dup of each other
    // (cos(6,7) > 0.99) → keep 7 (LOWER centroid cosine), drop 6
    val df = Seq(
      (6L, Seq(1.0f, 0.001f)),
      (7L, Seq(1.0f, 0.06f))
    ).toDF("vec_id", "v")
    val kept = VectorSimilarity.semDeDup(df, "vec_id", "v",
        cents, "cid", "cv", threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(7L))
  }

  test("semDeDupPairs plan: equi-joins only, centroids broadcast") {
    val df = (0L until 50L).map(i => (i, Seq((i % 5).toFloat, 1.0f)))
      .toDF("vec_id", "v")
    val plan = VectorSimilarity.semDeDupPairs(df, "vec_id", "v",
      cents, "cid", "cv", threshold = 0.99).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "cluster-scoped pair search must never cartesian the corpus")
    // the corpus-sized joins (pair self-join on cluster_id, vector
    // join-backs on id) must be equi joins; nested-loop joins appear only
    // as the tiny BROADCAST centroid scoring (every BNLJ instance in the
    // printed tree is the persisted assignment subtree re-inlined)
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight") ||
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-broadcast nested-loop join in the plan:\n$plan")
  }

  test("hot clusters collapse to star edges around the min-id member") {
    val rows = (0L until 20L).map(i => (i, Seq(1.0f, (i * 1e-4).toFloat)))
    val df = rows.toDF("vec_id", "v")
    val pairs = VectorSimilarity.semDeDupPairs(df, "vec_id", "v",
        cents, "cid", "cv", threshold = 0.99, maxCluster = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // star: every pair touches the minimum id 0
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, _) => a == 0L })
    assert(pairs === (1L until 20L).map(b => (0L, b)).toSet)
  }
}
