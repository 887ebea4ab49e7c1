package graft.operators

import graft.SparkSpec

/** The shuffle-free IVF assignment: centroids embed as literals in one
  * codegen projection — no Exchange, no Window — and the probed /
  * with-similarity variants agree with the single-probe argmin.
  */
class IvfAssignSpec extends SparkSpec {
  import spark.implicits._

  private def cents = VectorSimilarity.centroidFrame(spark,
    Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0)))

  private def corpus = Seq(
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.1f, 0.9f)),
    (3L, Seq(-0.9f, 0.1f)),
    (4L, Seq(0.7f, 0.7f))   // equidistant from centroids 0 and 1 → tie
  ).toDF("vec_id", "v")

  test("assigns each vector to the nearest centroid; ties to lowest cid") {
    val got = VectorSimilarity.ivfAssign(corpus, "vec_id", "v",
        cents, "cid", "cv")
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("assignment plan is a pure projection: no Exchange, no Window, no Join") {
    val plan = VectorSimilarity.ivfAssign(corpus, "vec_id", "v",
      cents, "cid", "cv").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"nearest-centroid assignment must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Window"), s"no per-vector window expected:\n$plan")
    assert(!plan.contains("Join"), s"no centroid join expected:\n$plan")
  }

  test("multi-probe explodes the nprobe nearest clusters in cosine-desc order") {
    val got = VectorSimilarity.ivfAssign(corpus, "vec_id", "v",
        cents, "cid", "cv", probes = 2)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // probe list is ordered (cosine desc, cid asc); tie at 45° → (0, 1)
    assert(got(1L) === Seq(0L, 1L))
    assert(got(4L) === Seq(0L, 1L))
    assert(got(3L).head === 2L)
    // first probe always equals the single-probe assignment
    val single = VectorSimilarity.ivfAssign(corpus, "vec_id", "v",
        cents, "cid", "cv")
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    got.foreach { case (id, probes) => assert(probes.head === single(id)) }
  }

  test("multi-probe plan is also exchange-free") {
    val plan = VectorSimilarity.ivfAssign(corpus, "vec_id", "v",
      cents, "cid", "cv", probes = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probed assignment shuffled:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("recallAudit counts exact-set recovery in integer ppm") {
    import spark.implicits._
    // exact top-3 per query; approx recovers 2 of 3 for q1, 3 of 3 for q2
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 22L))
      .toDF("query_id", "rank", "neighbor_id")
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 99L),
      (2L, 1L, 22L), (2L, 2L, 20L), (2L, 3L, 21L))
      .toDF("query_id", "rank", "neighbor_id")
    val row = VectorSimilarity.recallAudit(Seq(("m", approx, exact)))
      .as[(String, Long, Long, Long, Long)].head()
    assert(row === (("m", 2L, 6L, 5L, 833333L)))
  }

  test("ivfAssignWithSim emits the cosine to the ASSIGNED centroid, shuffle-free") {
    val rows = VectorSimilarity.ivfAssignWithSim(corpus, "vec_id", "v",
        cents, "cid", "cv")
      .select("vec_id", "cluster_id", "centroid_cosine")
      .as[(Long, Long, Double)].collect()
    val centMap = Map(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(-1.0, 0.0))
    val vecs = Map(1L -> Seq(0.9, 0.1), 2L -> Seq(0.1, 0.9),
      3L -> Seq(-0.9, 0.1), 4L -> Seq(0.7, 0.7))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { case (id, cid, ccos) =>
      // float→double read of the test vectors: compare with tolerance
      assert(math.abs(ccos - cos(vecs(id), centMap(cid))) < 1e-6,
        s"id=$id cid=$cid ccos=$ccos")
    }
    val plan = VectorSimilarity.ivfAssignWithSim(corpus, "vec_id", "v",
      cents, "cid", "cv").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
