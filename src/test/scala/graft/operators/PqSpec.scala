package graft.operators

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // m = 2 subspaces of 2 dims, ksub = 2 centroids each
  private val cb: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),
    Seq(Seq(0.0, 0.0), Seq(2.0, 2.0)))

  test("pqEncode assigns each subspace to its nearest sub-centroid") {
    val df = Seq(
      (1L, Seq(0.1f, 0.0f, 1.9f, 2.0f)), // sub1 -> c0, sub2 -> c1
      (2L, Seq(0.9f, 1.1f, 0.1f, 0.0f)), // sub1 -> c1, sub2 -> c0
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))  // both -> c0
    ).toDF("id", "v")
    val got = VectorSimilarity.pqEncode(df, "v", cb)
      .select("id", "v_code").as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) === Seq(0L, 1L))
    assert(got(2L) === Seq(1L, 0L))
    assert(got(3L) === Seq(0L, 0L))
  }

  test("equidistant subvectors tie to the lowest centroid id") {
    val df = Seq((1L, Seq(0.5f, 0.5f, 1.0f, 1.0f))).toDF("id", "v")
    val got = VectorSimilarity.pqEncode(df, "v", cb)
      .select("v_code").as[Seq[Long]].head()
    assert(got === Seq(0L, 0L))
  }

  test("ADC distance is exact when corpus vectors sit on centroids") {
    val corpus = Seq(
      (10L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
      (12L, Seq(1.0f, 1.0f, 2.0f, 2.0f))
    ).toDF("id", "v")
    val queries = Seq((1L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val got = VectorSimilarity.pqTopK(corpus, queries, "id", "v", cb, k = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    // exact squared L2 from the origin query: 0, 2, 10
    assert(got.map(r => (r._3, r._4)).toSeq ===
      Seq((10L, 0.0), (11L, 2.0), (12L, 10.0)))
  }

  test("ivfPqTopK with a single cluster reduces to the plain ADC scan") {
    val corpus = (0 until 20).map { i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 5 + j) % 7).toFloat))
    }.toDF("id", "v")
    val queries = corpus.where($"id" < 3)
    val oneCluster = Seq((0L, Seq(1.0, 1.0, 1.0, 1.0))).toDF("cid", "cv")
    val ivfpq = VectorSimilarity.ivfPqTopK(corpus, queries, "id", "v",
        oneCluster, "cid", "cv", cb, k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val pq = VectorSimilarity.pqTopK(corpus, queries, "id", "v", cb, k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(ivfpq.toSeq === pq.toSeq)
  }

  test("ivfPqTopK only scores candidates in probed clusters") {
    // two well-separated clusters; query sits in cluster A with nprobe = 1,
    // so the cluster-B vector never appears even though k allows it
    val corpus = Seq(
      (10L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.9f, 1.1f, 0.0f, 0.0f)),
      (20L, Seq(-1.0f, -1.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val queries = Seq((1L, Seq(1.0f, 0.9f, 0.0f, 0.0f))).toDF("id", "v")
    val cents = Seq(
      (0L, Seq(1.0, 1.0, 0.0, 0.0)), (1L, Seq(-1.0, -1.0, 0.0, 0.0))
    ).toDF("cid", "cv")
    val got = VectorSimilarity.ivfPqTopK(corpus, queries, "id", "v",
        cents, "cid", "cv", cb, k = 3, nprobe = 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._3).toSet === Set(10L, 11L))
  }

  test("multi-probe LSH recall is at least plain LSH recall vs brute force") {
    val e = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val q = e.where($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(VectorSimilarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3))
    val plain = pairs(VectorSimilarity.lshTopK(e, q, "vec_id", "embedding",
      k = 3, numPlanes = 6, dim = 64))
    val multi = pairs(VectorSimilarity.lshTopKMultiProbe(e, q, "vec_id", "embedding",
      k = 3, numPlanes = 6, dim = 64))
    assert((multi intersect truth).size >= (plain intersect truth).size,
      s"multiprobe recall ${(multi intersect truth).size} < plain ${(plain intersect truth).size}")
    // a query's plain-bucket candidates are a subset of its probed candidates,
    // so every plain result at full rank depth survives probing
    assert((multi intersect plain).nonEmpty)
  }

  test("trainPqCodebooks is deterministic and shapes correctly") {
    val vecs = (0 until 64).map { i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat / 11f))
    }.toDF("id", "v")
    val a = VectorSimilarity.trainPqCodebooks(vecs, "v", m = 2, ksub = 4)
    val b = VectorSimilarity.trainPqCodebooks(vecs, "v", m = 2, ksub = 4)
    assert(a === b, "seeded training must reproduce")
    assert(a.length === 2 && a.forall(_.length === 4) &&
      a.forall(_.forall(_.length === 2)))
  }

  test("int8TopK ranks by de-quantized integer dot products, hand-pinned") {
    import org.apache.spark.sql.functions._
    // scale 127 vectors: quantization is lossless on integer components
    val vecs = Seq(
      (0L, Seq(127.0f, 0.0f)),   // query
      (1L, Seq(127.0f, 0.0f)),   // identical -> top (dot 127*127)
      (2L, Seq(0.0f, 127.0f)),   // orthogonal -> dot 0
      (3L, Seq(64.0f, 64.0f))    // diagonal -> middle
    ).toDF("vec_id", "embedding")
    val qz = VectorSimilarity.quantizeInt8(vecs, "embedding")
      .select("vec_id", "embedding_q", "embedding_scale")
    val got = VectorSimilarity.int8TopK(qz, qz.where(col("vec_id") === 0L),
        "vec_id", "embedding_q", "embedding_scale", k = 3)
      .select("rank", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L))
    // scale = 127 for every vector, so score = int_dot * (127*127/16129) = int_dot
    assert(math.abs(got(0)._3 - 127.0 * 127.0) < 1e-9)
    assert(math.abs(got(2)._3) < 1e-12)
  }
}
