package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(ids: Seq[Long], pairs: Seq[(Long, Long)]) =
    Dedup.connectedComponentsStar(
      ids.toDF("id"), "id", pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** Reference labeling via plain driver union-find. */
  private def expected(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("long chain (diameter ≫ rounds) converges to the minimum label") {
    val n = 300L
    val ids = (0L until n)
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = labelsOf(ids, chain)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every chain node must label to the minimum")
  }

  test("min-label propagation throws on the same chain when diameter exceeds its rounds") {
    val ids = (0L until 50L).toDF("id")
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(ids, "id", chain, maxIters = 5).collect()
    }
  }

  test("seeded random graphs match driver union-find exactly") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val n = 120
      val ids = (0L until n.toLong)
      val pairs = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(labelsOf(ids, pairs) == expected(ids, pairs))
    }
  }

  test("no edges: every node is its own component") {
    val got = labelsOf(Seq(5L, 7L, 9L), Seq.empty)
    assert(got == Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
  }

  test("isolated nodes keep self labels next to real components") {
    val got = labelsOf(Seq(1L, 2L, 3L, 4L, 5L), Seq((4L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L, 5L -> 5L))
  }

  test("empty edge set converges even with maxIters = 0") {
    val got = Dedup.connectedComponentsStar(
        Seq(5L, 7L).toDF("id"), "id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"), maxIters = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 7L -> 7L))
  }
}
