package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.graft.VectorKernels

/** The native dot/L2 kernels must be bit-identical to the zip_with +
  * aggregate folds they replaced — every similarity value the knn/semantic
  * dedup family emits (and the DuckDB oracle re-computes) rests on this
  * parity, including the fold's null/shape edge semantics.
  */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  // the exact folds the operators used before the native kernels
  private def dotRef(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
  private def l2Ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, v) => acc + v)
  private def dotLRef(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private val rng = new scala.util.Random(7)
  private def vec(n: Int): Seq[Float] = Seq.fill(n)(rng.nextFloat() * 2 - 1)

  test("dot/l2 float kernels match the HOF folds bit-for-bit (incl. edges)") {
    val rows: Seq[(Seq[Float], Seq[Float])] =
      (1 to 200).map(_ => (vec(64), vec(64))) ++ Seq(
        (Seq.empty[Float], Seq.empty[Float]),   // empty → 0.0
        (vec(3), vec(5)),                        // length mismatch → null
        (vec(5), vec(3)),
        (Seq(1.0f, Float.NaN, 3.0f), Seq(2.0f, 4.0f, 6.0f)), // NaN rides through
        (Seq(Float.MaxValue, Float.MaxValue), Seq(Float.MaxValue, Float.MaxValue)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        VectorSimilarity.dot(col("a"), col("b")).as("d"),
        dotRef(col("a"), col("b")).as("dr"),
        VectorSimilarity.l2Dist2(col("a"), col("b")).as("l"),
        l2Ref(col("a"), col("b")).as("lr"))
      .where(not(col("d") <=> col("dr")) || not(col("l") <=> col("lr")))
      .count()
    assert(bad == 0L, "native dot/l2 diverged from the HOF fold")
  }

  test("null elements poison the sum exactly like the fold") {
    val df = Seq(
        (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](2.0, 2.0, 2.0)),
        (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 2.0)),
        (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val bad = df.select(
        VectorSimilarity.dot(col("a"), col("b")).as("d"),
        dotRef(col("a"), col("b")).as("dr"),
        VectorSimilarity.l2Dist2(col("a"), col("b")).as("l"),
        l2Ref(col("a"), col("b")).as("lr"))
      .where(not(col("d") <=> col("dr")) || not(col("l") <=> col("lr")))
      .count()
    assert(bad == 0L, "null-element semantics diverged from the HOF fold")
  }

  test("long dot kernel matches the fold (int8 scoring path)") {
    val rows: Seq[(Seq[Long], Seq[Long])] =
      (1 to 100).map(_ => (Seq.fill(64)((rng.nextInt(255) - 127).toLong),
        Seq.fill(64)((rng.nextInt(255) - 127).toLong))) ++ Seq(
        (Seq.empty[Long], Seq.empty[Long]),
        (Seq(1L, 2L), Seq(3L)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        VectorKernels.dotLCol(col("a"), col("b")).as("d"),
        dotLRef(col("a"), col("b")).as("dr"))
      .where(not(col("d") <=> col("dr"))).count()
    assert(bad == 0L, "native long dot diverged from the HOF fold")
  }

  test("offset l2 kernel matches slice + l2 fold (PQ subspace path)") {
    val dims = 64; val sub = 8
    val rows = (1 to 100).map(_ => (vec(dims), vec(sub).map(_.toDouble)))
    val df = rows.toDF("v", "c")
    (0 until dims / sub).foreach { mi =>
      val bad = df.select(
          VectorKernels.l2DOffCol(col("v"), mi * sub, col("c")).as("d"),
          l2Ref(slice(col("v"), mi * sub + 1, sub), col("c")).as("dr"))
        .where(not(col("d") <=> col("dr"))).count()
      assert(bad == 0L, s"offset l2 diverged from slice+fold at subspace $mi")
    }
    // window past the end of the vector: slice under-fills, fold nulls out
    val short = Seq((vec(5), vec(8).map(_.toDouble))).toDF("v", "c")
    val got = short.select(
        VectorKernels.l2DOffCol(col("v"), 0, col("c")).as("d"),
        l2Ref(slice(col("v"), 1, 8), col("c")).as("dr")).head()
    assert(got.isNullAt(0) && got.isNullAt(1), "short-vector semantics diverged")
  }

  test("kernels inside higher-order-function lambdas (interpreted path)") {
    // the centroid-similarity shape: transform over a nested literal array
    val cents = Seq(vec(16).map(_.toDouble), vec(16).map(_.toDouble))
    val df = (1 to 50).map(_ => Tuple1(vec(16))).toDF("v")
    val bad = df.select(
        transform(typedLit(cents), c => VectorSimilarity.dot(col("v"), c)).as("d"),
        transform(typedLit(cents), c => dotRef(col("v"), c)).as("dr"))
      .where(not(col("d") <=> col("dr"))).count()
    assert(bad == 0L, "interpreted-path kernel diverged from the fold")
  }
}
