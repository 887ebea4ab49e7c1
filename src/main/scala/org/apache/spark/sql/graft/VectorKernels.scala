package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector arithmetic kernels — the arithmetic twins of the
  * higher-order-function folds every similarity operator was built on:
  *
  *   dot:  aggregate(zip_with(a, b, (x, y) → double(x)·double(y)), 0.0, +)
  *   l2:   aggregate(zip_with(a, b, (x, y) → (x−y)²), 0.0, +)
  *   dotL: aggregate(zip_with(a, b, (x, y) → x·y), 0L, +)
  *
  * Why they exist (optimization guide §1.2 "per-task work" / §4 "prefer
  * codegen-friendly expressions"): Spark evaluates higher-order-function
  * lambdas INTERPRETED — per element of every vector, the zip_with lambda
  * allocates and boxes through the expression tree, and the intermediate
  * product array is materialized per row just to be folded and thrown
  * away. For 64-dim embeddings scored queries × corpus, that interpreted
  * per-element churn dominated the whole knn/semantic-dedup family. Each
  * kernel is one allocation-free while-loop over the two ArrayData inputs
  * — a straight static call in generated code, and the same tight loop on
  * the interpreted path (inside HOF lambdas, e.g. the centroid-similarity
  * transform).
  *
  * Bit-identical by construction: the loop accumulates left-to-right in
  * the same type the fold did (double / long; float inputs widen per
  * element exactly as the lambda's cast did — float→double is exact), so
  * every partial sum is the identical IEEE value. Null/shape semantics
  * reproduce the fold too: zip_with pads a length mismatch with nulls and
  * a null poisons the running sum, so mismatched lengths or any null
  * element → null result; empty arrays → the fold's init (0.0 / 0L).
  * Pinned HOF-vs-native by VectorKernelsSpec.
  */
object VectorKernels {

  /** Σ double(a_i)·double(b_i); null on length mismatch or null element. */
  def dotD(a: ArrayData, b: ArrayData,
           aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Σ (double(a_i) − double(b_i))²; null semantics as [[dotD]]. */
  def l2D(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ (double(a_(off+i)) − double(b_i))² over i < |b| — the fused form of
    * l2(slice(a, off+1, |b|), b) that skips the per-row slice allocation
    * (PQ encode/ADC evaluate it per subspace per centroid: 128 slices per
    * row at m=8, ksub=16). Shape/null semantics match slice+zip_with: |b|=0
    * → 0.0; a too short for the window (zip_with would null-pad) → null;
    * null element in the window → null. */
  def l2DOff(a: ArrayData, off: Int, b: ArrayData,
             aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = b.numElements()
    if (n == 0) return 0.0
    if (a.numElements() < off + n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(off + i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(off + i).toDouble else a.getDouble(off + i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ a_i·b_i over long arrays; null semantics as [[dotD]]. */
  def dotL(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def dotDCol(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDotD(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2DCol(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayL2D(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dotLCol(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayDotL(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** l2 of a[off..off+|b|) vs b — 0-based `off`; the fused
    * slice-then-l2 (see [[l2DOff]]). */
  def l2DOffCol(a: Column, off: Int, b: Column): Column =
    ExpressionUtils.column(ArrayL2DOff(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), off))
}

/** Shared shape of the two double kernels: float/double element accessors
  * resolved once per (analyzed) expression, nullable result (length
  * mismatch / null element → null, matching the zip_with fold). */
abstract class ArrayFoldD extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // lazy: children may be unresolved lambda variables at construction time
  // (these kernels compose inside higher-order-function lambdas)
  protected lazy val aFloat: Boolean = elemIsFloat(left.dataType)
  protected lazy val bFloat: Boolean = elemIsFloat(right.dataType)
  private def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double> inputs, got $other")
  }
  protected def kernel: String // static method name on VectorKernels
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("fold")
      s"""
         |java.lang.Double $r = org.apache.spark.sql.graft.VectorKernels.$kernel(
         |  $a, $b, $aFloat, $bFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

case class ArrayDotD(left: Expression, right: Expression) extends ArrayFoldD {
  override protected def kernel: String = "dotD"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotD =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

case class ArrayL2D(left: Expression, right: Expression) extends ArrayFoldD {
  override protected def kernel: String = "l2D"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2D(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayL2D =
    copy(left = l, right = r)
  override def prettyName: String = "graft_l2"
}

case class ArrayL2DOff(left: Expression, right: Expression, offset: Int)
  extends ArrayFoldD {
  override protected def kernel: String = "l2D" // unused: codegen overridden
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2DOff(a.asInstanceOf[ArrayData], offset,
      b.asInstanceOf[ArrayData], aFloat, bFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("fold")
      s"""
         |java.lang.Double $r = org.apache.spark.sql.graft.VectorKernels.l2DOff(
         |  $a, $offset, $b, $aFloat, $bFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayL2DOff =
    copy(left = l, right = r)
  override def prettyName: String = "graft_l2off"
}

case class ArrayDotL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("fold")
      s"""
         |java.lang.Long $r = org.apache.spark.sql.graft.VectorKernels.dotL($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDotL =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dotl"
}
