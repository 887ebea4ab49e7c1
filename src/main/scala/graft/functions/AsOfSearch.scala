package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The as-of binary search shared by interpreted eval and generated code.
  * `strictUpper` controls the boundary comparison (first key `>` vs `≥`
  * the probe); `takeLower` picks the element below the boundary (the
  * `<=`/`<` directions) instead of at it (`>=`/`>`). −1 = no match.
  */
object AsOfSearch {
  def lookup(keys: Array[Long], v: Long, strictUpper: Boolean, takeLower: Boolean): Int = {
    val n = keys.length
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val above = if (strictUpper) keys(mid) > v else keys(mid) >= v
      if (above) hi = mid else lo = mid + 1
    }
    if (takeLower) { if (lo - 1 >= 0) lo - 1 else -1 }
    else { if (lo < n) lo else -1 }
  }
}

/** Codegen'd sorted-key as-of index lookup — a native catalyst
  * [[UnaryExpression]] replacing the Scala UDF previously used by
  * [[graft.operators.AsOfJoin]]'s broadcast strategy. A UDF leaves
  * whole-stage codegen (per-row boxing + closure dispatch on the fact
  * scan's hottest path); this expression generates a direct static call
  * into [[AsOfSearch.lookup]], with the sorted key array attached as a
  * codegen reference object (shipped once per stage with the task binary,
  * like any broadcast). Null probe ⇒ −1 (no match), never null — matching
  * the UDF it replaces.
  */
case class AsOfIndexLookup(child: Expression, keys: Array[Long],
                           strictUpper: Boolean, takeLower: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "asof_index_lookup"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else AsOfSearch.lookup(keys, v.asInstanceOf[Long], strictUpper, takeLower)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("asofKeys", keys, "long[]")
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         |${c.code}
         |int ${ev.value} = -1;
         |if (!${c.isNull}) {
         |  ${ev.value} = graft.functions.AsOfSearch.lookup(
         |    $keysRef, ${c.value}, $strictUpper, $takeLower);
         |}
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AsOfIndexLookup =
    copy(child = newChild)
}
