package graft.sources

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Session extensions for the graft catalog — registered by setting
  * `spark.sql.extensions=graft.sources.GraftExtensions` (the Verify /
  * Bench / test sessions all do).
  *
  * Today's single rule refuses explicit assignments to GENERATED
  * ALWAYS AS columns in UPDATE / MERGE statements against graft
  * tables. The engine RECOMPUTES generated columns on every row-level
  * write (a SET on a base column must never leave the derived value
  * stale), which means a user's `SET gen_col = x` would otherwise
  * succeed while silently having no effect — the statement must refuse
  * at analysis instead (the Delta contract for generated columns). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => RefuseGeneratedAssignments)
}

/** Analysis-time refusal of generated-column assignments, in two
  * layers because the analyzer's row-level REWRITE can dissolve a
  * command in the same fixed-point iteration that resolves it:
  *
  *  1. pre-rewrite — UpdateTable / MergeIntoTable assignment lists,
  *     checked per-assignment as soon as both sides resolve;
  *  2. post-rewrite — ReplaceData / WriteDelta, whose MergeRows node
  *     still carries every action's full output row: the expression at
  *     a generated column's position IS the assignment's value (the
  *     connector itself never sees it — by write time the list is gone).
  *
  * What still PASSES, deliberately:
  *  - carried values and self-assignments (`SET gen = t.gen`) — Spark's
  *    own assignment ALIGNMENT emits one for every untouched column;
  *  - a bare same-name column (`t.gen = s.gen`) — exactly what
  *    `UPDATE SET *` / `INSERT *` expand to, and star expansion is
  *    indistinguishable from a user writing the expansion by hand
  *    (the value is recomputed either way);
  *  - null literals — the alignment's filler for omitted INSERT columns;
  *  - IDENTITY columns — a row-op SET there is the user overriding the
  *    assignment, the same contract as BY DEFAULT explicit inserts. */
object RefuseGeneratedAssignments extends Rule[LogicalPlan] {

  /** Generated (non-identity) column names of a graft target, lowercase;
    * empty for every other relation. */
  private def generatedCols(plan: LogicalPlan): Set[String] = plan match {
    case r: DataSourceV2Relation =>
      org.apache.spark.sql.graft.RowLevelBridge.underlying(r.table) match {
        case t: GraftBatchTable => t.generatedColumnNames
        case _ => Set.empty
      }
    case s: SubqueryAlias => generatedCols(s.child)
    case _ => Set.empty
  }

  private def nameOf(key: Expression): Option[String] = key match {
    case a: AttributeReference => Some(a.name.toLowerCase)
    case _ => None // struct-field assignment — never a generated column
  }

  /** Strip the alignment's cast and alias wraps. */
  private def uncast(e: Expression): Expression = e match {
    case c: Cast => uncast(c.child)
    case a: org.apache.spark.sql.catalyst.expressions.Alias => uncast(a.child)
    case other => other
  }

  /** A value the expansion machinery writes on its own: a bare column
    * of the SAME name (carry, self-assign, star expansion) or a null
    * literal (alignment's filler for a column the INSERT omitted). */
  private def mechanicalValue(col: String, v: Expression): Boolean =
    uncast(v) match {
      case a: AttributeReference => a.name.toLowerCase == col
      case Literal(null, _) => true
      case _ => false
    }

  private def refuse(stmt: String, colName: String): Nothing =
    throw new IllegalArgumentException(
      s"cannot $stmt GENERATED ALWAYS AS column '$colName' — its " +
        "value is always recomputed from the generation expression; " +
        "update the base columns instead")

  /** Layer 1: the unrewritten command's own assignment list. */
  private def check(target: LogicalPlan, assignments: Seq[Assignment],
                    stmt: String): Unit = {
    val gen = generatedCols(target)
    if (gen.nonEmpty) assignments.foreach { a =>
      // fire per-assignment as soon as BOTH sides resolve — the rewrite
      // can dissolve the statement in the same analyzer pass, so
      // waiting for the whole command to be `resolved` misses it
      if (a.key.resolved && a.value.resolved)
        nameOf(a.key).filter(gen).foreach { colName =>
          if (!mechanicalValue(colName, a.value)) refuse(stmt, colName)
        }
    }
  }

  /** Layer 2: the rewritten plan. Every MergeRows instruction output is
    * a full row in `mergeRows.output` order; the expression standing at
    * a generated column's position is that action's assigned value. */
  private def checkRewritten(target: LogicalPlan, query: LogicalPlan): Unit = {
    val gen = generatedCols(target)
    if (gen.isEmpty) return
    query.foreach {
      case mr: MergeRows =>
        val positions = mr.output.zipWithIndex
          .filter { case (a, _) => gen.contains(a.name.toLowerCase) }
        mr.outputs.foreach { row =>
          positions.foreach { case (attr, i) =>
            if (i < row.length && !mechanicalValue(attr.name.toLowerCase, row(i)))
              refuse("MERGE-assign a", attr.name.toLowerCase)
          }
        }
      case _ => ()
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case u: UpdateTable =>
        check(u.table, u.assignments, "UPDATE SET a")
      case m: MergeIntoTable =>
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).foreach {
          case ua: UpdateAction =>
            check(m.targetTable, ua.assignments, "MERGE UPDATE SET a")
          case ia: InsertAction =>
            check(m.targetTable, ia.assignments, "MERGE INSERT into a")
          case _ => ()
        }
      case rd: ReplaceData => checkRewritten(rd.originalTable, rd.query)
      case wd: WriteDelta => checkRewritten(wd.originalTable, wd.query)
      case _ => ()
    }
    plan
  }
}
