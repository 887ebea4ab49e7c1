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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => RefuseGeneratedAssignments)
    // hint-resolution: the only injection point that still sees the
    // MergeIntoTable COMMAND — the analyzer's Resolution batch can
    // resolve, align, and REWRITE a merge to ReplaceData/WriteDelta
    // within one fixed-point iteration, before any extended resolution
    // rule runs on the resolved form
    ext.injectHintResolutionRule(_ => RouteEqualityMerge)
  }
}

/** Routes a qualifying SQL `MERGE INTO` to the WRITE-WITHOUT-READ
  * equality-upsert path instead of the group-based/delta row-level
  * rewrite (which reads the target to find matches — O(table) per
  * statement, where the equality commit is O(batch)).
  *
  * OPT-IN and conservative: a merge routes ONLY when every one of
  * these holds — anything else falls through to the standard (always
  * correct) rewrite untouched:
  *
  *   - the TARGET's head manifest records table property
  *     `write.merge.mode = equality` (the user's explicit opt-in) and
  *     recorded upsert keys;
  *   - the ON clause is a conjunction of plain `t.k = s.k` equalities
  *     whose column names cover EXACTLY the recorded keys;
  *   - the actions are the upsert shape and nothing else:
  *     `WHEN MATCHED THEN UPDATE SET *` +
  *     `WHEN NOT MATCHED THEN INSERT *`, unconditional, no
  *     NOT MATCHED BY SOURCE clause, no schema evolution;
  *   - the table declares no GENERATED/IDENTITY columns (their
  *     per-statement machinery lives in the row-level writers).
  *
  * The rewrite replaces the command with `AppendData.byName` over a
  * table handle carrying `eqUpsert` write options (the batch write
  * builder routes those to [[graft.etl.VersionedTable
  * .upsertEqualityDelete]]), with the source projected to the target's
  * columns. MERGE's cardinality contract survives via
  * `requireDistinctKeys`: a source with duplicate key rows aborts the
  * commit with a clear error instead of silently landing duplicates.
  *
  * Running in the HINTS batch means the target is still an
  * UnresolvedRelation — the rule resolves it by hand through the
  * session's catalog manager (graft catalogs only), and on ANY doubt
  * (unknown catalog, missing table, odd shapes) declines to route. */
object RouteEqualityMerge extends Rule[LogicalPlan] {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
  import org.apache.spark.sql.connector.catalog.Identifier
  import graft.etl.{Catalog => EtlCatalog, GeneratedCols, VersionedTable}

  private def targetParts(p: LogicalPlan): Option[Seq[String]] = p match {
    case s: SubqueryAlias => targetParts(s.child)
    // the parser stamps the merge target with an internal
    // __required_write_privileges__ option — any OTHER option means a
    // user-shaped relation this rule should not touch
    case u: UnresolvedRelation if u.options.keySet().asScala
        .forall(_ == "__required_write_privileges__") =>
      Some(u.multipartIdentifier)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** `t.k = s.k` (either order, any qualifiers) → Some("k"). */
  private def keyEquality(e: Expression): Option[String] = e match {
    case EqualTo(l, r) =>
      def last(x: Expression): Option[String] = x match {
        case a: UnresolvedAttribute => a.nameParts.lastOption.map(_.toLowerCase)
        case a: AttributeReference => Some(a.name.toLowerCase)
        case _ => None
      }
      for { ln <- last(l); rn <- last(r) if ln == rn } yield ln
    case _ => None
  }

  private def starShaped(m: MergeIntoTable): Boolean =
    m.matchedActions == Seq(UpdateStarAction(None)) &&
      m.notMatchedActions == Seq(InsertStarAction(None)) &&
      m.notMatchedBySourceActions.isEmpty &&
      !m.withSchemaEvolution

  /** Resolve the merge target through the catalog manager; None unless
    * it is a graft table that opted in and the merge qualifies. */
  private def route(m: MergeIntoTable): Option[LogicalPlan] = try {
    if (!starShaped(m)) return None
    val parts = targetParts(m.targetTable).getOrElse(return None)
    if (parts.size < 2) return None // current-catalog shorthand: decline
    val spark = org.apache.spark.sql.SparkSession.active
    val cm = spark.sessionState.catalogManager
    val plugin = cm.catalog(parts.head) match {
      case g: GraftCatalog => g
      case _ => return None
    }
    val ident = Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last)
    val table = plugin.loadTable(ident) match {
      case t: GraftBatchTable => t
      case _ => return None
    }
    val opts = table.tableOpts
    if (opts.contains("versionAsOf")) return None
    val dir = opts.getOrElse("dir", return None)
    val name = opts.getOrElse("table", return None)
    val cat = new EtlCatalog(spark, dir)
    val props = VersionedTable.tableProps(cat, name)
    if (!props.get("write.merge.mode").map(_.trim.toLowerCase)
      .contains("equality")) return None
    val keys = VersionedTable.recordedUpsertKeys(cat, name)
      .getOrElse(return None).map(_.toLowerCase)
    val onCols = conjuncts(m.mergeCondition).map(c =>
      keyEquality(c).getOrElse(return None))
    if (onCols.toSet != keys.toSet) return None
    // generated/identity columns recompute in the row-level writers —
    // keep those merges on the standard path
    val declared = VersionedTable.recordedHeadSchema(cat, name)
      .getOrElse(table.schema())
    if (GeneratedCols.generationExprs(declared).nonEmpty ||
      GeneratedCols.identitySpecs(declared).nonEmpty) return None
    val routed = new GraftBatchTable(table.schema(),
      opts ++ Map("eqUpsert" -> "true", "requireDistinctKeys" -> "true",
        "upsertKeys" -> keys.mkString(","),
        "idOrder" -> keys.mkString(",")),
      acceptAnySchema = false)
    val rel = org.apache.spark.sql.execution.datasources.v2
      .DataSourceV2Relation.create(routed, Some(plugin), Some(ident))
    val cols = table.schema().fieldNames.toSeq
      .map(n => UnresolvedAttribute.quoted(n))
    Some(AppendData.byName(rel, Project(cols, m.sourceTable), Map.empty))
  } catch { case scala.util.control.NonFatal(_) => None }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case m: MergeIntoTable => route(m).getOrElse(m)
    }
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
