package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** The neutral predicate tree zone-map pruning evaluates — produced from
  * BOTH predicate representations (an unresolved `Column` node tree here,
  * a resolved Catalyst expression in [[ZoneMapFileIndex]]) so the
  * domain logic in `graft.etl.VersionedTable` is written once.
  *
  * Semantics are three-valued by construction: [[ZonePred.Unknown]] marks
  * any shape the pruner can't reason about, and evaluation treats it as
  * "may match" — so an unsupported branch inside an AND or OR degrades to
  * keeping the file, never skipping it.
  */
object ZonePred {
  sealed trait P
  /** `col (eq|lt|le|gt|ge|in) literals`. */
  final case class Leaf(col: String, op: String, values: Seq[Any]) extends P
  /** `col IS NULL` (isNot = false) / `col IS NOT NULL` (isNot = true). */
  final case class NullCheck(col: String, isNot: Boolean) extends P
  final case class And(ps: Seq[P]) extends P
  final case class Or(ps: Seq[P]) extends P
  /** Anything else — functions, casts, attr-vs-attr, NOT over a
    * comparison (its range complement is not worth the soundness risk). */
  case object Unknown extends P
}

/** Bridge into Spark's `private[sql]` Column internals.
  *
  * Spark 4 removed the public `Column.expr` accessor — a Column now wraps
  * a connect-agnostic `ColumnNode` tree (`org.apache.spark.sql.internal`),
  * converted to a Catalyst expression only during analysis. Graft's
  * zone-map pruner ([[graft.etl.VersionedTable.readWhere]]) needs the
  * predicate's structure BEFORE any plan exists, so this file lives in the
  * `org.apache.spark.sql` package tree (the accepted extension-point
  * pattern for `private[sql]` seams) and walks the node tree directly,
  * exporting the neutral [[ZonePred]] tree. Nothing from Spark is modified
  * or copied; internal literals conveniently carry their RAW Java values
  * (java.sql.Timestamp, LocalDate, String, …), which is exactly what a
  * driver-side range check wants.
  */
object ColumnExprBridge {

  /** The full predicate tree: AND/OR combinations of comparisons and
    * null checks; every unsupported shape collapses to
    * [[ZonePred.Unknown]] (= cannot skip). */
  def predTree(c: Column): ZonePred.P = walk(c.node)

  /** Legacy flat view: the top-level AND-chain's supported comparison
    * conjuncts only (no OR, no null checks) — kept for callers that
    * reason per-conjunct. */
  def conjuncts(c: Column): Seq[(String, String, Seq[Any])] = {
    def flat(p: ZonePred.P): Seq[(String, String, Seq[Any])] = p match {
      case ZonePred.And(ps) => ps.flatMap(flat)
      case ZonePred.Leaf(n, op, vs) => Seq((n, op, vs))
      case _ => Nil
    }
    flat(predTree(c))
  }

  private def walk(n: ColumnNode): ZonePred.P = n match {
    case f: UnresolvedFunction if f.functionName.equalsIgnoreCase("and") =>
      ZonePred.And(f.arguments.map(walk))
    case f: UnresolvedFunction if f.functionName.equalsIgnoreCase("or") =>
      ZonePred.Or(f.arguments.map(walk))
    case f: UnresolvedFunction
      if f.functionName.equalsIgnoreCase("isnull") &&
        f.arguments.lengthCompare(1) == 0 =>
      attrName(f.arguments.head)
        .map(ZonePred.NullCheck(_, isNot = false))
        .getOrElse(ZonePred.Unknown)
    case f: UnresolvedFunction
      if f.functionName.equalsIgnoreCase("isnotnull") &&
        f.arguments.lengthCompare(1) == 0 =>
      attrName(f.arguments.head)
        .map(ZonePred.NullCheck(_, isNot = true))
        .getOrElse(ZonePred.Unknown)
    case f: UnresolvedFunction
      if (f.functionName == "!" || f.functionName.equalsIgnoreCase("not")) &&
        f.arguments.lengthCompare(1) == 0 =>
      // only null checks have an exact, safe complement
      walk(f.arguments.head) match {
        case ZonePred.NullCheck(c, b) => ZonePred.NullCheck(c, !b)
        case _ => ZonePred.Unknown
      }
    case f: UnresolvedFunction =>
      leaf(f).map { case (n, op, vs) => ZonePred.Leaf(n, op, vs) }
        .getOrElse(ZonePred.Unknown)
    case _ => ZonePred.Unknown
  }

  private def attrName(n: ColumnNode): Option[String] = n match {
    case a: UnresolvedAttribute if a.nameParts.lengthCompare(1) == 0 =>
      Some(a.nameParts.head)
    case _ => None
  }

  private def litValue(n: ColumnNode): Option[Any] = n match {
    case l: Literal if l.value != null => Some(l.value)
    case _ => None
  }

  private val flip =
    Map("lt" -> "gt", "le" -> "ge", "gt" -> "lt", "ge" -> "le", "eq" -> "eq")

  private def leaf(f: UnresolvedFunction): Option[(String, String, Seq[Any])] = {
    val op = f.functionName match {
      case "=" | "==" | "<=>" => "eq" // null literals fall out via litValue
      case "<" => "lt"
      case "<=" => "le"
      case ">" => "gt"
      case ">=" => "ge"
      case "in" => "in"
      case _ => return None
    }
    f.arguments match {
      case Seq(a, b) if op != "in" =>
        (attrName(a), litValue(b)) match {
          case (Some(n), Some(v)) => Some((n, op, Seq(v)))
          case _ => (attrName(b), litValue(a)) match {
            case (Some(n), Some(v)) => Some((n, flip(op), Seq(v)))
            case _ => None
          }
        }
      case a +: rest if op == "in" && rest.nonEmpty =>
        val vs = rest.map(litValue)
        attrName(a) match {
          case Some(n) if vs.forall(_.isDefined) =>
            Some((n, "in", vs.flatten))
          case _ => None
        }
      case _ => None
    }
  }
}
