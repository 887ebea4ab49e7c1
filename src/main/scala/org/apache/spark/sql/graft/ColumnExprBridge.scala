package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** Bridge into Spark's `private[sql]` Column internals.
  *
  * Spark 4 removed the public `Column.expr` accessor — a Column now wraps
  * a connect-agnostic `ColumnNode` tree (`org.apache.spark.sql.internal`),
  * converted to a Catalyst expression only during analysis. Graft's
  * zone-map pruner ([[graft.etl.VersionedTable.readWhere]]) needs the
  * predicate's structure BEFORE any plan exists, so this file lives in the
  * `org.apache.spark.sql` package tree (the accepted extension-point
  * pattern for `private[sql]` seams) and walks the node tree directly,
  * exporting a neutral conjunct list. Nothing from Spark is modified or
  * copied; internal literals conveniently carry their RAW Java values
  * (java.sql.Timestamp, LocalDate, String, …), which is exactly what a
  * driver-side range check wants.
  */
object ColumnExprBridge {

  /** One prunable conjunct: (columnName, op, literalValues) with op ∈
    * eq|lt|le|gt|ge|in. Only top-level AND-chains of
    * `col <cmp> literal` / `literal <cmp> col` / `col IN (literals)`
    * surface; every other shape (OR, NOT, function calls, casts,
    * attr-vs-attr) contributes nothing — callers treat "no conjunct" as
    * "cannot skip", so unsupported shapes degrade to a full read. */
  def conjuncts(c: Column): Seq[(String, String, Seq[Any])] = walk(c.node)

  private def walk(n: ColumnNode): Seq[(String, String, Seq[Any])] = n match {
    case f: UnresolvedFunction if f.functionName == "and" =>
      f.arguments.flatMap(walk)
    case f: UnresolvedFunction => leaf(f).toSeq
    case _ => Nil
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
