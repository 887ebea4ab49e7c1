package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** PLANNING-TIME zone-map file skipping: a custom [[FileIndex]] that
  * filters a versioned table's explicit file list against its
  * manifest-recorded per-file column ranges (and null counts) when
  * Catalyst hands the scan its pushed-down data filters.
  *
  * `VersionedTable.readWhere` prunes eagerly for an explicitly passed
  * predicate; this index is the CATALYST-NATIVE composition of the same
  * metadata — the DataFrame is built over the index, and whatever filter
  * the optimizer later pushes to the scan (from `.where`, SQL, a join's
  * pushed predicate, the reference API's incremental watermark, …) prunes
  * files at `listFiles` time with zero graft API involvement. Planner
  * surface only; no Spark behavior is modified. Lives in the
  * `org.apache.spark.sql` package tree alongside the other internal-API
  * seams ([[ColumnExprBridge]]).
  *
  * The admits callback owns the comparison-domain logic (it is
  * [[graft.etl.VersionedTable]]'s pruning core under the hood), so the
  * one-sided-error contract is shared with the eager path: unsupported
  * shapes or unconvertible literals keep the file.
  */
final class ZoneMapFileIndex(
    files: Seq[FileStatus],
    admits: (String, ZonePred.P) => Boolean)
  extends FileIndex {

  override val rootPaths: Seq[Path] =
    files.map(_.getPath.getParent).distinct

  override def partitionSchema: StructType = StructType(Nil)

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // the scan's data filters are implicitly conjunctive
    val pred = ZonePred.And(dataFilters.map(ZoneMapFileIndex.resolvedPred))
    val surviving =
      if (dataFilters.isEmpty) files
      else files.filter(f => admits(f.getPath.toUri.getPath, pred))
    Seq(PartitionDirectory(InternalRow.empty, surviving.toArray))
  }
}

object ZoneMapFileIndex {

  /** Translate a RESOLVED filter expression into the neutral
    * [[ZonePred]] tree — the planner's twin of [[ColumnExprBridge
    * .predTree]] (which handles unresolved Column trees). Literals
    * convert back to external Java values via Catalyst's own converters,
    * so the downstream domain logic sees the same shapes either way.
    * Unsupported shapes become [[ZonePred.Unknown]] (= cannot skip). */
  def resolvedPred(e: Expression): ZonePred.P = {
    def ext(l: Literal): Option[Any] =
      if (l.value == null) None
      else Option(CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value))
    def attr(x: Expression): Option[String] = x match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def leaf(a: Expression, l: Literal, op: String): ZonePred.P =
      (attr(a), ext(l)) match {
        case (Some(n), Some(v)) => ZonePred.Leaf(n, op, Seq(v))
        case _ => ZonePred.Unknown
      }
    e match {
      case And(l, r) => ZonePred.And(Seq(resolvedPred(l), resolvedPred(r)))
      case Or(l, r) => ZonePred.Or(Seq(resolvedPred(l), resolvedPred(r)))
      case IsNull(a) => attr(a).map(ZonePred.NullCheck(_, isNot = false))
        .getOrElse(ZonePred.Unknown)
      case IsNotNull(a) => attr(a).map(ZonePred.NullCheck(_, isNot = true))
        .getOrElse(ZonePred.Unknown)
      case Not(inner) => resolvedPred(inner) match {
        case ZonePred.NullCheck(c, b) => ZonePred.NullCheck(c, !b)
        case _ => ZonePred.Unknown
      }
      case EqualTo(a, l: Literal) => leaf(a, l, "eq")
      case EqualTo(l: Literal, a) => leaf(a, l, "eq")
      case EqualNullSafe(a, l: Literal) => leaf(a, l, "eq")
      case EqualNullSafe(l: Literal, a) => leaf(a, l, "eq")
      case LessThan(a, l: Literal) => leaf(a, l, "lt")
      case LessThan(l: Literal, a) => leaf(a, l, "gt")
      case LessThanOrEqual(a, l: Literal) => leaf(a, l, "le")
      case LessThanOrEqual(l: Literal, a) => leaf(a, l, "ge")
      case GreaterThan(a, l: Literal) => leaf(a, l, "gt")
      case GreaterThan(l: Literal, a) => leaf(a, l, "lt")
      case GreaterThanOrEqual(a, l: Literal) => leaf(a, l, "ge")
      case GreaterThanOrEqual(l: Literal, a) => leaf(a, l, "le")
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attr(a) match {
          case Some(n) =>
            val ex = vs.map { case l: Literal => ext(l) }
            if (ex.forall(_.isDefined)) ZonePred.Leaf(n, "in", ex.flatten)
            else ZonePred.Unknown
          case None => ZonePred.Unknown
        }
      case InSet(a, hset) if hset.nonEmpty =>
        attr(a) match {
          case Some(n) =>
            val conv = CatalystTypeConverters.createToScalaConverter(a.dataType)
            val vs = hset.toSeq.filter(_ != null).map(conv)
            if (vs.nonEmpty) ZonePred.Leaf(n, "in", vs) else ZonePred.Unknown
          case None => ZonePred.Unknown
        }
      case _ => ZonePred.Unknown
    }
  }
}

object ZoneMapRead {

  /** A DataFrame over `statuses` (one schema, parquet) whose scan prunes
    * files through `admits` at planning time. */
  def dataFrame(spark: SparkSession, statuses: Seq[FileStatus],
                dataSchema: StructType,
                admits: (String, ZonePred.P) => Boolean)
      : DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val relation = HadoopFsRelation(
      new ZoneMapFileIndex(statuses, admits),
      partitionSchema = StructType(Nil),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    classic.baseRelationToDataFrame(relation)
  }
}
