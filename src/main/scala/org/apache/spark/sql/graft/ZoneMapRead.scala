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
  * manifest-recorded per-file column ranges when Catalyst hands the scan
  * its pushed-down data filters.
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
  * [[graft.etl.VersionedTable]]'s `rangeAdmits` under the hood), so the
  * one-sided-error contract is shared with the eager path: unsupported
  * shapes or unconvertible literals keep the file.
  */
final class ZoneMapFileIndex(
    files: Seq[FileStatus],
    admits: (String, Seq[(String, String, Seq[Any])]) => Boolean)
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
    val cs = dataFilters.flatMap(ZoneMapFileIndex.resolvedConjuncts)
    val surviving =
      if (cs.isEmpty) files
      else files.filter(f => admits(f.getPath.toUri.getPath, cs))
    Seq(PartitionDirectory(InternalRow.empty, surviving.toArray))
  }
}

object ZoneMapFileIndex {

  /** Extract (columnName, op, literalValues) conjuncts from a RESOLVED
    * filter expression — the planner's twin of [[ColumnExprBridge
    * .conjuncts]] (which handles unresolved Column trees). Literals
    * convert back to external Java values via Catalyst's own converters,
    * so the downstream domain logic sees the same shapes either way. */
  def resolvedConjuncts(e: Expression): Seq[(String, String, Seq[Any])] = {
    def ext(l: Literal): Option[Any] =
      if (l.value == null) None
      else Option(CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value))
    def attr(x: Expression): Option[String] = x match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    e match {
      case And(l, r) => resolvedConjuncts(l) ++ resolvedConjuncts(r)
      case EqualTo(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "eq", Seq(v))); case _ => Nil }
      case EqualTo(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "eq", Seq(v))); case _ => Nil }
      case EqualNullSafe(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "eq", Seq(v))); case _ => Nil }
      case EqualNullSafe(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "eq", Seq(v))); case _ => Nil }
      case LessThan(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "lt", Seq(v))); case _ => Nil }
      case LessThan(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "gt", Seq(v))); case _ => Nil }
      case LessThanOrEqual(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "le", Seq(v))); case _ => Nil }
      case LessThanOrEqual(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "ge", Seq(v))); case _ => Nil }
      case GreaterThan(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "gt", Seq(v))); case _ => Nil }
      case GreaterThan(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "lt", Seq(v))); case _ => Nil }
      case GreaterThanOrEqual(a, l: Literal) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "ge", Seq(v))); case _ => Nil }
      case GreaterThanOrEqual(l: Literal, a) =>
        (attr(a), ext(l)) match {
          case (Some(n), Some(v)) => Seq((n, "le", Seq(v))); case _ => Nil }
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attr(a) match {
          case Some(n) =>
            val ex = vs.map { case l: Literal => ext(l) }
            if (ex.forall(_.isDefined)) Seq((n, "in", ex.flatten)) else Nil
          case None => Nil
        }
      case InSet(a, hset) if hset.nonEmpty =>
        attr(a) match {
          case Some(n) =>
            val conv = CatalystTypeConverters.createToScalaConverter(a.dataType)
            val vs = hset.toSeq.filter(_ != null).map(conv)
            if (vs.nonEmpty) Seq((n, "in", vs)) else Nil
          case None => Nil
        }
      case _ => Nil
    }
  }
}

object ZoneMapRead {

  /** A DataFrame over `statuses` (one schema, parquet) whose scan prunes
    * files through `admits` at planning time. */
  def dataFrame(spark: SparkSession, statuses: Seq[FileStatus],
                dataSchema: StructType,
                admits: (String, Seq[(String, String, Seq[Any])]) => Boolean)
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
