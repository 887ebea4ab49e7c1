package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Estimated in-memory/serialized bytes per row: fixed-width fields from
  * Catalyst's per-type `defaultSize`; variable-width fields (string/binary/
  * nested) measured from the data — Catalyst alone assumes 20-byte strings,
  * which under-sizes payload-heavy rows by orders of magnitude.
  */
object RowWidth {

  def isVarWidth(dt: DataType): Boolean = dt match {
    case StringType | BinaryType => true
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Per-row data bytes of the variable-width fields among `fields`, nulls
    * counting as 0 (a null must not void the whole row's sum). */
  private def varBytesExpr(fields: Seq[StructField]): Option[Column] = {
    val varF = fields.filter(f => isVarWidth(f.dataType))
    if (varF.isEmpty) None
    else Some(varF.map { f =>
      val len = f.dataType match {
        case StringType => octet_length(col(f.name))
        case BinaryType => length(col(f.name)) // bytes for binary
        // octet_length, not length: the JSON rendering counts CHARS under
        // length, undercounting multi-byte text payloads ~3x
        case _ => octet_length(to_json(struct(col(f.name))))
      }
      coalesce(len.cast(LongType), lit(0L))
    }.reduce(_ + _))
  }

  private def fixedBytes(fields: Seq[StructField]): Long =
    fields.filterNot(f => isVarWidth(f.dataType))
      .map(_.dataType.defaultSize.toLong).sum

  /** Average data bytes per row of `cols`, variable widths measured over a
    * bounded HEAD sample (one tiny job; cheap but order-biased — fine for
    * a coarse broadcast budget; use [[shardForTargetFileSize]]'s exact
    * single-pass stats when the answer sizes real output).
    */
  def estimate(df: DataFrame, cols: Seq[String], sampleRows: Int = 65536): Long = {
    val fields = cols.map(df.schema(_))
    val varBytes: Long = varBytesExpr(fields) match {
      case None => 0L
      case Some(e) =>
        val r = df.select(e.as("__b")).limit(sampleRows).agg(avg(col("__b"))).head()
        if (r.isNullAt(0)) 0L else math.ceil(r.getDouble(0)).toLong
    }
    fixedBytes(fields) + varBytes
  }

  /** Repartition so each output file lands near `targetBytes` of row data
    * (parquet encoding/compression typically shrinks this further — set
    * the target with the observed ratio of your corpus). Row count and
    * total variable-width bytes come from ONE exact aggregation pass (no
    * sampling bias: a table whose payload width drifts over time — the
    * common case — would fool any head sample), then a round-robin
    * repartition. The knob against the two file-layout failure modes at
    * 100 TB: thousands of KB-sized files (metadata pressure, seek-bound
    * readers) or single multi-GB files (no read parallelism, stragglers).
    */
  def shardForTargetFileSize(df: DataFrame, targetBytes: Long,
                             maxPartitions: Int = 100000): DataFrame =
    df.repartition(partitionsForTargetFileSize(df, targetBytes, maxPartitions))

  /** The partition count [[shardForTargetFileSize]] would use — exposed for
    * writers that must partition on specific columns (e.g. compaction of a
    * Hive-partitioned table) rather than round-robin. */
  def partitionsForTargetFileSize(df: DataFrame, targetBytes: Long,
                                  maxPartitions: Int = 100000): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fields = df.columns.toSeq.map(df.schema(_))
    val aggs = count(lit(1)).as("__rows") +:
      varBytesExpr(fields).map(e => sum(e).as("__vbytes")).toSeq
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getLong(0)
    val vbytes = if (r.length > 1 && !r.isNullAt(1)) r.getLong(1) else 0L
    val totalBytes = rows * fixedBytes(fields) + vbytes
    partitionsFromTotal(totalBytes, targetBytes, maxPartitions)
  }

  /** Partition count for an ALREADY-KNOWN total-byte estimate — the
    * no-extra-scan variant for writers whose input is an existing parquet
    * table (compaction: the footers' uncompressed byte totals replace the
    * aggregation pass over the data). */
  def partitionsFromTotal(totalBytes: Long, targetBytes: Long,
                          maxPartitions: Int = 100000): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    math.min(maxPartitions.toLong,
      math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)).toInt
  }
}
