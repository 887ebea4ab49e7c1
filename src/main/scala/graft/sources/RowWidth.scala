package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Estimated in-memory/serialized bytes per row: fixed-width fields from
  * Catalyst's per-type `defaultSize`; variable-width fields (string/binary/
  * nested) MEASURED as average bytes over a bounded sample — one tiny job,
  * only when variable-width columns exist. Catalyst alone assumes 20-byte
  * strings, which under-sizes payload-heavy rows by orders of magnitude.
  */
object RowWidth {

  def isVarWidth(dt: DataType): Boolean = dt match {
    case StringType | BinaryType => true
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Average data bytes per row of `cols` (no JVM object overhead). */
  def estimate(df: DataFrame, cols: Seq[String], sampleRows: Int = 65536): Long = {
    val fields = cols.map(df.schema(_))
    val (varF, fixedF) = fields.partition(f => isVarWidth(f.dataType))
    val fixedBytes = fixedF.map(_.dataType.defaultSize.toLong).sum
    val varBytes: Long = if (varF.isEmpty) 0L
    else {
      val sample = df.select(varF.map { f =>
        f.dataType match {
          case StringType => octet_length(col(f.name))
          case BinaryType => length(col(f.name))
          case _ => length(to_json(struct(col(f.name))))
        }
      }.reduce(_ + _).cast(LongType).as("__b")).limit(sampleRows)
      val r = sample.agg(avg(col("__b"))).head()
      if (r.isNullAt(0)) 20L * varF.length else math.ceil(r.getDouble(0)).toLong
    }
    fixedBytes + varBytes
  }

  /** Repartition so each output file lands near `targetBytes` of row data
    * (parquet encoding/compression typically shrinks this further — set
    * the target with the observed ratio of your corpus). One count + one
    * sample job, then a round-robin repartition: the standard knob against
    * the two file-layout failure modes at 100 TB — thousands of KB-sized
    * files (metadata pressure, seek-bound readers) or single multi-GB
    * files (no read parallelism, task stragglers).
    */
  def shardForTargetFileSize(df: DataFrame, targetBytes: Long,
                             maxPartitions: Int = 100000): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val rowBytes = math.max(1L, estimate(df, df.columns.toSeq))
    val rows = df.count()
    val parts = math.min(maxPartitions.toLong,
      math.max(1L, (rows * rowBytes + targetBytes - 1) / targetBytes)).toInt
    df.repartition(parts)
  }
}
