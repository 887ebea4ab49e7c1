package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet reading with TIMESTAMP(NANOS) support.
  *
  * Spark has no nanosecond timestamp type and refuses parquet INT64
  * TIMESTAMP(NANOS) columns outright ([PARQUET_TYPE_ILLEGAL]). The driver
  * testdata's `events.ts` is nano-precision, so we:
  *   1. enable `spark.sql.legacy.parquet.nanosAsLong` (runtime SQL conf) so
  *      the scan surfaces those columns as LongType nanos, and
  *   2. detect which columns are nano-timestamps from the parquet FOOTER
  *      (one footer read per table — metadata only, no data IO) and rewrite
  *      them to microsecond TimestampType via `timestamp_micros(v div 1000)`.
  *
  * The conversion truncates toward negative infinity for the post-1970
  * values in scope (matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast). Scans
  * stay fully vectorized; the division folds into the projection.
  */
object ParquetSource {

  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set(NanosAsLongKey, "true")
    val df = spark.read.parquet(path)
    val nanoCols = nanoTimestampCols(spark, path)
    nanoCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
    }
  }

  /** Names of top-level INT64 TIMESTAMP(NANOS) columns, from the footer of
    * the first parquet file at `path` (file or directory).
    */
  def nanoTimestampCols(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .map(_.getPath)
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .getOrElse(return Seq.empty)
      else p

    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.getFields.asScala.toSeq.collect {
        case f if f.isPrimitive &&
          (f.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == TimeUnit.NANOS
            case _ => false
          }) => f.getName
      }
    } finally reader.close()
  }
}
