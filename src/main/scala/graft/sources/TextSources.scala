package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV and JSON-lines sources/sinks. Extension scope: the reference reads
  * SQL databases only, but a training-data pipeline ingests and emits flat
  * files; these wrap Spark's native distributed readers/writers with the
  * options that make round-trips lossless for the supported types.
  *
  * Scale notes: both formats split by file (and CSV/JSON-lines by line)
  * across executors; schemas are supplied EXPLICITLY — `inferSchema` costs
  * an extra full pass over the data and can silently drift types between
  * runs, which at 100 TB is both the slowest and the least reproducible
  * option. Writers emit one file per partition; readers prune columns but
  * cannot push predicates below the parse (prefer parquet for anything
  * re-read often — these are interchange formats).
  */
object TextSources {

  /** CSV null sentinel: nulls write as unquoted `\N` (the classic
    * MySQL-dump convention), empty strings as quoted `""` — the only
    * writer/reader option combination under which null and empty round-trip
    * distinctly (empirically verified; reader-side `emptyValue` SUBSTITUTES
    * for quoted-empty fields, it does not match them). */
  val NullSentinel = "\\N"

  /** Write as CSV with a header. Null vs empty string round-trips (see
    * [[NullSentinel]]). Values containing NEWLINES are not round-trippable
    * under line-splitting reads — reading them needs `multiLine=true`,
    * which forfeits intra-file parallelism; strip or escape newlines
    * upstream instead. */
  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("nullValue", NullSentinel)
      .csv(path)

  /** Read CSV with an explicit schema (no inference pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .schema(schema)
      .csv(path)

  /** Write as JSON lines (one object per row; nulls omitted per JSON
    * convention — they read back as null under the supplied schema). */
  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Read JSON lines with an explicit schema (no inference pass). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
