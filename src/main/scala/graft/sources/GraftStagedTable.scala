package graft.sources

import java.util.UUID

import graft.etl.{Catalog, VersionedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.graft.GraftStreamWrite
import org.apache.spark.sql.types.StructType

/** The staged table under ATOMIC `[CREATE OR] REPLACE TABLE ... [AS
  * SELECT]` ([[GraftCatalog]] as a `StagingTableCatalog`): the query's
  * rows stage as executor-written parquet under `__vstage`, and
  * `commitStagedChanges` lands everything — table creation or
  * replacement INCLUDING the data — as ONE versioned manifest commit
  * ([[VersionedTable.replaceAll]]). Nothing is visible until that
  * commit; an abort (or a crash) leaves only unreachable staging files
  * for vacuum. Against a non-staging catalog Spark would instead run
  * DROP + CREATE — non-atomic, and through graft's DROP it would DELETE
  * the table's history; the staged replace keeps every prior version
  * readable (time travel crosses the replace, clones stay valid). */
private[sources] final class GraftStagedTable(
    c: Catalog, table: String, declared: StructType,
    props: Map[String, String],
    requireExists: Option[Boolean]) extends StagedTable with SupportsWrite {

  private val stagingId = UUID.randomUUID().toString
  private def stagingRoot: String =
    s"${c.dirPath(table)}.__vstage/replace-$stagingId"

  // staged parquet paths, set by the write's commit (Spark commits the
  // WRITE first, then commitStagedChanges)
  @volatile private var staged: Seq[String] = Nil
  @volatile private var wrote = false

  override def name(): String = table
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // REPLACE ... AS SELECT plans as truncate-overwrite on the staged
    // table; the staged table is invisible until commit, so truncate is
    // a no-op on the fresh stage
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write with BatchWrite {
        override def toBatch: BatchWrite = this
        override def description(): String = "graft staged replace write"
        override def createBatchWriterFactory(
            pInfo: PhysicalWriteInfo): DataWriterFactory =
          GraftStreamWrite.stageFactory(SparkSession.active, info.schema(),
            stagingRoot)
        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          staged = messages.collect {
            case GraftStreamWrite.StagedFile(p, n) if n > 0 => p
          }.toSeq
          wrote = true
        }
        override def abort(messages: Array[WriterCommitMessage]): Unit =
          cleanup()
      }
    }

  override def commitStagedChanges(): Unit = {
    val spark = c.spark
    try {
      val exists = VersionedTable.currentVersion(c, table).isDefined
      requireExists.foreach { must =>
        if (must && !exists)
          throw new IllegalStateException(
            s"REPLACE TABLE: '$table' does not exist (it may have been " +
              "dropped since staging) — use CREATE OR REPLACE")
        if (!must && exists)
          throw new IllegalStateException(
            s"CREATE TABLE: '$table' already exists (created since " +
              "staging) — use CREATE OR REPLACE")
      }
      // plain REPLACE TABLE (no AS SELECT) stages no write: the commit
      // is an empty table with the declared schema
      val df =
        if (staged.nonEmpty) spark.read.schema(declared).parquet(staged: _*)
        else spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), declared)
      VersionedTable.replaceAll(c, table, df, props)
      ()
    } finally cleanup()
  }

  override def abortStagedChanges(): Unit = cleanup()

  private def cleanup(): Unit =
    try {
      val p = new Path(stagingRoot)
      val f = p.getFileSystem(c.spark.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
    } catch { case _: java.io.IOException => () }
}
