package org.apache.spark.sql.graft

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.etl.{Catalog, VersionedTable}

/** The NATIVE streaming sink for versioned tables —
  * `df.writeStream.format("graft")` — closing the loop the `graft-cdc`
  * source opened: versioned tables now both emit and absorb streams
  * through engine-managed checkpoints, no `foreachBatch` library call
  * required ([[graft.streaming.StreamLoader.streamInto]] remains the
  * library-call twin).
  *
  * EXACTLY-ONCE by epoch-keyed idempotent commits: each epoch's staged
  * rows land as ONE versioned commit whose manifest also records
  * `stream_epoch_<queryId> = epochId` — atomically, since the prop rides
  * the same manifest CAS as the data. A replayed epoch (restart from the
  * checkpoint WAL after a crash between our commit and the engine's) finds
  * its id already recorded and SKIPS, so re-delivery commits no duplicate
  * version. Composed with the loader's keyed upsert (`upsertKeys` option)
  * even at-least-once REPROCESSING of source data converges.
  *
  * Mechanics per micro-batch:
  *
  *   1. executors write their partitions as parquet into a staging dir
  *      beside the table (`<table>.__vstage/<queryId>/epoch-<n>/`), via
  *      Spark's own [[ParquetFileFormat.prepareWrite]] writer — no
  *      hand-rolled encoder; commit messages carry exactly the files the
  *      COMMITTED task attempts wrote (speculative/failed attempts'
  *      strays are never read — the commit coordinator guarantees one
  *      winner per partition, and the epoch dir dies after the commit);
  *   2. the driver reads the staged files back as one DataFrame and runs
  *      the FULL versioned loader (surrogate ids continuing, schema
  *      `ensure` widening, bucket-scoped keyed upserts, manifest CAS) —
  *      semantics identical to a batch load of the same rows;
  *   3. staging for every epoch ≤ the committed one is deleted (crashed
  *      predecessors' strays self-clean on the next successful commit).
  *
  * Scale: stage + re-read costs one extra write/read of the BATCH (never
  * the table) — the price of engine checkpoint interop with full loader
  * semantics; the loader's own write is O(batch + touched buckets), same
  * as the batch path. Output modes: Append, and Update-as-append when
  * `upsertKeys` makes re-emitted aggregate rows merge onto their keys
  * (the sink builder opts into the engine's update-as-append contract).
  *
  * (Reference anchor: the target-DB load, easy_etl/__init__.py:89-99,
  * is the batch ancestor; this is its always-on form.)
  */
object GraftStreamWrite {

  /** One committed task attempt's staged file. */
  final case class StagedFile(path: String, rows: Long) extends WriterCommitMessage

  val EpochPropPrefix = "stream_epoch_"

  /** Retained FOREIGN (other query ids') epoch stamps per manifest —
    * the accretion cap. Own stamps are never dropped by their query. */
  val MaxForeignEpochs = 16

  /** AGE FLOOR under the cap: a foreign stamp younger than this never
    * drops, however many stamps accrete — it may belong to a LIVE
    * concurrent query whose replay detection the drop would silently
    * disable. Only stamps both over-cap AND older than the floor go. */
  val ForeignStampAgeFloorMs: Long = 6L * 60 * 60 * 1000 // 6 hours

  /** Epoch id of a stamp — both formats: new `"<epoch>@<millis>"` and
    * legacy plain `"<epoch>"`. */
  def epochOf(stamp: String): Long =
    scala.util.Try(stamp.takeWhile(_ != '@').toLong).getOrElse(-1L)

  /** Wall clock of a stamp; legacy unstamped values sort oldest (they
    * predate the GC, so they are the right first victims). */
  def stampedAt(stamp: String): Long =
    stamp.split('@') match {
      case Array(_, ts) => scala.util.Try(ts.toLong).getOrElse(Long.MinValue)
      case _ => Long.MinValue
    }

  /** Build a staging writer factory (executor-side parquet via Spark's
    * own [[ParquetFileFormat.prepareWrite]] writer) for any consumer —
    * the streaming sink's epochs and the row-level replace write share
    * this machinery. */
  def stageFactory(spark: SparkSession, schema: StructType,
                                  stagingRoot: String): GraftStreamWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    new GraftStreamWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), schema, stagingRoot)
  }

  def apply(spark: SparkSession, queryId: String, schema: StructType,
            options: Map[String, String]): StreamingWrite = {
    def opt(k: String) = options.find(_._1.equalsIgnoreCase(k)).map(_._2)
    val dir = opt("dir").getOrElse(
      throw new IllegalArgumentException("graft format requires option 'dir'"))
    val table = opt("table").getOrElse(
      throw new IllegalArgumentException("graft format requires option 'table'"))
    val csv = (k: String) => opt(k).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val eqMode = opt("upsertMode").map(_.trim.toLowerCase) match {
      case None | Some("merge") => false
      case Some("equality-delete") | Some("equality") => true
      case Some(other) => throw new IllegalArgumentException(
        s"unknown upsertMode '$other' — use 'merge' (read-and-merge, " +
          "the default) or 'equality-delete' (write-without-read " +
          "tombstones, resolved at read / materialized by compact)")
    }
    if (eqMode) require(csv("upsertKeys").nonEmpty,
      "upsertMode 'equality-delete' requires upsertKeys")
    // OP-COLUMN ROUTING (Debezium-shaped feeds): `opColumn` names an
    // indicator column; rows whose (lowercased, trimmed) value is in
    // `deleteValues` (default "d,delete") tombstone their keys WITHOUT
    // replacement, every other row upserts — one commit per epoch, so
    // exactly-once holds across the mixed batch. Equality mode only:
    // the merge path would need a target-probing delete as a SECOND
    // commit per epoch, forking the replay stamp.
    val opCol = opt("opColumn").map(_.trim).filter(_.nonEmpty)
    opCol.foreach { c =>
      require(eqMode,
        "opColumn routing requires upsertMode 'equality-delete' — the " +
          "merge path has no single-commit spelling for mixed " +
          "upsert/delete epochs")
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"opColumn '$c' absent from the stream schema")
    }
    val delVals = csv("deleteValues").map(_.toLowerCase) match {
      case Nil => Seq("d", "delete")
      case vs => vs
    }
    new GraftStreamingWrite(spark, dir, table, queryId, schema,
      upsertKeys = csv("upsertKeys"), idOrder = csv("idOrder"),
      bucketBy = csv("bucketBy") match {
        case Nil => None
        case cols => Some((cols, opt("numBuckets").map(_.toInt).getOrElse(
          throw new IllegalArgumentException(
            "bucketBy requires option 'numBuckets'"))))
      }, equalityDelete = eqMode, opColumn = opCol, deleteValues = delVals)
  }
}

final class GraftStreamingWrite(
    spark: SparkSession, dir: String, table: String, queryId: String,
    schema: StructType, upsertKeys: Seq[String], idOrder: Seq[String],
    bucketBy: Option[(Seq[String], Int)],
    // write-without-read keyed upsert: each epoch commits data files +
    // a key tombstone, NEVER reading the target — continuous CDC ingest
    // stays O(batch) per trigger ([[VersionedTable.upsertEqualityDelete]])
    equalityDelete: Boolean = false,
    // Debezium-shaped routing: rows whose opColumn value ∈ deleteValues
    // delete their keys (tombstone only), the rest upsert — one commit
    opColumn: Option[String] = None,
    deleteValues: Seq[String] = Seq("d", "delete")) extends StreamingWrite {

  private def cat = new Catalog(spark, dir)
  private def stagingRoot = s"${cat.dirPath(table)}.__vstage/$queryId"
  private def epochProp = s"stream_epoch_$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // prepareWrite CONFIGURES the job conf (committer, compression,
    // schema) — stageFactory serializes it after preparation so the
    // executors' task attempt contexts carry the prepared conf
    GraftStreamWrite.stageFactory(spark, schema, stagingRoot)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val c = cat
    val files = messages.collect {
      case GraftStreamWrite.StagedFile(p, n) if n > 0 => p
    }
    val props = VersionedTable.tableProps(c, table)
    val replayed = props.get(epochProp)
      .map(GraftStreamWrite.epochOf).exists(_ >= epochId)
    if (replayed) {
      // the crash landed BETWEEN our manifest commit and the engine's
      // checkpoint commit: the data is already a version — re-delivery
      // must be a no-op, not a duplicate
      cleanupThrough(epochId)
      return
    }
    if (files.nonEmpty) {
      val batch = spark.read.schema(schema).parquet(files: _*)
      // the epoch stamp carries its wall clock ("<epoch>@<millis>") so
      // FOREIGN queries' stale stamps age out: without GC a manifest
      // accretes one prop per historical streaming query forever. Keep
      // the newest MaxForeignEpochs foreign stamps (Delta's txnAppId
      // retention tradeoff) — but NEVER drop a stamp younger than the
      // age floor: with more than MaxForeignEpochs LIVE concurrent
      // writers on one table, a count-only cap would evict the oldest
      // live query's stamp and silently disable its crash-replay
      // detection; a young stamp is presumed live, so only genuinely
      // idle queries lose idempotence.
      val now = System.currentTimeMillis()
      val foreign = props.keys.filter(k =>
        k.startsWith(GraftStreamWrite.EpochPropPrefix) && k != epochProp).toSeq
      val stale =
        if (foreign.size <= GraftStreamWrite.MaxForeignEpochs) Nil
        else foreign.sortBy(k => GraftStreamWrite.stampedAt(props(k)))
          .dropRight(GraftStreamWrite.MaxForeignEpochs)
          .filter(k => GraftStreamWrite.stampedAt(props(k)) <
            now - GraftStreamWrite.ForeignStampAgeFloorMs)
      if (equalityDelete) opColumn match {
        case Some(oc0) =>
          // mixed-op epoch, ONE commit: delete rows contribute only
          // their keys to the tombstone; upsert rows (op column
          // dropped) stage as the replacement data files
          val oc = batch.columns.find(_.equalsIgnoreCase(oc0)).get
          import org.apache.spark.sql.functions.{col, lower, trim}
          val isDel = lower(trim(col(oc).cast("string")))
            .isin(deleteValues: _*)
          VersionedTable.upsertEqualityDelete(c, table,
            batch.where(!(isDel <=> true)).drop(oc), upsertKeys,
            idOrder = idOrder,
            extraProps = Map(epochProp -> s"$epochId@$now"),
            dropProps = stale,
            deleteKeyRows = Some(batch.where(isDel <=> true)))
        case None =>
          VersionedTable.upsertEqualityDelete(c, table, batch, upsertKeys,
            idOrder = idOrder,
            extraProps = Map(epochProp -> s"$epochId@$now"),
            dropProps = stale)
      }
      else
        VersionedTable.load(c, table, batch,
          upsertFields = upsertKeys, idOrder = idOrder, bucketBy = bucketBy,
          extraProps = Map(epochProp -> s"$epochId@$now"),
          dropProps = stale)
    }
    cleanupThrough(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanupThrough(epochId)

  /** Delete staging for every epoch ≤ `epochId` — the committed epoch's
    * own dir plus any crashed predecessor's strays. Best-effort: a
    * failure here leaves garbage for the next commit's sweep, never a
    * wrong table. */
  private def cleanupThrough(epochId: Long): Unit =
    try {
      val root = new Path(stagingRoot)
      val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(root)) {
        f.listStatus(root).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("epoch-") &&
            scala.util.Try(n.stripPrefix("epoch-").toLong).toOption
              .exists(_ <= epochId))
            f.delete(st.getPath, true)
        }
        if (f.listStatus(root).isEmpty) f.delete(root, true)
      }
    } catch { case _: java.io.IOException => () }
}

final class GraftStreamWriterFactory(
    owf: OutputWriterFactory, conf: SerializableConfiguration,
    schema: StructType, stagingRoot: String) extends StreamingDataWriterFactory
  with org.apache.spark.sql.connector.write.DataWriterFactory {

  /** Batch flavor (row-level replace writes): same staging, epoch 0. */
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId, 0L)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val path = s"$stagingRoot/epoch-$epochId/" +
      s"part-$partitionId-$taskId-${UUID.randomUUID()}.parquet"
    val attempt = new TaskAttemptID(
      new TaskID(new JobID(queryJobId(epochId), 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val tac = new TaskAttemptContextImpl(conf.value, attempt)

    new DataWriter[InternalRow] {
      // lazy: an empty partition never creates a file
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var n = 0L

      override def write(record: InternalRow): Unit = {
        if (writer == null) writer = owf.newInstance(path, schema, tac)
        writer.write(record)
        n += 1
      }

      /** Metadata-bearing writes (group-based row-level operations hand
        * (metadataRow, dataRow) pairs): the replace commit works from
        * the scanned-file SET, so the per-row metadata is not needed —
        * write the data row. */
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)

      override def commit(): WriterCommitMessage = {
        if (writer != null) writer.close()
        GraftStreamWrite.StagedFile(path, n)
      }

      override def abort(): Unit = {
        if (writer != null) writer.close()
        val p = new Path(path)
        p.getFileSystem(conf.value).delete(p, false)
      }

      override def close(): Unit = ()
    }
  }

  private def queryJobId(epochId: Long): String =
    s"graft-stream-$epochId"
}
