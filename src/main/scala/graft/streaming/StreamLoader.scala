package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.etl.{Catalog, Loader, MaterializedAgg}

/** Streaming → ETL-target integration: a `writeStream` sink that lands each
  * micro-batch through [[Loader.load]], so streams compose with the batch
  * ETL API — same parquet table layout, surrogate ids continuing across
  * batches AND across batch/stream loads, schema evolution, atomic swap.
  * (The reference is batch-only by design; extension scope.)
  *
  * Delivery semantics: the checkpoint gives at-least-once batch redelivery
  * after a restart — a replayed batch APPENDS again. For effectively-
  * exactly-once, pass `upsertFields` on a business key: the replayed rows
  * merge onto their previous load instead of duplicating.
  *
  * Scale: each micro-batch is one distributed Loader write (O(batch) on
  * the append fast path); state lives in the stream's own operators, not
  * the sink. An UPSERTING stream sink was the remaining O(table)-per-batch
  * shape: pass `partitionBy` (with `upsertFields` ⊇ the partition column)
  * and each micro-batch's merge partition-scopes — only the partitions the
  * batch touches are read and swapped, so a continuously-upserting stream
  * stops rewriting the table every trigger.
  */
object StreamLoader {

  def streamInto(stream: DataFrame, tgt: Catalog, table: String,
                 checkpointDir: String,
                 idOrder: Seq[String] = Nil,
                 upsertFields: Seq[String] = Nil,
                 partitionBy: Seq[String] = Nil,
                 targetFileBytes: Option[Long] = None,
                 bucketBy: Option[(Seq[String], Int)] = None): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Loader.load(tgt, table, batch,
          upsertFields = upsertFields, idOrder = idOrder,
          partitionBy = partitionBy, targetFileBytes = targetFileBytes,
          bucketBy = bucketBy)
      }
      .start()

  /** Stream → incrementally-maintained aggregate view: every micro-batch
    * folds into a persistent GROUP BY table via [[MaterializedAgg.refresh]]
    * — O(batch) maintenance per trigger where a recompute-the-dashboard
    * sink would rescan the whole history every trigger. The streaming twin
    * of the batch matview: a continuously-updated rollup (events per
    * (day, type), tokens per source, …) over an unbounded stream with NO
    * stream-side state — the view table IS the state, swapped atomically
    * each trigger, readable by any batch consumer mid-stream.
    *
    * Delivery: checkpointed at-least-once batch redelivery means a REPLAYED
    * batch would double-count into sums — run with a deterministic trigger
    * boundary source (files, kafka offsets) and idempotent restarts at
    * batch granularity, or route through [[streamInto]] + periodic batch
    * refresh when exact replay-dedup matters.
    */
  def streamIntoView(stream: DataFrame, tgt: Catalog, view: String,
                     checkpointDir: String,
                     groupBy: Seq[String],
                     aggs: Seq[MaterializedAgg.AggCol]): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          MaterializedAgg.refresh(tgt, view, batch, groupBy, aggs)
      }
      .start()
}
