package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** Document chunking for context-length-bounded consumers (RAG indexing,
  * fixed-window pretraining examples). Extension scope beyond the reference
  * (easy-etl has no text operators at all).
  *
  * Everything here is a projection + explode — no shuffle, no state: a
  * chunking pass over 100 TB runs at scan speed and parallelizes per file
  * split, and the explode multiplies rows AFTER column pruning (only the
  * text column is read).
  */
object Chunking {

  /** Sliding token windows of `chunkSize` tokens every `stride` tokens
    * (overlap = chunkSize − stride). Windows start at multiples of
    * `stride`; the first window reaching the document's end is the last
    * and may carry fewer than `chunkSize` tokens — coverage is complete,
    * no token is dropped. An empty/whitespace document yields one empty
    * chunk (chunk_id 0), so every input row is represented downstream.
    *
    * Emits (idCol, chunk_id, n_chunk_tokens, chunk_text); tokens are the
    * whitespace tokens of the lowercased text ([[TextAnalysis.tokens]]).
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast(LongType)
    // last start = ceil(max(n - chunkSize, 0) / stride) * stride, 0-based
    val m = greatest(n - chunkSize, lit(0L))
    val lastStart = floor((m + stride - 1) / lit(stride.toLong)).cast(LongType) * stride
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0L), lastStart, lit(stride.toLong))).as("__s"))
      .select(col(idCol),
        floor(col("__s") / lit(stride.toLong)).cast(LongType).as("chunk_id"),
        slice(col("__toks"), (col("__s") + 1).cast("int"), lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).cast(LongType).as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Greedy sequence packing: assign documents to training sequences under
    * a token `budget` — walk documents in id order, appending to the
    * current pack until the next document would overflow, then open a new
    * pack (first-fit-contiguous; a document larger than the budget gets a
    * pack of its own). The batch-construction step of an LLM training
    * pipeline: wasted pad tokens ≈ the tail of each pack, with a stable,
    * engine-reproducible assignment (no RNG, no partition dependence).
    *
    * Packing is inherently sequential, so the corpus is first split into
    * `numShards` portable-hash shards and each shard packs independently —
    * the parallelism/packing-quality knob. At 100 TB pick shards of a few
    * hundred MB of token counts: the per-shard walk is one higher-order
    * `aggregate` over a collected (id, n) list, so a shard must fit in one
    * task's memory — millions of shards is the intended shape, and shard
    * count does not change any shard's own packing.
    *
    * Emits (idCol, n_tokens, shard, pack, pack_pos): pack ids count from 0
    * within each shard; pack_pos is the document's position in its pack.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, numShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    val shard = PortableHash.hmod(col(idCol).cast("string")) % numShards
    val grouped = df
      .select(col(idCol).cast(LongType).as("__id"),
        col(nTokensCol).cast(LongType).as("__n"), shard.as("shard"))
      .groupBy(col("shard"))
      .agg(array_sort(collect_list(struct(col("__id").as("id"), col("__n").as("n"))))
        .as("__items"))
    val init = struct(lit(0L).as("pack"), lit(0L).as("used"),
      array().cast("array<struct<id:bigint,n:bigint,pack:bigint>>").as("out"))
    val walked = aggregate(col("__items"), init,
      (acc, x) => {
        val overflow = (acc.getField("used") + x.getField("n") > budget) &&
          (acc.getField("used") > 0)
        val pack = when(overflow, acc.getField("pack") + 1)
          .otherwise(acc.getField("pack"))
        val used = when(overflow, x.getField("n"))
          .otherwise(acc.getField("used") + x.getField("n"))
        struct(pack.as("pack"), used.as("used"),
          concat(acc.getField("out"),
            array(struct(x.getField("id").as("id"), x.getField("n").as("n"),
              pack.as("pack")))).as("out"))
      },
      acc => acc.getField("out"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("pack")).orderBy(col(idCol))
    grouped.select(col("shard"), explode(walked).as("__e"))
      .select(col("__e.id").as(idCol), col("__e.n").as("n_tokens"),
        col("shard"), col("__e.pack").as("pack"))
      .withColumn("pack_pos", row_number().over(w).cast(LongType))
  }
}
