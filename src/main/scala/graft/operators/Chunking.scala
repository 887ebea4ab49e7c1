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
                  chunkSize: Int, stride: Int): DataFrame =
    // NULL text behaves as empty: tokens(NULL) is NULL and explode would
    // silently DROP the row, breaking the every-row-represented contract
    tokenChunksOf(df, idCol,
      TextAnalysis.tokens(coalesce(col(textCol), lit(""))), chunkSize, stride)

  /** [[tokenChunks]] over an arbitrary token-array expression — the unit a
    * window counts in is the caller's choice: whitespace words, learned
    * BPE subwords ([[graft.functions.Bpe.tokens]]), sentences. The token
    * expression must be NULL-safe (evaluate to an array on every row). */
  def tokenChunksOf(df: DataFrame, idCol: String, toks0: org.apache.spark.sql.Column,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    // bind the token expression ONCE: n appears three times in the window
    // arithmetic, and a heavy tokenizer (BPE's replace fold) must not
    // re-evaluate per mention
    val bound = df.select(col(idCol), toks0.as("__toks"))
    val toks = col("__toks")
    val n = size(toks).cast(LongType)
    // last start = ceil(max(n - chunkSize, 0) / stride) * stride, 0-based
    val m = greatest(n - chunkSize, lit(0L))
    val lastStart = floor((m + stride - 1) / lit(stride.toLong)).cast(LongType) * stride
    bound.select(col(idCol), toks,
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
    * the parallelism knob. The per-shard walk is a typed `flatMapGroups`
    * (one of the rare genuinely-imperative per-group computations this
    * codebase allows itself): O(s log s) for the in-memory id sort, O(s)
    * for the walk, streaming output. A shard's (id, n) pairs must fit in
    * one task's memory — 16 bytes/doc, so even 10M-doc shards are ~160 MB;
    * size numShards accordingly at 100 TB. Shard count never changes any
    * shard's own packing.
    *
    * Emits (idCol, n_tokens, shard, pack, pack_pos): pack ids count from 0
    * within each shard; pack_pos is the document's position in its pack.
    *
    * Contract: `idCol` must be an integral column — the walk order is the
    * NUMERIC id order (2 before 10, where a string sort would interleave).
    * Rejected eagerly rather than silently cast: a string id would cast to
    * NULL and crash the typed encoder mid-job.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, numShards: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"packSequences requires an integral id column; '$idCol' is $idType " +
        "(map a surrogate long id first, e.g. via Loader's id column)")
    val spark = df.sparkSession
    import spark.implicits._
    val shard = PortableHash.hmod(col(idCol).cast("string")) % numShards
    df.select(col(idCol).cast(LongType), col(nTokensCol).cast(LongType),
        shard.cast(LongType))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shardId: Long, it: Iterator[(Long, Long, Long)]) =>
        val docs = it.toArray.sortBy(_._1)
        var pack = 0L
        var used = 0L
        var pos = 0L
        docs.iterator.map { case (id, n, _) =>
          if (used + n > budget && used > 0) { pack += 1; used = n; pos = 1 }
          else { used += n; pos += 1 }
          (id, n, shardId, pack, pos)
        }
      }
      .toDF(idCol, "n_tokens", "shard", "pack", "pack_pos")
  }
}
