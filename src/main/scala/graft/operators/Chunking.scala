package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
}
