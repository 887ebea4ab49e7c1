package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CCNet-style reference-LM perplexity scoring against FROZEN statistics
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data" §4.3) — score every document by how
  * likely its token transitions are under a language model trained ONCE
  * on a reference corpus (CCNet: a Wikipedia KenLM), then band the corpus
  * into head / middle / tail by the reference distribution's terciles.
  *
  * This is the third and strongest member of the perplexity-proxy family:
  *   - [[graft.operators.TextAnalysis.corpusTypicality]] — unigram,
  *     self-referential (scores against the scored corpus itself);
  *   - [[graft.operators.TextAnalysis.bigramTypicality]] — transition
  *     probabilities, still self-referential, three shuffles;
  *   - THIS — a frozen EXTERNAL reference model: the semantics CCNet
  *     actually uses (quality = "looks like the target domain", not
  *     "looks like the average of the crawl"), and because the model
  *     ships as a literal, scoring is a ZERO-SHUFFLE scan projection —
  *     at 100 TB the gate runs at scan speed, where the self-referential
  *     proxies pay corpus-wide aggregations.
  *
  * Cross-engine determinism: bucketed bigrams via [[PortableHash.hmod]],
  * per-bucket negative log-probs as FROZEN e6 integers (the ln happened
  * once, offline — no libm in either engine), per-doc score = integer
  * mean. Bit-identical in Spark and the DuckDB oracle.
  */
object NgramLm {

  /** Exact integer division (Spark's `DIV`) as a composable Column — both
    * operands are non-negative here, so it matches DuckDB `//` bit-for-bit
    * (a double `/` + floor would be subject to rounding at the margin). */
  private def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Adjacent-token bigrams of a BOUND token-array lambda variable (the
    * [[QualityClassifier.logitPpm]] let-binding pattern). */
  private def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))

  /** Per-document mean negative log-prob (e6 integer) of `text` under the
    * frozen bucketed-bigram model — ONE self-contained, let-bound codegen
    * expression (tokenization runs once per row regardless of projection
    * collapse). NULL for documents with < 2 tokens (no transitions to
    * score). Lower = more reference-like. */
  def nllE6(text: Column, nllByBucket: Seq[Long]): Column = {
    val numBuckets = nllByBucket.length
    val nllLit = typedLit(nllByBucket)
    val bucketNll = (f: Column) =>
      element_at(nllLit, (PortableHash.hmod(f) % numBuckets + 1).cast("int"))
    val toks = filter(split(lower(coalesce(text, lit(""))), "\\s+"),
      t => t =!= lit(""))
    element_at(transform(array(toks), ws =>
      when(size(ws) < 2, lit(null).cast(LongType))
        .otherwise(intDiv(aggregate(bigramsOf(ws), lit(0L),
          (acc, f) => acc + bucketNll(f)), (size(ws) - 1).cast(LongType)))), 1)
  }

  /** CCNet band of a (possibly NULL) e6 score against frozen tercile
    * cuts: 'head' (most reference-like) / 'middle' / 'tail' /
    * 'unscored' (< 2 tokens). */
  def band(scoreE6: Column, headMaxE6: Long, middleMaxE6: Long): Column =
    when(scoreE6.isNull, lit("unscored"))
      .when(scoreE6 <= headMaxE6, lit("head"))
      .when(scoreE6 <= middleMaxE6, lit("middle"))
      .otherwise(lit("tail"))

  /** Score `textCol` against the frozen model: emits `lm_nll_e6` (long,
    * NULL when unscorable) and `ppl_band` (head/middle/tail/unscored). */
  def withPerplexity(df: DataFrame, textCol: String, nllByBucket: Seq[Long],
                     headMaxE6: Long, middleMaxE6: Long): DataFrame =
    df.withColumn("lm_nll_e6", nllE6(col(textCol), nllByBucket))
      .withColumn("ppl_band",
        band(col("lm_nll_e6"), headMaxE6, middleMaxE6))

  /** DuckDB twin of [[nllE6]] over a word-list SQL fragment `w` (caller
    * supplies the shared tokenization): integer mean of the same frozen
    * per-bucket values. Integer division semantics match: both operands
    * are non-negative, so DuckDB `//` (floor) equals Spark's truncating
    * long division. */
  def nllE6Sql(w: String, nllByBucket: Seq[Long]): String = {
    val numBuckets = nllByBucket.length
    val nllList = nllByBucket.mkString("[", ", ", "]")
    val bg = s"CASE WHEN len($w) < 2 THEN CAST([] AS VARCHAR[]) " +
      s"ELSE list_transform(range(1, len($w)), i -> $w[i] || ' ' || $w[i + 1]) END"
    val v = (f: String) => s"($nllList)[(${PortableHash.hmodSql(f)} % $numBuckets) + 1]"
    s"CASE WHEN len($w) < 2 THEN NULL ELSE CAST(" +
      s"list_sum(list_transform($bg, f -> ${v("f")})) // (len($w) - 1) AS BIGINT) END"
  }

  /** DuckDB twin of [[band]] over an e6-score SQL fragment. */
  def bandSql(score: String, headMaxE6: Long, middleMaxE6: Long): String =
    s"CASE WHEN $score IS NULL THEN 'unscored' " +
      s"WHEN $score <= $headMaxE6 THEN 'head' " +
      s"WHEN $score <= $middleMaxE6 THEN 'middle' ELSE 'tail' END"
}
