package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based document quality scoring with FROZEN learned weights — the
  * FineWeb-edu / DCLM-style gate: a linear classifier over hashed
  * unigram+bigram features, trained offline and frozen as literals (the
  * BpeMerges / IvfCentroids pattern), scored as one codegen projection.
  * Complements the rule gates (Gopher/C4) and frequency proxies
  * (typicality, DSIR) with learned weights.
  *
  * Design for cross-engine determinism and 100 TB scale:
  *   - Features: [[PortableHash.hmod]] of each lowercased whitespace token
  *     and each adjacent-token bigram, folded into `numBuckets` buckets —
  *     the fastText/hashing-trick feature space, identical in Spark, the
  *     DuckDB oracle, and the JVM training twin.
  *   - Weights are INTEGER ppm (floor(w · 1e6)): the score is an integer
  *     sum, bit-exact across engines — no double aggregation anywhere.
  *   - Scoring is a scan-side projection (no shuffle, no UDF): at 100 TB
  *     the gate runs at scan speed like the rule filters it composes with.
  *   - Training ([[train]]) is deterministic full-batch logistic
  *     regression, run ONCE offline on a labeled sample (driver-side —
  *     the model is O(numBuckets), the corpus never trains in-band); the
  *     frozen result ships as source (graft.queries.QualityWeights).
  */
object QualityClassifier {

  /** Adjacent-token bigrams ("a b") of a BOUND token-array column (a
    * lambda variable — never a raw expression, see [[logitPpm]]).
    * Guarded: Spark's `sequence(1, 0)` is DESCENDING, not empty. */
  private def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))

  /** The integer-ppm logit of `text` as ONE self-contained expression.
    * The token array is LET-BOUND via the single-element-transform trick
    * (the [[graft.operators.Dedup.shingles]] pattern): a lambda variable
    * is a bound VALUE, so tokenization runs once per row NO MATTER how
    * Catalyst collapses surrounding projections — a `withColumn` binding
    * is NOT enough, because CollapseProject inlines it back into every
    * reference and the per-index bigram lambda would then re-run the
    * regex split per bigram (the measured O(n²) pipeline blowup). */
  def logitPpm(text: Column, weightsPpm: Seq[Long], biasPpm: Long): Column = {
    val numBuckets = weightsPpm.length
    val wLit = typedLit(weightsPpm)
    val bucketWeight = (f: Column) =>
      element_at(wLit, (PortableHash.hmod(f) % numBuckets + 1).cast("int"))
    val toks = filter(split(lower(coalesce(text, lit(""))), "\\s+"),
      t => t =!= lit(""))
    element_at(transform(array(toks), ws =>
      (lit(biasPpm) + aggregate(concat(ws, bigramsOf(ws)), lit(0L),
        (acc, f) => acc + bucketWeight(f))).cast(LongType)), 1)
  }

  /** Score `textCol` against frozen ppm weights: emits
    * `quality_logit_ppm` (long) and `quality_keep` (logit ≥ 0). */
  def withQualityScore(df: DataFrame, textCol: String,
                       weightsPpm: Seq[Long], biasPpm: Long): DataFrame =
    df.withColumn("quality_logit_ppm",
        logitPpm(col(textCol), weightsPpm, biasPpm))
      .withColumn("quality_keep", col("quality_logit_ppm") >= 0L)

  /** DuckDB twin of [[withQualityScore]]'s logit over a word-list SQL
    * fragment `w` (the caller supplies the same whitespace tokenization the
    * Spark side uses): an integer-ppm sum against the same weight list. */
  def logitPpmSql(w: String, weightsPpm: Seq[Long], biasPpm: Long): String = {
    val numBuckets = weightsPpm.length
    val wList = weightsPpm.mkString("[", ", ", "]")
    val bg = s"CASE WHEN len($w) < 2 THEN CAST([] AS VARCHAR[]) " +
      s"ELSE list_transform(range(1, len($w)), i -> $w[i] || ' ' || $w[i + 1]) END"
    val wt = (f: String) => s"($wList)[(${PortableHash.hmodSql(f)} % $numBuckets) + 1]"
    s"CAST($biasPpm + coalesce(list_sum(list_transform(" +
      s"list_concat($w, $bg), f -> ${wt("f")})), 0) AS BIGINT)"
  }

  /** JVM twin of the feature extraction — bit-identical bucketing
    * ([[PortableHash.hmodJvm]]) for offline training. */
  def featureBucketsJvm(text: String, numBuckets: Int): Seq[Int] = {
    val toks = Option(text).getOrElse("").toLowerCase
      .split("\\s+").filter(_.nonEmpty).toSeq
    val bigrams = if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(p => p(0) + " " + p(1)).toSeq
    (toks ++ bigrams).map(f => (PortableHash.hmodJvm(f) % numBuckets).toInt)
  }

  /** Deterministic full-batch logistic regression over hashed features:
    * fixed example order, fixed epoch count, no randomness — retraining on
    * the same sample reproduces the same weights. Returns (weightsPpm,
    * biasPpm) floored to integer ppm, ready to freeze as literals.
    * Labels: 1 = keep, 0 = drop.
    */
  def train(examples: Seq[(String, Int)], numBuckets: Int,
            epochs: Int = 200, lr: Double = 0.5): (Seq[Long], Long) = {
    require(numBuckets >= 1 && examples.nonEmpty)
    val feats = examples.map { case (t, y) =>
      (featureBucketsJvm(t, numBuckets), y.toDouble) }
    val w = new Array[Double](numBuckets)
    var b = 0.0
    val n = feats.size.toDouble
    var e = 0
    while (e < epochs) {
      val gw = new Array[Double](numBuckets)
      var gb = 0.0
      feats.foreach { case (fs, y) =>
        var z = b
        fs.foreach(f => z += w(f))
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        gb += err
        fs.foreach(f => gw(f) += err)
      }
      var i = 0
      while (i < numBuckets) { w(i) -= lr * gw(i) / n; i += 1 }
      b -= lr * gb / n
      e += 1
    }
    (w.map(x => math.floor(x * 1e6).toLong).toSeq, math.floor(b * 1e6).toLong)
  }
}
