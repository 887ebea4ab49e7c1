package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) equi-join — the entity-resolution /
  * record-linkage operator a training-data pipeline uses to reconcile noisy
  * keys (author names, product titles, URLs with typos) across corpora.
  * Extension scope beyond the reference (easy-etl's `link` is exact-match
  * only, /root/reference/easy_etl/__init__.py:120-135).
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007, "Fast
  * Similarity Search in Large Dictionaries"): two strings within Levenshtein
  * distance d share at least one member of their d-deletion neighborhoods
  * (every string reachable by deleting ≤ d characters). So:
  *
  *   1. reduce each side to its DISTINCT strings (a dictionary — typically
  *      orders of magnitude smaller than the row count, and the step that
  *      bounds candidate fan-out: bucket size is distinct-strings-per-
  *      variant, never rows-per-variant);
  *   2. explode each dictionary into (variant, string) pairs — ≤ L^d + 1
  *      variants for a length-L string;
  *   3. equi-join the two variant streams on the variant (one shuffle);
  *   4. verify surviving candidate pairs with exact `levenshtein` — the
  *      blocking is LOSSLESS (the theorem guarantees recall 1.0), the
  *      verification removes false candidates;
  *   5. join string-level matches back to the original rows.
  *
  * At 100 TB this never goes quadratic: no cross join anywhere, candidate
  * cost is Σ_variant |L_v|·|R_v| over dictionary entries, and the verify is
  * a projection on the surviving pairs. Degenerate variants (e.g. the empty
  * string, shared by every length-≤d string) only blow up if the dictionary
  * holds many near-empty strings; `minLength` drops those rows up front
  * (documented contract: strings shorter than `minLength` don't participate).
  */
object FuzzyJoin {

  /** All strings obtained by deleting exactly one character of `c`
    * (empty array for the empty string). */
  private def del1(c: Column): Column =
    when(length(c) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(c)),
        i => concat(substr(c, lit(1), i - 1), substr(c, i + 1, length(c)))))

  /** The d-deletion neighborhood of `c` (the string itself plus every
    * distinct string reachable by deleting up to `d` characters).
    * d ∈ {1, 2}: d = 1 is the common typo radius; d = 2 squares the
    * variant count (L² per string) — still scan-local, but size the
    * dictionary accordingly. */
  def deletionVariants(c: Column, d: Int): Column = {
    require(d == 1 || d == 2, s"maxDist must be 1 or 2: $d")
    val v1 = concat(array(c), del1(c))
    val vs = if (d == 1) v1 else concat(v1, flatten(transform(del1(c), del1(_))))
    array_distinct(vs)
  }

  /** Fuzzy join `left` to `right` on Levenshtein(leftStr, rightStr) ≤
    * `maxDist`. Returns (leftId, rightId, dist), one row per matching row
    * pair (exact-equal strings match at dist 0). Rows whose string is
    * shorter than `minLength` never match (degenerate-variant guard). */
  def editDistanceJoin(left: DataFrame, leftId: String, leftStr: String,
                       right: DataFrame, rightId: String, rightStr: String,
                       maxDist: Int, minLength: Int = 3): DataFrame = {
    require(minLength > maxDist, s"minLength ($minLength) must exceed maxDist ($maxDist)")
    def variants(df: DataFrame, strCol: String, out: String): DataFrame =
      df.where(length(col(strCol)) >= minLength)
        .select(col(strCol).as(out)).distinct()
        .select(col(out), explode(deletionVariants(col(out), maxDist)).as("__v"))
    val lv = variants(left, leftStr, "__sl")
    val rv = variants(right, rightStr, "__sr")
    val cand = lv.join(rv, "__v").select("__sl", "__sr").distinct()
    // materialize dist once, then filter on the column: Catalyst does not
    // reliably CSE the O(L²) levenshtein across a Filter and a Project
    val verified = cand
      .select(col("__sl"), col("__sr"),
        levenshtein(col("__sl"), col("__sr")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
    left.select(col(leftId), col(leftStr).as("__sl"))
      .join(verified, "__sl")
      .join(right.select(col(rightId), col(rightStr).as("__sr")), "__sr")
      .select(col(leftId), col(rightId), col("dist"))
  }

  /** Best-match lookup (spell correction / canonicalization): for each left
    * string, the single right-side string within `maxDist` edits ranked by
    * (closest distance, highest `weightCol`, lexicographic) — e.g. correct
    * a typo'd token to the most frequent vocabulary word one edit away.
    * Returns (leftId, suggestion, dist, weightCol); left rows with no
    * match within the radius are absent. Same blocking/scale properties as
    * [[editDistanceJoin]]; the rank window partitions by the left id over
    * its (few) candidates only.
    */
  def bestMatch(left: DataFrame, leftId: String, leftStr: String,
                right: DataFrame, rightStr: String, weightCol: String,
                maxDist: Int, minLength: Int = 3): DataFrame = {
    val r = right.select(col(rightStr).as("__cand"), col(rightStr).as("__rs"),
      col(weightCol).as("__w"))
    val pairs = editDistanceJoin(left, leftId, leftStr,
      r.select("__cand", "__rs"), "__cand", "__rs", maxDist, minLength)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(leftId))
      .orderBy(col("dist").asc, col("__w").desc, col("__cand").asc)
    pairs.join(r.select(col("__cand"), col("__w")).distinct(), Seq("__cand"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(leftId), col("__cand").as("suggestion"), col("dist"),
        col("__w").as(weightCol))
  }
}
