package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Keyword search over a document corpus: BM25-shaped relevance scoring for
  * a literal query-term list, returning the global top-k documents.
  * Extension scope beyond the reference (no search surface in easy-etl).
  *
  * The scoring function is BM25's term-frequency saturation and document-
  * length normalization (Robertson/Spärck Jones; k1, b parameters) with one
  * deliberate substitution: idf = (N − df + 0.5)/(df + 0.5) — BM25's idf
  * WITHOUT the final ln(·). The logarithm is a monotone transform of a
  * per-term constant, so per-term score ORDER is unchanged; what it would
  * change is cross-engine determinism, because libm log bits differ between
  * engines while +,·,/ on doubles are IEEE-exact. Same determinism-over-
  * textbook-form trade recorded at [[TextAnalysis.topTerms]]. For a
  * multi-term query the mix across terms differs from ln-BM25 (rare terms
  * weigh relatively heavier); the weighting is documented, deterministic,
  * and rank-sensible — that is the contract here.
  *
  * Scale design: query terms are LITERALS, so per-document tf needs no
  * explode/shuffle — tf and dl are one codegen projection over the text
  * column. Corpus statistics (N, Σdl, per-term df) are ONE aggregation to a
  * single row, broadcast back. The only data movement for scoring 100 TB is
  * that one stats row; the top-k is a TakeOrdered (per-partition heap + k-row
  * driver merge), never a global sort or single-partition window.
  */
object Search {

  /** BM25-shaped top-k: (idCol, rank, score) for the `k` highest-scoring
    * documents matching ≥ 1 term (score > 0), ties broken by id. */
  def keywordTopK(df: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k >= 1, s"k must be >= 1: $k")
    // NULL text must score as an empty document, not poison the corpus
    // stats: size(tokens(NULL)) would contribute a NULL/-1 __dl into
    // N/sumdl/avgdl and skew EVERY document's score.
    val toks = TextAnalysis.tokens(coalesce(col(textCol), lit("")))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast(LongType).as(s"__tf$i")
    }
    val baseCols = Seq(col(idCol), size(toks).cast(LongType).as("__dl")) ++ tfCols
    val base = df.select(baseCols: _*)
    // all-integer aggregates (exact, order-independent): doubles only enter
    // in the final per-row projection, where association order is fixed
    val dfCols = terms.indices.map { i =>
      sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")
    }
    val aggCols = Seq(count(lit(1)).as("__n"), sum("__dl").as("__sumdl")) ++ dfCols
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val j = base.crossJoin(broadcast(stats))
    val nD = col("__n").cast(DoubleType)
    val avgdl = col("__sumdl").cast(DoubleType) / nD
    val dlD = col("__dl").cast(DoubleType)
    val score = terms.indices.map { i =>
      val tfD = col(s"__tf$i").cast(DoubleType)
      val dfD = col(s"__df$i").cast(DoubleType)
      val idf = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
      idf * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / avgdl)))
    }.reduce(_ + _)
    val scored = j.select(col(idCol), score.as("score")).where(col("score") > 0)
    val top = scored.orderBy(col("score").desc, col(idCol).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast(LongType))
      .select(col(idCol), col("rank"), col("score"))
  }

  /** The DuckDB spelling of [[keywordTopK]] over table `src(id, text)` —
    * identical constants (interpolated from the same Scala doubles) and
    * identical double association order, so scores match bit-for-bit. The
    * caller selects from relation `topk(id, rank, score)`. */
  def keywordTopKSql(src: String, id: String, textTok: String,
                     terms: Seq[String], k: Int,
                     k1: Double = 1.2, b: Double = 0.75): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      val esc = t.replace("'", "''") // SQL string literal escaping
      s"CAST(len(list_filter(w, x -> x = '$esc')) AS BIGINT) AS tf$i"
    }.mkString(",\n  ")
    val dfs = terms.indices.map { i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val score = terms.indices.map { i =>
      s"((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))" +
        s" * (CAST(tf$i AS DOUBLE) * ${k1 + 1.0})" +
        s" / (CAST(tf$i AS DOUBLE) + $k1 * (${1.0 - b} + $b *" +
        s" (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))"
    }.mkString("(", " + ", ")")
    s"""base AS (SELECT $id AS id, CAST(len(w) AS BIGINT) AS dl,
       |  $tfs
       |  FROM (SELECT $id, $textTok AS w FROM $src)),
       |st AS (SELECT count(*) AS n, sum(dl) AS sumdl, $dfs FROM base),
       |sc AS (SELECT id, $score AS score FROM base CROSS JOIN st),
       |topk AS (SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS rank, score
       |         FROM sc WHERE score > 0 ORDER BY score DESC, id ASC LIMIT $k)"""
      .stripMargin
  }
}
