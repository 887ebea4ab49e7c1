package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.functions.PortableHash
import graft.functions.PortableHash.{P, e9, e9Sql, hmodSql}
import graft.operators.{Dedup, TextAnalysis, VectorSimilarity}

/** Oracle-checked queries for the training-data extension operators
  * (SURVEY.md §7.5 item 6): text analysis, dedup (exact / n-gram Jaccard /
  * MinHash+LSH / SimHash / embedding-cosine), and similarity search
  * (brute-force + LSH top-k) over the driver's `documents` and `embeddings`
  * tables.
  *
  * Cross-engine determinism rules (verified empirically against the
  * driver's DuckDB 1.0.0 — see [[PortableHash]]):
  *   - all hashing goes through the portable md5-prefix hash;
  *   - all derived constants (MinHash permutations, LSH hyperplanes) are
  *     computed ONCE in Scala and interpolated into both engines' plans;
  *   - double arithmetic is written with identical association order in
  *     both engines (bit-exact empirically) and exported via the exact
  *     fixed-point projection [[PortableHash.e9]], never decimal round();
  *   - int-typed outputs are cast to BIGINT on both sides.
  *
  * The synthetic corpus has no natural duplicates, so dedup queries build
  * deterministic duplicate/near-duplicate copies in-query (same
  * construction in both engines): exact copies at doc_id+100000, near
  * copies (first two tokens dropped) at doc_id+200000, scaled embedding
  * copies at vec_id+100000.
  */
object TrainingDataQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** documents ∪ near-dup copies (every `everyN`th doc, first 2 tokens
    * dropped, id + 200000). */
  private def nearDupCorpus(d: DataFrame, everyN: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val near = d.where(col("doc_id") % everyN === 0)
      .select((col("doc_id") + lit(200000L)).as("doc_id"),
        concat_ws(" ", slice(toks, lit(3), size(toks))).as("text"))
    d.select("doc_id", "text").unionByName(near)
  }

  val queries: Map[String, Q] = Map(

    // ---- text analysis ---------------------------------------------------

    "q_text_stats" -> { (spark, sfDir) =>
      TextAnalysis.withStats(docs(spark, sfDir), "text", BpeMerges.Merges)
        .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"),
          col("n_bpe_tokens"),
          e9(col("avg_token_len")).as("avg_token_len_e9"),
          e9(col("alpha_ratio")).as("alpha_ratio_e9"),
          e9(col("stopword_ratio")).as("stopword_ratio_e9"),
          e9(col("quality_score")).as("quality_score_e9"))
        .orderBy("doc_id")
    },

    "q_text_langid" -> { (spark, sfDir) =>
      TextAnalysis.withLangId(docs(spark, sfDir), "text")
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          e9(col("pred_lang_score")).as("score_e9"))
        .orderBy("doc_id")
    },

    "q_text_fingerprint" -> { (spark, sfDir) =>
      docs(spark, sfDir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    "q_text_topterms" -> { (spark, sfDir) =>
      TextAnalysis.topTerms(docs(spark, sfDir), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")
    },

    "q_text_repetition" -> { (spark, sfDir) =>
      TextAnalysis.repetitionStats(docs(spark, sfDir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("max_tf"),
          e9(col("top_token_ratio")).as("top_token_ratio_e9"),
          e9(col("dup_2gram_ratio")).as("dup_2gram_ratio_e9"))
        .orderBy("doc_id")
    },

    // PII pass: the synthetic corpus carries no PII, so every 25th doc gets
    // a deterministic contact blurb appended in-query (same construction in
    // the oracle); counts + redacted text must match byte-for-byte
    "q_text_pii" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir).select(col("doc_id"),
        when(col("doc_id") % 25 === 0,
          concat(col("text"), lit(" contact bob@example.com or visit " +
            "https://example.com/a?b=1 or call +1 (555) 123-4567 now")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withPiiStats(d, "text")
        .select("doc_id", "n_emails", "n_urls", "n_phones", "redacted")
        .orderBy("doc_id")
    },

    // exact heavy hitters over the token stream (vocabulary hot-list):
    // Misra-Gries candidates + exact verification — the answer is EXACT,
    // the shuffle is bounded by the candidate set, never the vocabulary
    "q_heavy_hitters" -> { (spark, sfDir) =>
      val toks = docs(spark, sfDir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      graft.operators.FrequentItems.heavyHittersBySupport(toks, "token", support = 0.005)
        .orderBy("item")
    },

    // license/copyright compliance gate: CC / code-license / rights-
    // reserved / dated-copyright signals + the open-wins class fold; the
    // fixture corpus carries no notices, so deterministic ones are injected
    // on doc_id residues (the oracle injects the same)
    "q_license_gate" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir).select("doc_id", "text")
      val noised = d.withColumn("text",
        when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" © 2023 example corp. all rights reserved")))
          .when(col("doc_id") % 11 === 1,
            concat(col("text"), lit(" released under the mit license")))
          .when(col("doc_id") % 11 === 2,
            concat(col("text"),
              lit(" licensed cc by-sa — see creativecommons.org/licenses")))
          .when(col("doc_id") % 11 === 3,
            concat(col("text"), lit(" copyright (c) 1998 the authors")))
          .when(col("doc_id") % 11 === 4,
            concat(col("text"),
              lit(" distributed under the apache license, all rights reserved")))
          .otherwise(col("text")))
      TextAnalysis.withLicenseFlags(noised, "text")
        .select("doc_id", "license_cc", "license_open_code",
          "license_rights_reserved", "license_copyright",
          "license_class", "license_keep")
        .orderBy("doc_id")
    },

    // count-min sketch: frequency estimates for the hot vocabulary from a
    // d×w counter matrix built in ONE partial aggregation whose key domain
    // is ≤ d·w cells — a 100 TB token stream shuffles kilobytes where exact
    // counting shuffles the vocabulary; estimates are provably ≥ exact
    // (both columns in the result so the bound is visible)
    "q_sketch_countmin" -> { (spark, sfDir) =>
      import graft.operators.CountMin
      val toks = docs(spark, sfDir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val sk = CountMin.sketch(toks, "token", d = 4, w = 2048)
      val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .where(col("exact_cnt") >= 500)
      CountMin.estimates(sk, exact.select("token"), "token", d = 4, w = 2048)
        .join(exact, Seq("token"))
        .select(col("token"), col("exact_cnt"), col("cms_count"))
        .orderBy("token")
    },

    // ---- dedup -----------------------------------------------------------

    "q_dedup_exact" -> { (spark, sfDir) =>
      val base = docs(spark, sfDir).select("doc_id", "text", "lang")
      val copies = base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(100000L)).as("doc_id"), col("text"), col("lang"))
      Dedup.exact(base.unionByName(copies), Seq("text"), "doc_id")
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // URL-keyed dedup — the FIRST pass of a web pipeline: casing, www,
    // tracking params, fragments, and trailing slashes canonicalize away,
    // then exact dedup on the canonical URL keeps the min-id fetch
    "q_dedup_url" -> { (spark, sfDir) =>
      val url = concat(
        when(col("doc_id") % 3 === 0, lit("HTTP://WWW.")).otherwise(lit("http://")),
        lit("example.com/page/"), (col("doc_id") % 40).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/?utm_source=feed#top"))
          .otherwise(lit("")))
      val withUrl = docs(spark, sfDir)
        .select(col("doc_id"), TextAnalysis.canonicalUrl(url).as("curl"))
      Dedup.exact(withUrl, Seq("curl"), "doc_id")
        .select("doc_id", "curl").orderBy("doc_id")
    },

    // URL/domain blocklist gate: frozen blocklist, registrable-domain
    // suffix rule — subdomains of a blocked domain match, lookalike hosts
    // that merely CONTAIN the blocked string do not
    "q_domain_gate" -> { (spark, sfDir) =>
      val host = when(col("doc_id") % 5 === 0, lit("spam-ads.example"))
        .when(col("doc_id") % 5 === 1, lit("tracker.spam-ads.example"))
        .when(col("doc_id") % 5 === 2, lit("notspam-ads.example"))
        .when(col("doc_id") % 5 === 3, lit("WWW.News.Example.org"))
        .otherwise(lit("example.com"))
      val url = concat(lit("http://"), host, lit("/page/"),
        (col("doc_id") % 40).cast("string"))
      TextAnalysis.withDomainGate(
          docs(spark, sfDir).select(col("doc_id"), url.as("url")),
          "url", Seq("spam-ads.example", "casino.example"))
        .select("doc_id", "url_host", "blocked_by", "domain_keep")
        .orderBy("doc_id")
    },

    "q_dedup_ngram_jaccard" -> { (spark, sfDir) =>
      Dedup.jaccardPairs(nearDupCorpus(docs(spark, sfDir), 10), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), e9(col("jaccard")).as("jaccard_e9"))
        .orderBy("id_a", "id_b")
    },

    "q_dedup_minhash" -> { (spark, sfDir) =>
      Dedup.minHashPairs(nearDupCorpus(docs(spark, sfDir), 10), "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6)
        .select(col("id_a"), col("id_b"), e9(col("jaccard")).as("jaccard_e9"))
        .orderBy("id_a", "id_b")
    },

    "q_dedup_simhash" -> { (spark, sfDir) =>
      // full corpus: the 60-bit signature's 15-bit band keys (32768 per
      // band) keep buckets sparse even on this single-vocabulary corpus —
      // the 31-bit/byte-band predecessor needed a %5 subset here
      Dedup.simHashPairs(nearDupCorpus(docs(spark, sfDir), 10), "doc_id", "text",
          maxDist = 3)
        .orderBy("id_a", "id_b")
    },

    // wider Hamming radius via the configurable banding: 6 bands of 10 bits
    // (pigeonhole-complete for maxDist <= 5); %4 subset — radius 5 on this
    // correlated synthetic corpus yields ~quadratically more TRUE pairs
    // (the result itself is dense, not a candidate-generation artifact)
    "q_dedup_simhash_wide" -> { (spark, sfDir) =>
      val subset = docs(spark, sfDir).where(col("doc_id") % 4 === 0)
      Dedup.simHashPairs(nearDupCorpus(subset, 10), "doc_id", "text",
          maxDist = 5, bands = 6)
        .orderBy("id_a", "id_b")
    },

    // incremental ingest dedup: a NEW batch (every 10th doc, first two
    // tokens dropped, id+200000) pairs against the full corpus — per-batch
    // cost O(batch x bands), never corpus x corpus
    "q_dedup_incremental" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir).select("doc_id", "text")
      val toks = TextAnalysis.tokens(col("text"))
      val fresh = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(200000L)).as("doc_id"),
          concat_ws(" ", slice(toks, lit(3), size(toks))).as("text"))
      Dedup.minHashPairsAgainst(fresh, d, "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6)
        .select(col("new_id"), col("corpus_id"), e9(col("jaccard")).as("jaccard_e9"))
        .orderBy("new_id", "corpus_id")
    },

    // EXACT-substring duplication (Lee et al. 2021): rolling 8-token
    // windows hashed corpus-wide; a doc holding any duplicated >=8-token
    // run carries >= 1 duplicated window — the trim/drop signal
    "q_dedup_substrings" -> { (spark, sfDir) =>
      TextAnalysis.duplicatedWindowStats(
          docs(spark, sfDir).select("doc_id", "text"), "doc_id", "text",
          windowTokens = 8)
        .orderBy("doc_id")
    },

    // the exact-substring dedup ACTION: a 10-token footer injected into
    // every 5th doc; the rewrite strips it everywhere except the globally
    // FIRST occurrence (lowest doc, position), token counts reconcile
    "q_dedup_substrings_drop" -> { (spark, sfDir) =>
      val base = docs(spark, sfDir).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"),
            lit(" subscribe to our mailing list for daily updates and offers")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.dropDuplicatedWindows(base, "doc_id", "text", windowTokens = 8)
        .orderBy("doc_id")
    },

    // decontamination: the "benchmark" is built from leaked corpus excerpts
    // (first 12 tokens of every 50th doc — the realistic contamination
    // scenario); flag every training doc sharing a 6-gram with it
    "q_decontaminate" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir).select("doc_id", "text")
      val toks = TextAnalysis.tokens(col("text"))
      val probes = d.where(col("doc_id") % 50 === 0)
        .select(concat_ws(" ", slice(toks, 1, 12)).as("text"))
      Dedup.contaminatedIds(d, "doc_id", "text", probes, "text", n = 6)
        .orderBy("doc_id")
    },

    // the end-to-end dedup ACTION: near-dup clusters via MinHash pairs →
    // connected components → keep the canonical (min-id) doc per cluster,
    // over the FULL corpus (the near-dup edge set stays tiny, so the
    // oracle's recursive min-label CTE is cheap even at full scale)
    "q_dedup_drop" -> { (spark, sfDir) =>
      Dedup.dropNearDuplicates(nearDupCorpus(docs(spark, sfDir), 10), "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6)
        .select("doc_id").orderBy("doc_id")
    },

    // the SAME drop forced down the distributed path (maxDriverEdges = 0
    // disables the driver union-find): components come from the
    // large-star/small-star log-rounds algorithm, and the result must be
    // bit-identical to the driver-path q_dedup_drop (shared oracle)
    "q_dedup_drop_star" -> { (spark, sfDir) =>
      Dedup.dropNearDuplicates(nearDupCorpus(docs(spark, sfDir), 10), "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6,
          maxDriverEdges = 0)
        .select("doc_id").orderBy("doc_id")
    },

    // the pre-drop audit: corpus duplication totals from the same pair
    // pipeline q_dedup_drop acts on — group count, member count, rows a
    // drop would remove, and the ppm reduction
    "q_dedup_report" -> { (spark, sfDir) =>
      val corpus = nearDupCorpus(docs(spark, sfDir), 10)
      val pairs = Dedup.minHashPairs(corpus, "doc_id", "text",
        n = 3, numPerms = 16, bands = 4, threshold = 0.6)
      Dedup.dedupReport(corpus, "doc_id", pairs)
    },

    "q_dedup_embedding" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val copies = e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + lit(100000L)).as("vec_id"),
          transform(col("embedding"), x => (x * lit(1.5)).cast(FloatType)).as("embedding"))
      VectorSimilarity.cosineNearDupPairs(e.unionByName(copies), "vec_id", "embedding",
          threshold = 0.99, numPlanes = 6, dim = 64)
        .select(col("id_a"), col("id_b"), e9(col("cosine")).as("cosine_e9"))
        .orderBy("id_a", "id_b")
    },

    // SEMANTIC decontamination: "benchmark" embeddings (every 20th vector,
    // rescaled — same direction, so cosine 1 with its source) pair against
    // the training corpus WITHOUT a corpus self-join — the two-frame
    // embedding twin of q_dedup_incremental
    "q_decontaminate_semantic" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val bench = e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + lit(100000L)).as("vec_id"),
          transform(col("embedding"), x => (x * lit(1.5)).cast(FloatType)).as("embedding"))
      VectorSimilarity.cosineNearDupPairsAgainst(bench, e, "vec_id", "embedding",
          threshold = 0.99, numPlanes = 6, dim = 64)
        .select(col("new_id"), col("corpus_id"), e9(col("cosine")).as("cosine_e9"))
        .orderBy("new_id", "corpus_id")
    },

    // the generic drop ACTION over a NON-text pair source: embedding
    // near-dup pairs → components → keep the canonical vector per cluster
    "q_dedup_drop_embedding" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val copies = e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + lit(100000L)).as("vec_id"),
          transform(col("embedding"), x => (x * lit(1.5)).cast(FloatType)).as("embedding"))
      val corpus = e.unionByName(copies)
      val pairs = VectorSimilarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 6, dim = 64)
      Dedup.dropByPairs(corpus, "vec_id", pairs)
        .select("vec_id").orderBy("vec_id")
    },

    // SemDeDup (Abbas et al. 2023): k-means-cluster-scoped semantic dedup —
    // pairs searched only within a vector's assigned IVF cluster; per dup
    // group KEEP the member least similar to its centroid (ties → min id)
    "q_dedup_semdedup" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val copies = e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + lit(100000L)).as("vec_id"),
          transform(col("embedding"), x => (x * lit(1.5)).cast(FloatType)).as("embedding"))
      val corpus = e.unionByName(copies)
      val cents = VectorSimilarity.centroidFrame(spark, IvfCentroids.K8Sf001)
      // maxCluster lifted above any test SF's cluster sizes: the oracle's
      // recursive CTE enumerates ALL within-cluster pairs, so the Spark
      // side must run un-capped or the two diverge past the default guard
      VectorSimilarity.semDeDup(corpus, "vec_id", "embedding", cents, "cid", "cv",
          threshold = 0.99, maxCluster = 1 << 20)
        .select(col("vec_id"), col("cluster_id"),
          e9(col("centroid_cosine")).as("ccos_e9"))
        .orderBy("vec_id")
    },

    // int8 quantization: compare via scalar projections of the quantized
    // vector (rolling hash + sum) — deterministic integers, no array-typed
    // oracle columns
    "q_embed_quantize" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      VectorSimilarity.quantizeInt8(e, "embedding")
        .select(col("vec_id"),
          aggregate(col("embedding_q"), lit(0L),
            (acc, q) => (acc * 31L + q + 128L) % lit(P)).as("q_hash"),
          aggregate(col("embedding_q"), lit(0L), (acc, q) => acc + q).as("q_sum"),
          e9(col("embedding_scale")).as("scale_e9"))
        .orderBy("vec_id")
    },

    // ---- similarity search ----------------------------------------------

    "q_knn_bruteforce" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      VectorSimilarity.bruteForceTopK(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("cosine")).as("cosine_e9"))
        .orderBy("query_id", "rank")
    },

    // compressed-scoring ANN: the int8-quantized store scanned with exact
    // integer dot products + scale de-quantization — a quarter of the scan
    // bytes per candidate vs float32 (the V1 quantization put to work)
    "q_knn_int8" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val qz = VectorSimilarity.quantizeInt8(e, "embedding")
        .select("vec_id", "embedding_q", "embedding_scale")
      VectorSimilarity.int8TopK(qz, qz.where(col("vec_id") < 10),
          "vec_id", "embedding_q", "embedding_scale", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("score")).as("score_e9"))
        .orderBy("query_id", "rank")
    },

    "q_knn_lsh" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      VectorSimilarity.lshTopK(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, numPlanes = 6, dim = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("cosine")).as("cosine_e9"))
        .orderBy("query_id", "rank")
    },

    "q_knn_ivf" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      // KMeans-trained centroids ([[IvfCentroids]]: seeded spark-mllib
      // training, frozen as literals shared with the DuckDB oracle)
      val cents = VectorSimilarity.centroidFrame(spark, IvfCentroids.K8Sf001)
      VectorSimilarity.ivfTopK(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", cents, "cid", "cv", k = 3, nprobe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("cosine")).as("cosine_e9"))
        .orderBy("query_id", "rank")
    }
  )

  // ---- DuckDB oracle twins ----------------------------------------------

  /** Tokens of lowercased `c`, empties removed (DuckDB spelling of
    * [[TextAnalysis.tokens]]). */
  private[queries] def tok(c: String): String =
    s"""list_filter(regexp_split_to_array(lower($c), '${graft.operators.TextAnalysis.JavaWsSplitSql}'), x -> x <> '')"""

  /** documents ∪ near-dup copies, as a CTE body (DuckDB twin of
    * [[nearDupCorpus]]); `pred` restricts the base set. */
  private def nearDupCorpusSql(everyN: Int, pred: String = "TRUE"): String =
    s"""base AS (SELECT doc_id, text FROM documents WHERE $pred),
       |basew AS (SELECT doc_id, ${tok("text")} AS w FROM base),
       |corpus AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL
       |  SELECT doc_id + 200000, array_to_string(w[3:len(w)], ' ')
       |  FROM basew WHERE doc_id % $everyN = 0)""".stripMargin

  /** (doc_id, h) where h = distinct portable hashes of 3-gram shingles of
    * `corpus.text`. */
  private val shingleHashesSql: String =
    s"""cw AS (SELECT doc_id, ${tok("text")} AS w FROM corpus),
       |hs AS (SELECT doc_id, list_distinct(list_transform(
       |  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
       |                i -> array_to_string(w[i:i+2], ' '))),
       |  s -> ${hmodSql("s")})) AS h FROM cw)""".stripMargin

  private val jaccardSql: String =
    """CAST(len(list_filter(ha, x -> list_contains(hb, x))) AS DOUBLE)
      | / CAST(len(ha) + len(hb) - len(list_filter(ha, x -> list_contains(hb, x))) AS DOUBLE)"""
      .stripMargin.replace("\n", "")

  /** VALUES rows for the deterministic LSH hyperplanes (shared constants
    * with [[VectorSimilarity.lshBucket]]). */
  private def planesSql(numPlanes: Int, dim: Int): String =
    (0 until numPlanes).map { j =>
      val vs = PortableHash.hyperplane(j, dim).mkString("[", ", ", "]")
      s"(CAST($j AS BIGINT), CAST($vs AS DOUBLE[]))"
    }.mkString(",\n  ")

  /** A (vec_id, embedding, bucket) CTE named `out` over relation
    * `src(vec_id, embedding)`; expects `planes(j, p)` already in scope. */
  private def bucketBodySql(src: String, out: String, dim: Int): String =
    s"""$out AS (
       |  SELECT vec_id, embedding,
       |         CAST(sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM (SELECT s.vec_id, s.embedding, planes.j,
       |               list_sum(list_transform(generate_series(1, $dim),
       |                        i -> CAST(s.embedding[i] AS DOUBLE) * planes.p[i])) AS d
       |        FROM $src s CROSS JOIN planes) x
       |  GROUP BY vec_id, embedding)""".stripMargin

  /** (vec_id, embedding, bucket) over relation `src(vec_id, embedding)`. */
  private[queries] def bucketSql(src: String, numPlanes: Int, dim: Int): String =
    s"""planes(j, p) AS (VALUES
       |  ${planesSql(numPlanes, dim)}),
       |${bucketBodySql(src, "bk", dim)}""".stripMargin

  /** Cosine of two DOUBLE-castable list columns, same association order as
    * [[VectorSimilarity.cosine]]. */
  private[queries] def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
      .stripMargin.replace("\n", "")

  private val cosineSql: String = cosSql("ea", "eb")

  private val stopwordsSql: String =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Shared oracle for q_dedup_drop / q_dedup_drop_star — the component
    * algorithm (driver union-find vs distributed star rounds) is physical
    * strategy only; the logical answer is one recursive min-label CTE. */
  private lazy val dedupDropOracle: String = {
      val sigExprs = (0 until 16).map { k =>
        val (a, b) = PortableHash.perm(k)
        s"list_min(list_transform(h, x -> ($a * x + $b) % $P))"
      }.mkString("[\n    ", ",\n    ", "]")
      // components via a recursive min-label CTE: propagate a label along an
      // edge only when it's smaller than the target (lossless prune — a
      // node's component is its minimum reachable label); survivors are the
      // nodes that ARE their component's minimum.
      s"""WITH RECURSIVE ${nearDupCorpusSql(10)},
         |$shingleHashesSql,
         |sigs AS (SELECT doc_id, h, $sigExprs AS sig FROM hs),
         |bands AS (SELECT doc_id, t.b AS band,
         |                 array_to_string(sig[t.b*4+1 : t.b*4+4], ',') AS key
         |          FROM sigs, unnest([0, 1, 2, 3]) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |pj AS (SELECT c.id_a, c.id_b, ha.h AS ha, hb.h AS hb
         |       FROM cand c
         |       JOIN hs ha ON ha.doc_id = c.id_a
         |       JOIN hs hb ON hb.doc_id = c.id_b),
         |gp AS (SELECT id_a, id_b FROM pj WHERE $jaccardSql >= 0.6),
         |nodes AS (SELECT doc_id AS id FROM corpus),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM gp
         |          UNION ALL SELECT id_b, id_a FROM gp),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.lbl < e.dst),
         |comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id)
         |SELECT id AS doc_id FROM comp WHERE id = comp ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, ${tok("text")} AS w FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq_tokens,
         |  CAST(len(${graft.functions.Bpe.tokensSql("w", BpeMerges.Merges)}) AS BIGINT) AS n_bpe_tokens,
         |  CAST(list_sum(list_transform(w, t2 -> length(t2))) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS avg_token_len,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS uniq_ratio,
         |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio,
         |  CAST(len(list_filter(w, x -> x IN $stopwordsSql)) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS stopword_ratio,
         |  CAST(len(w) AS DOUBLE) AS n_tok_d
         |FROM t)
         |SELECT doc_id, n_tokens, n_uniq_tokens, n_bpe_tokens,
         |  ${e9Sql("avg_token_len")} AS avg_token_len_e9,
         |  ${e9Sql("alpha_ratio")} AS alpha_ratio_e9,
         |  ${e9Sql("stopword_ratio")} AS stopword_ratio_e9,
         |  ${e9Sql("uniq_ratio * 0.3 + alpha_ratio * 0.3 + least(stopword_ratio * 4.0, 1.0) * 0.2 + least(n_tok_d / 100.0, 1.0) * 0.2")} AS quality_score_e9
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_text_langid" -> {
      val profiles = TextAnalysis.LangProfiles
      val scoreCols = profiles.map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString("(", ", ", ")")
        s"CAST(len(list_filter(w, x -> x IN $inList)) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS s_$lang"
      }.mkString(",\n  ")
      val caseArms = profiles.zipWithIndex.init.map { case ((lang, _), i) =>
        val later = profiles.drop(i + 1).map { case (l2, _) => s"s_$lang >= s_$l2" }.mkString(" AND ")
        s"WHEN $later THEN '$lang'"
      }.mkString("\n    ")
      val bestExpr = profiles.map(p => s"s_${p._1}").reduce((a, b) => s"greatest($a, $b)")
      s"""WITH t AS (SELECT doc_id, lang, ${tok("text")} AS w FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  $scoreCols
         |FROM t)
         |SELECT doc_id, lang,
         |  CASE $caseArms ELSE '${profiles.last._1}' END AS pred_lang,
         |  ${e9Sql(bestExpr)} AS score_e9
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS w FROM documents)
         |SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(w, t2 -> ${hmodSql("t2")})),
         |    (acc, h) -> (acc * 31 + h) % $P) AS fp
         |FROM t ORDER BY doc_id""".stripMargin,

    // threshold = ceil(support · N) computed from the SAME double product in
    // both engines (bit-identical), so the HAVING cut lands on the same count
    "q_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(${tok("text")}) AS item FROM documents),
         |n AS (SELECT count(*) AS n FROM tk)
         |SELECT item, CAST(count(*) AS BIGINT) AS cnt
         |FROM tk GROUP BY item
         |HAVING count(*) >= (SELECT greatest(CAST(1 AS BIGINT),
         |                           CAST(ceil(0.005 * n) AS BIGINT)) FROM n)
         |ORDER BY item""".stripMargin,

    "q_license_gate" -> {
      val flags = TextAnalysis.licenseFlagSqls("s")
        .map { case (name, frag) => s"$frag AS $name" }.mkString(",\n        ")
      s"""WITH noised AS (SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' © 2023 example corp. all rights reserved'
         |         WHEN doc_id % 11 = 1 THEN text || ' released under the mit license'
         |         WHEN doc_id % 11 = 2 THEN text || ' licensed cc by-sa — see creativecommons.org/licenses'
         |         WHEN doc_id % 11 = 3 THEN text || ' copyright (c) 1998 the authors'
         |         WHEN doc_id % 11 = 4 THEN text || ' distributed under the apache license, all rights reserved'
         |         ELSE text END AS text FROM documents),
         |f AS (SELECT doc_id, $flags
         |      FROM (SELECT doc_id, lower(coalesce(text, '')) AS s FROM noised)),
         |c AS (SELECT *,
         |        CASE WHEN license_cc OR license_open_code THEN 'open'
         |             WHEN license_rights_reserved OR license_copyright THEN 'restricted'
         |             ELSE 'none' END AS license_class
         |      FROM f)
         |SELECT doc_id, license_cc, license_open_code, license_rights_reserved,
         |       license_copyright, license_class,
         |       license_class <> 'restricted' AS license_keep
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q_sketch_countmin" -> {
      import graft.operators.CountMin
      val (d, w) = (4, 2048)
      def cells(src: String): String =
        (0 until d).map(r =>
          s"SELECT $r AS r, ${CountMin.bucketSql("token", r, w)} AS bucket, token FROM $src")
          .mkString("\nUNION ALL ")
      s"""WITH tk AS (SELECT unnest(${tok("text")}) AS token FROM documents),
         |sk AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
         |       FROM (${cells("tk")}) GROUP BY r, bucket),
         |ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
         |       FROM tk GROUP BY token HAVING count(*) >= 500),
         |pb AS (${cells("ex")}),
         |est AS (SELECT pb.token, min(coalesce(sk.cnt, 0)) AS cms_count
         |        FROM pb LEFT JOIN sk USING (r, bucket) GROUP BY pb.token)
         |SELECT ex.token, ex.exact_cnt, est.cms_count
         |FROM ex JOIN est USING (token) ORDER BY token""".stripMargin
    },

    "q_text_topterms" ->
      s"""WITH t AS (SELECT doc_id, unnest(${tok("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
         |s AS (SELECT doc_id, term, tf, df,
         |        CAST(tf * 1000000 // df AS BIGINT) AS score FROM d),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |                                   ORDER BY score DESC, term ASC) AS rank
         |      FROM s)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
         |       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
         |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "q_dedup_url" -> {
      val rawUrl =
        "CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.' ELSE 'http://' END" +
          " || 'example.com/page/' || CAST(doc_id % 40 AS VARCHAR)" +
          " || CASE WHEN doc_id % 2 = 0 THEN '/?utm_source=feed#top' ELSE '' END"
      s"""WITH u AS (SELECT doc_id,
         |  ${TextAnalysis.canonicalUrlSql(s"($rawUrl)")} AS curl
         |FROM documents),
         |d AS (SELECT doc_id, curl,
         |        row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS rn
         |      FROM u)
         |SELECT doc_id, curl FROM d WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },

    "q_domain_gate" -> {
      val urlSql =
        "'http://' || CASE WHEN doc_id % 5 = 0 THEN 'spam-ads.example' " +
          "WHEN doc_id % 5 = 1 THEN 'tracker.spam-ads.example' " +
          "WHEN doc_id % 5 = 2 THEN 'notspam-ads.example' " +
          "WHEN doc_id % 5 = 3 THEN 'WWW.News.Example.org' " +
          "ELSE 'example.com' END || '/page/' || CAST(doc_id % 40 AS VARCHAR)"
      val blocked = Seq("spam-ads.example", "casino.example")
      s"""WITH u AS (SELECT doc_id, ($urlSql) AS url FROM documents),
         |hh AS (SELECT doc_id,
         |  regexp_replace(lower(regexp_extract(url, '${TextAnalysis.UrlHostPattern}', 1)),
         |                 '^www\\.', '', 'g') AS url_host
         |  FROM u),
         |g AS (SELECT doc_id, url_host,
         |        ${TextAnalysis.domainGateRuleSql("url_host", blocked)} AS blocked_by
         |      FROM hh)
         |SELECT doc_id, url_host, blocked_by, blocked_by IS NULL AS domain_keep
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q_dedup_exact" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 7 = 0),
         |d AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |      FROM corpus)
         |SELECT doc_id, lang FROM d WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // inverted-index form (mirrors the Spark operator): co-occurrence count
    // per pair sharing >= 1 shingle, J = inter/(|A|+|B|-inter) — with a
    // positive threshold this is the same result set as all-pairs, at
    // Σ_shingle df² cost instead of the quadratic docs² list comparisons
    // that forced a %5 corpus subset before
    "q_dedup_ngram_jaccard" ->
      s"""WITH ${nearDupCorpusSql(10)},
         |$shingleHashesSql,
         |inv AS (SELECT doc_id, len(h) AS n, unnest(h) AS x FROM hs),
         |co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |              a.n AS na, b.n AS nb, count(*) AS inter
         |       FROM inv a JOIN inv b ON a.x = b.x AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2, 3, 4),
         |j AS (SELECT id_a, id_b,
         |             CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jac
         |      FROM co)
         |SELECT id_a, id_b, ${e9Sql("jac")} AS jaccard_e9
         |FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_minhash" -> {
      val sigExprs = (0 until 16).map { k =>
        val (a, b) = PortableHash.perm(k)
        s"list_min(list_transform(h, x -> ($a * x + $b) % $P))"
      }.mkString("[\n    ", ",\n    ", "]")
      s"""WITH ${nearDupCorpusSql(10)},
         |$shingleHashesSql,
         |sigs AS (SELECT doc_id, h, $sigExprs AS sig FROM hs),
         |bands AS (SELECT doc_id, t.b AS band,
         |                 array_to_string(sig[t.b*4+1 : t.b*4+4], ',') AS key
         |          FROM sigs, unnest([0, 1, 2, 3]) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |pairs AS (SELECT c.id_a, c.id_b, ha.h AS ha, hb.h AS hb
         |          FROM cand c
         |          JOIN hs ha ON ha.doc_id = c.id_a
         |          JOIN hs hb ON hb.doc_id = c.id_b),
         |j AS (SELECT id_a, id_b, $jaccardSql AS jac FROM pairs)
         |SELECT id_a, id_b, ${e9Sql("jac")} AS jaccard_e9
         |FROM j WHERE jac >= 0.6 ORDER BY id_a, id_b""".stripMargin
    },

    "q_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |g AS (SELECT doc_id, len(w) AS n,
         |        list_transform(generate_series(1, greatest(len(w) - 1, 1)),
         |                       i -> array_to_string(w[i:i+1], ' ')) AS grams
         |      FROM t),
         |p AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |        CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
         |          / CAST(len(grams) AS DOUBLE) AS dup2
         |      FROM g),
         |tf AS (SELECT doc_id, term, count(*) AS tf
         |       FROM (SELECT doc_id, unnest(w) AS term FROM t) GROUP BY 1, 2),
         |mx AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS max_tf FROM tf GROUP BY doc_id)
         |SELECT p.doc_id, n_tokens, max_tf,
         |  ${e9Sql("CAST(max_tf AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)")} AS top_token_ratio_e9,
         |  ${e9Sql("dup2")} AS dup_2gram_ratio_e9
         |FROM p JOIN mx ON p.doc_id = mx.doc_id
         |ORDER BY p.doc_id""".stripMargin,

    "q_text_pii" -> {
      val email = TextAnalysis.EmailPattern
      val url = TextAnalysis.UrlPattern
      val phone = TextAnalysis.PhonePattern
      s"""WITH src AS (SELECT doc_id,
         |  CASE WHEN doc_id % 25 = 0
         |       THEN text || ' contact bob@example.com or visit https://example.com/a?b=1 or call +1 (555) 123-4567 now'
         |       ELSE text END AS text
         |  FROM documents)
         |, staged AS (SELECT doc_id, text,
         |    regexp_replace(text, '$url', '<URL>', 'g') AS after_url,
         |    regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
         |                   '$email', '<EMAIL>', 'g') AS after_email
         |  FROM src)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(after_url, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email, '$phone')) AS BIGINT) AS n_phones,
         |  regexp_replace(after_email, '$phone', '<PHONE>', 'g') AS redacted
         |FROM staged ORDER BY doc_id""".stripMargin
    },

    "q_decontaminate" -> {
      // same hashed-shingle domain as the Spark side (shingleHashes), so a
      // (cosmically unlikely) hash collision could never diverge the engines
      val sh6 =
        s"""list_distinct(list_transform(list_distinct(
           |  list_transform(generate_series(1, greatest(len(w) - 5, 1)),
           |                 i -> array_to_string(w[i:i+5], ' '))),
           |  s -> ${hmodSql("s")}))""".stripMargin.replace("\n", "")
      s"""WITH cw AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |sh AS (SELECT doc_id, unnest($sh6) AS h FROM cw),
         |pw AS (SELECT w[1:12] AS w FROM cw WHERE doc_id % 50 = 0),
         |probe AS (SELECT DISTINCT unnest($sh6) AS h FROM pw)
         |SELECT DISTINCT doc_id FROM sh
         |WHERE h IN (SELECT h FROM probe)
         |ORDER BY doc_id""".stripMargin
    },

    "q_dedup_drop" -> dedupDropOracle,
    // identical end state: the component algorithm is physical strategy only
    "q_dedup_drop_star" -> dedupDropOracle,

    "q_dedup_substrings_drop" -> {
      val W = 8
      s"""WITH nd AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0
         |       THEN text || ' subscribe to our mailing list for daily updates and offers'
         |       ELSE text END AS text FROM documents),
         |t AS (SELECT doc_id, ${tok("text")} AS w FROM nd),
         |win AS (SELECT doc_id, u.i AS pos,
         |          array_to_string(w[u.i : u.i + $W - 1], ' ') AS h
         |        FROM t, unnest(generate_series(1, len(w) - $W + 1)) AS u(i)
         |        WHERE len(w) >= $W),
         |dup AS (SELECT h, count(*) AS c, min(doc_id * 1000000 + pos) AS keep
         |        FROM win GROUP BY h),
         |rem AS (SELECT win.doc_id, win.pos FROM win JOIN dup USING (h)
         |        WHERE dup.c >= 2 AND win.doc_id * 1000000 + win.pos <> dup.keep),
         |cov AS (SELECT DISTINCT doc_id, u.tp
         |        FROM rem, unnest(generate_series(pos, pos + $W - 1)) AS u(tp)),
         |tp AS (SELECT doc_id, u.i AS tp, w[u.i] AS tok
         |       FROM t, unnest(generate_series(1, len(w))) AS u(i)),
         |kept AS (SELECT tp.doc_id, tp.tp, tp.tok
         |         FROM tp ANTI JOIN cov USING (doc_id, tp)),
         |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS clean_text,
         |               count(*) AS nk
         |        FROM kept GROUP BY doc_id),
         |nn AS (SELECT doc_id, len(w) AS ntok FROM t)
         |SELECT nn.doc_id, coalesce(reb.clean_text, '') AS clean_text,
         |  CAST(nn.ntok AS BIGINT) AS n_tokens,
         |  CAST(nn.ntok - coalesce(reb.nk, 0) AS BIGINT) AS n_removed
         |FROM nn LEFT JOIN reb USING (doc_id) ORDER BY nn.doc_id""".stripMargin
    },

    "q_dedup_report" -> {
      val sigExprs = (0 until 16).map { k =>
        val (a, b) = PortableHash.perm(k)
        s"list_min(list_transform(h, x -> ($a * x + $b) % $P))"
      }.mkString("[\n    ", ",\n    ", "]")
      s"""WITH RECURSIVE ${nearDupCorpusSql(10)},
         |$shingleHashesSql,
         |sigs AS (SELECT doc_id, h, $sigExprs AS sig FROM hs),
         |bands AS (SELECT doc_id, t.b AS band,
         |                 array_to_string(sig[t.b*4+1 : t.b*4+4], ',') AS key
         |          FROM sigs, unnest([0, 1, 2, 3]) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |pj AS (SELECT c.id_a, c.id_b, ha.h AS ha, hb.h AS hb
         |       FROM cand c
         |       JOIN hs ha ON ha.doc_id = c.id_a
         |       JOIN hs hb ON hb.doc_id = c.id_b),
         |gp AS (SELECT id_a, id_b FROM pj WHERE $jaccardSql >= 0.6),
         |nodes AS (SELECT doc_id AS id FROM corpus),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM gp
         |          UNION ALL SELECT id_b, id_a FROM gp),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.lbl < e.dst),
         |comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         |sz AS (SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
         |SELECT CAST(sum(sz) AS BIGINT) AS n_total,
         |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
         |  CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT) AS n_dup_members,
         |  CAST(sum(sz) - count(*) AS BIGINT) AS n_dropped,
         |  CAST((sum(sz) - count(*)) * 1000000 // sum(sz) AS BIGINT) AS drop_ppm
         |FROM sz""".stripMargin
    },

    // 60-bit signature over FULL-width (h60) shingle hashes, 4 bands of 15
    // bits — matches [[Dedup.simHashSignatures]]/[[Dedup.simHashPairs]]
    "q_dedup_simhash" ->
      s"""WITH ${nearDupCorpusSql(10)},
         |cw AS (SELECT doc_id, ${tok("text")} AS w FROM corpus),
         |hs60 AS (SELECT doc_id, list_distinct(list_transform(
         |  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
         |                i -> array_to_string(w[i:i+2], ' '))),
         |  s -> ${PortableHash.h60Sql("s")})) AS h FROM cw),
         |sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |    CASE WHEN list_sum(list_transform(h, x ->
         |           CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS s
         |  FROM hs60),
         |bands AS (SELECT doc_id, s, t.k AS band, (s >> (t.k * 15)) & 32767 AS key
         |          FROM sig, unnest([0, 1, 2, 3]) AS t(k)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_incremental" -> {
      val sigExprs = (0 until 16).map { k =>
        val (a, b) = PortableHash.perm(k)
        s"list_min(list_transform(h, x -> ($a * x + $b) % $P))"
      }.mkString("[\n    ", ",\n    ", "]")
      def shingleHs(src: String): String =
        s"""(SELECT doc_id, list_distinct(list_transform(
           |  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
           |                i -> array_to_string(w[i:i+2], ' '))),
           |  s -> ${hmodSql("s")})) AS h
           |FROM (SELECT doc_id, ${tok("text")} AS w FROM $src))""".stripMargin
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |basew AS (SELECT doc_id, ${tok("text")} AS w FROM corpus),
         |fresh AS (SELECT doc_id + 200000 AS doc_id,
         |                 array_to_string(w[3:len(w)], ' ') AS text
         |          FROM basew WHERE doc_id % 10 = 0),
         |chs AS ${shingleHs("corpus")},
         |nhs AS ${shingleHs("fresh")},
         |csig AS (SELECT doc_id, h, $sigExprs AS sig FROM chs),
         |nsig AS (SELECT doc_id, h, $sigExprs AS sig FROM nhs),
         |cbands AS (SELECT doc_id, t.b AS band,
         |                  array_to_string(sig[t.b*4+1 : t.b*4+4], ',') AS key
         |           FROM csig, unnest([0, 1, 2, 3]) AS t(b)),
         |nbands AS (SELECT doc_id, t.b AS band,
         |                  array_to_string(sig[t.b*4+1 : t.b*4+4], ',') AS key
         |           FROM nsig, unnest([0, 1, 2, 3]) AS t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
         |         FROM nbands a JOIN cbands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id <> b.doc_id),
         |pairs AS (SELECT c.new_id, c.corpus_id, na.h AS ha, cb.h AS hb
         |          FROM cand c
         |          JOIN nhs na ON na.doc_id = c.new_id
         |          JOIN chs cb ON cb.doc_id = c.corpus_id),
         |j AS (SELECT new_id, corpus_id, $jaccardSql AS jac FROM pairs)
         |SELECT new_id, corpus_id, ${e9Sql("jac")} AS jaccard_e9
         |FROM j WHERE jac >= 0.6 ORDER BY new_id, corpus_id""".stripMargin
    },

    // 6 bands of 10 bits over the same 60-bit signature, Hamming <= 5
    "q_dedup_simhash_wide" ->
      s"""WITH ${nearDupCorpusSql(10, "doc_id % 4 = 0")},
         |cw AS (SELECT doc_id, ${tok("text")} AS w FROM corpus),
         |hs60 AS (SELECT doc_id, list_distinct(list_transform(
         |  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
         |                i -> array_to_string(w[i:i+2], ' '))),
         |  s -> ${PortableHash.h60Sql("s")})) AS h FROM cw),
         |sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |    CASE WHEN list_sum(list_transform(h, x ->
         |           CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS s
         |  FROM hs60),
         |bands AS (SELECT doc_id, s, t.k AS band, (s >> (t.k * 10)) & 1023 AS key
         |          FROM sig, unnest([0, 1, 2, 3, 4, 5]) AS t(k)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 5 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_embedding" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |${bucketSql("corpus", 6, 64)},
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |                 a.embedding AS ea, b.embedding AS eb
         |          FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |sc AS (SELECT id_a, id_b, $cosineSql AS cos FROM pairs)
         |SELECT id_a, id_b, ${e9Sql("cos")} AS cosine_e9
         |FROM sc WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_substrings" ->
      s"""WITH t AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |wins AS (SELECT doc_id,
         |           ${hmodSql("array_to_string(w[u.i : u.i + 7], ' ')")} AS h
         |         FROM t, unnest(generate_series(1, len(w) - 7)) AS u(i)),
         |c AS (SELECT h, count(*) AS cnt FROM wins GROUP BY h),
         |d AS (SELECT doc_id, count(*) AS nw,
         |             sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS nd
         |      FROM wins JOIN c USING (h) GROUP BY doc_id)
         |SELECT doc.doc_id,
         |  CAST(coalesce(nw, 0) AS BIGINT) AS n_windows,
         |  CAST(coalesce(nd, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(CASE WHEN coalesce(nw, 0) = 0 THEN 0
         |       ELSE coalesce(nd, 0) * 1000000 // nw END AS BIGINT) AS dup_window_ppm
         |FROM documents doc LEFT JOIN d USING (doc_id)
         |ORDER BY doc.doc_id""".stripMargin,

    "q_decontaminate_semantic" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
         |bench AS (
         |  SELECT vec_id + 100000 AS vec_id,
         |         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS embedding
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |planes(j, p) AS (VALUES
         |  ${planesSql(6, 64)}),
         |${bucketBodySql("corpus", "cbk", 64)},
         |${bucketBodySql("bench", "nbk", 64)},
         |pairs AS (SELECT n.vec_id AS new_id, c.vec_id AS corpus_id,
         |                 n.embedding AS ea, c.embedding AS eb
         |          FROM nbk n JOIN cbk c ON n.bucket = c.bucket AND n.vec_id <> c.vec_id),
         |sc AS (SELECT new_id, corpus_id, $cosineSql AS cos FROM pairs)
         |SELECT new_id, corpus_id, ${e9Sql("cos")} AS cosine_e9
         |FROM sc WHERE cos >= 0.99 ORDER BY new_id, corpus_id""".stripMargin,

    "q_dedup_drop_embedding" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |${bucketSql("corpus", 6, 64)},
         |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |               a.embedding AS ea, b.embedding AS eb
         |        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |gp AS (SELECT id_a, id_b FROM prs WHERE $cosineSql >= 0.99),
         |nodes AS (SELECT vec_id AS id FROM corpus),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM gp
         |          UNION ALL SELECT id_b, id_a FROM gp),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.lbl < e.dst),
         |comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id)
         |SELECT id AS vec_id FROM comp WHERE id = comp ORDER BY vec_id""".stripMargin,

    "q_dedup_semdedup" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT))
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |cents(cid, cv) AS (VALUES
         |  ${IvfCentroids.K8Sf001.zipWithIndex.map { case (v, i) =>
               s"(CAST($i AS BIGINT), CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
             }.mkString(",\n  ")}),
         |sc AS (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.cv")} AS csim
         |       FROM corpus e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, embedding, cid AS cluster_id, csim,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |        FROM sc),
         |a1 AS (SELECT vec_id, embedding, cluster_id, csim FROM asg WHERE rn = 1),
         |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |               a.embedding AS ea, b.embedding AS eb
         |        FROM a1 a JOIN a1 b
         |          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id),
         |gp AS (SELECT id_a, id_b FROM prs WHERE $cosineSql >= 0.99),
         |nodes AS (SELECT vec_id AS id FROM corpus),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM gp
         |          UNION ALL SELECT id_b, id_a FROM gp),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         |  WHERE r.lbl < e.dst),
         |comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         |ranked AS (SELECT a1.vec_id, a1.cluster_id, a1.csim,
         |             row_number() OVER (PARTITION BY comp.comp
         |                                ORDER BY a1.csim ASC, a1.vec_id ASC) AS krn
         |           FROM a1 JOIN comp ON a1.vec_id = comp.id)
         |SELECT vec_id, cluster_id, ${e9Sql("csim")} AS ccos_e9
         |FROM ranked WHERE krn = 1 ORDER BY vec_id""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH m AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
         |  FROM embeddings),
         |q AS (SELECT vec_id, ma,
         |  CASE WHEN ma = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |       ELSE list_transform(embedding,
         |              x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT))
         |  END AS qv FROM m)
         |SELECT vec_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), qv),
         |              (a, x) -> (a * 31 + x + 128) % $P) AS q_hash,
         |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
         |  ${e9Sql("ma")} AS scale_e9
         |FROM q ORDER BY vec_id""".stripMargin,

    "q_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS ea FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS eb FROM embeddings),
         |sc AS (SELECT query_id, neighbor_id, $cosineSql AS cos
         |       FROM q JOIN c ON query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, rank, neighbor_id, ${e9Sql("cos")} AS cosine_e9
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_knn_int8" ->
      s"""WITH m AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
         |  FROM embeddings),
         |qz AS (SELECT vec_id, ma,
         |  CASE WHEN ma = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |       ELSE list_transform(embedding,
         |              x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT))
         |  END AS qv FROM m),
         |q AS (SELECT vec_id AS query_id, qv AS qa, ma AS sa FROM qz WHERE vec_id < 10),
         |c AS (SELECT vec_id AS neighbor_id, qv AS qb, ma AS sb FROM qz),
         |sc AS (SELECT query_id, neighbor_id,
         |         CAST(list_sum(list_transform(generate_series(1, 64),
         |                i -> qa[i] * qb[i])) AS DOUBLE) * ((sa * sb) / 16129.0) AS score
         |       FROM q JOIN c ON query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, score,
         |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, rank, neighbor_id, ${e9Sql("score")} AS score_e9
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_knn_ivf" ->
      s"""WITH cents(cid, cv) AS (VALUES
         |  ${IvfCentroids.K8Sf001.zipWithIndex.map { case (v, i) =>
               s"(CAST($i AS BIGINT), CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
             }.mkString(",\n  ")}),
         |sc AS (SELECT e.vec_id, e.embedding, c.cid, ${cosSql("e.embedding", "c.cv")} AS csim
         |       FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, embedding, cid AS cluster_id,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |        FROM sc),
         |q AS (SELECT vec_id AS query_id, embedding AS ea, cluster_id
         |      FROM asg WHERE vec_id < 10 AND rn <= 2),
         |c2 AS (SELECT vec_id AS neighbor_id, embedding AS eb, cluster_id
         |       FROM asg WHERE rn = 1),
         |s2 AS (SELECT query_id, neighbor_id, $cosineSql AS cos
         |       FROM q JOIN c2 USING (cluster_id) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |      FROM s2)
         |SELECT query_id, rank, neighbor_id, ${e9Sql("cos")} AS cosine_e9
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q_knn_lsh" ->
      s"""WITH ${bucketSql("embeddings", 6, 64)},
         |q AS (SELECT vec_id AS query_id, embedding AS ea, bucket FROM bk WHERE vec_id < 10),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS eb, bucket FROM bk),
         |sc AS (SELECT query_id, neighbor_id, $cosineSql AS cos
         |       FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, rank, neighbor_id, ${e9Sql("cos")} AS cosine_e9
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  )
}
