package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{e9, e9Sql}
import graft.operators.{Chunking, Dedup, Funnel, FuzzyJoin, Sampling, Search, TextAnalysis, VectorSimilarity}

/** Oracle-checked queries for the round-5 corpus-construction operators:
  * fuzzy (edit-distance) joins, token chunking, keyword search, line-level
  * dedup, weighted sampling, and sequence packing — the remaining
  * operations a large-scale training-data pipeline runs that earlier query
  * groups don't cover. Same cross-engine determinism rules as
  * [[TrainingDataQueries]] (portable hashing, fixed association order,
  * e9 fixed-point export).
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  private def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")
  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Target mixture for q_sample_mixture: relative ppm weights over four
    * sources; every other source drops out of the mixture. */
  private val MixWeights: Map[String, Long] = Map(
    "src0" -> 600000L, "src1" -> 250000L, "src2" -> 100000L, "src3" -> 50000L)

  val queries: Map[String, Q] = Map(

    // entity resolution: every 4th customer name re-enters with its 5th
    // character deleted (a typo'd duplicate feed); the FastSS-blocked join
    // recovers each noisy name's source at Levenshtein distance <= 1
    "q_fuzzy_join" -> { (spark, sfDir) =>
      val c = customer(spark, sfDir)
      val noisy = c.where(col("c_custkey") % 4 === 0)
        .select((col("c_custkey") + lit(100000L)).as("noisy_id"),
          concat(substr(col("c_name"), lit(1), lit(4)),
            substr(col("c_name"), lit(6), length(col("c_name")))).as("name"))
      FuzzyJoin.editDistanceJoin(
          c.select(col("c_custkey"), col("c_name")), "c_custkey", "c_name",
          noisy, "noisy_id", "name", maxDist = 1)
        .orderBy("c_custkey", "noisy_id")
    },

    // spell correction: every 10th doc's 3rd token with its 2nd char
    // deleted, corrected to the (closest, most frequent) vocabulary word
    "q_spell_correct" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir)
      val toks = TextAnalysis.tokens(col("text"))
      val vocab = d.select(explode(toks).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val bad = d.where(col("doc_id") % 10 === 0)
        .select(try_element_at(toks, lit(3)).as("w3"))
        .where(length(col("w3")) >= 4)
        .select(concat(substring(col("w3"), 1, 1),
          expr("substring(w3, 3, length(w3))")).as("bad"))
        .distinct()
      FuzzyJoin.bestMatch(bad, "bad", "bad", vocab, "word", "cnt", maxDist = 1)
        .orderBy("bad")
    },

    // RAG/context-window chunking: 32-token windows every 24 tokens
    // (8-token overlap), full coverage, last window short
    "q_chunk_tokens" -> { (spark, sfDir) =>
      Chunking.tokenChunks(docs(spark, sfDir), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // sentence-window chunking (RAG indexing units): sentence segmentation
    // (the corpus has no punctuation, so the fixture inserts it
    // deterministically) + sliding windows of 4 sentences every 3 — chunk
    // boundaries never split a sentence, unlike the token windows above
    "q_chunk_sentences" -> { (spark, sfDir) =>
      val punct = concat(
        regexp_replace(col("text"), " the ", ". the "),
        lit(". done now! ready?"))
      Chunking.tokenChunksOf(
          docs(spark, sfDir).select(col("doc_id"), punct.as("text")),
          "doc_id", TextAnalysis.sentencesOf(col("text")),
          chunkSize = 4, stride = 3)
        .select(col("doc_id"), col("chunk_id"),
          col("n_chunk_tokens").as("n_sentences"), col("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },

    // learned-merge BPE encode under the frozen table: per doc, the subword
    // token count (the REAL context-window budget) and the full token
    // sequence — the oracle re-derives both from the same merge literals
    "q_bpe_encode" -> { (spark, sfDir) =>
      graft.functions.Bpe.tokensByDict(
          docs(spark, sfDir), "doc_id", "text", BpeMerges.Merges)
        .select(col("doc_id"),
          size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"),
          concat_ws(" ", col("bpe_tokens")).as("bpe_text"))
        .orderBy("doc_id")
    },

    // BPE round-trip identity: decode(wordTokens(text)) must equal the
    // canonical text (lowercased, whitespace-collapsed) for EVERY document
    // — closes the tokenizer loop (encode loses no characters; merges
    // concatenate back exactly), with both engines running the same
    // data-driven fold
    "q_bpe_roundtrip" -> { (spark, sfDir) =>
      import graft.functions.Bpe
      val w = filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"),
        t => t =!= lit(""))
      docs(spark, sfDir)
        .select(col("doc_id"), w.as("__w"),
          Bpe.decode(Bpe.wordTokens(col("text"), BpeMerges.Merges)).as("__rec"))
        .select(col("doc_id"),
          size(col("__w")).cast("long").as("n_words"),
          length(col("__rec")).cast("long").as("decoded_len"),
          (col("__rec") === array_join(col("__w"), " ")).as("roundtrip_ok"))
        .orderBy("doc_id")
    },

    // context-window chunking denominated in BPE subword tokens — the
    // budget a model's context length is actually measured in. Tokenized
    // via the DICTIONARY path (encode distinct words once, join back):
    // per-instance encode wastes the corpus' Zipf duplication factor
    "q_chunk_bpe" -> { (spark, sfDir) =>
      val toks = graft.functions.Bpe.tokensByDict(
        docs(spark, sfDir), "doc_id", "text", BpeMerges.Merges)
      Chunking.tokenChunksOf(toks, "doc_id", col("bpe_tokens"),
          chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },

    // training-batch packing under a BPE token budget (the production
    // denomination — whitespace counts under-fill packs by the merge
    // rate); counts from the dictionary path
    "q_pack_bpe" -> { (spark, sfDir) =>
      val d = graft.functions.Bpe.nTokensByDict(
          docs(spark, sfDir), "doc_id", "text", BpeMerges.Merges)
        .withColumnRenamed("n_bpe_tokens", "n_tokens")
      Chunking.packSequences(d, "doc_id", "n_tokens", budget = 256, numShards = 8)
        .orderBy("doc_id")
    },

    // keyword search: one rare + two common terms, BM25-shaped scoring
    // (ln-free idf — see Search.scala), global top-20
    "q_search_bm25" -> { (spark, sfDir) =>
      Search.keywordTopK(docs(spark, sfDir), "doc_id", "text",
          SearchTerms, k = 20)
        .select(col("doc_id"), col("rank"), e9(col("score")).as("score_e9"))
        .orderBy("rank")
    },

    // per-domain rollup: URLs injected over a 4-domain pool (one via a
    // www. alias that must normalize together, one doc subset carrying a
    // second mirror link); the rollup attributes docs and mentions per host
    "q_domain_stats" -> { (spark, sfDir) =>
      val host = when(col("doc_id") % 3 === 0, lit("example.com"))
        .when(col("doc_id") % 3 === 1, lit("www.example.com"))
        .otherwise(lit("data.org"))
      val base = docs(spark, sfDir).select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" see https://"), host, lit("/page"),
            when(col("doc_id") % 6 === 0, lit(" and http://mirror.net/x"))
              .otherwise(lit(""))))
          .otherwise(col("text")).as("text"))
      TextAnalysis.domainStats(base, "doc_id", "text").orderBy("host")
    },

    // boilerplate removal: newsletter/footer lines injected into overlapping
    // doc subsets become corpus-frequent and are stripped; original
    // (unique) lines survive; counts reconcile per document
    "q_line_dedup" -> { (spark, sfDir) =>
      val base = docs(spark, sfDir).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"),
            lit("\nsubscribe to our newsletter\nall rights reserved")))
          .when(col("doc_id") % 3 === 0,
            concat(col("text"), lit("\nsubscribe to our newsletter")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.dropCommonLines(base, "doc_id", "text", maxDocFreq = 50)
        .orderBy("doc_id")
    },

    // quality-proportional corpus draw: each doc kept with probability
    // equal to its composite quality score (deterministic hash membership,
    // no RNG — same keys selected on every engine and every run)
    "q_sample_weighted" -> { (spark, sfDir) =>
      val scored = TextAnalysis.withStats(docs(spark, sfDir), "text", BpeMerges.Merges)
      Sampling.weightedHashSample(scored, "doc_id", col("quality_score"))
        .select(col("doc_id"), e9(col("quality_score")).as("quality_score_e9"))
        .orderBy("doc_id")
    },

    // product-quantization ANN: corpus compressed to 8 codebook codes per
    // vector (frozen per-subspace KMeans — PqCodebooks), queries score by
    // asymmetric distance (exact query vs quantized corpus)
    "q_knn_pq" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      VectorSimilarity.pqTopK(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", PqCodebooks.M8K16Sf001, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("adist")).as("adist_e9"))
        .orderBy("query_id", "rank")
    },

    // multi-probe LSH: each query also searches the 6 buckets one sign-flip
    // away — recall recovery for near-hyperplane vectors, query-side cost
    "q_knn_lsh_multiprobe" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      VectorSimilarity.lshTopKMultiProbe(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, numPlanes = 6, dim = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("cosine")).as("cosine_e9"))
        .orderBy("query_id", "rank")
    },

    // IVF-PQ composition: inverted-file pruning (cosine clusters, 2 probes)
    // + ADC scoring over PQ codes — the billion-scale ANN shape
    "q_knn_ivfpq" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val cents = VectorSimilarity.centroidFrame(spark, IvfCentroids.K8Sf001)
      VectorSimilarity.ivfPqTopK(e, e.where(col("vec_id") < 10),
          "vec_id", "embedding", cents, "cid", "cv",
          PqCodebooks.M8K16Sf001, k = 3, nprobe = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          e9(col("adist")).as("adist_e9"))
        .orderBy("query_id", "rank")
    },

    // ANN recall audit: recall@5 of every approximate index (LSH,
    // multi-probe LSH, IVF at 1 and 2 probes, PQ/ADC) against the exact
    // baseline in its own metric (cosine for the LSH/IVF family, squared
    // L2 for ADC) — integer counts and ppm ratios only, so the audit is
    // oracle-checkable bit-for-bit. The user-runnable "is my index good
    // enough" check the PqSpec assertions graduate into.
    "q_knn_recall" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val q = e.where(col("vec_id") < 20)
      val cents = VectorSimilarity.centroidFrame(spark, IvfCentroids.K8Sf001)
      val exactCos = VectorSimilarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      val exactL2 = VectorSimilarity.bruteForceTopKL2(e, q, "vec_id", "embedding", k = 5)
      VectorSimilarity.recallAudit(Seq(
        ("ivf_p1", VectorSimilarity.ivfTopK(e, q, "vec_id", "embedding",
          cents, "cid", "cv", k = 5, nprobe = 1), exactCos),
        ("ivf_p2", VectorSimilarity.ivfTopK(e, q, "vec_id", "embedding",
          cents, "cid", "cv", k = 5, nprobe = 2), exactCos),
        ("lsh", VectorSimilarity.lshTopK(e, q, "vec_id", "embedding",
          k = 5, numPlanes = 6, dim = 64), exactCos),
        ("lsh_multiprobe", VectorSimilarity.lshTopKMultiProbe(e, q, "vec_id",
          "embedding", k = 5, numPlanes = 6, dim = 64), exactCos),
        ("pq_adc", VectorSimilarity.pqTopK(e, q, "vec_id", "embedding",
          PqCodebooks.M8K16Sf001, k = 5), exactL2),
        ("int8", {
          val qz = VectorSimilarity.quantizeInt8(e, "embedding")
            .select("vec_id", "embedding_q", "embedding_scale")
          VectorSimilarity.int8TopK(qz, qz.where(col("vec_id") < 20),
            "vec_id", "embedding_q", "embedding_scale", k = 5)
        }, VectorSimilarity.bruteForceTopKIp(e, q, "vec_id", "embedding", k = 5))
      )).orderBy("method")
    },

    // phrase mining: top adjacent-pair collocations by lift
    // (n_ab·N / (n_a·n_b)), pairs seen >= 5 times
    "q_collocations" -> { (spark, sfDir) =>
      TextAnalysis.collocations(docs(spark, sfDir), "text", minCount = 5, k = 20)
        .select(col("rank"), col("w1"), col("w2"), col("n_ab"),
          e9(col("lift")).as("lift_e9"))
        .orderBy("rank")
    },

    // LM-frequency quality proxy: mean corpus frequency (ppm) of each
    // doc's token instances — common vocabulary scores high, outliers low
    "q_text_typicality" -> { (spark, sfDir) =>
      TextAnalysis.corpusTypicality(docs(spark, sfDir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // the CCNet bucket-and-sample step in one call: score docs by corpus
    // typicality, cut each SOURCE at its own [25%, 75%] typicality
    // quantiles (the middle band), hash-draw half of the band
    "q_sample_quality_band" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir)
      val scored = TextAnalysis.corpusTypicality(d, "doc_id", "text")
        .join(d.select("doc_id", "source"), Seq("doc_id"))
      Sampling.qualityBandSample(scored, "doc_id", "source", "typicality_ppm",
          lowerQ = 0.25, upperQ = 0.75, fraction = 0.5)
        .select("doc_id", "source", "typicality_ppm")
        .orderBy("doc_id")
    },

    // the END-TO-END curation pipeline in one expression: whitespace-
    // variant re-crawls (doubled spaces, id+100000) normalize back to
    // their source text -> exact dedup keeps the original -> Gopher gate
    // -> per-source doc/token budget of the survivors. Every stage is an
    // operator from this library; the oracle replays the whole chain.
    "q_pipeline_curate" -> { (spark, sfDir) =>
      import graft.functions.QualityClassifier
      val d = docs(spark, sfDir)
      val variants = d.where(col("doc_id") % 6 === 0)
        .select((col("doc_id") + lit(100000L)).as("doc_id"), col("source"),
          regexp_replace(col("text"), " ", "  ").as("text"))
      // spam twins: unique text (dedup passes them), rule-gate-clean
      // (Gopher passes them) — ONLY the learned classifier catches them
      val spam = d.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(200000L)).as("doc_id"), col("source"),
          concat(lit("free prize winner click here buy now "),
            concat_ws(" ", reverse(TextAnalysis.tokens(col("text"))))).as("text"))
      val corpus = d.select("doc_id", "source", "text")
        .unionByName(variants).unionByName(spam)
      val norm = corpus.select(col("doc_id"), col("source"),
        TextAnalysis.normalizeText(col("text")).as("text"))
      val deduped = Dedup.exact(norm, Seq("text"), "doc_id")
      val gated = TextAnalysis.withGopherFlags(deduped, "text", minWords = 30)
        .where(col("gopher_keep"))
      val scored = QualityClassifier.withQualityScore(gated, "text",
          QualityWeights.WeightsPpm, QualityWeights.BiasPpm)
        .where(col("quality_keep"))
      scored.select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("__nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
        .orderBy("source")
    },

    // learned quality gate: frozen hashed-bigram linear scorer (integer-ppm
    // logit) over real docs plus spam-corrupted twins — the corrupted ones
    // must score negative, the originals positive, bit-for-bit vs oracle
    "q_quality_classifier" -> { (spark, sfDir) =>
      import graft.functions.QualityClassifier
      val d = docs(spark, sfDir).select(col("doc_id"), col("text"))
      val corrupted = d.select((col("doc_id") + lit(100000L)).as("doc_id"),
        concat(lit("free prize winner click here buy now "),
          concat_ws(" ", reverse(TextAnalysis.tokens(col("text"))))).as("text"))
      QualityClassifier.withQualityScore(d.unionByName(corrupted), "text",
          QualityWeights.WeightsPpm, QualityWeights.BiasPpm)
        .select("doc_id", "quality_logit_ppm", "quality_keep")
        .orderBy("doc_id")
    },

    // CCNet perplexity gate: score every doc against the FROZEN English
    // reference LM (zero-shuffle scan projection) and band the corpus
    // head/middle/tail — English docs should dominate the head, other
    // languages the tail, exactly the CCNet language+quality story
    "q_quality_perplexity" -> { (spark, sfDir) =>
      import graft.functions.NgramLm
      NgramLm.withPerplexity(
          docs(spark, sfDir).select(col("doc_id"), col("lang"), col("text")),
          "text", LmStats.NllE6, LmStats.HeadMaxE6, LmStats.MiddleMaxE6)
        .select("doc_id", "lang", "lm_nll_e6", "ppl_band")
        .orderBy("doc_id")
    },

    // DSIR-style data selection: score every doc by the target-domain
    // (English) vs raw-corpus bigram likelihood ratio in integer ppm —
    // the importance weights a targeted resampling step draws from
    "q_sample_importance" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir)
      TextAnalysis.importanceScores(d, "doc_id", "text",
          d.where(col("lang") === "en"), "text")
        .orderBy("doc_id")
    },

    // exact-budget deterministic sample: precisely 100 docs by smallest
    // key hash (TakeOrdered — no global sort), nested under larger budgets
    "q_sample_exactn" -> { (spark, sfDir) =>
      Sampling.exactHashSample(docs(spark, sfDir), "doc_id", n = 100)
        .select("doc_id", "source").orderBy("doc_id")
    },

    // per-source lexical diversity: KMV vocabulary estimate vs exact,
    // plus the type-token ratio — the "is this source repetitive
    // boilerplate or diverse prose" audit (a KMV buffer per group scales
    // where an exact count-distinct per group shuffles every token)
    "q_lexical_diversity" -> { (spark, sfDir) =>
      import graft.functions.{KmvSketch, PortableHash}
      val tok = docs(spark, sfDir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .select(col("source"), col("token"),
          PortableHash.hmod(col("token")).as("h"))
      tok.groupBy("source")
        .agg(KmvSketch.kmv(col("h"), k = 64).as("__buf"),
          countDistinct(col("token")).as("exact_vocab"),
          count(lit(1)).as("n_tokens"))
        .select(col("source"), col("n_tokens"),
          KmvSketch.estimate("__buf", k = 64).as("est_vocab"),
          col("exact_vocab"),
          expr("CAST(exact_vocab * 1000000 DIV n_tokens AS BIGINT)").as("ttr_ppm"))
        .orderBy("source")
    },

    // tokenizer fertility audit: per language, whitespace-vs-BPE token
    // ratio and chars-per-subword — the "how well does the frozen vocab
    // fit each language" health check run before committing a tokenizer
    "q_tokenizer_fertility" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir)
      val counts = graft.functions.Bpe.nTokensByDict(d, "doc_id", "text", BpeMerges.Merges)
      val base = d.select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws"),
        length(col("text")).cast("long").as("n_chars"))
      base.join(counts, Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_ws").as("n_ws_tokens"),
          sum("n_bpe_tokens").as("n_bpe_tokens"), sum("n_chars").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_ws_tokens"), col("n_bpe_tokens"),
          expr("CAST(n_bpe_tokens * 1000000 DIV n_ws_tokens AS BIGINT)").as("fertility_ppm"),
          expr("CAST(n_chars * 1000000 DIV n_bpe_tokens AS BIGINT)").as("chars_per_bpe_ppm"))
        .orderBy("lang")
    },

    // bigram conditional-probability typicality: the integer-exact
    // perplexity-filter proxy (P(w2|w1) transitions, not unigram
    // frequency) — word salad in rare orders scores low
    "q_text_typicality_bigram" -> { (spark, sfDir) =>
      TextAnalysis.bigramTypicality(docs(spark, sfDir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // the C4 cleaning rules (Raffel et al. 2020 §2.2) over deterministically
    // composed multi-line docs: punctuation-terminated lines survive, short/
    // unterminated/cookie lines drop, brace or lorem-ipsum docs gate out
    "q_quality_c4" -> { (spark, sfDir) =>
      val noisy = concat(
        lit("the quick brown fox jumps high.\n"),
        col("text"),
        when(col("doc_id") % 4 === 0,
          lit("\nplease accept our cookie policy now.")).otherwise(lit("")),
        when(col("doc_id") % 6 === 0, lit("\ntiny line.")).otherwise(lit("")),
        when(col("doc_id") % 9 === 0,
          lit("\nfunction f() { return 1; }")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit("\nlorem ipsum dolor sit amet is here.")).otherwise(lit("")),
        lit("\nanother good sentence appears right here! and one more " +
          "follows after that? plus a third one ends now."))
      TextAnalysis.c4Clean(
          docs(spark, sfDir).select(col("doc_id"), noisy.as("text")),
          "doc_id", "text", minSentences = 3)
        .select("doc_id", "c4_text", "n_lines", "n_kept_lines",
          "n_sentences", "c4_keep")
        .orderBy("doc_id")
    },

    // the Gopher rule gate (Rae et al. 2021 A1.1) over deterministically
    // noised docs: every 7th doc goes symbol-heavy (#/...), every 11th
    // becomes a bullet list — the flags and conjunctive keep must agree
    // bit-for-bit with the oracle's integer cross-multiplied thresholds
    "q_quality_gopher" -> { (spark, sfDir) =>
      val noised = docs(spark, sfDir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit("# ## "), col("text"), lit(" ... and more ...")))
          .when(col("doc_id") % 11 === 0,
            lit("\u2022 one\n\u2022 two\n\u2022 three"))
          .otherwise(col("text")).as("text"))
      TextAnalysis.withGopherFlags(noised, "text", minWords = 30)
        .select(col("doc_id"), col("f_word_count"), col("f_mean_word_len"),
          col("f_symbol_ratio"), col("f_bullet_lines"), col("f_ellipsis_lines"),
          col("f_alpha_words"), col("f_stopwords"), col("gopher_keep"))
        .orderBy("doc_id")
    },

    // pre-tokenization text scrub: control/zero-width strip, Unicode-space
    // + curly-quote + dash normalization, whitespace collapse — exercised
    // on deterministically noised text (same construction both engines)
    "q_text_normalize" -> { (spark, sfDir) =>
      val noisy = concat(
        lit("\u00A0 \u201Cquoted\u201D \u2014"), col("text"),
        lit("\u0007 \u2019s \t end\u200B"))
      docs(spark, sfDir)
        .select(col("doc_id"), TextAnalysis.normalizeText(noisy).as("norm_text"))
        .orderBy("doc_id")
    },

    // HTML → text extraction over a deterministic HTML wrapping of each
    // document (title + style/script + pure-link nav/footer + headline +
    // paragraphs): script/style/comment strip, block segmentation,
    // link-density boilerplate drop, tag strip, entity decode. The nav and
    // footer blocks (100% anchor text) must vanish; title and paragraphs
    // survive — same construction and rules in both engines.
    "q_text_html_extract" -> { (spark, sfDir) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit(" &amp; friends</title><style>p{color:red}</style>"),
        lit("<script>var x=1; if(x<2){x=3;}</script></head><body>"),
        lit("<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About us</a></div>"),
        lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1><p>"),
        regexp_replace(col("text"), "\n", "</p><p>"),
        lit("</p><!-- boilerplate note --><div class=\"footer\">" +
          "<a href=\"/tos\">Terms &amp; conditions</a> | " +
          "<a href=\"/privacy\">Privacy</a></div></body></html>"))
      TextAnalysis.extractHtmlText(
          docs(spark, sfDir).select(col("doc_id"), html.as("html")),
          "doc_id", "html")
        .select("doc_id", "title", "html_text", "n_blocks", "n_kept_blocks")
        .orderBy("doc_id")
    },

    // domain-mixture resampling: retain a web60/books25/code10/ref5-style
    // target mixture over four sources (the rest dropped), scaled to the
    // largest total the corpus can serve without upsampling
    "q_sample_mixture" -> { (spark, sfDir) =>
      Sampling.mixtureSample(docs(spark, sfDir), "source", "doc_id", MixWeights)
        .select("doc_id", "source").orderBy("doc_id")
    },

    // per-IVF-cluster corpus audit: member count + centroid-cosine
    // distribution on the exact e9 domain
    "q_cluster_profile" -> { (spark, sfDir) =>
      val e = embs(spark, sfDir).select("vec_id", "embedding")
      val cents = VectorSimilarity.centroidFrame(spark, IvfCentroids.K8Sf001)
      VectorSimilarity.clusterProfile(e, "vec_id", "embedding", cents, "cid", "cv")
        .orderBy("cluster_id")
    },

    // product-analytics funnel: how far each user's (ts, event_id)-ordered
    // event sequence progresses through view -> click -> purchase
    "q_funnel" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
      Funnel.funnelDepth(ev, "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")
    },

    // first-order Markov transition matrix: what users do AFTER each event
    // type, as counts + integer-ppm conditional probabilities
    "q_event_transitions" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
      Funnel.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
        .orderBy("prev_type", "event_type")
    },

    // exact per-group sampling quota: n docs per source by smallest key
    // hash (balanced eval sets) — bounded-heap per group, no sort window
    "q_sample_group_exactn" -> { (spark, sfDir) =>
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.operators.Sampling.groupExactSample(d, "source", "doc_id", n = 8)
        .select("doc_id", "source").orderBy("doc_id")
    },

    // anchored 2-day window: later steps only count within 48h of the
    // first matched step
    "q_funnel_windowed" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
      Funnel.funnelDepthWithin(ev, "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"), spanSeconds = 2L * 86400L)
        .orderBy("user_id")
    },

    // weekly retention triangle: cohort = first active epoch-week,
    // counted in every week each user returns
    "q_retention" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
      Funnel.retentionCohorts(ev, "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    },

    // training-batch construction: greedy first-fit-contiguous packing of
    // documents into 256-token sequences across 8 hash shards
    "q_pack_sequences" -> { (spark, sfDir) =>
      val d = docs(spark, sfDir).select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Chunking.packSequences(d, "doc_id", "n_tokens", budget = 256, numShards = 8)
        .orderBy("doc_id")
    }
  )

  private val SearchTerms = Seq("dup", "vector", "merge")

  // ---- DuckDB oracle twins ----------------------------------------------

  /** Shared DuckDB builders for the PQ oracle queries: codebook VALUES,
    * per-(vec, subspace) argmin encode, nested-literal ADC terms. */
  private object PqSql {
    private val cbs = PqCodebooks.M8K16Sf001
    private val m = cbs.length
    private val sub = cbs.head.head.length

    private val valuesRows = (for { mi <- 0 until m; cid <- cbs(mi).indices } yield
      s"(CAST($mi AS BIGINT), CAST($cid AS BIGINT), " +
        s"CAST(${cbs(mi)(cid).mkString("[", ", ", "]")} AS DOUBLE[]))"
    ).mkString(",\n  ")

    /** cb + sd + pasg + codes: `codes(vec_id, code)` = the PQ code list per
      * embedding (argmin sub-centroid per subspace, ties → lowest cid). */
    val codesCtes: String =
      s"""cb(m, cid, cv) AS (VALUES
         |  $valuesRows),
         |sd AS (SELECT e.vec_id, cb.m, cb.cid,
         |         list_sum(list_transform(generate_series(1, $sub),
         |           i -> (CAST(e.embedding[cb.m * $sub + i] AS DOUBLE) - cb.cv[i])
         |              * (CAST(e.embedding[cb.m * $sub + i] AS DOUBLE) - cb.cv[i]))) AS d
         |       FROM embeddings e CROSS JOIN cb),
         |pasg AS (SELECT vec_id, m, cid,
         |           row_number() OVER (PARTITION BY vec_id, m ORDER BY d ASC, cid ASC) AS rn
         |         FROM sd),
         |codes AS (SELECT vec_id, list(cid ORDER BY m) AS code
         |          FROM pasg WHERE rn = 1 GROUP BY vec_id)""".stripMargin

    /** `cbl(c3)`: the nested codebook literal for ADC lookups. */
    val cblCte: String = {
      val c3 = cbs.map(sp => sp.map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"cbl AS (SELECT $c3 AS c3)"
    }

    /** ADC distance of query vector `qe` to the code list `codeRef`
      * (both SQL fragments), association-matched to
      * [[VectorSimilarity.pqTopK]]'s adcDist. */
    def adistTerms(qe: String, codeRef: String): String =
      (0 until m).map { mi =>
        val cv = s"cbl.c3[${mi + 1}][$codeRef[${mi + 1}] + 1]"
        s"list_sum(list_transform(generate_series(1, $sub), " +
          s"i -> (CAST($qe[${mi * sub} + i] AS DOUBLE) - $cv[i])" +
          s" * (CAST($qe[${mi * sub} + i] AS DOUBLE) - $cv[i])))"
      }.mkString("(", " + ", ")")
  }

  /** 1-deletion neighborhood of SQL fragment `s` (DuckDB spelling of
    * [[FuzzyJoin.deletionVariants]] at d = 1). */
  private def variants1Sql(s: String): String =
    s"""list_distinct(list_prepend($s,
       |  list_transform(generate_series(1, length($s)),
       |    i -> substr($s, 1, i - 1) || substr($s, i + 1, length($s)))))"""
      .stripMargin.replace("\n", "")

  val oracleSql: Map[String, String] = Map(

    "q_pipeline_curate" -> {
      val stops = TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH corpus AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, source, regexp_replace(text, ' ', '  ', 'g')
         |  FROM documents WHERE doc_id % 6 = 0
         |  UNION ALL
         |  SELECT doc_id + 200000, source,
         |    'free prize winner click here buy now ' ||
         |      array_to_string(list_reverse(${TrainingDataQueries.tok("text")}), ' ')
         |  FROM documents WHERE doc_id % 7 = 0),
         |nm AS (SELECT doc_id, source, ${TextAnalysis.normalizeTextSql("text")} AS text
         |       FROM corpus),
         |dd AS (SELECT doc_id, source, text,
         |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |       FROM nm),
         |d1 AS (SELECT doc_id, source, text FROM dd WHERE rn = 1),
         |tw AS (SELECT doc_id, source, text, ${TrainingDataQueries.tok("text")} AS w FROM d1),
         |m AS (SELECT doc_id, source, w,
         |  CAST(len(w) AS BIGINT) AS n,
         |  CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS totlen,
         |  list_filter(string_split(text, chr(10)), l -> l <> '') AS lines,
         |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
         |  CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
         |    + CAST(length(text) - length(replace(text, chr(8230), '')) AS BIGINT) AS ellipses,
         |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alphaw,
         |  CAST(len(list_filter(list_distinct(w), x -> x IN $stops)) AS BIGINT) AS stophits
         | FROM tw),
         |f AS (SELECT doc_id, source, w, n, totlen, hashes, ellipses, alphaw, stophits,
         |  CAST(len(lines) AS BIGINT) AS nlines,
         |  CAST(len(list_filter(lines, l -> starts_with(l, chr(8226))
         |    OR starts_with(l, '- ') OR starts_with(l, '* '))) AS BIGINT) AS bullets,
         |  CAST(len(list_filter(lines, l -> ends_with(l, '...')
         |    OR ends_with(l, chr(8230)))) AS BIGINT) AS ellines
         | FROM m),
         |keep AS (SELECT source, n, w FROM f
         |  WHERE (n >= 30 AND n <= 100000) AND (totlen >= 3 * n AND totlen <= 10 * n)
         |    AND (10 * (hashes + ellipses) <= n) AND (10 * bullets <= 9 * nlines)
         |    AND (10 * ellines <= 3 * nlines) AND (5 * alphaw >= 4 * n)
         |    AND (stophits >= 2)),
         |qk AS (SELECT source, n FROM keep
         |  WHERE ${graft.functions.QualityClassifier.logitPpmSql("w",
                QualityWeights.WeightsPpm, QualityWeights.BiasPpm)} >= 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM qk GROUP BY source ORDER BY source""".stripMargin
    },

    "q_quality_classifier" ->
      s"""WITH t AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000,
         |    'free prize winner click here buy now ' ||
         |      array_to_string(list_reverse(${TrainingDataQueries.tok("text")}), ' ')
         |  FROM documents),
         |w AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM t),
         |s AS (SELECT doc_id, ${graft.functions.QualityClassifier.logitPpmSql("w",
                QualityWeights.WeightsPpm, QualityWeights.BiasPpm)} AS quality_logit_ppm
         |      FROM w)
         |SELECT doc_id, quality_logit_ppm, quality_logit_ppm >= 0 AS quality_keep
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_quality_perplexity" -> {
      import graft.functions.NgramLm
      s"""WITH w AS (SELECT doc_id, lang, ${TrainingDataQueries.tok("text")} AS w
         |           FROM documents),
         |s AS (SELECT doc_id, lang,
         |        ${NgramLm.nllE6Sql("w", LmStats.NllE6)} AS lm_nll_e6
         |      FROM w)
         |SELECT doc_id, lang, lm_nll_e6,
         |  ${NgramLm.bandSql("lm_nll_e6", LmStats.HeadMaxE6, LmStats.MiddleMaxE6)} AS ppl_band
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "q_sample_importance" ->
      s"""WITH t AS (SELECT doc_id, lang, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |bgr AS (SELECT doc_id, lang, w[u.i] AS w1, w[u.i + 1] AS w2
         |        FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |        WHERE len(w) >= 2),
         |cr AS (SELECT w1, w2, count(*) AS cr FROM bgr GROUP BY 1, 2),
         |tr AS (SELECT sum(cr) AS tr FROM cr),
         |ct AS (SELECT w1, w2, count(*) AS ct FROM bgr WHERE lang = 'en' GROUP BY 1, 2),
         |tt AS (SELECT sum(ct) AS tt FROM ct),
         |sc AS (SELECT bgr.doc_id,
         |         CAST(CAST(coalesce(ct.ct, 0) * 1000000 // tt.tt AS BIGINT) * 1000000
         |              // greatest(CAST(cr.cr * 1000000 // tr.tr AS BIGINT), 1) AS BIGINT) AS ratio
         |       FROM bgr JOIN cr USING (w1, w2) LEFT JOIN ct USING (w1, w2)
         |       CROSS JOIN tr CROSS JOIN tt),
         |agg AS (SELECT doc_id, count(*) AS n,
         |          CAST(sum(ratio) // count(*) AS BIGINT) AS imp
         |        FROM sc GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(agg.imp, 0) AS BIGINT) AS importance_ppm
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "q_sample_exactn" -> {
      val h = graft.functions.PortableHash.hmodSql("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source FROM documents
         |  ORDER BY $h ASC, doc_id ASC LIMIT 100
         |) ORDER BY doc_id""".stripMargin
    },

    "q_lexical_diversity" -> {
      val h = graft.functions.PortableHash.hmodSql("token")
      s"""WITH tk AS (SELECT source, unnest(${TrainingDataQueries.tok("text")}) AS token
         |            FROM documents),
         |hh AS (SELECT source, token, $h AS h FROM tk)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |  ${graft.functions.KmvSketch.estimateSql("list(h)", 64)} AS est_vocab,
         |  CAST(count(DISTINCT token) AS BIGINT) AS exact_vocab,
         |  CAST(count(DISTINCT token) * 1000000 // count(*) AS BIGINT) AS ttr_ppm
         |FROM hh GROUP BY source ORDER BY source""".stripMargin
    },

    "q_tokenizer_fertility" ->
      s"""WITH t AS (SELECT doc_id, lang, length(text) AS nc,
         |             ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |b AS (SELECT doc_id, lang, nc, len(w) AS nws,
         |        len(${graft.functions.Bpe.tokensSql("w", BpeMerges.Merges)}) AS nbpe
         |      FROM t),
         |a AS (SELECT lang, count(*) AS n_docs, sum(nws) AS ws,
         |             sum(nbpe) AS bpe, sum(nc) AS chars
         |      FROM b GROUP BY lang)
         |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(ws AS BIGINT) AS n_ws_tokens, CAST(bpe AS BIGINT) AS n_bpe_tokens,
         |  CAST(bpe * 1000000 // ws AS BIGINT) AS fertility_ppm,
         |  CAST(chars * 1000000 // bpe AS BIGINT) AS chars_per_bpe_ppm
         |FROM a ORDER BY lang""".stripMargin,

    "q_text_typicality_bigram" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |bg AS (SELECT doc_id, w[u.i] AS w1, w[u.i + 1] AS w2
         |       FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |       WHERE len(w) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
         |sc AS (SELECT bg.doc_id,
         |         CAST(c12.c12 * 1000000 // c1.c1 AS BIGINT) AS ppm
         |       FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
         |agg AS (SELECT doc_id, count(*) AS n, CAST(sum(ppm) // count(*) AS BIGINT) AS typ
         |        FROM sc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(agg.typ, 0) AS BIGINT) AS bigram_typicality_ppm
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q_quality_c4" ->
      s"""WITH nd AS (SELECT doc_id,
         |  'the quick brown fox jumps high.' || chr(10) || text
         |  || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'please accept our cookie policy now.' ELSE '' END
         |  || CASE WHEN doc_id % 6 = 0 THEN chr(10) || 'tiny line.' ELSE '' END
         |  || CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END
         |  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet is here.' ELSE '' END
         |  || chr(10) || 'another good sentence appears right here! and one more follows after that? plus a third one ends now.'
         |  AS text FROM documents),
         |ln AS (SELECT doc_id, text,
         |         list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
         |       FROM nd),
         |kp AS (SELECT doc_id, text, lines,
         |         list_filter(lines, l ->
         |           (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
         |             OR ends_with(trim(l), '?') OR ends_with(trim(l), '"')
         |             OR ends_with(trim(l), chr(39)))
         |           AND len(list_filter(string_split(lower(trim(l)), ' '), w -> w <> '')) >= 3
         |           AND NOT contains(lower(trim(l)), 'javascript')
         |           AND NOT contains(lower(trim(l)), 'cookie')) AS kept
         |       FROM ln),
         |cl AS (SELECT doc_id, text, lines, kept,
         |         array_to_string(kept, chr(10)) AS c4_text FROM kp),
         |sn AS (SELECT doc_id, text, lines, kept, c4_text,
         |         len(list_filter(regexp_split_to_array(c4_text, '[.!?]+'),
         |             s -> trim(s) <> '')) AS nsent
         |       FROM cl)
         |SELECT doc_id, c4_text,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |  CAST(nsent AS BIGINT) AS n_sentences,
         |  (nsent >= 3 AND NOT contains(text, '{') AND NOT contains(text, '}')
         |    AND NOT contains(lower(text), 'lorem ipsum')) AS c4_keep
         |FROM sn ORDER BY doc_id""".stripMargin,

    "q_quality_gopher" -> {
      val stops = TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH nd AS (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0 THEN '# ## ' || text || ' ... and more ...'
         |       WHEN doc_id % 11 = 0 THEN chr(8226) || ' one' || chr(10) || chr(8226) || ' two' || chr(10) || chr(8226) || ' three'
         |       ELSE text END AS text FROM documents),
         |tw AS (SELECT doc_id, text, ${TrainingDataQueries.tok("text")} AS w FROM nd),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n,
         |  CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS totlen,
         |  list_filter(string_split(text, chr(10)), l -> l <> '') AS lines,
         |  CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
         |  CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
         |    + CAST(length(text) - length(replace(text, chr(8230), '')) AS BIGINT) AS ellipses,
         |  CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alphaw,
         |  CAST(len(list_filter(list_distinct(w), x -> x IN $stops)) AS BIGINT) AS stophits
         | FROM tw),
         |f AS (SELECT doc_id, n, totlen, hashes, ellipses, alphaw, stophits,
         |  CAST(len(lines) AS BIGINT) AS nlines,
         |  CAST(len(list_filter(lines, l -> starts_with(l, chr(8226))
         |    OR starts_with(l, '- ') OR starts_with(l, '* '))) AS BIGINT) AS bullets,
         |  CAST(len(list_filter(lines, l -> ends_with(l, '...')
         |    OR ends_with(l, chr(8230)))) AS BIGINT) AS ellines
         | FROM m)
         |SELECT doc_id,
         |  (n >= 30 AND n <= 100000) AS f_word_count,
         |  (totlen >= 3 * n AND totlen <= 10 * n) AS f_mean_word_len,
         |  (10 * (hashes + ellipses) <= n) AS f_symbol_ratio,
         |  (10 * bullets <= 9 * nlines) AS f_bullet_lines,
         |  (10 * ellines <= 3 * nlines) AS f_ellipsis_lines,
         |  (5 * alphaw >= 4 * n) AS f_alpha_words,
         |  (stophits >= 2) AS f_stopwords,
         |  ((n >= 30 AND n <= 100000) AND (totlen >= 3 * n AND totlen <= 10 * n)
         |    AND (10 * (hashes + ellipses) <= n) AND (10 * bullets <= 9 * nlines)
         |    AND (10 * ellines <= 3 * nlines) AND (5 * alphaw >= 4 * n)
         |    AND (stophits >= 2)) AS gopher_keep
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q_text_normalize" -> {
      // the same noise as the Spark side, built from chr() codepoints:
      // NBSP sp LDQUO 'quoted' RDQUO sp EMDASH | text | BEL sp RSQUO 's' sp TAB ' end' ZWSP
      val noisy = "chr(160) || ' ' || chr(8220) || 'quoted' || chr(8221) || ' ' || " +
        "chr(8212) || text || chr(7) || ' ' || chr(8217) || 's ' || chr(9) || " +
        "' end' || chr(8203)"
      s"""SELECT doc_id, ${TextAnalysis.normalizeTextSql(noisy)} AS norm_text
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_text_html_extract" -> {
      import TextAnalysis.{HtmlScriptPattern, HtmlStylePattern,
        HtmlCommentPattern, HtmlTitlePattern}
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; friends</title><style>p{color:red}</style>'
         |  || '<script>var x=1; if(x<2){x=3;}</script></head><body>'
         |  || '<div class="nav"><a href="/">Home</a> <a href="/about">About us</a></div>'
         |  || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
         |  || regexp_replace(text, chr(10), '</p><p>', 'g')
         |  || '</p><!-- boilerplate note --><div class="footer"><a href="/tos">Terms &amp; conditions</a> | <a href="/privacy">Privacy</a></div></body></html>'
         |  AS html FROM documents),
         |ns AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(html,
         |    '$HtmlScriptPattern', ' ', 'g'), '$HtmlStylePattern', ' ', 'g'),
         |    '$HtmlCommentPattern', ' ', 'g') AS nos FROM h),
         |tb AS (SELECT doc_id,
         |  ${TextAnalysis.htmlFragmentTextSql(s"regexp_extract(nos, '$HtmlTitlePattern', 1)")} AS title,
         |  regexp_replace(nos, '$HtmlTitlePattern', ' ', 'g') AS body FROM ns),
         |sc AS (SELECT doc_id, title, ${TextAnalysis.htmlScoredBlocksSql("body")} AS blocks FROM tb),
         |fl AS (SELECT doc_id, title, list_filter(blocks, s -> s.txt <> '') AS ne FROM sc),
         |kp AS (SELECT doc_id, title, ne,
         |  list_filter(ne, s -> 100 * s.alen <= 50 * length(s.txt)) AS kept FROM fl)
         |SELECT doc_id, title,
         |  array_to_string(list_transform(kept, s -> s.txt), chr(10)) AS html_text,
         |  CAST(len(ne) AS BIGINT) AS n_blocks,
         |  CAST(len(kept) AS BIGINT) AS n_kept_blocks
         |FROM kp ORDER BY doc_id""".stripMargin
    },

    "q_sample_mixture" ->
      s"""SELECT doc_id, source FROM (
         |${Sampling.mixtureSampleSql("documents", "source", "doc_id", MixWeights)}
         |) ORDER BY doc_id""".stripMargin,

    "q_cluster_profile" ->
      s"""WITH cents(cid, cv) AS (VALUES
         |  ${IvfCentroids.K8Sf001.zipWithIndex.map { case (v, i) =>
               s"(CAST($i AS BIGINT), CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
             }.mkString(",\n  ")}),
         |sc AS (SELECT e.vec_id, c.cid, ${TrainingDataQueries.cosSql("e.embedding", "c.cv")} AS csim
         |       FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cid AS cluster_id, csim,
         |          row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |        FROM sc),
         |a1 AS (SELECT vec_id, cluster_id, ${e9Sql("csim")} AS ce9 FROM asg WHERE rn = 1)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(ce9) AS BIGINT) AS sum_ccos_e9,
         |  min(ce9) AS min_ccos_e9, max(ce9) AS max_ccos_e9
         |FROM a1 GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |p AS (SELECT doc_id, w, len(w) AS n FROM t),
         |s AS (SELECT doc_id, w,
         |        unnest(generate_series(0, ((greatest(n - 32, 0) + 23) // 24) * 24, 24)) AS s
         |      FROM p)
         |SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
         |  CAST(len(w[s + 1 : s + 32]) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(w[s + 1 : s + 32], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "q_chunk_sentences" -> {
      val punct = "regexp_replace(text, ' the ', '. the ', 'g') || '. done now! ready?'"
      s"""WITH t AS (SELECT doc_id,
         |  ${graft.operators.TextAnalysis.sentencesOfSql(s"($punct)")} AS w
         |FROM documents),
         |p AS (SELECT doc_id, w, len(w) AS n FROM t),
         |s AS (SELECT doc_id, w,
         |        unnest(generate_series(0, ((greatest(n - 4, 0) + 2) // 3) * 3, 3)) AS s
         |      FROM p)
         |SELECT doc_id, CAST(s // 3 AS BIGINT) AS chunk_id,
         |  CAST(len(w[s + 1 : s + 4]) AS BIGINT) AS n_sentences,
         |  array_to_string(w[s + 1 : s + 4], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin
    },

    "q_bpe_encode" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |b AS (SELECT doc_id, ${graft.functions.Bpe.tokensSql("w", BpeMerges.Merges)} AS bt FROM t)
         |SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_bpe_tokens,
         |       array_to_string(bt, ' ') AS bpe_text
         |FROM b ORDER BY doc_id""".stripMargin,

    "q_bpe_roundtrip" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |d AS (SELECT doc_id, w,
         |        ${graft.functions.Bpe.decodeSql("w", BpeMerges.Merges)} AS rec
         |      FROM t)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         |  CAST(length(rec) AS BIGINT) AS decoded_len,
         |  rec = array_to_string(w, ' ') AS roundtrip_ok
         |FROM d ORDER BY doc_id""".stripMargin,

    "q_chunk_bpe" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w0 FROM documents),
         |p AS (SELECT doc_id, w, len(w) AS n FROM
         |       (SELECT doc_id, ${graft.functions.Bpe.tokensSql("w0", BpeMerges.Merges)} AS w FROM t)),
         |s AS (SELECT doc_id, w,
         |        unnest(generate_series(0, ((greatest(n - 32, 0) + 23) // 24) * 24, 24)) AS s
         |      FROM p)
         |SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
         |  CAST(len(w[s + 1 : s + 32]) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(w[s + 1 : s + 32], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pack_bpe" -> {
      val hm = graft.functions.PortableHash.hmodSql("CAST(doc_id AS VARCHAR)")
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id,
         |         CAST(len(${graft.functions.Bpe.tokensSql(TrainingDataQueries.tok("text"), BpeMerges.Merges)}) AS BIGINT) AS n,
         |         $hm % 8 AS shard
         |  FROM documents),
         |t AS (SELECT doc_id, n, shard,
         |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM d),
         |walk(shard, rn, doc_id, n, pack, used) AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), n FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.shard, t.rn, t.doc_id, t.n,
         |         CASE WHEN w.used + t.n > 256 AND w.used > 0 THEN w.pack + 1 ELSE w.pack END,
         |         CASE WHEN w.used + t.n > 256 AND w.used > 0 THEN t.n ELSE w.used + t.n END
         |  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1)
         |SELECT doc_id, n AS n_tokens, shard, pack,
         |  CAST(row_number() OVER (PARTITION BY shard, pack ORDER BY doc_id) AS BIGINT) AS pack_pos
         |FROM walk ORDER BY doc_id""".stripMargin
    },

    "q_search_bm25" ->
      s"""WITH ${Search.keywordTopKSql("documents", "doc_id", TrainingDataQueries.tok("text"), SearchTerms, 20)}
         |SELECT id AS doc_id, rank, ${e9Sql("score")} AS score_e9
         |FROM topk ORDER BY rank""".stripMargin,

    "q_collocations" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |bg AS (SELECT w[u.i] AS w1, w[u.i + 1] AS w2
         |       FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)),
         |nb AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2
         |       HAVING count(*) >= 5),
         |uc AS (SELECT word, count(*) AS c
         |       FROM (SELECT unnest(w) AS word FROM t) GROUP BY word),
         |tot AS (SELECT sum(c) AS n FROM uc),
         |sc AS (SELECT w1, w2, n_ab,
         |         (CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE))
         |           / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift
         |       FROM nb JOIN uc a ON a.word = nb.w1
         |               JOIN uc b ON b.word = nb.w2
         |               CROSS JOIN tot),
         |r AS (SELECT w1, w2, n_ab, lift,
         |        row_number() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC) AS rank
         |      FROM sc)
         |SELECT CAST(rank AS BIGINT) AS rank, w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
         |       ${e9Sql("lift")} AS lift_e9
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_text_typicality" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${TrainingDataQueries.tok("text")}) AS token
         |            FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
         |t AS (SELECT sum(cnt) AS total FROM c),
         |s AS (SELECT tk.doc_id, count(*) AS n,
         |        sum(CAST(cnt * 1000000 // total AS BIGINT)) AS sm
         |      FROM tk JOIN c USING (token) CROSS JOIN t
         |      GROUP BY tk.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sm // n, 0) AS BIGINT) AS typicality_ppm
         |FROM documents d LEFT JOIN s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // per-source quantile cuts on the typicality score, then the shared
    // hash-membership draw — integer thresholds, same definition as the
    // Spark prefix-sum path
    "q_sample_quality_band" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${TrainingDataQueries.tok("text")}) AS token
         |            FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token),
         |t AS (SELECT sum(cnt) AS total FROM c),
         |s AS (SELECT tk.doc_id, count(*) AS n,
         |        sum(CAST(cnt * 1000000 // total AS BIGINT)) AS sm
         |      FROM tk JOIN c USING (token) CROSS JOIN t
         |      GROUP BY tk.doc_id),
         |ty AS (SELECT d.doc_id, d.source,
         |         CAST(coalesce(sm // n, 0) AS BIGINT) AS typicality_ppm
         |       FROM documents d LEFT JOIN s USING (doc_id)),
         |e AS (SELECT doc_id, source, typicality_ppm,
         |        CAST(floor(CAST(typicality_ppm AS DOUBLE) * 1e9) AS BIGINT) AS v
         |      FROM ty),
         |cnts AS (SELECT source, v, count(*) AS cn FROM e GROUP BY 1, 2),
         |cum AS (SELECT source, v, sum(cn) OVER (PARTITION BY source ORDER BY v) AS cum,
         |               sum(cn) OVER (PARTITION BY source) AS n FROM cnts),
         |lo AS (SELECT source, min(v) AS lo FROM cum
         |       WHERE cum >= (250000 * n + 999999) // 1000000 GROUP BY source),
         |hi AS (SELECT source, min(v) AS hi FROM cum
         |       WHERE cum >= (750000 * n + 999999) // 1000000 GROUP BY source)
         |SELECT e.doc_id, e.source, e.typicality_ppm
         |FROM e JOIN lo USING (source) JOIN hi USING (source)
         |WHERE v >= lo AND v <= hi
         |  AND ${Sampling.hashSamplePredicateSql("doc_id", 0.5)}
         |ORDER BY e.doc_id""".stripMargin,

    "q_event_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
        |     FROM events),
        |c AS (SELECT prev AS prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY prev_type)
        |SELECT c.prev_type, c.event_type, c.n,
        |       CAST(c.n * 1000000 // t.tot AS BIGINT) AS p_ppm
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type, event_type""".stripMargin,

    "q_sample_group_exactn" -> {
      val h = graft.functions.PortableHash.hmodSql("CAST(doc_id AS VARCHAR)")
      s"""WITH h AS (SELECT doc_id, source, $h AS hv FROM documents),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source ORDER BY hv ASC, doc_id ASC) AS rk
         |      FROM h)
         |SELECT doc_id, source FROM r WHERE rk <= 8 ORDER BY doc_id""".stripMargin
    },

    // subsequence walk as a CTE chain: i_k = first occurrence of step k
    // strictly after i_{k-1} (coalesce: DuckDB list_position yields NULL
    // where Spark array_position yields 0)
    "q_funnel" -> {
      val steps = Seq("view", "click", "purchase")
      val chain = steps.zipWithIndex.map { case (s, k) =>
        if (k == 0)
          s"d0 AS (SELECT user_id, tps, coalesce(list_position(tps, '$s'), 0) AS i0 FROM u)"
        else {
          val p = k - 1
          s"""d$k AS (SELECT user_id, tps, ${(0 until k).map(j => s"i$j").mkString(", ")},
             |  CASE WHEN i$p > 0 AND coalesce(list_position(tps[i$p + 1 : len(tps)], '$s'), 0) > 0
             |       THEN i$p + list_position(tps[i$p + 1 : len(tps)], '$s')
             |       ELSE 0 END AS i$k FROM d$p)""".stripMargin
        }
      }.mkString(",\n")
      val depth = steps.indices
        .map(k => s"(CASE WHEN i$k > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH u AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS tps
         |           FROM events GROUP BY user_id),
         |$chain
         |SELECT user_id, CAST($depth AS BIGINT) AS depth
         |FROM d${steps.size - 1} ORDER BY user_id""".stripMargin
    },

    // DuckDB list index 0 yields NULL (never errors), so the bare AND in
    // the window CASE is safe where Spark needed nested whens
    "q_funnel_windowed" -> {
      val steps = Seq("view", "click", "purchase")
      val spanUs = 2L * 86400L * 1000000L
      val chain = steps.zipWithIndex.map { case (s, k) =>
        if (k == 0)
          s"d0 AS (SELECT user_id, tps, tss, coalesce(list_position(tps, '$s'), 0) AS i0 FROM u)"
        else {
          val p = k - 1
          s"""d$k AS (SELECT user_id, tps, tss, ${(0 until k).map(j => s"i$j").mkString(", ")},
             |  CASE WHEN i$p > 0 AND coalesce(list_position(tps[i$p + 1 : len(tps)], '$s'), 0) > 0
             |       THEN i$p + list_position(tps[i$p + 1 : len(tps)], '$s')
             |       ELSE 0 END AS i$k FROM d$p)""".stripMargin
        }
      }.mkString(",\n")
      val depth = steps.indices.map { k =>
        if (k == 0) "(CASE WHEN i0 > 0 THEN 1 ELSE 0 END)"
        else s"(CASE WHEN i$k > 0 AND tss[i$k] - tss[i0] <= $spanUs THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH u AS (SELECT user_id,
         |             list(event_type ORDER BY ts, event_id) AS tps,
         |             list(epoch_us(CAST(ts AS TIMESTAMP)) ORDER BY ts, event_id) AS tss
         |           FROM events GROUP BY user_id),
         |$chain
         |SELECT user_id, CAST($depth AS BIGINT) AS depth
         |FROM d${steps.size - 1} ORDER BY user_id""".stripMargin
    },

    // FLOOR-division weeks, matching the operator (exactness argument in
    // Funnel.retentionCohorts — epoch-us values sit far below 2^53)
    "q_retention" ->
      s"""WITH uw AS (SELECT DISTINCT user_id AS u,
         |              CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / ${7L * 86400L * 1000000L}.0) AS BIGINT) AS w
         |            FROM events),
         |c AS (SELECT u, min(w) AS cw FROM uw GROUP BY u)
         |SELECT CAST(c.cw AS BIGINT) AS cohort_week,
         |       CAST(uw.w - c.cw AS BIGINT) AS week_offset,
         |       CAST(count(*) AS BIGINT) AS n_users
         |FROM uw JOIN c USING (u)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the per-shard greedy walk as a linear recursive CTE (same overflow
    // rule as the Spark fold: open a new pack when the next doc would
    // overflow a non-empty pack)
    "q_pack_sequences" -> {
      val hm = graft.functions.PortableHash.hmodSql("CAST(doc_id AS VARCHAR)")
      s"""WITH RECURSIVE d AS (SELECT doc_id, CAST(len(${TrainingDataQueries.tok("text")}) AS BIGINT) AS n,
         |                            $hm % 8 AS shard
         |                     FROM documents),
         |t AS (SELECT doc_id, n, shard,
         |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM d),
         |walk(shard, rn, doc_id, n, pack, used) AS (
         |  SELECT shard, rn, doc_id, n, CAST(0 AS BIGINT), n FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.shard, t.rn, t.doc_id, t.n,
         |         CASE WHEN w.used + t.n > 256 AND w.used > 0 THEN w.pack + 1 ELSE w.pack END,
         |         CASE WHEN w.used + t.n > 256 AND w.used > 0 THEN t.n ELSE w.used + t.n END
         |  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1)
         |SELECT doc_id, n AS n_tokens, shard, pack,
         |  CAST(row_number() OVER (PARTITION BY shard, pack ORDER BY doc_id) AS BIGINT) AS pack_pos
         |FROM walk ORDER BY doc_id""".stripMargin
    },

    // PQ oracle: encode via the VALUES codebook + per-(vec, subspace) argmin
    // (row_number d ASC, cid ASC = Spark's first-min-index tie-break); ADC
    // via the nested codebook literal. All double sums are
    // list_sum(list_transform(...)) paired with Spark aggregate+zip_with —
    // the association the cosine oracles already prove bit-exact.
    "q_knn_pq" ->
      s"""WITH ${PqSql.codesCtes},
         |${PqSql.cblCte},
         |q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |sc AS (SELECT q.query_id, codes.vec_id AS neighbor_id,
         |         ${PqSql.adistTerms("q.qe", "codes.code")} AS adist
         |       FROM codes CROSS JOIN cbl JOIN q ON q.query_id <> codes.vec_id),
         |r AS (SELECT query_id, neighbor_id, adist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ${e9Sql("adist")} AS adist_e9
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_knn_recall" -> {
      val centsRows = IvfCentroids.K8Sf001.zipWithIndex.map { case (v, i) =>
        s"(CAST($i AS BIGINT), CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
      }.mkString(",\n  ")
      val cos = TrainingDataQueries.cosSql("ea", "eb")
      def top5(body: String, order: String): String =
        s"""SELECT query_id, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY $order, neighbor_id ASC) AS rk
           |  FROM ($body)) WHERE rk <= 5""".stripMargin
      def audit(method: String, pairs: String, exact: String): String =
        s"""SELECT '$method' AS method,
           |  CAST((SELECT count(DISTINCT query_id) FROM $exact) AS BIGINT) AS n_queries,
           |  CAST((SELECT count(*) FROM $exact) AS BIGINT) AS n_exact,
           |  CAST((SELECT count(*) FROM $pairs JOIN $exact USING (query_id, neighbor_id)) AS BIGINT) AS n_hits""".stripMargin
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS ea FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS eb FROM embeddings),
         |exc AS (${top5(
             s"SELECT query_id, neighbor_id, $cos AS cos FROM q JOIN c ON query_id <> neighbor_id",
             "cos DESC")}),
         |exl AS (${top5(
             s"""SELECT query_id, neighbor_id,
                |  list_sum(list_transform(generate_series(1, 64),
                |    i -> (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE))
                |       * (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE)))) AS d
                |FROM q JOIN c ON query_id <> neighbor_id""".stripMargin,
             "d ASC")}),
         |${TrainingDataQueries.bucketSql("embeddings", 6, 64)},
         |lq AS (SELECT vec_id AS query_id, embedding AS ea, bucket FROM bk WHERE vec_id < 20),
         |lc AS (SELECT vec_id AS neighbor_id, embedding AS eb, bucket FROM bk),
         |lshp AS (${top5(
             s"SELECT query_id, neighbor_id, $cos AS cos FROM lq JOIN lc USING (bucket) WHERE query_id <> neighbor_id",
             "cos DESC")}),
         |mq AS (SELECT vec_id AS query_id, embedding AS ea,
         |         unnest(list_prepend(bucket,
         |           list_transform(generate_series(0, 5),
         |             j -> xor(bucket, CAST(1 AS BIGINT) << j)))) AS probe
         |       FROM bk WHERE vec_id < 20),
         |mpp AS (${top5(
             s"SELECT query_id, neighbor_id, $cos AS cos FROM mq JOIN lc ON lc.bucket = mq.probe WHERE query_id <> neighbor_id",
             "cos DESC")}),
         |cents(cid, cv) AS (VALUES
         |  $centsRows),
         |ia AS (SELECT e.vec_id, e.embedding, cents.cid,
         |         ${TrainingDataQueries.cosSql("e.embedding", "cents.cv")} AS csim
         |       FROM embeddings e CROSS JOIN cents),
         |iasg AS (SELECT vec_id, embedding, cid AS cluster_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |         FROM ia),
         |icorp AS (SELECT vec_id AS neighbor_id, embedding AS eb, cluster_id FROM iasg WHERE rn = 1),
         |iq1 AS (SELECT vec_id AS query_id, embedding AS ea, cluster_id FROM iasg WHERE vec_id < 20 AND rn <= 1),
         |iq2 AS (SELECT vec_id AS query_id, embedding AS ea, cluster_id FROM iasg WHERE vec_id < 20 AND rn <= 2),
         |ivf1 AS (${top5(
             s"SELECT query_id, neighbor_id, $cos AS cos FROM iq1 JOIN icorp USING (cluster_id) WHERE query_id <> neighbor_id",
             "cos DESC")}),
         |ivf2 AS (${top5(
             s"SELECT query_id, neighbor_id, $cos AS cos FROM iq2 JOIN icorp USING (cluster_id) WHERE query_id <> neighbor_id",
             "cos DESC")}),
         |${PqSql.codesCtes},
         |${PqSql.cblCte},
         |pqsc AS (SELECT pq2.query_id, codes.vec_id AS neighbor_id,
         |           ${PqSql.adistTerms("pq2.qe", "codes.code")} AS adist
         |         FROM codes CROSS JOIN cbl
         |         JOIN (SELECT vec_id AS query_id, embedding AS qe
         |               FROM embeddings WHERE vec_id < 20) pq2
         |           ON pq2.query_id <> codes.vec_id),
         |pqp AS (${top5("SELECT query_id, neighbor_id, adist FROM pqsc", "adist ASC")}),
         |exi AS (${top5(
             s"""SELECT query_id, neighbor_id,
                |  list_sum(list_transform(generate_series(1, 64),
                |    i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))) AS ip
                |FROM q JOIN c ON query_id <> neighbor_id""".stripMargin,
             "ip DESC")}),
         |i8m AS (SELECT vec_id, embedding,
         |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
         |        FROM embeddings),
         |i8z AS (SELECT vec_id, ma,
         |          CASE WHEN ma = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |               ELSE list_transform(embedding,
         |                      x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT))
         |          END AS qv FROM i8m),
         |i8p AS (${top5(
             s"""SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                |  CAST(list_sum(list_transform(generate_series(1, 64),
                |         i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                |    * ((a.ma * b.ma) / 16129.0) AS s
                |FROM i8z a JOIN i8z b ON a.vec_id < 20 AND a.vec_id <> b.vec_id""".stripMargin,
             "s DESC")})
         |SELECT method, n_queries, n_exact, n_hits,
         |  CAST(n_hits * 1000000 // n_exact AS BIGINT) AS recall_ppm
         |FROM (
         |  ${audit("ivf_p1", "ivf1", "exc")}
         |  UNION ALL
         |  ${audit("ivf_p2", "ivf2", "exc")}
         |  UNION ALL
         |  ${audit("lsh", "lshp", "exc")}
         |  UNION ALL
         |  ${audit("lsh_multiprobe", "mpp", "exc")}
         |  UNION ALL
         |  ${audit("pq_adc", "pqp", "exl")}
         |  UNION ALL
         |  ${audit("int8", "i8p", "exi")}
         |) ORDER BY method""".stripMargin
    },

    "q_knn_lsh_multiprobe" ->
      s"""WITH ${TrainingDataQueries.bucketSql("embeddings", 6, 64)},
         |q AS (SELECT vec_id AS query_id, embedding AS ea,
         |        unnest(list_prepend(bucket,
         |          list_transform(generate_series(0, 5),
         |            j -> xor(bucket, CAST(1 AS BIGINT) << j)))) AS probe
         |      FROM bk WHERE vec_id < 10),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS eb, bucket FROM bk),
         |sc AS (SELECT query_id, neighbor_id, ${TrainingDataQueries.cosSql("ea", "eb")} AS cos
         |       FROM q JOIN c ON c.bucket = q.probe
         |       WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ${e9Sql("cos")} AS cosine_e9
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    // IVF-PQ: IVF prunes (corpus in its nearest cluster by cosine, queries
    // probe their 2 nearest), PQ scores the survivors by ADC
    "q_knn_ivfpq" -> {
      val centsRows = IvfCentroids.K8Sf001.zipWithIndex.map { case (v, i) =>
        s"(CAST($i AS BIGINT), CAST(${v.mkString("[", ", ", "]")} AS DOUBLE[]))"
      }.mkString(",\n  ")
      s"""WITH cents(cid, cv) AS (VALUES
         |  $centsRows),
         |ia AS (SELECT e.vec_id, e.embedding, c.cid,
         |         ${TrainingDataQueries.cosSql("e.embedding", "c.cv")} AS csim
         |       FROM embeddings e CROSS JOIN cents c),
         |iasg AS (SELECT vec_id, embedding, cid AS cluster_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |         FROM ia),
         |${PqSql.codesCtes},
         |${PqSql.cblCte},
         |ccl AS (SELECT i.vec_id, i.cluster_id, codes.code
         |        FROM iasg i JOIN codes USING (vec_id) WHERE i.rn = 1),
         |qcl AS (SELECT vec_id AS query_id, embedding AS qe, cluster_id
         |        FROM iasg WHERE vec_id < 10 AND rn <= 2),
         |sc AS (SELECT q.query_id, ccl.vec_id AS neighbor_id,
         |         ${PqSql.adistTerms("q.qe", "ccl.code")} AS adist
         |       FROM qcl q
         |       JOIN ccl ON q.cluster_id = ccl.cluster_id AND q.query_id <> ccl.vec_id
         |       CROSS JOIN cbl),
         |r AS (SELECT query_id, neighbor_id, adist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ${e9Sql("adist")} AS adist_e9
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },

    "q_domain_stats" ->
      s"""WITH src AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |       THEN text || ' see https://' ||
         |            CASE WHEN doc_id % 3 = 0 THEN 'example.com'
         |                 WHEN doc_id % 3 = 1 THEN 'www.example.com'
         |                 ELSE 'data.org' END || '/page' ||
         |            CASE WHEN doc_id % 6 = 0 THEN ' and http://mirror.net/x' ELSE '' END
         |       ELSE text END AS text
         |  FROM documents),
         |h AS (SELECT doc_id,
         |        regexp_replace(lower(unnest(
         |          regexp_extract_all(text, '${TextAnalysis.UrlHostPattern}', 1))),
         |          '^www\\.', '') AS host
         |      FROM src)
         |SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_urls
         |FROM h GROUP BY host ORDER BY host""".stripMargin,

    "q_sample_weighted" -> {
      val stopwordsSql =
        TextAnalysis.Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH t AS (SELECT doc_id, text, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS uniq_ratio,
         |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio,
         |  CAST(len(list_filter(w, x -> x IN $stopwordsSql)) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS stopword_ratio,
         |  CAST(len(w) AS DOUBLE) AS n_tok_d
         |FROM t),
         |q AS (SELECT doc_id,
         |  uniq_ratio * 0.3 + alpha_ratio * 0.3 + least(stopword_ratio * 4.0, 1.0) * 0.2 + least(n_tok_d / 100.0, 1.0) * 0.2 AS quality
         |FROM r)
         |SELECT doc_id, ${e9Sql("quality")} AS quality_score_e9
         |FROM q WHERE ${Sampling.weightedHashSampleSql("doc_id", "quality")}
         |ORDER BY doc_id""".stripMargin
    },

    "q_line_dedup" ->
      s"""WITH src AS (SELECT doc_id,
         |  CASE WHEN doc_id % 5 = 0
         |       THEN text || chr(10) || 'subscribe to our newsletter' || chr(10) || 'all rights reserved'
         |       WHEN doc_id % 3 = 0
         |       THEN text || chr(10) || 'subscribe to our newsletter'
         |       ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM src),
         |ln AS (SELECT doc_id, u.pos AS pos, lines[u.pos] AS line
         |       FROM t, unnest(generate_series(1, len(lines))) AS u(pos)),
         |cf AS (SELECT line, count(DISTINCT doc_id) AS dfc FROM ln GROUP BY line),
         |keep AS (SELECT ln.doc_id, ln.pos, ln.line
         |         FROM ln JOIN cf USING (line) WHERE dfc < 50),
         |res AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         |               count(*) AS kept
         |        FROM keep GROUP BY doc_id)
         |SELECT t.doc_id, coalesce(res.clean_text, '') AS clean_text,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(lines) - coalesce(kept, 0) AS BIGINT) AS n_dropped
         |FROM t LEFT JOIN res ON t.doc_id = res.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "q_spell_correct" ->
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.tok("text")} AS w FROM documents),
         |vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |          FROM (SELECT unnest(w) AS word FROM t) GROUP BY word),
         |bad AS (SELECT DISTINCT substr(w3, 1, 1) || substr(w3, 3, length(w3)) AS bad
         |        FROM (SELECT w[3] AS w3 FROM t WHERE doc_id % 10 = 0)
         |        WHERE length(w3) >= 4),
         |lv AS (SELECT bad AS s, unnest(${variants1Sql("bad")}) AS v
         |       FROM bad WHERE length(bad) >= 3),
         |rv AS (SELECT word AS s, unnest(${variants1Sql("word")}) AS v
         |       FROM (SELECT DISTINCT word FROM vocab WHERE length(word) >= 3)),
         |cand AS (SELECT DISTINCT lv.s AS bad, rv.s AS word
         |         FROM lv JOIN rv ON lv.v = rv.v),
         |ver AS (SELECT bad, word, CAST(levenshtein(bad, word) AS BIGINT) AS dist
         |        FROM cand WHERE levenshtein(bad, word) <= 1),
         |wd AS (SELECT ver.bad, ver.word, ver.dist, vocab.cnt,
         |         row_number() OVER (PARTITION BY ver.bad
         |                            ORDER BY ver.dist ASC, vocab.cnt DESC, ver.word ASC) AS rn
         |       FROM ver JOIN vocab ON ver.word = vocab.word)
         |SELECT bad, word AS suggestion, dist, cnt
         |FROM wd WHERE rn = 1 ORDER BY bad""".stripMargin,

    "q_fuzzy_join" ->
      s"""WITH l AS (SELECT c_custkey, c_name FROM customer),
         |r AS (SELECT c_custkey + 100000 AS noisy_id,
         |             substr(c_name, 1, 4) || substr(c_name, 6, length(c_name)) AS name
         |      FROM customer WHERE c_custkey % 4 = 0),
         |ls AS (SELECT DISTINCT c_name AS s FROM l WHERE length(c_name) >= 3),
         |rs AS (SELECT DISTINCT name AS s FROM r WHERE length(name) >= 3),
         |lv AS (SELECT s, unnest(${variants1Sql("s")}) AS v FROM ls),
         |rv AS (SELECT s, unnest(${variants1Sql("s")}) AS v FROM rs),
         |cand AS (SELECT DISTINCT lv.s AS sl, rv.s AS sr
         |         FROM lv JOIN rv ON lv.v = rv.v),
         |ver AS (SELECT sl, sr, CAST(levenshtein(sl, sr) AS BIGINT) AS dist
         |        FROM cand WHERE levenshtein(sl, sr) <= 1)
         |SELECT l.c_custkey, r.noisy_id, ver.dist
         |FROM ver JOIN l ON l.c_name = ver.sl JOIN r ON r.name = ver.sr
         |ORDER BY c_custkey, noisy_id""".stripMargin
  )
}
