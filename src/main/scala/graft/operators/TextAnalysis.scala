package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.PortableHash

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, and document
  * fingerprinting. Extension scope beyond the reference (which has no text
  * functions at all — /root/reference/easy_etl/__init__.py delegates
  * everything scalar to Python string methods, §2.1/T1); these are the
  * operations a 100 TB corpus pipeline runs before training.
  *
  * Design: every operator is a pure `Column` expression (whole-stage
  * codegen, no UDFs), so scans stay pipelined and columns prune — a
  * quality-score pass over 100 TB is one projection over the text column,
  * no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Learned-merge BPE subword tokens of `text` under a frozen merge
    * table ([[graft.functions.Bpe]]): lowercased whitespace words, each
    * encoded by the replace fold, flattened in order. The real tokenizer
    * every context-window and packing budget should be denominated in
    * (replaces round 5's regex stand-in). */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.Bpe.tokens(text, merges)

  /** Sentence segmentation as a pure projection: split after terminal
    * punctuation ([.!?]) followed by whitespace, trimmed, empties dropped.
    * RE2 (the oracle's regex engine) has no lookbehind, so the shared
    * dialect marks boundaries with a sentinel (U+001E, record separator)
    * and splits on it; pre-existing U+001E is stripped first so hostile
    * input cannot inject boundaries. NULL-safe (NULL → empty array).
    * Feed to [[Chunking.tokenChunksOf]] for sentence-window chunking. */
  def sentencesOf(text: Column): Column = {
    val clean = regexp_replace(coalesce(text, lit("")), "\u001E", "")
    val marked = regexp_replace(clean, "([.!?])\\s+", "$1\u001E")
    filter(transform(split(marked, "\u001E"), s => trim(s)), s => s =!= lit(""))
  }

  /** The DuckDB spelling of [[sentencesOf]]. */
  def sentencesOfSql(s: String): String = {
    val clean = s"regexp_replace(coalesce($s, ''), '\\x{1E}', '', 'g')"
    val marked = s"regexp_replace($clean, '([.!?])$JavaWsSplitSql', " +
      "'\\1' || chr(30), 'g')"
    s"list_filter(list_transform(string_split($marked, chr(30)), x -> trim(x)), " +
      "x -> x <> '')"
  }

  /** English stopwords used by quality scoring (tiny, deterministic). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---- text normalization ------------------------------------------------
  //
  // The standard pre-tokenization scrub (the ftfy/CCNet cleanup step,
  // minus ICU): strip control + zero-width characters, map exotic Unicode
  // spaces to ' ', straighten curly quotes and dashes, collapse whitespace
  // runs, trim. Patterns use \x{hex} escapes ONLY — the syntax Java regex
  // and RE2 (DuckDB) share ('\uXXXX' is Java-only; bare '\s' differs
  // between the engines re \x0B) — and each pattern string below is
  // interpolated verbatim into BOTH engines' plans. Unicode NFC/NFKC is
  // deliberately out of scope: it needs an ICU/Normalizer UDF (breaks
  // whole-stage codegen) and the two engines' normalizers aren't
  // guaranteed bit-identical.

  /** Control chars (minus \t \n \r), zero-widths, BOM, soft hyphen → drop. */
  val DropPattern: String =
    "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}\\x{AD}\\x{200B}-\\x{200D}\\x{FEFF}]"
  /** Exotic Unicode spaces → ASCII space. */
  val SpacePattern: String =
    "[\\x{A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]"
  /** Curly/prime single quotes → '. */
  val SingleQuotePattern: String = "[\\x{2018}\\x{2019}\\x{201A}\\x{2032}]"
  /** Curly/low double quotes → ". */
  val DoubleQuotePattern: String = "[\\x{201C}\\x{201D}\\x{201E}\\x{2033}]"
  /** Hyphen/dash family (incl. minus sign) → -. */
  val DashPattern: String = "[\\x{2010}-\\x{2015}\\x{2212}]"
  /** ASCII whitespace runs (spelled out — Java \s and RE2 \s disagree). */
  val WsRunPattern: String = "[ \\x{09}\\x{0A}\\x{0D}]+"
  /** The ORACLE spelling of Java's `\s` class for token splitting: RE2's
    * `\s` lacks \x0B (vertical tab), so a bare '\s+' in the DuckDB twin
    * would keep "a\x0Bb" as one token where Spark's `split(_, "\\s+")`
    * yields two. Every oracle tokenizer interpolates THIS class so the two
    * engines split identically on all inputs, not just corpora that happen
    * to lack \x0B. (The Spark side keeps "\\s+" — Java \s IS this class.) */
  val JavaWsSplitSql: String = "[ \\x{09}\\x{0A}\\x{0B}\\x{0C}\\x{0D}]+"

  /** Deterministic text normalization as one codegen'd projection — no
    * UDF, no shuffle; at 100 TB this is a pure scan-side rewrite. */
  def normalizeText(c: Column): Column = {
    val dropped = regexp_replace(c, DropPattern, "")
    val spaces = regexp_replace(dropped, SpacePattern, " ")
    val sq = regexp_replace(spaces, SingleQuotePattern, "'")
    val dq = regexp_replace(sq, DoubleQuotePattern, "\"")
    val dashes = regexp_replace(dq, DashPattern, "-")
    trim(regexp_replace(dashes, WsRunPattern, " "))
  }

  /** The DuckDB spelling of [[normalizeText]] over SQL fragment `s` (the
    * 'g' flag replaces every match, matching Spark's semantics). */
  def normalizeTextSql(s: String): String = {
    def rep(src: String, pat: String, to: String): String =
      s"regexp_replace($src, '$pat', '$to', 'g')"
    val dropped = rep(s, DropPattern, "")
    val spaces = rep(dropped, SpacePattern, " ")
    val sq = rep(spaces, SingleQuotePattern, "''")
    val dq = rep(sq, DoubleQuotePattern, "\"")
    val dashes = rep(dq, DashPattern, "-")
    s"trim(${rep(dashes, WsRunPattern, " ")})"
  }

  // ---- HTML → text extraction -------------------------------------------
  //
  // The first stage of every web-corpus pipeline (C4/Gopher/CCNet all start
  // from crawled HTML): strip script/style/comments, segment on block tags,
  // drop boilerplate blocks by link density (the jusText/boilerpipe
  // heuristic — navigation and footer blocks are mostly anchor text), strip
  // the remaining tags, decode the common entities, collapse whitespace.
  // Pure codegen regex/expression chains in the shared Java-regex/RE2
  // dialect (the [[normalizeText]] pattern): a scan-side projection, no
  // shuffle, no UDF — at 100 TB extraction runs at scan speed.

  /** `<script>…</script>` elements (content included). */
  val HtmlScriptPattern: String = "(?is)<script[^>]*>.*?</script>"
  /** `<style>…</style>` elements (content included). */
  val HtmlStylePattern: String = "(?is)<style[^>]*>.*?</style>"
  /** `<!-- … -->` comments. */
  val HtmlCommentPattern: String = "(?s)<!--.*?-->"
  /** `<title>…</title>` element — group 1 is the title text. */
  val HtmlTitlePattern: String = "(?is)<title[^>]*>(.*?)</title>"
  /** Block-level tags: segmentation boundaries for the link-density test. */
  val HtmlBlockTagPattern: String =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|section|article|header|footer|nav|form)[^>]*>"
  /** `<a>…</a>` elements — group 1 is the anchor inner HTML. */
  val HtmlAnchorPattern: String = "(?is)<a[^>]*>(.*?)</a>"
  /** Any remaining tag. */
  val HtmlTagPattern: String = "<[^>]*>"
  /** Entity decodes, in application order (`&amp;` LAST, so a literal
    * `&amp;lt;` decodes to `&lt;` and not to `<`). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Tag-strip + entity-decode + whitespace-collapse of an HTML fragment. */
  private def htmlFragmentText(b: Column): Column = {
    val noTags = regexp_replace(b, HtmlTagPattern, " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r) // entities contain no regex metacharacters
    }
    trim(regexp_replace(decoded, WsRunPattern, " "))
  }

  /** Summed visible-text length of a fragment's `<a>` elements. */
  private def anchorTextLen(b: Column): Column =
    aggregate(regexp_extract_all(b, lit(HtmlAnchorPattern), lit(1)),
      lit(0L), (acc, m) => acc + length(htmlFragmentText(m)).cast(LongType))

  /** HTML → text: emits (idCol…, title, html_text, n_blocks,
    * n_kept_blocks). A block survives when its visible text is non-empty
    * and its link density (anchor-text chars / total chars) is at most
    * `maxLinkDensityPct`% — the integer cross-multiplied test
    * `100·alen ≤ pct·tlen`, exact in both engines. Kept blocks join with
    * newlines in document order.
    */
  def extractHtmlText(df: DataFrame, idCol: String, htmlCol: String,
                      maxLinkDensityPct: Int = 50): DataFrame = {
    require(maxLinkDensityPct >= 0 && maxLinkDensityPct <= 100,
      s"maxLinkDensityPct must be a percentage: $maxLinkDensityPct")
    val h = coalesce(col(htmlCol), lit(""))
    val noScript = regexp_replace(regexp_replace(regexp_replace(h,
      HtmlScriptPattern, " "), HtmlStylePattern, " "), HtmlCommentPattern, " ")
    val title = htmlFragmentText(regexp_extract(noScript, HtmlTitlePattern, 1))
    val body = regexp_replace(noScript, HtmlTitlePattern, " ")
    // bind the scored block array ONCE (lambda-bearing trees are not
    // reliably collapsed by subexpression elimination)
    val scored = transform(split(body, HtmlBlockTagPattern),
      b => struct(htmlFragmentText(b).as("txt"), anchorTextLen(b).as("alen")))
    df.withColumn("__scored", scored)
      .withColumn("__nonempty",
        filter(col("__scored"), s => s("txt") =!= lit("")))
      .withColumn("__kept", filter(col("__nonempty"), s =>
        s("alen") * lit(100L) <=
          lit(maxLinkDensityPct.toLong) * length(s("txt")).cast(LongType)))
      .withColumn("title", title)
      .withColumn("html_text",
        concat_ws("\n", transform(col("__kept"), s => s("txt"))))
      .withColumn("n_blocks", size(col("__nonempty")).cast(LongType))
      .withColumn("n_kept_blocks", size(col("__kept")).cast(LongType))
      .drop("__scored", "__nonempty", "__kept")
  }

  /** DuckDB twin of [[htmlFragmentText]] over SQL fragment `b`. */
  def htmlFragmentTextSql(b: String): String = {
    val noTags = s"regexp_replace($b, '$HtmlTagPattern', ' ', 'g')"
    val decoded = HtmlEntities.foldLeft(noTags) { case (s, (e, r)) =>
      val rq = if (r == "'") "chr(39)" else s"'$r'"
      s"replace($s, '$e', $rq)"
    }
    s"trim(regexp_replace($decoded, '$WsRunPattern', ' ', 'g'))"
  }

  /** DuckDB twin of [[extractHtmlText]]'s block scoring: a SQL fragment
    * yielding the list of (txt, alen) structs for every block of `body`
    * (script/style/comment/title removal is the caller's, via the shared
    * pattern constants). The caller filters for the nonempty and kept
    * lists exactly as the Spark side does. */
  def htmlScoredBlocksSql(body: String): String = {
    val blockTxt = htmlFragmentTextSql("b")
    val anchorLen = "coalesce(list_sum(list_transform(" +
      s"regexp_extract_all(b, '$HtmlAnchorPattern', 1), " +
      s"m -> length(${htmlFragmentTextSql("m")}))), 0)"
    s"list_transform(regexp_split_to_array($body, '$HtmlBlockTagPattern'), " +
      s"b -> struct_pack(txt := $blockTxt, alen := $anchorLen))"
  }

  private def ratioIn(toks: Column, words: Seq[String]): Column = {
    val inSet = (t: Column) => words.map(w => t === lit(w)).reduce(_ || _)
    size(filter(toks, inSet)).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Token/char statistics + a composite quality score, as a projection.
    * Emits: n_tokens, n_uniq_tokens, n_bpe_tokens, avg_token_len,
    * alpha_ratio, stopword_ratio, quality_score (all deterministic).
    * `bpeMerges` is the frozen learned merge table the n_bpe_tokens
    * budget counts in (e.g. graft.queries.BpeMerges.Merges).
    */
  def withStats(df: DataFrame, textCol: String,
                bpeMerges: Seq[(String, String)]): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    val totLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast(LongType))
    val alpha = length(regexp_replace(lower(t), "[^a-z]", ""))
    val uniqRatio = nUniq.cast(DoubleType) / greatest(nTok, lit(1)).cast(DoubleType)
    val alphaRatio = alpha.cast(DoubleType) / greatest(length(t), lit(1)).cast(DoubleType)
    val stopRatio = ratioIn(toks, Stopwords)
    // quality: unique-vocab ratio, alphabetic density, stopword presence,
    // and a saturating length prior — the standard heuristic-filter shape
    // (Gopher/C4-style rules), weights fixed for determinism.
    val quality =
      uniqRatio * 0.3 + alphaRatio * 0.3 +
        least(stopRatio * lit(4.0), lit(1.0)) * 0.2 +
        least(nTok.cast(DoubleType) / lit(100.0), lit(1.0)) * 0.2
    df.withColumn("n_tokens", nTok.cast(LongType))
      .withColumn("n_uniq_tokens", nUniq.cast(LongType))
      .withColumn("n_bpe_tokens", size(bpeTokens(t, bpeMerges)).cast(LongType))
      .withColumn("avg_token_len",
        totLen.cast(DoubleType) / greatest(nTok, lit(1)).cast(DoubleType))
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score", quality)
  }

  /** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning…", §2.2) as one codegen'd projection — the
    * LINE-level companion to the doc-level [[withGopherFlags]] gate:
    * keep only lines that end in terminal punctuation (. ! ? " ')
    * and carry at least `minLineWords` words and mention none of the
    * `bannedLineWords` (javascript/cookie boilerplate); then gate the
    * whole document on ≥ `minSentences` sentences, no curly brace (code
    * leak-through), and no "lorem ipsum". Returns per doc:
    * (idCol, c4_text, n_lines, n_kept_lines, n_sentences, c4_keep).
    *
    * Scale: pure scan-side projection, no shuffle — the filter runs at
    * scan speed and composes with any downstream sampler.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = 3, minSentences: Int = 5,
              bannedLineWords: Seq[String] = Seq("javascript", "cookie")):
      DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val bound = df.withColumn("__lines",
      filter(split(t, "\n"), l => trim(l) =!= lit("")))
    val lines = col("__lines")
    // a kept line: terminal punctuation + word budget + no banned word
    val keepLine = (l: Column) => {
      val lt = trim(l)
      val terminal = lt.endsWith(".") || lt.endsWith("!") || lt.endsWith("?") ||
        lt.endsWith("\"") || lt.endsWith("'")
      val enoughWords =
        size(filter(split(lower(lt), " "), w => w =!= lit(""))) >= minLineWords
      val banned = bannedLineWords.map(b => lower(lt).contains(b)).reduce(_ || _)
      terminal && enoughWords && !banned
    }
    // bind the kept-lines filter and the reassembled text ONCE per row —
    // three output columns reference them, and Spark's subexpression
    // elimination does not reliably collapse lambda-bearing trees
    val bound2 = bound
      .withColumn("__kept", filter(lines, keepLine))
      .withColumn("c4_text", concat_ws("\n", col("__kept")))
    // sentence count over the KEPT text: terminal-punctuation runs
    val nSentences = size(filter(
      split(col("c4_text"), "[.!?]+"), s => trim(s) =!= lit("")))
    val hasBrace = t.contains("{") || t.contains("}")
    val hasLorem = lower(t).contains("lorem ipsum")
    bound2
      .withColumn("n_lines", size(lines).cast(LongType))
      .withColumn("n_kept_lines", size(col("__kept")).cast(LongType))
      .withColumn("n_sentences", nSentences.cast(LongType))
      .withColumn("c4_keep",
        nSentences >= minSentences && !hasBrace && !hasLorem)
      .drop("__lines", "__kept")
  }

  // ---- Gopher quality rules ---------------------------------------------

  /** The Gopher corpus-filter rule set (Rae et al. 2021, "Scaling Language
    * Models: ... Gopher", Appendix A1.1) as one codegen'd projection: per
    * document, a boolean per rule plus the conjunctive `gopher_keep` gate.
    * All thresholds are evaluated in INTEGER cross-multiplied form
    * (10·symbols ≤ words, not symbols/words ≤ 0.1) so the flags are exact
    * and engine-portable — no double division anywhere.
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [3, 10]; symbol-to-word ratio (# and …/'...') ≤ 0.1; ≤ 90% of lines
    * bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of words contain
    * an alphabetic character; ≥ 2 distinct stopwords present.
    *
    * Scale: pure scan-side projection — no shuffle, no UDF; the gate runs
    * at scan speed over 100 TB and composes with any downstream sampler.
    */
  def withGopherFlags(df: DataFrame, textCol: String,
                      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    // NULL text gates like empty text (definite false flags, not NULL
    // tri-state booleans a downstream filter silently loses both ways)
    val t = coalesce(col(textCol), lit(""))
    // bind the tokenization and line split ONCE per row (expressions that
    // reference them below would otherwise re-run the regex splits)
    val bound = df
      .withColumn("__toks", tokens(t))
      .withColumn("__lines", filter(split(t, "\n"), l => l =!= lit("")))
    val toks = col("__toks")
    val lines = col("__lines")
    val n = size(toks).cast(LongType)
    val totLen = aggregate(toks, lit(0L), (a, w) => a + length(w).cast(LongType))
    val nLines = size(lines).cast(LongType)
    val bulletLines = size(filter(lines, l =>
      l.startsWith("\u2022") || l.startsWith("- ") || l.startsWith("* "))).cast(LongType)
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("\u2026"))).cast(LongType)
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast(LongType)
    val ellipses = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast(LongType) +
      (length(t) - length(regexp_replace(t, "\u2026", ""))).cast(LongType)
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]"))).cast(LongType)
    val stopHits = size(array_intersect(array_distinct(toks),
      typedLit(Stopwords))).cast(LongType)
    bound.withColumn("f_word_count", n >= minWords && n <= maxWords)
      .withColumn("f_mean_word_len", totLen >= lit(3L) * n && totLen <= lit(10L) * n)
      .withColumn("f_symbol_ratio", lit(10L) * (hashes + ellipses) <= n)
      .withColumn("f_bullet_lines", lit(10L) * bulletLines <= lit(9L) * nLines)
      .withColumn("f_ellipsis_lines", lit(10L) * ellipsisLines <= lit(3L) * nLines)
      .withColumn("f_alpha_words", lit(5L) * alphaWords >= lit(4L) * n)
      .withColumn("f_stopwords", stopHits >= 2L)
      .withColumn("gopher_keep", gopherKeepExpr(col(textCol), minWords, maxWords))
      .drop("__toks", "__lines")
  }

  /** `gopher_keep` as ONE self-contained let-bound tree — the same
    * conjunction of the seven flags above, but with the input text AND the
    * token/line arrays bound as lambda VALUES (the [[QualityClassifier]] /
    * shingles trick). Why: a downstream `filter(gopher_keep)` is
    * deterministic, so Catalyst pushes it below windows/joins down to the
    * scan, INLINING the referenced column trees — with the flag-column
    * formulation that re-ran the normalize+tokenize chain once per
    * subpredicate (~10× per row in q_pipeline_curate's pushed scan filter,
    * its dominant task cost; lambda-bearing trees are outside Spark's
    * subexpression elimination, so nothing de-duplicated them). Bound as
    * values, the gate costs one tokenize + one line split per row wherever
    * the optimizer moves it. Boolean-identical by construction: the same
    * seven conditions over the same arrays, in the same order.
    */
  private def gopherKeepExpr(text: Column, minWords: Int, maxWords: Int): Column =
    element_at(transform(array(coalesce(text, lit(""))), tv =>
      element_at(transform(array(struct(
          tokens(tv).as("ws"),
          filter(split(tv, "\n"), l => l =!= lit("")).as("ls"))), b => {
        val toks = b.getField("ws")
        val lines = b.getField("ls")
        val n = size(toks).cast(LongType)
        val totLen = aggregate(toks, lit(0L), (a, w) => a + length(w).cast(LongType))
        val nLines = size(lines).cast(LongType)
        val bulletLines = size(filter(lines, l =>
          l.startsWith("•") || l.startsWith("- ") || l.startsWith("* "))).cast(LongType)
        val ellipsisLines = size(filter(lines, l =>
          l.endsWith("...") || l.endsWith("…"))).cast(LongType)
        val hashes = (length(tv) - length(regexp_replace(tv, "#", ""))).cast(LongType)
        val ellipses = ((length(tv) - length(regexp_replace(tv, "\\.\\.\\.", ""))) / 3).cast(LongType) +
          (length(tv) - length(regexp_replace(tv, "…", ""))).cast(LongType)
        val alphaWords = size(filter(toks, w => w.rlike("[a-z]"))).cast(LongType)
        val stopHits = size(array_intersect(array_distinct(toks),
          typedLit(Stopwords))).cast(LongType)
        (n >= minWords && n <= maxWords) &&
          (totLen >= lit(3L) * n && totLen <= lit(10L) * n) &&
          (lit(10L) * (hashes + ellipses) <= n) &&
          (lit(10L) * bulletLines <= lit(9L) * nLines) &&
          (lit(10L) * ellipsisLines <= lit(3L) * nLines) &&
          (lit(5L) * alphaWords >= lit(4L) * n) &&
          (stopHits >= 2L)
      }), 1)), 1)

  /** Stopword profiles for the n-gram/stopword language-ID heuristic.
    * Order matters: ties resolve to the FIRST language in this list.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和")
  )

  /** Predict a language per row from stopword-hit ratios; emits
    * `<out>` (the argmax language, first-wins on ties) and
    * `<out>_score` (the winning ratio). A heuristic n-gram profiler, not a
    * trained model — the point is the distributed shape: one projection,
    * no shuffle, runs at scan speed on 100 TB.
    */
  def withLangId(df: DataFrame, textCol: String, out: String = "pred_lang"): DataFrame = {
    val toks = tokens(col(textCol))
    val scores = LangProfiles.map { case (lang, words) => lang -> ratioIn(toks, words) }
    // first-wins argmax as a CASE cascade: the first language whose score is
    // >= every LATER score is the global max (earlier ones already failed
    // against some later score), ties resolving to profile order.
    val pred = scores.zipWithIndex.init.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), elseCol) =>
        val beatsLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }.reduce(_ && _)
        when(beatsLater, lit(lang)).otherwise(elseCol)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    df.withColumn(out, pred).withColumn(s"${out}_score", best)
  }

  /** Per-document top-k salient terms by the INTEGER score
    * tf · 1,000,000 div df (df = documents containing the term). This is a
    * rarity-weighted salience ranking, deliberately NOT tf·ln(N/df): with
    * differing tf the two weightings can order terms differently, but
    * integer arithmetic is bit-identical across engines where libm log is
    * not — determinism is the contract here, classic tf·idf is not. Ties
    * break on the term itself. Returns (idCol, rank, term, tf, df, score).
    *
    * Scale: explode → one (doc,term) hash-aggregation (map-side partial) →
    * df via a groupBy(term) AGGREGATION + join-back, NOT a count window
    * over the term partition: a window must buffer each partition, and a
    * stopword's partition is a large fraction of the corpus — the hot-key
    * buffering this codebase guards against everywhere else. The
    * aggregation partial-aggregates map-side and the join-back streams
    * (AQE splits a skewed probe side). tf is cached across its two
    * consumers and released after the result materializes.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", expr("CAST(tf * 1000000 DIV df AS BIGINT)"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    val result = scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("score"))
    Dedup.materializeAndRelease(result, tf)
  }

  // PII patterns (RE2-compatible subset — identical semantics under Java
  // regex and DuckDB's RE2, so the oracle reproduces counts and redactions
  // byte-for-byte). Whitespace is spelled out as an explicit class rather
  // than \s: Java's \s includes \x0B (vertical tab) while RE2's does not,
  // and that one character would diverge the engines. Deliberately
  // simple/high-precision; a production pass layers locale-specific
  // patterns on the same plumbing.
  private val Ws = "\\t\\n\\x0B\\f\\r "
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlPattern = s"https?://[^$Ws]+"
  val PhonePattern = s"\\+?[0-9][0-9()\\-$Ws]{7,}[0-9]"

  /** Host capture group of [[UrlPattern]]-shaped URLs. */
  val UrlHostPattern = s"https?://([^/$Ws]+)"

  /** All URL hosts mentioned in `text`, lowercased, `www.` prefix
    * stripped (so `www.example.com` and `example.com` aggregate
    * together). Pure codegen projection — the domain-attribution pass of
    * a web-corpus pipeline (per-domain caps, quality rollups, opt-out
    * filtering) runs at scan speed.
    */
  def urlHosts(text: Column): Column =
    transform(regexp_extract_all(text, lit(UrlHostPattern), lit(1)),
      h => regexp_replace(lower(h), "^www\\.", ""))

  /** Tracking query parameters [[canonicalUrl]] strips (the utm_ family +
    * the common click ids); CONTENT parameters (?v=, ?id=, …) survive —
    * two genuinely different pages must never dedup together. */
  val TrackingParamPattern: String =
    "(?i)([?&])(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)=[^&#]*"

  /** Canonical form of a URL COLUMN (one URL per row — a crawl manifest's
    * `url` field, not free text): lowercase scheme+host, `www.` stripped,
    * the fragment dropped, TRACKING query parameters removed (content
    * parameters kept — see [[TrackingParamPattern]]), and the trailing
    * slash removed — so `HTTP://WWW.Example.com/a/?utm_source=x#f` and
    * `http://example.com/a` dedup together while `watch?v=abc` and
    * `watch?v=xyz` stay distinct. A pure codegen projection: URL-keyed
    * exact dedup ([[graft.operators.Dedup]] on this column) is the FIRST
    * dedup pass of a web pipeline — it prunes re-crawls for free before
    * any content hashing runs.
    */
  def canonicalUrl(url: Column): Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    // strip tracking params keeping the separator, then tidy: "?&"->"?",
    // "&&"->"&", trailing "?"/"&" dropped
    val noTracking = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(noFragment, TrackingParamPattern, "$1"),
          "\\?&+", "?"),
        "&&+", "&"),
      "[?&]+$", "")
    // lowercase scheme://host only (the path stays case-sensitive);
    // (?i) is the case-insensitivity syntax Java regex and RE2 share
    val lowered = concat(
      lower(regexp_extract(noTracking, "(?i)^(https?://[^/]*)", 1)),
      regexp_replace(noTracking, "(?i)^https?://[^/]*", ""))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    regexp_replace(noWww, "/$", "")
  }

  /** The DuckDB spelling of [[canonicalUrl]]. */
  def canonicalUrlSql(s: String): String = {
    def rep(src: String, pat: String, to: String): String =
      s"regexp_replace($src, '$pat', '$to', 'g')"
    val noFragment = rep(s, "#.*$", "")
    val noTracking = rep(rep(rep(rep(noFragment,
      TrackingParamPattern, "\\1"), "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    val lowered = s"lower(regexp_extract($noTracking, '(?i)^(https?://[^/]*)', 1)) || " +
      rep(noTracking, "(?i)^https?://[^/]*", "")
    val noWww = rep(lowered, "^(https?://)www\\.", "\\1")
    rep(noWww, "/$", "")
  }

  /** URL/domain blocklist gate — the FIRST filter of a web-corpus pipeline
    * (runs before any content even downloads in a real crawl; here before
    * any content processing): per row, the canonical host of `urlCol`
    * (lowercased, `www.`-stripped), the blocklist entry that matched (the
    * standard REGISTRABLE-DOMAIN suffix rule: host equals the entry or
    * ends with `"." + entry`, so `ads.evil.example` matches `evil.example`
    * while `notevil.example` does not), and the keep flag. The blocklist
    * is a frozen literal (the QualityWeights pattern) and the whole gate
    * is one let-bound codegen projection — no shuffle, no UDF, scan-speed
    * at 100 TB. Emits `url_host`, `blocked_by` (null when clean),
    * `domain_keep`.
    */
  def withDomainGate(df: DataFrame, urlCol: String,
                     blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist: nothing to gate")
    val blockedLit = typedLit(blockedDomains.map(_.toLowerCase))
    val host = regexp_replace(
      lower(regexp_extract(coalesce(col(urlCol), lit("")), UrlHostPattern, 1)),
      "^www\\.", "")
    // let-bound: the host regex runs once per row, not once per blocklist
    // entry inside the match lambda (and not once more per output column)
    val gated = element_at(transform(array(host), h => struct(
      h.as("host"),
      try_element_at(filter(blockedLit,
        b => h === b || h.endsWith(concat(lit("."), b))), lit(1)).as("rule"))), 1)
    df.withColumn("__gate", gated)
      .withColumn("url_host", col("__gate.host"))
      .withColumn("blocked_by", col("__gate.rule"))
      .withColumn("domain_keep", col("__gate.rule").isNull)
      .drop("__gate")
  }

  // ---- license / copyright gate -----------------------------------------
  // Patterns shared verbatim by Java regex (Spark codegen) and RE2
  // (DuckDB): literal words, \b, alternation, bounded repetition only —
  // no \s (the engines' \s classes differ at \x0B), no lookaround.

  /** Creative-Commons markers (license URL, name, short code). */
  val CcLicensePattern: String =
    "creative commons|creativecommons\\.org|\\bcc[- ]by\\b"

  /** Open code-license names (MIT/Apache/GPL/BSD/MPL). */
  val CodeLicensePattern: String =
    "mit license|apache license|gnu general public license|" +
      "\\bgplv?[23]\\b|bsd [23]-clause|mozilla public license"

  /** The classic restrictive notice. */
  val RightsReservedPattern: String = "all rights reserved"

  /** A dated copyright line: `copyright`/`©`/`(c)` followed by a year. */
  val CopyrightPattern: String =
    "(copyright|©|\\(c\\))[ \t]*(19|20)[0-9]{2}"

  /** License/copyright compliance gate: per-document boolean signals for
    * Creative-Commons marks, open code licenses, "all rights reserved",
    * and dated copyright lines, folded into `license_class` ∈
    * open | restricted | none (an explicit open grant wins over a
    * boilerplate notice — CC-licensed pages routinely carry a publisher
    * copyright footer) and `license_keep` (= not restricted). The
    * corpus-compliance companion to the quality gates: what a
    * permissively-licensed training set filters on first.
    *
    * Scale: one codegen projection over a let-bound lowercased text —
    * four regex passes per row, no shuffle, no UDF; scan-speed at 100 TB.
    */
  def withLicenseFlags(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(coalesce(col(textCol), lit("")))
    // let-bind the lowered text once; each flag regex runs over the bound
    // copy (withColumn bindings do not survive projection collapse —
    // lambda variables do)
    val flags = element_at(transform(array(t), s => struct(
      s.rlike(CcLicensePattern).as("cc"),
      s.rlike(CodeLicensePattern).as("code"),
      s.rlike(RightsReservedPattern).as("rights"),
      s.rlike(CopyrightPattern).as("copy"))), 1)
    val out = df.withColumn("__lic", flags)
      .withColumn("license_cc", col("__lic.cc"))
      .withColumn("license_open_code", col("__lic.code"))
      .withColumn("license_rights_reserved", col("__lic.rights"))
      .withColumn("license_copyright", col("__lic.copy"))
    out.withColumn("license_class",
        when(col("license_cc") || col("license_open_code"), lit("open"))
          .when(col("license_rights_reserved") || col("license_copyright"),
            lit("restricted"))
          .otherwise(lit("none")))
      .withColumn("license_keep", col("license_class") =!= lit("restricted"))
      .drop("__lic")
  }

  /** DuckDB twin of [[withLicenseFlags]] over a lowercased text fragment
    * `s`: the four flag fragments in declaration order. */
  def licenseFlagSqls(s: String): Seq[(String, String)] = Seq(
    "license_cc" -> s"regexp_matches($s, '$CcLicensePattern')",
    "license_open_code" -> s"regexp_matches($s, '$CodeLicensePattern')",
    "license_rights_reserved" -> s"regexp_matches($s, '$RightsReservedPattern')",
    "license_copyright" -> s"regexp_matches($s, '$CopyrightPattern')")

  /** DuckDB twin of [[withDomainGate]]'s match over a host fragment `h`:
    * the first matching blocklist entry, NULL when clean (DuckDB list
    * indexing is NULL on out-of-range — the `try_element_at` twin). */
  def domainGateRuleSql(h: String, blockedDomains: Seq[String]): String = {
    val bl = blockedDomains.map(d => s"'${d.toLowerCase}'")
      .mkString("[", ", ", "]")
    s"(list_filter($bl, b -> $h = b OR ends_with($h, '.' || b)))[1]"
  }

  /** Per-domain corpus rollup: one row per distinct host with the number
    * of documents mentioning it and the total mention count — the inputs
    * to per-domain caps ([[Sampling.groupCap]]) and domain blocklists.
    * One explode + one partial-aggregating hash aggregation; a hot domain
    * (half the web is one CDN) partial-aggregates map-side, never buffers
    * a partition. */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(urlHosts(col(textCol))).as("host"))
      .groupBy(col("host"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_urls"))

  /** PII detection + redaction as a projection: redaction proceeds
    * URL → `<URL>`, then email → `<EMAIL>`, then phone → `<PHONE>` (an
    * email inside a URL disappears with the URL, never double-redacts),
    * and each COUNT runs on the text the corresponding replace actually
    * saw — so n_urls/n_emails/n_phones always equal the markers emitted,
    * the invariant an audit of the redacted output reconciles against.
    * Codegen regexes, no shuffle: the text-cleaning pass runs at scan
    * speed over 100 TB.
    */
  def withPiiStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterUrl = regexp_replace(t, UrlPattern, "<URL>")
    val afterEmail = regexp_replace(afterUrl, EmailPattern, "<EMAIL>")
    val redacted = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    df.withColumn("n_urls", size(regexp_extract_all(t, lit(UrlPattern), lit(0))).cast(LongType))
      .withColumn("n_emails",
        size(regexp_extract_all(afterUrl, lit(EmailPattern), lit(0))).cast(LongType))
      .withColumn("n_phones",
        size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0))).cast(LongType))
      .withColumn("redacted", redacted)
  }

  /** Repetition signals — the Gopher-style duplication filters that
    * complement [[withStats]]' composite quality score: the top token's
    * frequency share (boilerplate/listicle detector) and the duplicated
    * 2-gram share (copy-paste detector). Returns
    * (idCol, n_tokens, max_tf, top_token_ratio, dup_2gram_ratio).
    *
    * Scale: the 2-gram ratio is a pure projection; max_tf needs one
    * (doc,term) hash-aggregation + a per-doc max — both partial-aggregate
    * map-side — and joins back on the doc id. No windows over shared-term
    * partitions, no driver state.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE into a bound column: slice(tokens(text), i, 2) inside
    // the index lambda would re-run the regex split per 2-gram index
    val base = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val n = size(toks)
    // raw (non-distinct) 2-grams; a single-token doc yields its one token
    val grams = transform(sequence(lit(1), greatest(n - 1, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    val total2 = size(grams)
    val proj = base.select(col(idCol), n.cast(LongType).as("n_tokens"),
      ((total2 - size(array_distinct(grams))).cast(DoubleType) /
        total2.cast(DoubleType)).as("dup_2gram_ratio"))
    val maxTf = base.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol)).agg(max(col("tf")).as("max_tf"))
    proj.join(maxTf, Seq(idCol))
      .withColumn("top_token_ratio",
        col("max_tf").cast(DoubleType) / greatest(col("n_tokens"), lit(1L)).cast(DoubleType))
      .select(col(idCol), col("n_tokens"), col("max_tf"),
        col("top_token_ratio"), col("dup_2gram_ratio"))
  }

  /** Corpus-typicality score — the deterministic stand-in for CCNet's
    * LM-perplexity quality signal: the mean corpus frequency (parts per
    * million, integer) of a document's token instances. Text made of
    * common corpus vocabulary scores high; rare-vocabulary text (other
    * languages, code dumps, mojibake) scores low. Integer arithmetic
    * end-to-end (cnt·1e6 div total, then an integer mean) — an ln-based
    * perplexity would not be bit-portable across engines
    * (see [[topTerms]]).
    *
    * Returns (idCol, n_tokens, typicality_ppm), one row per input doc
    * (token-less docs score 0). Scale: explode → one token aggregation
    * (partial map-side; total falls out of the count table) → join back
    * (AQE splits hot-token skew) → one per-doc aggregation. No windows,
    * no driver state.
    */
  def corpusTypicality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum(col("__cnt")).as("__total"))
    val scored = toks.join(counts, "token")
      .crossJoin(broadcast(total))
      .withColumn("__ppm", expr("CAST(__cnt * 1000000 DIV __total AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("__ppm")).as("__sum"))
      .select(col(idCol), col("__n"),
        expr("CAST(__sum DIV __n AS BIGINT)").as("__typ"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).cast(LongType).as("n_tokens"),
        coalesce(col("__typ"), lit(0L)).cast(LongType).as("typicality_ppm"))
  }

  /** Bigram conditional-probability typicality — the perplexity-filter
    * proxy one grade up from [[corpusTypicality]]'s unigram frequency: per
    * document, the mean over its adjacent token pairs (w1, w2) of
    * P(w2 | w1) in ppm = count(w1 w2) · 10⁶ DIV count(w1 ·). A document of
    * corpus-typical TRANSITIONS scores high; word salad with common words
    * in rare orders (which unigram typicality cannot see) scores low —
    * exactly what a KenLM-perplexity gate measures, in integer arithmetic
    * an oracle can replay bit-for-bit (ln-perplexity is not bit-portable).
    * Returns (idCol, n_bigrams, bigram_typicality_ppm); docs with < 2
    * tokens score 0.
    *
    * Scale: one corpus-wide bigram aggregation (partial map-side combine —
    * hot bigrams never buffer a partition), prefix counts derived FROM the
    * bigram table (no second corpus pass), join-back on the bigram key
    * (AQE splits skewed hot keys), one per-doc mean. Three shuffles total,
    * all on partial-aggregating keys.
    */
  def bigramTypicality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text tokenizes as empty (a NULL array would propagate NULLs)
    val base = df.select(col(idCol),
      tokens(coalesce(col(textCol), lit(""))).as("__toks"))
    val toks = col("__toks")
    // zip-with-shift adjacent pairs (never element_at-per-index)
    val pairs2 = base.where(size(toks) >= 2).select(col(idCol),
      explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("w1"),
        slice(toks, lit(2), size(toks) - 1).as("w2"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val bigramCounts = pairs2.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    // count(w1 ·) = how many bigrams start with w1 — derived from the
    // bigram table, not a second corpus pass
    val prefixCounts = bigramCounts.groupBy("w1").agg(sum(col("__c12")).as("__c1"))
    val scored = pairs2
      .join(bigramCounts, Seq("w1", "w2"))
      .join(prefixCounts, Seq("w1"))
      .withColumn("__ppm", expr("CAST(__c12 * 1000000 DIV __c1 AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("__ppm")).as("__sum"))
      .select(col(idCol), col("__n"),
        expr("CAST(__sum DIV __n AS BIGINT)").as("__typ"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).cast(LongType).as("n_bigrams"),
        coalesce(col("__typ"), lit(0L)).cast(LongType).as("bigram_typicality_ppm"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw-corpus
    * documents by how much their token TRANSITIONS look like a TARGET
    * domain — per document, the mean over its bigrams of the likelihood
    * ratio P_target(bg) / P_raw(bg), both sides as integer ppm
    * probabilities (ratio in ppm of ppm: 10⁶ ≙ equally likely; rare-in-ppm
    * bigrams floor to 0 — the documented granularity of the proxy; log-sum
    * DSIR is not bit-portable across engines). Feed the scores to
    * [[Sampling.weightedHashSample]] (capped/normalized) or a
    * [[Sampling.qualityBandSample]] for the actual resampling step.
    * Returns (idCol, n_bigrams, importance_ppm); docs with < 2 tokens
    * score 0.
    *
    * Scale: two bigram aggregations (raw corpus once, target once — both
    * partial map-side), broadcast-or-shuffled join-back on the bigram key,
    * one per-doc mean. The target is typically small (a curated seed set);
    * its count table broadcasts.
    */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String): DataFrame = {
    def bigrams(d: DataFrame, cols: Seq[Column], text: String): DataFrame = {
      val base = d.select(cols :+ tokens(coalesce(col(text), lit(""))).as("__toks"): _*)
      val toks = col("__toks")
      base.where(size(toks) >= 2).select(cols :+
        explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1).as("w1"),
          slice(toks, lit(2), size(toks) - 1).as("w2"))).as("__bg"): _*)
        .select(cols ++ Seq(col("__bg.w1").as("w1"), col("__bg.w2").as("w2")): _*)
    }
    // both the count census and the join-back consume the exploded raw
    // bigrams — persist so the corpus tokenizes ONCE
    val raw = bigrams(df, Seq(col(idCol)), textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCounts = raw.groupBy("w1", "w2").agg(count(lit(1)).as("__cr"))
    val rawTotal = rawCounts.agg(sum(col("__cr")).as("__tr"))
    val tgtCounts = bigrams(target, Seq.empty, targetTextCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("__ct"))
    val tgtTotal = tgtCounts.agg(sum(col("__ct")).as("__tt"))
    val scored = raw
      .join(rawCounts, Seq("w1", "w2"))
      .join(tgtCounts, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(rawTotal)).crossJoin(broadcast(tgtTotal))
      .withColumn("__pt", expr("CAST(coalesce(__ct, 0) * 1000000 DIV __tt AS BIGINT)"))
      .withColumn("__pr", expr("CAST(__cr * 1000000 DIV __tr AS BIGINT)"))
      .withColumn("__ratio",
        expr("CAST(__pt * 1000000 DIV greatest(__pr, 1) AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("__ratio")).as("__sum"))
      .select(col(idCol), col("__n"),
        expr("CAST(__sum DIV __n AS BIGINT)").as("__imp"))
    val out = df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).cast(LongType).as("n_bigrams"),
        coalesce(col("__imp"), lit(0L)).cast(LongType).as("importance_ppm"))
    Dedup.materializeAndRelease(out, raw)
  }

  /** Line-level corpus dedup (the CCNet/RefinedWeb boilerplate filter):
    * drop every line that occurs in at least `maxDocFreq` distinct
    * documents (nav menus, cookie banners, license footers — text that
    * repeats across a corpus is boilerplate, not content), then reassemble
    * each document from its surviving lines in original order. Empty lines
    * are lines: if the empty string is corpus-frequent it is dropped too.
    * Returns (idCol, clean_text, n_lines, n_dropped) — one row per input
    * document, even when every line was dropped (clean_text = "").
    *
    * Scale: explode to (doc, pos, line) → line document-frequency via one
    * hash aggregation (partial map-side; a hot boilerplate line partial-
    * aggregates, never buffers a partition) → flag-join surviving lines
    * (the frequent-line set is tiny, AQE broadcasts it) → one groupBy(doc)
    * reassembly. Two shuffles total, both on keys that partial-aggregate.
    */
  def dropCommonLines(df: DataFrame, idCol: String, textCol: String,
                      maxDocFreq: Long, sep: String = "\n"): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2: $maxDocFreq")
    // NULL text = one empty line (split(NULL) would drop the doc from the
    // explode AND emit n_lines = NULL/-1 in the final projection)
    val txt = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol),
        posexplode(split(txt, java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
    val common = lines.groupBy("line")
      .agg(count_distinct(col(idCol)).as("__df"))
      .where(col("__df") >= maxDocFreq)
      .select("line")
    val kept = lines.join(common, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("__ls"),
        count(lit(1)).as("__kept"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__ls"), s => s.getField("line"))).as("clean_text"),
        col("__kept"))
    df.select(col(idCol),
        size(split(txt, java.util.regex.Pattern.quote(sep)))
          .cast(LongType).as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__kept"), lit(0L))).cast(LongType).as("n_dropped"))
  }

  /** Collocation (phrase) mining — the word2phrase/PMI step that decides
    * which adjacent token pairs are phrases ("new york") rather than
    * chance neighbors: lift(a,b) = P(ab) / (P(a)·P(b)) =
    * n_ab·N / (n_a·n_b), over adjacent pairs with n_ab ≥ `minCount`,
    * global top-`k` by (lift desc, pair asc). Lift is computed in doubles
    * with a fixed association order (products stay ≪ 2^1023; both engines
    * round identically) — a log-PMI would not be bit-portable.
    *
    * Scale: one explode over adjacent positions → a (w1, w2) hash
    * aggregation (partial map-side), unigram counts likewise, the totals
    * row broadcasts, and the top-k is a TakeOrdered. No windows over
    * shared keys; the minCount filter prunes the long tail before the
    * joins.
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount/k must be >= 1: $minCount/$k")
    // NULL text tokenizes as empty (slice/arrays_zip over a NULL array
    // would propagate NULLs instead of contributing zero bigrams)
    val toks = tokens(coalesce(col(textCol), lit("")))
    // adjacent pairs by zipping the array with its own shift — NOT an
    // element_at-per-index lambda, which re-evaluates the tokenization
    // subtree once per element (O(tokens²) regex work per row)
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = df.select(explode(arrays_zip(
        slice(toks, lit(1), n1).as("w1"), slice(toks, lit(2), n1).as("w2"))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val nb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    val uni = df.select(explode(toks).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val tot = uni.agg(sum(col("__c")).as("__n"))
    val scored = nb
      .join(uni.select(col("__w").as("w1"), col("__c").as("__ca")), Seq("w1"))
      .join(uni.select(col("__w").as("w2"), col("__c").as("__cb")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("lift",
        (col("n_ab").cast(DoubleType) * col("__n").cast(DoubleType)) /
          (col("__ca").cast(DoubleType) * col("__cb").cast(DoubleType)))
    val top = scored.orderBy(col("lift").desc, col("w1").asc, col("w2").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
    top.withColumn("rank", row_number().over(w).cast(LongType))
      .select(col("rank"), col("w1"), col("w2"), col("n_ab"), col("lift"))
  }

  /** EXACT-substring duplication stats — the Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better") signal:
    * a document contains a duplicated run of ≥ `windowTokens` tokens iff
    * one of its `windowTokens`-token windows occurs elsewhere in the
    * corpus (any duplicated longer substring contains a duplicated
    * window; any duplicated window IS a duplicated substring — detection
    * is exact, token-aligned). Emits per input row:
    * (idCol, n_windows, n_dup_windows, dup_window_ppm), where a window is
    * duplicated when its token sequence occurs ≥ 2 times corpus-wide
    * (other docs or repeats within the same doc). Feed high-ppm docs to
    * the drop/trim stage; production systems build suffix arrays per
    * shard — this windowed form is the distributed, oracle-checkable
    * equivalent for the fixed minimum match length.
    *
    * Scale: the window stream is one explode of the corpus token stream
    * (the inherent cost of substring-level dedup), counted by ONE
    * partial-aggregating hash aggregation on the 60-bit window hash, then
    * one join-back (AQE splits hot hashes) and a per-doc aggregation. No
    * windows over shared keys, no driver state. Tokens bind ONCE per row;
    * each window hashes a slice of the bound array (O(w) per window).
    */
  def duplicatedWindowStats(df: DataFrame, idCol: String, textCol: String,
                            windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2: $windowTokens")
    val base = df.select(col(idCol),
      tokens(coalesce(col(textCol), lit(""))).as("__toks"))
    val toks = col("__toks")
    val n = size(toks)
    // guard the empty range: Spark sequence(1, 0) steps DOWNWARD
    val hs = when(n >= windowTokens,
      transform(sequence(lit(1), n - windowTokens + 1),
        i => PortableHash.hmod(concat_ws(" ", slice(toks, i, lit(windowTokens))))))
      .otherwise(typedLit(Seq.empty[Long]))
    val windows = base.select(col(idCol), explode(hs).as("__h"))
    val counts = windows.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    val perDoc = windows.join(counts, Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nw"),
        sum(when(col("__c") >= 2L, 1L).otherwise(0L)).as("__nd"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nw"), lit(0L)).cast(LongType).as("n_windows"),
        coalesce(col("__nd"), lit(0L)).cast(LongType).as("n_dup_windows"),
        expr("CAST(CASE WHEN coalesce(__nw, 0) = 0 THEN 0 " +
          "ELSE coalesce(__nd, 0) * 1000000 DIV __nw END AS BIGINT)")
          .as("dup_window_ppm"))
  }

  /** The exact-substring dedup ACTION (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): remove every duplicated
    * ≥`windowTokens`-token run from the corpus, keeping the GLOBALLY FIRST
    * occurrence (lowest (doc id, position)). Complements
    * [[duplicatedWindowStats]] (the audit) with the rewrite: any token
    * covered by a non-first duplicated window is dropped; each document is
    * reassembled from its surviving tokens in order. Returns one row per
    * input document: (idCol, clean_text, n_tokens, n_removed).
    *
    * EXACT: the duplicate census groups on the window TEXT itself, not a
    * hash — a destructive rewrite must never delete legitimate text on a
    * hash collision (the audit-only [[duplicatedWindowStats]] tolerates
    * its 31-bit hashes; this action does not). The census shuffles window
    * strings instead of longs, but it partial-aggregates map-side, so the
    * post-combine volume is the distinct-window set either way.
    *
    * Keeper selection min-reduces the (id, pos) STRUCT — exact for any id
    * type (string ids order lexicographically) and any document length,
    * with no arithmetic-encoding collision risk.
    *
    * Scale: rolling hashes are a projection; the dup census is ONE
    * partial-aggregating shuffle on the window hash (a window duplicated a
    * million times partial-aggregates, never buffers); removal joins back
    * on the hash (AQE splits hot hashes); the rebuild collapses removed
    * positions to ONE per-doc array (O(docs-with-removals) rows, bounded
    * by the removal volume) and reassembles each document with row-local
    * array ops against the already-tokenized base — the corpus is never
    * exploded to token granularity and never regrouped (the previous
    * formulation shuffled every token of every document through a
    * left-anti join plus a collect_list regroup; at 100 TB that is two
    * corpus-sized shuffles for what is per-row arithmetic).
    */
  def dropDuplicatedWindows(df: DataFrame, idCol: String, textCol: String,
                            windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2: $windowTokens")
    val base = df.select(col(idCol),
      tokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = col("__toks")
    val n = size(toks)
    val hs = when(n >= windowTokens,
      transform(sequence(lit(1), n - windowTokens + 1),
        i => concat_ws(" ", slice(toks, i, lit(windowTokens)))))
      .otherwise(typedLit(Seq.empty[String]))
    val windows = base.select(col(idCol), posexplode(hs).as(Seq("__p0", "__h")))
      .select(col(idCol), (col("__p0") + 1).cast(LongType).as("__pos"), col("__h"))
      .withColumn("__enc", struct(col(idCol), col("__pos")))
    val dupes = windows.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"), min(col("__enc")).as("__keep"))
      .where(col("__c") >= 2L)
      .select(col("__h"), col("__keep"))
    val removed = windows.join(dupes, Seq("__h"))
      .where(col("__enc") =!= col("__keep"))
    // positions covered by a removed window, ONE array per affected doc
    // (collect_set: overlapping windows cover positions repeatedly)
    val coveredPerDoc = removed.select(col(idCol),
      explode(sequence(col("__pos"), col("__pos") + lit(windowTokens - 1).cast(LongType)))
        .as("__tp"))
      .groupBy(col(idCol)).agg(collect_set(col("__tp")).as("__cov"))
    // rebuild row-locally: surviving positions in order (array_except
    // preserves left-operand order), tokens looked up by position —
    // byte-identical to the explode/anti-join/regroup it replaces
    val keptPos = array_except(
      when(n >= 1, sequence(lit(1L), n.cast(LongType)))
        .otherwise(typedLit(Seq.empty[Long])),
      coalesce(col("__cov"), typedLit(Seq.empty[Long])))
    val out = base
      .join(coveredPerDoc, Seq(idCol), "left")
      .select(col(idCol),
        concat_ws(" ",
          transform(keptPos, p => element_at(toks, p.cast("int")))).as("clean_text"),
        n.cast(LongType).as("n_tokens"),
        (n.cast(LongType) - size(keptPos).cast(LongType)).as("n_removed"))
    Dedup.materializeAndRelease(out, base)
  }

  /** Rolling polynomial fingerprint of the token stream:
    * fp = fold(tokens, 0, (acc, t) -> (31*acc + hmod(t)) mod P).
    * Order-sensitive (unlike a bag-of-words hash) and portable; used for
    * exact-dedup keys and shard-stable document identity.
    */
  def fingerprint(text: Column): Column = {
    val hs = transform(tokens(text), t => PortableHash.hmod(t))
    aggregate(hs, lit(0L), (acc, h) => (acc * 31L + h) % PortableHash.P)
  }
}
