package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization with a FROZEN merge table — the learned
  * subword tokenizer a training pipeline denominates context windows and
  * packing budgets in (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"). Extension scope beyond the reference.
  *
  * Design for cross-engine determinism (the same bar as every oracle-checked
  * operator here):
  *   - The merge table is TRAINED ONCE ([[train]], plain deterministic
  *     Scala — count ties break lexicographically) and frozen as literals
  *     (see graft.queries.BpeMerges), the IvfCentroids/PqCodebooks pattern:
  *     one source of truth interpolated into both engines' plans.
  *   - ENCODE is the exact leftmost merge walk ([[applyMerge]]) in BOTH
  *     engines, with the merge table entering the plan as DATA (one
  *     literal list), never as nested per-rule expressions: a rule-per-
  *     nesting-level fold blows Spark's analyzer iteration budget AND
  *     DuckDB's binder recursion limit at realistic table sizes. Spark
  *     runs the walk as a nested `aggregate` ([[encodeWord]]); DuckDB as
  *     a nested `list_reduce` with a string accumulator whose separator
  *     marks symbol boundaries — merging appends the right symbol WITHOUT
  *     a separator ([[encodeWordSql]]). A plain string-replace fold was
  *     rejected outright: replace() is symbol-boundary-blind ("an a"
  *     matches into the middle of "an an a") and provably cannot
  *     implement the merge pass in either engine.
  *
  * Scale: encode is a projection over the text column — `numMerges` array
  * rewrites per word, no shuffle, no UDF, no driver state; it runs at scan
  * speed over 100 TB and the cost knob is the merge-table size.
  */
object Bpe {

  /** Train a BPE merge table from (word, count) frequencies: `numMerges`
    * rounds of "merge the most frequent adjacent symbol pair" (ties break
    * on the lexicographically smallest pair, so training is deterministic
    * for a given word-count table regardless of input order).
    * Driver-side by design — production runs train once on an aggregated
    * word-count table (tiny next to the corpus:
    * `df.groupBy(word).count().collect()`) and freeze the result.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var words: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** One leftmost-non-overlapping merge pass over a symbol sequence —
    * the reference semantics the encode fold reproduces. */
  private[functions] def applyMerge(syms: Vector[String],
                                    m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Symbol separator of the string-accumulator fold: the unit separator
    * control char. U+001F is NOT regex whitespace, so whitespace-tokenized
    * words CAN contain it (real crawl text does) — both encode paths strip
    * it from the word first, otherwise a stray separator would silently
    * mis-segment the symbol accumulator. */
  private val Sep = "\u001F"

  /** Encode one WORD (non-empty, no whitespace) as its BPE symbol array.
    *
    * The merge table enters the plan as DATA (one array<struct> literal),
    * not as code: a nested-merge-table fold would nest one lambda level
    * per rule and blow the analyzer's resolution budget at realistic table
    * sizes. Instead ONE outer `aggregate` walks the rule literal and ONE
    * inner `aggregate` applies the current rule sequentially —
    *   last(acc) = a ∧ cur = b  →  replace last with "ab", else append —
    * which IS the reference leftmost walk ([[applyMerge]]), self-pairs
    * included (the fresh "ab" symbol is strictly longer than a, so it can
    * never re-match as the same rule's left side). Constant lambda depth,
    * O(|table|) plan size regardless of table size.
    *
    * The accumulator is a [[Sep]]-joined symbol STRING, exactly like the
    * DuckDB twin — "last symbol = a" is "acc = a OR acc ends with Sep‖a",
    * and merging appends `b` with no separator. An array accumulator was
    * measured ~10× slower: every interpreted fold step re-allocated a
    * Catalyst array (concat/slice), where the string path is one byte-copy
    * concat per step.
    */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    val rules = typedLit(merges)
    // strip the separator char itself from untrusted words (U+001F is not
    // \s-whitespace, so tokenization alone cannot exclude it); a word that
    // was ONLY separators encodes to an empty symbol array in both engines
    val w = regexp_replace(word, Sep, "")
    val init = array_join(split(w, ""), Sep)
    val folded = aggregate(rules, init, (acc, m) => {
      val a = m.getField("_1")
      val b = m.getField("_2")
      aggregate(split(acc, Sep), lit(""), (s, x) =>
        when(s === lit(""), x)
          .when((s === a || s.endsWith(concat(lit(Sep), a))) && x === b,
            concat(s, b))
          .otherwise(concat(s, lit(Sep), x)))
    })
    when(w === lit(""), typedLit(Seq.empty[String])).otherwise(split(folded, Sep))
  }

  /** BPE tokens of full `text`: lowercased whitespace words, each encoded
    * independently (word boundaries never merge), flattened in order.
    * NULL-safe: NULL text yields an empty token array. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      filter(split(lower(coalesce(text, lit(""))), "\\s+"), t => t =!= lit("")),
      w => encodeWord(w, merges)))

  /** BPE token count of full `text` — the context-window/packing budget. */
  def nTokens(text: Column, merges: Seq[(String, String)]): Column =
    size(tokens(text, merges)).cast("long")

  private def wordsOf(text: Column): Column =
    filter(split(lower(coalesce(text, lit(""))), "\\s+"), t => t =!= lit(""))

  /** Per-word BPE symbol arrays — [[tokens]] WITHOUT the flatten, so word
    * boundaries survive and [[decode]] can invert the encoding. */
  def wordTokens(text: Column, merges: Seq[(String, String)]): Column =
    transform(wordsOf(text), w => encodeWord(w, merges))

  /** Decode [[wordTokens]] output back to text: concatenate each word's
    * symbols (BPE merges are concatenations, so the symbol array of a word
    * always concatenates back to the word), join words with single spaces.
    * Words that encoded to ZERO symbols (all-U+001F words, whose content
    * the encoder strips) are skipped — they have no text to contribute,
    * and joining them would inject phantom double spaces. Recovers the
    * CANONICAL text — lowercased, whitespace-collapsed, U+001F-stripped,
    * empty words dropped — i.e. exactly the preimage class [[tokens]]
    * quotients over; `decode(wordTokens(x)) = canonical(x)` is the
    * round-trip identity q_bpe_roundtrip checks per document and BpeSpec
    * property-checks on random words (incl. separator-bearing ones). */
  def decode(wordToks: Column): Column =
    array_join(transform(
      filter(wordToks, s => size(s) > 0), s => array_join(s, "")), " ")

  /** DuckDB twin of [[decode]] over a word-list fragment (re-encodes each
    * word and concatenates its symbols — the same data-driven fold,
    * empty encodes skipped identically). */
  def decodeSql(wordsFrag: String, merges: Seq[(String, String)]): String =
    s"array_to_string(list_filter(list_transform($wordsFrag, " +
      s"x -> array_to_string(${encodeWordSql("x", merges)}, '')), " +
      s"x -> x <> ''), ' ')"

  /** Corpus-scale BPE: encode the DICTIONARY, not the word stream.
    * Natural corpora are Zipfian — word instances outnumber distinct
    * words by orders of magnitude (876× even on the tiny test corpus) —
    * so running the merge fold per INSTANCE ([[tokens]]) wastes exactly
    * that factor. Here the fold runs once per distinct word and the
    * results join back:
    *   explode words with position → distinct() → encode each dictionary
    *   word → join the word stream back (AQE broadcasts a small dict) →
    *   reassemble each document's token array in word order.
    * Two shuffles (dictionary distinct + per-doc reassembly) buy an
    * encode cost of O(|dictionary|) instead of O(|corpus|) — at 100 TB
    * the tokenizer cost becomes a rounding error instead of the job.
    * Emits (idCol, bpe_tokens array<string>), EVERY input row represented
    * (token-less docs get an empty array). */
  def tokensByDict(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String,
                   merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val words = df.select(col(idCol),
      posexplode(wordsOf(col(textCol))).as(Seq("__pos", "__w")))
    val dict = words.select(col("__w")).distinct()
      .withColumn("__syms", encodeWord(col("__w"), merges))
    val assembled = words.join(dict, Seq("__w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__syms")))),
        s => s.getField("__syms"))).as("bpe_tokens"))
    df.select(col(idCol)).join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("bpe_tokens"), typedLit(Seq.empty[String])).as("bpe_tokens"))
  }

  /** [[tokensByDict]]'s counting twin: (idCol, n_bpe_tokens) — the packing
    * budget at dictionary cost, skipping the per-doc array reassembly
    * (counts need only Σ per-word sizes). */
  def nTokensByDict(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val words = df.select(col(idCol), explode(wordsOf(col(textCol))).as("__w"))
    val dict = words.select(col("__w")).distinct()
      .withColumn("__n", size(encodeWord(col("__w"), merges)).cast("long"))
    val counts = words.join(dict, Seq("__w"))
      .groupBy(col(idCol)).agg(sum(col("__n")).as("__sum"))
    df.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__sum"), lit(0L)).as("n_bpe_tokens"))
  }

  private def sqlLit(s: String): String = s"'${s.replace("'", "''")}'"

  /** The DuckDB spelling of [[encodeWord]] over word fragment `w`: the
    * identical data-driven double fold via list_reduce. The accumulator is
    * a chr(31)-separated symbol string (symbols never contain chr(31):
    * they are concatenations of word characters, and words come from
    * whitespace tokenization); "last symbol = a" is therefore exactly
    * "acc = a OR acc ends with chr(31)||a", and merging appends `b` with
    * NO separator. list_reduce seeds from the first element, so the word's
    * initial symbol string is prepended to the rule list and each rule
    * arrives as "a<chr31>b". */
  def encodeWordSql(w: String, merges: Seq[(String, String)]): String = {
    val rules = merges.map { case (a, b) =>
      s"${sqlLit(a)} || chr(31) || ${sqlLit(b)}"
    }.mkString("[", ", ", "]")
    // same U+001F strip as [[encodeWord]]: words CAN carry the separator
    // char (it is not regex whitespace); an all-separator word encodes to
    // an empty list — spelled explicitly so neither engine's
    // split-empty-string corner is relied on
    val cw = s"replace($w, chr(31), '')"
    val init = s"array_to_string(string_split($cw, ''), chr(31))"
    val inner =
      "list_reduce(string_split(acc, chr(31)), (s, x) -> " +
        "CASE WHEN (s = string_split(r, chr(31))[1] " +
        "OR ends_with(s, chr(31) || string_split(r, chr(31))[1])) " +
        "AND x = string_split(r, chr(31))[2] THEN s || x " +
        "ELSE s || chr(31) || x END)"
    s"CASE WHEN $cw = '' THEN CAST([] AS VARCHAR[]) ELSE " +
      s"string_split(list_reduce(list_prepend($init, $rules), (acc, r) -> $inner), chr(31)) END"
  }

  /** The DuckDB spelling of [[tokens]] over a pre-tokenized word-list
    * fragment `wordsFrag` (the caller supplies the same whitespace
    * tokenization the Spark side uses): flattened per-word symbol lists. */
  def tokensSql(wordsFrag: String, merges: Seq[(String, String)]): String =
    s"flatten(list_transform($wordsFrag, w -> ${encodeWordSql("w", merges)}))"
}
