package graft.operators

import graft.SparkSpec

class DomainGateSpec extends SparkSpec {
  import spark.implicits._

  test("blocklist gate: suffix rule, subdomains match, lookalikes do not") {
    val df = Seq(
      (1L, "http://spam-ads.example/x"),        // exact blocked host
      (2L, "https://a.b.spam-ads.example/y"),   // deep subdomain -> blocked
      (3L, "http://notspam-ads.example/z"),     // lookalike -> clean
      (4L, "http://WWW.Example.com/ok"),        // www + case -> clean
      (5L, "not a url at all"),                 // no host -> clean, empty host
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "url")
    val got = TextAnalysis.withDomainGate(df, "url", Seq("spam-ads.example"))
      .select("doc_id", "url_host", "blocked_by", "domain_keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2)), r.getBoolean(3)))).toMap
    assert(got(1L) === (("spam-ads.example", Some("spam-ads.example"), false)))
    assert(got(2L) === (("a.b.spam-ads.example", Some("spam-ads.example"), false)))
    assert(got(3L) === (("notspam-ads.example", None, true)))
    assert(got(4L) === (("example.com", None, true)))
    assert(got(5L) === (("", None, true)))
    assert(got(6L) === (("", None, true)))
  }

  test("gate plan is a pure projection: no Exchange, no Join") {
    val df = Seq((1L, "http://x.example/")).toDF("doc_id", "url")
    val plan = TextAnalysis.withDomainGate(df, "url", Seq("bad.example"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }
}
import org.apache.spark.sql.functions.col

/** Specs for the TextAnalysis corpus operators added in round 5: line
  * dedup, URL/domain extraction, collocations, and typicality. */
class TextAnalysisOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lines in >= maxDocFreq docs are dropped; order and counts preserved") {
    val footer = "all rights reserved"
    val df = Seq(
      (1L, s"unique one\n$footer\nunique two"),
      (2L, s"$footer\nsecond doc body"),
      (3L, s"third doc body\n$footer"),
      (4L, "no footer here")
    ).toDF("id", "text")
    val got = TextAnalysis.dropCommonLines(df, "id", "text", maxDocFreq = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "unique one\nunique two", 3L, 1L),
      (2L, "second doc body", 2L, 1L),
      (3L, "third doc body", 2L, 1L),
      (4L, "no footer here", 1L, 0L)))
  }

  test("a doc whose every line is boilerplate survives as an empty row") {
    val df = Seq(
      (1L, "menu\nbody a"), (2L, "menu\nbody b"), (3L, "menu")
    ).toDF("id", "text")
    val got = TextAnalysis.dropCommonLines(df, "id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "body a", 2L, 1L), (2L, "body b", 2L, 1L), (3L, "", 1L, 1L)))
  }

  test("within-doc repetition counts once toward document frequency") {
    // "x" repeats inside doc 1 but occurs in only 2 DOCS -> below cutoff 3
    val df = Seq(
      (1L, "x\nx\nx\nbody"), (2L, "x\nother"), (3L, "clean")
    ).toDF("id", "text")
    val got = TextAnalysis.dropCommonLines(df, "id", "text", maxDocFreq = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._4).toSeq === Seq(0L, 0L, 0L), "nothing should be dropped")
  }

  test("urlHosts extracts, lowercases, and strips www; domainStats attributes docs") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a https://WWW.Example.com/x b http://example.com/y"),
      (2L, "see https://data.org/z and https://example.com"),
      (3L, "no urls at all")
    ).toDF("id", "text")
    val hosts = df.select(TextAnalysis.urlHosts(col("text")).as("h"))
      .as[Seq[String]].collect()
    assert(hosts(0) === Seq("example.com", "example.com"))
    val got = TextAnalysis.domainStats(df, "id", "text")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("data.org", 1L, 1L), ("example.com", 2L, 3L)))
  }

  test("corpusTypicality: common vocabulary outscores rare; empty doc scores 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog"),  // all common-ish tokens
      (2L, "zyx qwv"),              // singletons
      (3L, "")).toDF("id", "text")
    val got = TextAnalysis.corpusTypicality(df, "id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // total tokens = 7; ppm: the=2/7, others 1/7
    val p1 = 1000000L / 7
    val p2 = 2 * 1000000L / 7
    assert(got(1L) === ((1L, 5L, (p2 * 2 + p1 * 3) / 5)))
    assert(got(2L) === ((2L, 2L, p1)))
    assert(got(3L) === ((3L, 0L, 0L)))
  }

  test("collocations: a glued pair outranks chance neighbors; minCount prunes") {
    import org.apache.spark.sql.functions.col
    // "new york" always adjacent (lift high); filler words pair randomly
    val docs = (0 until 30).map { i =>
      (i.toLong, s"a b new york c d" + (if (i % 2 == 0) " a d" else " b c"))
    }.toDF("id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5, k = 5)
      .select(col("rank"), col("w1"), col("w2"), col("n_ab"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.head._2 === "new" && got.head._3 === "york",
      s"expected (new, york) first, got ${got.head}")
    assert(got.head._4 === 30L)
    // every reported pair met the support threshold
    assert(got.forall(_._4 >= 5L))
  }

  test("NULL text: dropCommonLines keeps the row as one empty line") {
    val df = Seq(
      (1L, "menu\nbody a"), (2L, "menu\nbody b"), (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.dropCommonLines(df, "id", "text", maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "body a", 2L, 1L), (2L, "body b", 2L, 1L), (3L, "", 1L, 0L)))
  }

  test("NULL text contributes zero bigrams to collocations") {
    val docs = ((0 until 10).map(i => (i.toLong, "new york")) :+
      (10L, null.asInstanceOf[String])).toDF("id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 2, k = 3)
      .select(org.apache.spark.sql.functions.col("w1"),
        org.apache.spark.sql.functions.col("n_ab"))
      .as[(String, Long)].collect()
    assert(got.toSeq === Seq(("new", 10L)))
  }

  test("duplicatedWindowStats: cross-doc and within-doc repeats, short docs") {
    val df = Seq(
      // docs 1 and 2 share the 3-token run "a b c" (cross-doc duplication)
      (1L, "a b c x y"),        // windows: [a b c][b c x][c x y] -> 1 dup
      (2L, "q a b c r"),        // windows: [q a b][a b c][b c r] -> 1 dup
      // doc 3 repeats its own 3-token run twice (within-doc duplication)
      (3L, "m n o m n o"),      // windows: [m n o][n o m][o m n][m n o] -> 2 dup
      (4L, "entirely unique words here"), // 2 windows, 0 dup
      (5L, "too short")         // < 3 tokens -> 0 windows
    ).toDF("id", "text")
    val got = TextAnalysis.duplicatedWindowStats(df, "id", "text", windowTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 1L, 1000000L / 3)))
    assert(got(2L) === ((3L, 1L, 1000000L / 3)))
    assert(got(3L) === ((4L, 2L, 500000L)))
    assert(got(4L) === ((2L, 0L, 0L)))
    assert(got(5L) === ((0L, 0L, 0L)))
  }

  test("custom separator with regex metacharacters is treated literally") {
    val df = Seq(
      (1L, "a|b|common"), (2L, "c|common"), (3L, "d|common")
    ).toDF("id", "text")
    val got = TextAnalysis.dropCommonLines(df, "id", "text", maxDocFreq = 3, sep = "|")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a|b", 3L, 1L), (2L, "c", 2L, 1L), (3L, "d", 2L, 1L)))
  }

  test("normalizeText scrubs controls/zero-widths, maps spaces/quotes/dashes, collapses ws") {
    val df = Seq(
      (1L, "  “hello”—world ’s ​x\t\ty  "),
      (2L, "plain text stays"),
      (3L, "a–b—c−d"),             // dash family
      (4L, "tabs\tand\nnewlines\r\ncollapse"),
      (5L, "")
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "\"hello\"-world 's x y")
    assert(got(2L) === "plain text stays")
    assert(got(3L) === "a-b-c-d")
    assert(got(4L) === "tabs and newlines collapse")
    assert(got(5L) === "")
  }

  test("dropDuplicatedWindows removes non-first duplicated runs, keeps the first") {
    // w=3: docs 1 and 2 share the run "x y z q" (two overlapping dup
    // windows); doc 1 (lower id) keeps it, doc 2 loses all 4 covered
    // tokens; doc 3 is untouched; doc 4 is too short to window
    val df = Seq(
      (1L, "a b x y z q c"),
      (2L, "d x y z q e"),
      (3L, "p q r s"),
      (4L, "hi")
    ).toDF("id", "text")
    val got = TextAnalysis.dropDuplicatedWindows(df, "id", "text", windowTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("a b x y z q c", 7L, 0L)))
    assert(got(2L) === (("d e", 6L, 4L)))
    assert(got(3L) === (("p q r s", 4L, 0L)))
    assert(got(4L) === (("hi", 1L, 0L)))
  }

  test("dropDuplicatedWindows supports STRING ids (struct keeper, no encoding)") {
    val df = Seq(
      ("doc-a", "p q x y z q c"),
      ("doc-b", "d x y z q e")
    ).toDF("id", "text")
    val got = TextAnalysis.dropDuplicatedWindows(df, "id", "text", windowTokens = 3)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // "x y z q" duplicated; doc-a (lexicographically first) keeps it
    assert(got("doc-a") === (("p q x y z q c", 0L)))
    assert(got("doc-b") === (("d e", 4L)))
  }

  test("dropDuplicatedWindows: within-doc repetition collapses to the first run") {
    // "u v w u v w u v w": windows at pos 1..7; "u v w"-starting windows
    // at 1,4,7 — hashes at pos 1/4 ("u v w" vs continuation)...
    // identical windows: pos1="u v w", pos4="u v w", pos7="u v w";
    // pos2="v w u"=pos5; pos3="w u v"=pos6. First occurrences pos1,2,3
    // keep; pos4..7 removed -> covered tokens 4..9 -> kept "u v w"
    val df = Seq((1L, "u v w u v w u v w")).toDF("id", "text")
    val got = TextAnalysis.dropDuplicatedWindows(df, "id", "text", windowTokens = 3)
      .head()
    assert(got.getString(1) == "u v w")
    assert(got.getLong(2) == 9L && got.getLong(3) == 6L)
  }

  test("canonicalUrl collapses casing, www, params, fragments, slashes") {
    val urls = Seq(
      "HTTP://WWW.Example.com/a/?utm_source=x#frag",
      "http://example.com/a",
      "https://example.com/A",          // path case preserved -> distinct
      "http://example.com/a/",
      "http://www.example.com/a?x=1",   // CONTENT param survives
      "http://example.com/w?utm_source=f&v=abc&fbclid=z", // tracking stripped, v kept
      "http://example.com/w?v=xyz",
      "https://Example.COM",            // host-only
      "not a url at all")
    val got = urls.toDF("u")
      .select(col("u"), TextAnalysis.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("HTTP://WWW.Example.com/a/?utm_source=x#frag") == "http://example.com/a")
    assert(got("http://example.com/a") == "http://example.com/a")
    assert(got("http://example.com/a/") == "http://example.com/a")
    assert(got("http://www.example.com/a?x=1") == "http://example.com/a?x=1")
    assert(got("http://example.com/w?utm_source=f&v=abc&fbclid=z") ==
      "http://example.com/w?v=abc")
    assert(got("http://example.com/w?v=xyz") == "http://example.com/w?v=xyz",
      "distinct content params must stay distinct")
    assert(got("https://example.com/A") == "https://example.com/A")
    assert(got("https://Example.COM") == "https://example.com")
    assert(got("not a url at all") == "not a url at all")
  }

  test("c4Clean: line rules and doc gates fire individually") {
    val good = "one full sentence sits right here. a second one follows now! " +
      "a third one arrives too? then a fourth lands. and a fifth closes it."
    val df = Seq(
      (1L, good),                                          // keep
      (2L, good + "\nno terminal punctuation line"),       // line dropped
      (3L, good + "\nplease accept the cookie banner."),   // banned word line
      (4L, good + "\ncode { brace }"),                     // doc gated: brace
      (5L, good + "\nlorem ipsum dolor sit amet."),        // doc gated: lorem
      (6L, "too. few. sentences."),                        // < 5 sentences
      (7L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.c4Clean(df, "id", "text")
      .select("id", "n_lines", "n_kept_lines", "c4_keep")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(1L) === ((1L, 1L, true)))
    assert(got(2L) === ((2L, 1L, true)))   // bad line dropped, doc survives
    assert(got(3L) === ((2L, 1L, true)))   // cookie line dropped
    assert(got(4L)._3 == false, "brace must gate the doc out")
    assert(got(5L)._3 == false, "lorem ipsum must gate the doc out")
    assert(got(6L)._3 == false, "sentence minimum must gate")
    assert(got(7L) === ((0L, 0L, false)), "NULL text gates definitively")
  }

  test("importanceScores: target-like transitions outrank off-target ones") {
    val df = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the rug", "en"),
      (3L, "the cat sat on the rug", "en"),     // unseen-in-target? no: all en are target
      (4L, "uno dos tres cuatro cinco seis", "es"),
      (5L, "x", "en")
    ).toDF("id", "text", "lang")
    val got = TextAnalysis.importanceScores(df, "id", "text",
        df.where(col("lang") === "en"), "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every en bigram is in the target -> high ratio; es bigrams never -> 0
    assert(got(1L)._2 > got(4L)._2)
    assert(got(4L)._2 == 0L, s"off-target doc must score 0: ${got(4L)}")
    assert(got(5L) === ((0L, 0L)), "sub-bigram docs score 0")
    // deterministic
    val again = TextAnalysis.importanceScores(df, "id", "text",
        df.where(col("lang") === "en"), "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.map { case (k, v) => k -> v._2 })
  }

  test("bigramTypicality: typical transitions score high, rare ones low, shorts zero") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "b a"),
      (4L, "one"), (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.bigramTypicality(df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // corpus bigrams: (a,b)=2, (b,c)=1, (b,d)=1, (b,a)=1; prefix: a.=2, b.=3
    // doc1: P(b|a)=2/2=1e6, P(c|b)=1/3=333333 -> mean 666666
    assert(got(1L) === ((2L, 666666L)))
    assert(got(2L) === ((2L, 666666L)))
    // doc3: the rare transition only -> 333333
    assert(got(3L) === ((1L, 333333L)))
    // short and NULL docs -> zero
    assert(got(4L) === ((0L, 0L)))
    assert(got(5L) === ((0L, 0L)))
  }

  test("withGopherFlags: each rule fires on its pathological input") {
    val good = ("the quick brown fox jumps over a lazy dog and " * 5).trim
    val df = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short"),                           // word count
      (3L, ("a b c " * 20).trim),                  // mean word len < 3
      (4L, ("# " * 60 + good)),                    // symbol ratio
      (5L, "• x\n• y\n• z"),                       // bullets (and word count)
      (6L, (1 to 60).map(_ => "12345").mkString(" ")) // no alpha, no stopwords
    ).toDF("id", "text")
    val got = TextAnalysis.withGopherFlags(df, "text", minWords = 20)
      .select("id", "f_word_count", "f_mean_word_len", "f_symbol_ratio",
        "f_bullet_lines", "f_alpha_words", "f_stopwords", "gopher_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7))).toMap
    assert(got(1L) === ((true, true, true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._7)
    assert(!got(3L)._2)
    assert(!got(4L)._3)
    assert(!got(5L)._4)
    assert(!got(6L)._5 && !got(6L)._6)
  }

  test("normalizeText handles NULL and exotic unicode spaces") {
    val df = Seq((1L, Some("a　b c")), (2L, None))
      .toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some("a b c"))
    assert(got(2L) === None)
  }

  test("withLicenseFlags classifies hand-pinned notices") {
    val df = Seq(
      (1L, "plain prose with no notice at all"),
      (2L, "Shared under Creative Commons terms."),
      (3L, "This code ships under the MIT License."),
      (4L, "\u00a9 2021 Example Corp"),
      (5L, "All Rights Reserved."),
      (6L, "CC BY-SA applies. All rights reserved by the publisher."), // open wins
      (7L, "copyright (c) 1987 someone"),
      (8L, "we talk about copyright law generally"), // no year => not a notice
      (9L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.withLicenseFlags(df, "text")
      .select("id", "license_class", "license_keep")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("none", true)))
    assert(got(2L) === (("open", true)))
    assert(got(3L) === (("open", true)))
    assert(got(4L) === (("restricted", false)))
    assert(got(5L) === (("restricted", false)))
    assert(got(6L) === (("open", true)))
    assert(got(7L) === (("restricted", false)))
    assert(got(8L) === (("none", true)))
    assert(got(9L) === (("none", true)))
  }
}
