package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("train learns the most frequent pair first, ties break lexicographically") {
    // "abab" x3: pairs (a,b)=6, (b,a)=3 → first merge (a,b)
    val m1 = Bpe.train(Seq(("abab", 3L)), numMerges = 1)
    assert(m1 === Seq(("a", "b")))
    // equal counts: ("xy" 2, "pq" 2) → (p,q) wins the tie lexicographically
    val m2 = Bpe.train(Seq(("xy", 2L), ("pq", 2L)), numMerges = 1)
    assert(m2 === Seq(("p", "q")))
    // training is input-order independent
    val a = Bpe.train(Seq(("hello", 5L), ("help", 3L), ("world", 2L)), 10)
    val b = Bpe.train(Seq(("world", 2L), ("help", 3L), ("hello", 5L)), 10)
    assert(a === b)
  }

  test("train handles self-pairs and stops when no pair remains") {
    // "aaaa": (a,a) merges to [aa, aa], then (aa,aa) to [aaaa] — done
    assert(Bpe.train(Seq(("aaaa", 9L)), numMerges = 5) ===
      Seq(("a", "a"), ("aa", "aa")))
    val m = Bpe.train(Seq(("ab", 1L)), numMerges = 50)
    assert(m === Seq(("a", "b"))) // one merge exhausts the vocab
  }

  test("column encode matches the walk on self-pair merges (runs pair left-first)") {
    val spark0 = spark
    import spark0.implicits._
    val merges = Seq(("a", "a"), ("aa", "a"))
    def reference(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString).toVector)(Bpe.applyMerge)
    val words = Seq("a", "aa", "aaa", "aaaa", "aaaaa", "baaab")
    val got = words.toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(got(w) === reference(w), s"diverged on '$w'"))
  }

  test("applyMerge is leftmost non-overlapping") {
    assert(Bpe.applyMerge(Vector("a", "a", "a"), ("a", "a")) === Vector("aa", "a"))
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a"), ("a", "a")) === Vector("aa", "aa"))
  }

  test("column encode matches the reference Scala walk on every vocab word") {
    val spark0 = spark
    import spark0.implicits._
    val words = Seq("hello", "help", "hell", "lop", "banana", "bananas", "anana", "nan")
    val merges = Bpe.train(words.map(w => (w, 1L)), numMerges = 10)
    def reference(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString).toVector)(Bpe.applyMerge)
    val got = words.toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) === reference(w), s"encode diverged on '$w' (merges=$merges)")
    }
  }

  test("column encode equals the walk on random unseen words (property sweep)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(2026)
    val trainWords = (0 until 30).map(_ => (0 until (3 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val merges = Bpe.train(trainWords.groupBy(identity).view
      .map { case (w, g) => (w, g.size.toLong) }.toSeq, numMerges = 15)
    assert(merges.nonEmpty)
    val probe = (0 until 60).map(_ => (0 until (1 + rnd.nextInt(10)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString).distinct
    def reference(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString).toVector)(Bpe.applyMerge)
    val got = probe.toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    probe.foreach { w =>
      assert(got(w) === reference(w), s"encode diverged on '$w' (merges=$merges)")
    }
  }

  test("tokens flattens per-word encodes; NULL and empty text yield zero tokens") {
    val spark0 = spark
    import spark0.implicits._
    val merges = Seq(("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"))
      .filter { case (a, b) => a != b } // (l,l) is a self-pair — dropped
    val df = Seq(Some("Hello hello world"), Some(""), Some("x"), None)
      .toDF("text")
    val got = df.select(Bpe.tokens(col("text"), merges).as("t"),
        Bpe.nTokens(col("text"), merges).as("n")).collect()
    // without (l,l): hello → he,l,l,o (the (he,ll) rule can't fire)
    assert(got(0).getSeq[String](0) ===
      Seq("he", "l", "l", "o", "he", "l", "l", "o", "w", "o", "r", "l", "d"))
    assert(got(1).getLong(1) === 0L)
    assert(got(2).getSeq[String](0) === Seq("x"))
    assert(got(3).getLong(1) === 0L)
  }

  test("tokensByDict equals the per-instance expression path, row for row") {
    val spark0 = spark
    import spark0.implicits._
    val merges = graft.queries.BpeMerges.Merges
    val docs = Seq(
      (1L, "the customer orders a small batch"),
      (2L, "merge the stream window"),
      (3L, ""), (4L, null.asInstanceOf[String]),
      (5L, "query query query")).toDF("doc_id", "text")
    val expr = docs.select(col("doc_id"),
        Bpe.tokens(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val dict = Bpe.tokensByDict(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(dict === expr)
    val counts = Bpe.nTokensByDict(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === expr.view.mapValues(_.size.toLong).toMap)
  }

  test("SQL literal escaping handles quotes in merge symbols") {
    val sql = Bpe.encodeWordSql("w", Seq(("'", "s")))
    assert(sql.contains("'''' || chr(31) || 's'"), sql)
  }

  test("decode inverts encode: property sweep over random words and real text") {
    import spark.implicits._
    val merges = Bpe.train(Seq(("hello", 5L), ("help", 3L), ("world", 2L),
      ("held", 1L)), numMerges = 20)
    // random lowercase words from the trained alphabet + unseen chars
    val rnd = new scala.util.Random(7)
    val alphabet = "helowrdpxyz"
    val words = (0 until 60).map(_ =>
      (0 until (1 + rnd.nextInt(10))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val texts = words.grouped(6).map(_.mkString(" ")).toSeq
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val bad = df.select(col("id"),
        Bpe.decode(Bpe.wordTokens(col("text"), merges)).as("rec"), col("text"))
      .where(col("rec") =!= col("text"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
    // real corpus text round-trips to its canonical form under the frozen table
    val docs = spark.read.parquet(s"$SfDir/documents.parquet").limit(50)
    val canon = array_join(filter(split(lower(col("text")), "\\s+"),
      t => t =!= lit("")), " ")
    val badDocs = docs.select(
        Bpe.decode(Bpe.wordTokens(col("text"),
          graft.queries.BpeMerges.Merges)).as("rec"), canon.as("canon"))
      .where(col("rec") =!= col("canon"))
    assert(badDocs.count() === 0)
  }

  test("U+001F in words is stripped, not treated as a symbol boundary") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    // U+001F is NOT \s-whitespace: it survives whitespace tokenization and
    // would mis-segment the separator-joined accumulator if kept
    val docs = Seq(
      (1L, "abc plain"),   // embedded separator → encodes as "abc"
      (2L, "abc plain"),
      (3L, " x")      // all-separator word → zero tokens
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Bpe.tokens(col("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === got(2L), s"got(1)=${got(1L)} got(2)=${got(2L)}")
    assert(got(1L) === Seq("abc", "p", "l", "a", "i", "n"))
    assert(got(3L) === Seq("x")) // the separator-only word vanishes
    // decode skips empty-encoded (all-separator) words: no phantom spaces
    val rec = docs.select(col("doc_id"),
        Bpe.decode(Bpe.wordTokens(col("text"), merges)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rec(1L) === "abc plain")
    assert(rec(3L) === "x")
    // the DuckDB twin carries the same strip
    assert(Bpe.encodeWordSql("w", merges).contains("replace(w, chr(31), '')"))
  }
}
