package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, TextAnalysis}

class SentenceSpec extends SparkSpec {
  import spark.implicits._

  private def sents(text: String): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.sentencesOf(col("t")).as("s"))
    df.collect()(0).getSeq[String](0)
  }

  test("splits after terminal punctuation followed by whitespace") {
    assert(sents("One sentence. Two now! Three?  Four") ==
      Seq("One sentence.", "Two now!", "Three?", "Four"))
  }

  test("punctuation without following whitespace does not split") {
    assert(sents("pi is 3.14 not 3. 15") == Seq("pi is 3.14 not 3.", "15"))
    assert(sents("e.g.this stays whole") == Seq("e.g.this stays whole"))
  }

  test("null and empty text yield no sentences") {
    assert(sents("") == Seq.empty)
    val df = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(TextAnalysis.sentencesOf(col("t")).as("s"))
    assert(df.collect()(0).getSeq[String](0) == Seq.empty)
  }

  test("a pre-existing record separator cannot inject boundaries") {
    assert(sents("evilinput here") == Seq("evil" + "input here"))
  }

  test("sentence windows never split a sentence") {
    val text = "A one. B two. C three. D four. E five."
    val chunks = Chunking.tokenChunksOf(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", TextAnalysis.sentencesOf(col("text")),
        chunkSize = 2, stride = 2)
      .orderBy("chunk_id").collect()
    assert(chunks.map(_.getString(3)).toSeq == Seq(
      "A one. B two.", "C three. D four.", "E five."))
  }
}
