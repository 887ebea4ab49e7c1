package graft

import org.apache.spark.sql.functions._
import graft.functions.NgramLm
import graft.queries.LmStats

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(texts: (Long, String)*) =
    NgramLm.withPerplexity(
        texts.toSeq.toDF("doc_id", "text"),
        "text", LmStats.NllE6, LmStats.HeadMaxE6, LmStats.MiddleMaxE6)
      .orderBy("doc_id")
      .collect()

  test("reference-like text scores below reference-alien text") {
    // a verbatim reference-corpus opening vs the same tokens in an order
    // the reference LM has never seen (reversed destroys the transitions)
    val refLike = "the fast key order sort table scan merge part window"
    val alien = refLike.split(' ').reverse.mkString(" ")
    val rows = score(1L -> refLike, 2L -> alien)
    val nll = rows.map(r => r.getLong(r.fieldIndex("lm_nll_e6")))
    assert(nll(0) < nll(1), s"expected ${nll(0)} < ${nll(1)}")
  }

  test("documents with fewer than two tokens are unscored, not zero") {
    val rows = score(1L -> "single", 2L -> "", 3L -> "two tokens")
    assert(rows(0).isNullAt(rows(0).fieldIndex("lm_nll_e6")))
    assert(rows(0).getString(rows(0).fieldIndex("ppl_band")) == "unscored")
    assert(rows(1).getString(rows(1).fieldIndex("ppl_band")) == "unscored")
    assert(!rows(2).isNullAt(rows(2).fieldIndex("lm_nll_e6")))
  }

  test("null text is unscored") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("doc_id", "text")
    val out = NgramLm.withPerplexity(df, "text",
      LmStats.NllE6, LmStats.HeadMaxE6, LmStats.MiddleMaxE6).orderBy("doc_id").collect()
    assert(out(0).getString(out(0).fieldIndex("ppl_band")) == "unscored")
  }

  test("banding respects the frozen tercile cuts exactly") {
    val cuts = Seq(
      LmStats.HeadMaxE6 -> "head", (LmStats.HeadMaxE6 + 1) -> "middle",
      LmStats.MiddleMaxE6 -> "middle", (LmStats.MiddleMaxE6 + 1) -> "tail")
    val df = cuts.zipWithIndex
      .map { case ((s, b), i) => (i.toLong, s, b) }
      .toDF("id", "score", "expected")
      .withColumn("band",
        NgramLm.band(col("score"), LmStats.HeadMaxE6, LmStats.MiddleMaxE6))
    assert(df.where(col("band") =!= col("expected")).count() == 0)
  }

  test("score is a deterministic pure projection (no shuffle in the plan)") {
    val df = spark.read.parquet(s"$SfDir/documents.parquet")
    val scored = NgramLm.withPerplexity(df, "text",
      LmStats.NllE6, LmStats.HeadMaxE6, LmStats.MiddleMaxE6)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
