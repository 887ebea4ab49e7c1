package graft.functions

import graft.SparkSpec
import graft.queries.QualityWeights
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("column scorer matches the JVM feature twin exactly (integer ppm)") {
    val texts = Seq("the quick brown fox jumps", "merge the stream window",
      "free prize winner click here buy now", "one", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = QualityClassifier.withQualityScore(df, "text",
        QualityWeights.WeightsPpm, QualityWeights.BiasPpm)
      .select("id", "quality_logit_ppm").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = QualityWeights.BiasPpm +
        QualityClassifier.featureBucketsJvm(t, QualityWeights.WeightsPpm.length)
          .map(QualityWeights.WeightsPpm(_)).sum
      assert(got(i.toLong) === want, s"text '$t'")
    }
  }

  test("frozen weights separate real docs from spam-reversed corruption") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val corrupted = docs.select(col("doc_id"),
      concat(lit("free prize winner click here buy now "),
        concat_ws(" ", reverse(graft.operators.TextAnalysis.tokens(col("text")))))
        .as("text"))
    def keeps(df: org.apache.spark.sql.DataFrame): Seq[Boolean] =
      QualityClassifier.withQualityScore(df, "text",
          QualityWeights.WeightsPpm, QualityWeights.BiasPpm)
        .select("quality_keep").as[Boolean].collect().toSeq
    assert(keeps(docs).forall(identity), "every real doc must score keep")
    assert(keeps(corrupted).forall(!_), "every corrupted doc must score drop")
  }

  test("training is deterministic and separates its own training set") {
    val pos = Seq("alpha beta gamma delta", "beta gamma delta epsilon",
      "gamma delta epsilon zeta")
    val neg = pos.map("spam spam " + _.split(" ").reverse.mkString(" "))
    val ex = pos.map((_, 1)) ++ neg.map((_, 0))
    val (w1, b1) = QualityClassifier.train(ex, numBuckets = 64, epochs = 100)
    val (w2, b2) = QualityClassifier.train(ex, numBuckets = 64, epochs = 100)
    assert(w1 === w2 && b1 === b2)
    def score(t: String): Long =
      b1 + QualityClassifier.featureBucketsJvm(t, 64).map(w1(_)).sum
    assert(pos.forall(score(_) >= 0) && neg.forall(score(_) < 0))
  }

  test("scoring plan is a pure projection: no Exchange, no Join") {
    val df = Seq((1L, "some text here")).toDF("id", "text")
    val plan = QualityClassifier.withQualityScore(df, "text",
        QualityWeights.WeightsPpm, QualityWeights.BiasPpm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }
}
