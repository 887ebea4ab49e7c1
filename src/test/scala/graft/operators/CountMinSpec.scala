package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic skewed stream: key k_i appears i times, i = 1..40
  private def stream = (1 to 40).flatMap(i => Seq.fill(i)(s"k$i")).toDF("item")

  test("estimates are never below exact counts (one-sided error)") {
    val sk = CountMin.sketch(stream, "item", d = 4, w = 32) // tight width forces collisions
    val exact = stream.groupBy("item").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimates(sk, exact.select("item"), "item", d = 4, w = 32)
    val bad = est.join(exact, "item").where($"cms_count" < $"exact").count()
    assert(bad == 0L)
  }

  test("wide sketch (no collisions) is exact; unseen keys estimate 0") {
    val sk = CountMin.sketch(stream, "item", d = 4, w = 1 << 16)
    val exact = stream.groupBy("item").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimates(sk, exact.select("item"), "item", d = 4, w = 1 << 16)
    assert(est.join(exact, "item").where($"cms_count" =!= $"exact").count() == 0L)
    val unseen = CountMin.estimates(sk, Seq("never-seen").toDF("item"), "item", 4, 1 << 16)
      .select("cms_count").as[Long].head()
    assert(unseen == 0L)
  }

  test("merged per-part sketches equal the sketch of the union") {
    val (a, b) = (stream.where($"item".isin("k1", "k5", "k30")),
      stream.where(!$"item".isin("k1", "k5", "k30")))
    val merged = CountMin.merge(
      CountMin.sketch(a, "item", 4, 64), CountMin.sketch(b, "item", 4, 64))
      .orderBy("r", "bucket").as[(Int, Long, Long)].collect.toSeq
    val whole = CountMin.sketch(stream, "item", 4, 64)
      .orderBy("r", "bucket").as[(Int, Long, Long)].collect.toSeq
    assert(merged == whole)
  }

  test("sketch size is bounded by d·w regardless of stream size") {
    val sk = CountMin.sketch(stream, "item", d = 3, w = 8)
    assert(sk.count() <= 3L * 8)
  }
}
