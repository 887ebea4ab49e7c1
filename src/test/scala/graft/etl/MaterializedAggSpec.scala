package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private val aggs = Seq(
    MaterializedAgg.AggCol("count", "", "n"),
    MaterializedAgg.AggCol("sum", "v", "sv"),
    MaterializedAgg.AggCol("min", "v", "mn"),
    MaterializedAgg.AggCol("max", "v", "mx"))

  test("incremental refreshes equal one full recomputation") {
    val tgt = new Catalog(spark, tmpDir("mv"))
    val rows = (1 to 300).map(i => (s"g${i % 7}", i.toLong))
    val base = rows.toDF("g", "v")
    // three uneven batches
    val batches = Seq(base.where($"v" <= 50), base.where($"v" > 50 && $"v" <= 230),
      base.where($"v" > 230))
    batches.foreach(b => MaterializedAgg.refresh(tgt, "mv", b, Seq("g"), aggs))
    val incr = MaterializedAgg.read(tgt, "mv").orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    val full = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(incr == full)
  }

  test("a batch with only new groups inserts; only existing groups update in place") {
    val tgt = new Catalog(spark, tmpDir("mv"))
    MaterializedAgg.refresh(tgt, "mv", Seq(("a", 1L), ("a", 2L)).toDF("g", "v"),
      Seq("g"), aggs)
    MaterializedAgg.refresh(tgt, "mv", Seq(("b", 10L)).toDF("g", "v"), Seq("g"), aggs)
    MaterializedAgg.refresh(tgt, "mv", Seq(("a", 7L)).toDF("g", "v"), Seq("g"), aggs)
    val out = MaterializedAgg.read(tgt, "mv").orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq(("a", 3L, 10L, 1L, 7L), ("b", 1L, 10L, 10L, 10L)))
  }

  test("unsupported aggregate is rejected at definition time") {
    intercept[IllegalArgumentException] {
      MaterializedAgg.AggCol("avg", "v", "a")
    }
  }
}
