package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RowWidthSpec extends SparkSpec {

  test("estimate measures variable-width columns instead of assuming 20 bytes") {
    val spark0 = spark
    import spark0.implicits._
    val wide = (1 to 500).map(i => (i.toLong, "x" * 1000)).toDF("k", "payload")
    val est = RowWidth.estimate(wide, Seq("k", "payload"))
    assert(est >= 1000L && est <= 1100L, s"estimate $est should reflect the 1KB payload")
    val narrow = (1 to 500).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    assert(RowWidth.estimate(narrow, Seq("a", "b")) == 16L)
  }

  test("shardForTargetFileSize picks ceil(total/target) partitions and keeps the data") {
    val spark0 = spark
    import spark0.implicits._
    // 1000 rows x ~1008 bytes ≈ 1.0 MB; 128KB target -> 8 partitions
    val df = (1 to 1000).map(i => (i.toLong, "y" * 1000)).toDF("k", "payload")
    val sharded = RowWidth.shardForTargetFileSize(df, 128L * 1024)
    assert(sharded.rdd.getNumPartitions == 8,
      s"expected 8 partitions, got ${sharded.rdd.getNumPartitions}")
    assert(sharded.count() == 1000)
    // a tiny frame never explodes into many partitions
    val tiny = (1 to 3).map(i => (i.toLong, "z")).toDF("k", "payload")
    assert(RowWidth.shardForTargetFileSize(tiny, 128L * 1024).rdd.getNumPartitions == 1)
  }
}
