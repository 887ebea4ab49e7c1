package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located bucketed joins: two tables bucketed on the join key with the
  * same bucket count must join with NO shuffle exchange — the layout paid
  * the shuffle once, every later join on that key rides it.
  */
class BucketedJoinSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmpDir("graft-bucket")
    (0 until 20000).map(i => (i.toLong, s"left-$i")).toDF("k", "lv")
      .write.parquet(s"$dir/l")
    (0 until 20000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
      .write.parquet(s"$dir/r")
    val cat = new Catalog(spark, dir)

    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // the un-bucketed join shuffles both sides
      val plain = cat.table("l").join(cat.table("r"), Seq("k"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

      val lt = cat.registerBucketed("l", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
      val rt = cat.registerBucketed("r", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
      val bucketed = spark.table(lt).join(spark.table(rt), Seq("k"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // bucket metadata reached the scan
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      // identical results
      assert(bucketed.count() == 20000 && plain.count() == 20000)
      assert(bucketed.agg(sum(col("rv"))).head().getDouble(0) ==
        plain.agg(sum(col("rv"))).head().getDouble(0))

      spark.sql(s"DROP TABLE IF EXISTS $lt")
      spark.sql(s"DROP TABLE IF EXISTS $rt")
    }
  }
}
