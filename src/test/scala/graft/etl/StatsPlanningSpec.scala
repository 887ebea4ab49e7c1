package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VERDICT r4 #8 — stats-fed planning: ANALYZEd catalog tables give the
  * cost-based optimizer the row counts + column NDVs it needs to see that
  * a FILTERED large dimension fits under the broadcast threshold. The same
  * join over a stats-less temp view keeps the full-table size estimate and
  * degrades to a shuffle join.
  */
class StatsPlanningSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("column stats flip a filtered-dimension join from shuffle to broadcast") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmpDir("graft-stats")
    val cat = new Catalog(spark, dir)

    // dim: 40k rows, parquet well above the 16KB threshold below; the
    // grp = 5 slice is ~40 rows — broadcastable iff the planner can SEE it
    (0 until 40000).map(k => (k.toLong, (k % 1000).toLong, s"pad-$k-" + "x" * 24))
      .toDF("k", "grp", "pad").repartition(2)
      .write.parquet(s"$dir/dim")
    val fact = (0 until 10000).map(i => (i.toLong % 40000, i.toLong)).toDF("k", "v")

    withConfs(
      "spark.sql.adaptive.enabled" -> "false", // assert the STATIC plan
      "spark.sql.autoBroadcastJoinThreshold" -> (16 * 1024).toString) {
      Catalog.enableCbo(spark)

      // no stats: temp view estimate = file size; filter doesn't shrink it
      cat.registerViews()
      val blind = fact.join(
        spark.table("dim").where(col("grp") === 5), Seq("k"))
      val blindPlan = blind.queryExecution.executedPlan.toString
      assert(!blindPlan.contains("BroadcastHashJoin"),
        s"stats-less plan should NOT broadcast the filtered dim:\n$blindPlan")

      // ANALYZEd catalog table: filter estimation via grp's NDV shrinks the
      // build side under the threshold -> broadcast
      cat.registerWithStats(Seq("dim"), Map("dim" -> Seq("k", "grp")),
        prefix = "stats_")
      val informed = fact.join(
        spark.table("stats_dim").where(col("grp") === 5), Seq("k"))
      val informedPlan = informed.queryExecution.executedPlan.toString
      assert(informedPlan.contains("BroadcastHashJoin"),
        s"stats-fed plan should broadcast the filtered dim:\n$informedPlan")

      // and the answers agree
      assert(blind.count() == informed.count())
      spark.sql("DROP TABLE IF EXISTS stats_dim")
    }
  }
}
