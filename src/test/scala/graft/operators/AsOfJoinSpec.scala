package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** The shuffled (range-merge) as-of join must agree with the broadcast
  * binary-search implementation on every direction, including boundary
  * cases at partition edges (forced small partition counts).
  */
class AsOfJoinSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("fk").collect().toSeq
      .map(r => (0 until r.length).map(i => r.get(i)))
      .sortBy(_.mkString("|"))

  test("asOfShuffled matches asOf on seeded random data, all directions") {
    val rnd = new Random(13)
    val facts = spark.createDataFrame(
      Seq.tabulate(200)(i => (i.toLong, rnd.nextLong(1000)))).toDF("fid", "fk")
    val dims = spark.createDataFrame(
      Seq.tabulate(40)(i => (rnd.nextLong(1000), i.toLong + 1))).toDF("dk", "id")

    for (dir <- Seq(">=", ">", "<=", "<")) {
      val a = AsOfJoin.asOf(facts, "fk", dims, "dk",
        payloadCols = Seq("id"), direction = dir, rename = Map("id" -> "dim_id"))
      val b = AsOfJoin.asOfShuffled(facts, "fk", dims, "dk",
        payloadCols = Seq("id"), direction = dir, rename = Map("id" -> "dim_id"),
        numPartitions = 7) // force partition boundaries through the data
      assert(canon(a) == canon(b), s"direction $dir diverged")
    }
  }

  test("asOfShuffled: null fact keys get null payload; empty dim gives all nulls") {
    val facts = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, java.lang.Long.valueOf(5L)),
        org.apache.spark.sql.Row(2L, null.asInstanceOf[java.lang.Long])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fid", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("fk", org.apache.spark.sql.types.LongType))))
    val dims = spark.createDataFrame(Seq((3L, 1L))).toDF("dk", "id")
    val out = AsOfJoin.asOfShuffled(facts, "fk", dims, "dk",
      payloadCols = Seq("id"), direction = "<=", numPartitions = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L) == Some(1L)) // 3 <= 5
    assert(out(2L).isEmpty)     // null key

    val emptyDim = dims.where(lit(false))
    val out2 = AsOfJoin.asOfShuffled(facts, "fk", emptyDim, "dk",
      payloadCols = Seq("id"), direction = "<=", numPartitions = 3)
      .collect().map(r => Option(r.get(2)))
    assert(out2.forall(_.isEmpty))
  }

  test("asOfAuto picks the shuffled path above the broadcast threshold") {
    val facts = spark.createDataFrame(Seq.tabulate(50)(i => (i.toLong, i.toLong * 3))).toDF("fid", "fk")
    val dims = spark.createDataFrame(Seq.tabulate(30)(i => (i.toLong * 5, i.toLong + 1))).toDF("dk", "id")
    val viaAuto = AsOfJoin.asOfAuto(facts, "fk", dims, "dk",
      payloadCols = Seq("id"), direction = "<=", maxBroadcastRows = 10) // forces shuffled
    val viaBroadcast = AsOfJoin.asOf(facts, "fk", dims, "dk",
      payloadCols = Seq("id"), direction = "<=")
    assert(canon(viaAuto) == canon(viaBroadcast))
  }

  test("asOfAuto byte budget: wide string payloads force the merge path, same result") {
    // 200 dim rows x ~1KB payload ≈ 200KB measured — over the 64KB budget,
    // far under the 10k row cap: only the MEASURED byte estimate can flip
    // this to the merge strategy
    val payload = "x" * 1024
    val dims = spark.createDataFrame(
      Seq.tabulate(200)(i => (i.toLong * 5, s"$payload-$i"))).toDF("dk", "p")
    val facts = spark.createDataFrame(
      Seq.tabulate(100)(i => (i.toLong, i.toLong * 7))).toDF("fid", "fk")
    val viaAuto = AsOfJoin.asOfAuto(facts, "fk", dims, "dk",
      payloadCols = Seq("p"), direction = ">=",
      maxBroadcastRows = 10000, maxBroadcastBytes = 64 * 1024)
    val viaBroadcast = AsOfJoin.asOf(facts, "fk", dims, "dk",
      payloadCols = Seq("p"), direction = ">=")
    // the merge strategy has NO join operator (zipPartitions merge-scan);
    // the broadcast strategy joins payloads on the match index — its
    // absence proves the byte budget (not the row cap) made the choice
    val plan = viaAuto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), "byte budget failed to force the merge path")
    assert(viaBroadcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(canon(viaAuto) == canon(viaBroadcast))
  }
}
