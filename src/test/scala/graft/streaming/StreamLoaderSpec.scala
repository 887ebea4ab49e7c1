package graft.streaming

import graft.SparkSpec
import graft.etl.Catalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sink → Loader-managed target: micro-batches land through the
  * same write path as batch loads (surrogate ids continue across batches,
  * upsert merges replayed data).
  */
class StreamLoaderSpec extends SparkSpec {

  test("streamInto appends micro-batches with contiguous ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt"))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("k", "v")

    val q = StreamLoader.streamInto(stream, tgt, "t",
      checkpointDir = tmpDir("graft-stream-ckpt"), idOrder = Seq("k"))
    try {
      input.addData((3L, "c"), (1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((5L, "e"), (4L, "d"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = tgt.table("t").select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // batch 1 ids 1..3 in k order; batch 2 continues 4..5 — contiguous
    assert(rows.toSeq == Seq(
      (1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c"), (4L, 4L, "d"), (5L, 5L, "e")))
  }

  test("intervalJoin on two streams: watermarked state, only in-window matches") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val views = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, Long)]
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp, Long)]
    val vdf = Sessions.withEventTimeWatermark(
      views.toDF().toDF("user_id", "ts", "view_id"), "1 hour")
    val cdf = Sessions.withEventTimeWatermark(
      clicks.toDF().toDF("user_id", "ts", "click_id"), "1 hour")
    val joined = Sessions.intervalJoin(vdf, cdf, "user_id", "ts", "10 MINUTES",
      leftPayload = Seq("view_id"), rightPayload = Seq("click_id"))
    val q = joined.select("user_id", "view_id", "click_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      views.addData((1L, ts(0), 100L), (2L, ts(0), 200L))
      clicks.addData((1L, ts(5), 900L),  // in window  -> match
        (1L, ts(20), 901L),              // outside 10 min -> no match
        (2L, ts(3), 902L))               // in window, other user
      q.processAllAvailable()
      val rows = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 100L, 900L), (2L, 200L, 902L)))
    } finally q.stop()
  }

  test("streamInto with upsertFields merges replayed rows instead of duplicating") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt2"))

    def run(data: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      val q = StreamLoader.streamInto(input.toDF().toDF("k", "v"), tgt, "t",
        checkpointDir = tmpDir("graft-stream-ckpt2"), idOrder = Seq("k"),
        upsertFields = Seq("k"))
      try { input.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    run(Seq((1L, "a"), (2L, "b")))
    // replay batch with one changed value (simulates at-least-once redelivery)
    run(Seq((1L, "a2"), (2L, "b")))

    val rows = tgt.table("t").select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    // same keys keep their ids; values updated; no duplicate rows
    assert(rows.toSeq == Seq((1L, 1L, "a2"), (2L, 2L, "b")))
  }

  test("partitioned upserting sink: micro-batch merges only touch their partitions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt3"))

    def run(ckpt: String, data: Seq[(Long, String, Double)]): Unit = {
      val input = MemoryStream[(Long, String, Double)]
      val q = StreamLoader.streamInto(input.toDF().toDF("k", "typ", "v"), tgt, "t",
        checkpointDir = ckpt, idOrder = Seq("k"),
        upsertFields = Seq("k", "typ"), partitionBy = Seq("typ"))
      try { input.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    // batch 1 seeds both partitions
    run(tmpDir("graft-sck-a"), (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble)))
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(tgt.dirPath("t")))
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    // batch 2 upserts ONLY partition a
    run(tmpDir("graft-sck-b"), Seq((2L, "a", 999.0), (100L, "a", 1.0)))
    val after = snapshot()
    assert(before.filter(_._1.contains("typ=b")) == after.filter(_._1.contains("typ=b")),
      "partition b files must survive an a-only micro-batch upsert")
    val out = tgt.table("t").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(out(2L) == 999.0 && out(100L) == 1.0 && out.size == 41)
  }

  test("bucketed upserting sink: CDC stream into a hash-bucketed table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tgt = new Catalog(spark, tmpDir("graft-stream-tgt4"))

    def run(ckpt: String, data: Seq[(Long, Double)]): Unit = {
      val input = MemoryStream[(Long, Double)]
      val q = StreamLoader.streamInto(input.toDF().toDF("k", "v"), tgt, "t",
        checkpointDir = ckpt, idOrder = Seq("k"),
        upsertFields = Seq("k"), bucketBy = Some((Seq("k"), 8)))
      try { input.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    run(tmpDir("graft-sck-c"), (1 to 400).map(i => (i.toLong, i.toDouble)))
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(tgt.dirPath("t")))
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    // a 2-key CDC batch merges, touching at most 2 buckets
    run(tmpDir("graft-sck-d"), Seq((7L, 7000.0), (401L, 1.0)))
    val after = snapshot()
    val changed = (before.toSet union after.toSet)
      .diff(before.toSet intersect after.toSet)
      .map(_._1.split("__gbucket=")(1).split("/")(0))
    assert(changed.size <= 2, s"2-key batch must touch <= 2 buckets: $changed")
    val out = tgt.table("t").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(out(7L) == 7000.0 && out(401L) == 1.0 && out.size == 401)
    // the stream table remains point-lookup-able through the bucket path
    val hit = graft.etl.Loader.bucketLookup(tgt, "t", Map("k" -> 7L))
    assert(hit.select("v").head().getDouble(0) == 7000.0)
  }

  test("streamIntoView maintains the aggregate view incrementally per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.etl.MaterializedAgg
    val tgt = new Catalog(spark, tmpDir("graft-stream-mv"))
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("g", "v")
    val aggs = Seq(
      MaterializedAgg.AggCol("count", "", "n"),
      MaterializedAgg.AggCol("sum", "v", "sv"),
      MaterializedAgg.AggCol("max", "v", "mx"))
    val q = StreamLoader.streamIntoView(stream, tgt, "mv",
      checkpointDir = tmpDir("graft-stream-mv-ckpt"),
      groupBy = Seq("g"), aggs = aggs)
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      input.addData(("a", 4L), ("c", 7L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = MaterializedAgg.read(tgt, "mv").orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(("a", 3L, 7L, 4L), ("b", 1L, 10L, 10L), ("c", 1L, 7L, 7L)))
  }

  test("streamIntoView composes with partial-state aggregates (avg, ndv)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.etl.MaterializedAgg
    val tgt = new Catalog(spark, tmpDir("graft-stream-mvp"))
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("g", "v")
    val aggs = Seq(
      MaterializedAgg.AggCol("avg", "v", "av"),
      MaterializedAgg.AggCol("ndv", "v", "nd"))
    val q = StreamLoader.streamIntoView(stream, tgt, "mv",
      checkpointDir = tmpDir("graft-stream-mvp-ckpt"),
      groupBy = Seq("g"), aggs = aggs)
    try {
      input.addData(("a", 2L), ("a", 4L), ("b", 10L))
      q.processAllAvailable()
      input.addData(("a", 6L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
    } finally q.stop()
    // avg folds (sum,count) partials across micro-batches; ndv's KMV union
    // counts each distinct value once regardless of which batch carried it
    val rows = MaterializedAgg.read(tgt, "mv", Seq("g"), aggs).orderBy("g")
      .as[(String, Double, Long)].collect().toSeq
    assert(rows == Seq(("a", 3.5, 3L), ("b", 10.0, 1L)))
  }
}
