package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ADMISSION-TIME pruning for the streaming reads (`admissionFilter`):
  * per-batch file planning skips every file whose zone maps prove no
  * matching row — the streaming twin of the batch format's pushed-filter
  * pruning (Spark itself pushes nothing into DSv2 streaming scans).
  *
  *   - append tail (`format("graft")`): files prune AND rows filter
  *     exactly, so the filtered stream IS `unfiltered.where(pred)` —
  *     pinned against a clustered 3-append table (only admitting files
  *     planned; mid-file predicates row-exact);
  *   - CDC (`format("graft-cdc")`): KEY-column predicates only
  *     (diff-sound: a matching key's files always admit on both sides;
  *     value predicates refuse loudly), batch shape pinned = fewer
  *     partitions, and feed + re-filter ≡ unfiltered + filter.
  */
class StreamAdmissionSpec extends SparkSpec {
  import spark.implicits._

  /** 3 appends with DISJOINT k ranges → 3 data files with disjoint zone
    * maps (the shape admission pruning exists for). */
  private def clustered(): Catalog = {
    val src = new Catalog(spark, tmpDir("adm"))
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      VersionedTable.load(src, "t",
        r.map(i => (i, s"v$i")).toDF("k", "s").coalesce(1),
        idOrder = Seq("k"))
    }
    src
  }

  private def drain(df: DataFrame, out: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", tmpDir("admck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (b.count() > 0) b.write.mode("append").parquet(out)
      }
      .start()
    q.awaitTermination()
  }

  test("append tail: only admitting files plan; results = unfiltered + filter") {
    val src = clustered()
    // planner surface: the zone maps drop 2 of the 3 data files
    val all = VersionedTable.appendSlices(src, "t", 0L, 3L, skipChanges = false)
    val pruned = VersionedTable.appendSlices(src, "t", 0L, 3L,
      skipChanges = false,
      admit = org.apache.spark.sql.graft.ZonePred.Leaf("k", "ge", Seq(250L)))
    assert(all.size >= 3 && pruned.size < all.size,
      s"admission must drop whole files: ${pruned.size} of ${all.size}")
    // end-to-end, boundary INSIDE a file: rows filter exactly
    val out = tmpDir("admout") + "/rows"
    drain(spark.readStream.format("graft")
      .option("dir", src.dir).option("table", "t")
      .option("admissionFilter", "k >= 150").load(), out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq ==
      (150L to 300L),
      "the filtered stream must equal unfiltered.where(pred) row-exactly")
    // appends after bootstrap prune too: one in-range, one fully pruned
    val out2 = tmpDir("admout2") + "/rows"
    val ck = tmpDir("admck2")
    val q1 = spark.readStream.format("graft")
      .option("dir", src.dir).option("table", "t")
      .option("admissionFilter", "k >= 350").load()
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, _: Long) =>
        if (b.count() > 0) b.write.mode("append").parquet(out2))
      .start()
    q1.awaitTermination()
    VersionedTable.load(src, "t",
      (301L to 400L).map(i => (i, s"v$i")).toDF("k", "s").coalesce(1),
      idOrder = Seq("k"))
    val q2 = spark.readStream.format("graft")
      .option("dir", src.dir).option("table", "t")
      .option("admissionFilter", "k >= 350").load()
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, _: Long) =>
        if (b.count() > 0) b.write.mode("append").parquet(out2))
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out2).select("k").as[Long].collect().sorted.toSeq ==
      (350L to 400L), "the appended batch must row-filter too")
  }

  test("CDC: key-predicate admission plans fewer partitions, feed stays exact") {
    // flat CLUSTERED appends (disjoint key ranges per file) — bucket
    // hashing would scatter the ranges and leave nothing to prune
    val src = new Catalog(spark, tmpDir("admcdc"))
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      VersionedTable.load(src, "t",
        r.map(i => (i, i * 10L)).toDF("k", "v").coalesce(1),
        idOrder = Seq("k"))
    }
    def feed(extra: Map[String, String]) = {
      val r = spark.read.format("graft-cdc")
        .option("dir", src.dir).option("table", "t")
        .option("keys", "k")
        .option("startingVersion", "0")
      extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
    }
    val unfiltered = feed(Map.empty)
    val filtered = feed(Map("admissionFilter" -> "k >= 250"))
    assert(filtered.rdd.getNumPartitions < unfiltered.rdd.getNumPartitions,
      "key admission must drop whole files from the CDC plan")
    // feed + re-filter ≡ unfiltered + filter (the documented contract)
    val lhs = filtered.where(col("k") >= 250)
      .select("op", "k", "v").collect().toSet
    val rhs = unfiltered.where(col("k") >= 250)
      .select("op", "k", "v").collect().toSet
    assert(lhs == rhs && lhs.nonEmpty, s"CDC admission must lose no matching key")
    // a VALUE-column predicate is refused (it would lose matching keys'
    // counterpart rows from the diff)
    val err = intercept[Exception] {
      feed(Map("admissionFilter" -> "v >= 100")).rdd.getNumPartitions
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("KEY columns only")),
      s"expected the key-only refusal: ${messages(err)}")
  }
}
