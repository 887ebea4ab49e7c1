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
      MaterializedAgg.AggCol("median", "v", "a")
    }
  }

  test("avg and ndv partials merge across refreshes to the full-recompute answer") {
    val tgt = new Catalog(spark, tmpDir("mv"))
    val withPartials = aggs ++ Seq(
      MaterializedAgg.AggCol("avg", "v", "av"),
      MaterializedAgg.AggCol("ndv", "v", "nd"))
    val rows = (1 to 300).map(i => (s"g${i % 7}", (i % 40).toLong))
    val base = rows.toDF("g", "v")
    val batches = Seq(base.where($"v" <= 13), base.where($"v" > 13 && $"v" <= 27),
      base.where($"v" > 27))
    batches.foreach(b =>
      MaterializedAgg.refresh(tgt, "mv", b, Seq("g"), withPartials, kmvK = 64))
    val incr = MaterializedAgg
      .read(tgt, "mv", Seq("g"), withPartials, kmvK = 64)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Double, Long)].collect.toSeq
    val full = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"),
        max("v").as("mx"),
        (sum("v").cast("double") / count("v")).as("av"),
        // < k distinct per group → the KMV estimate is EXACT
        countDistinct("v").as("nd"))
      .orderBy("g").as[(String, Long, Long, Long, Long, Double, Long)].collect.toSeq
    assert(incr == full)
  }

  test("avg over an all-null group reads back null, not zero") {
    val tgt = new Catalog(spark, tmpDir("mv"))
    val a = Seq(MaterializedAgg.AggCol("avg", "v", "av"))
    val batch = Seq(("a", Some(4L)), ("a", Some(6L)), ("b", None))
      .toDF("g", "v")
    MaterializedAgg.refresh(tgt, "mv", batch, Seq("g"), a)
    val out = MaterializedAgg.read(tgt, "mv", Seq("g"), a).orderBy("g")
      .collect.map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq == Seq(("a", 5.0), ("b", null)))
  }

  test("applyChanges retracts deletes and group-moving updates exactly") {
    val tgt = new Catalog(spark, tmpDir("mvcdc"))
    val a = Seq(
      MaterializedAgg.AggCol("count", "", "n"),
      MaterializedAgg.AggCol("sum", "v", "sv"),
      MaterializedAgg.AggCol("avg", "v", "av"))
    // base state: g1 = {10, 20}, g2 = {30}
    val base = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L))
      .toDF("k", "g", "v")
    MaterializedAgg.refresh(tgt, "mv", base, Seq("g"), a)
    // feed: k=1 deleted; k=2 updated AND moved g1→g2 with new value 25;
    // k=4 inserted into g3
    val feed = Seq(
      ("delete", 1L, "g1", 10L, Some("g1"), Some(10L)),
      ("update", 2L, "g2", 25L, Some("g1"), Some(20L)),
      ("insert", 4L, "g3", 7L, None: Option[String], None: Option[Long]))
      .toDF("op", "k", "g", "v", "g__old", "v__old")
    MaterializedAgg.applyChanges(tgt, "mv", feed, Seq("g"), a)
    val out = MaterializedAgg.read(tgt, "mv", Seq("g"), a)
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    // g1 emptied → zero row retained (documented: keyed upsert can't
    // delete); g2 = {30, 25}; g3 = {7}
    assert(out == Seq(
      ("g1", 0L, 0L, null),
      ("g2", 2L, 55L, 27.5),
      ("g3", 1L, 7L, 7.0)))
    // the same state a fresh aggregation of the target snapshot yields,
    // modulo the zero row
    val target = Seq((2L, "g2", 25L), (3L, "g2", 30L), (4L, "g3", 7L))
      .toDF("k", "g", "v")
    val fresh = target.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        (sum("v").cast("double") / count("v")).as("av"))
      .orderBy("g")
      .as[(String, Long, Long, Double)].collect.toSeq
    assert(out.filter(_._2 > 0).map(t => (t._1, t._2, t._3, t._4)) == fresh)
  }

  test("applyChanges refuses non-retractable aggregates and old-less feeds") {
    val tgt = new Catalog(spark, tmpDir("mvcdc2"))
    val feed = Seq(("insert", "g1", 1L, Some(0L))).toDF("op", "g", "v", "v__old")
    intercept[IllegalArgumentException] {
      MaterializedAgg.applyChanges(tgt, "mv", feed, Seq("g"),
        Seq(MaterializedAgg.AggCol("min", "v", "mn")))
    }
    val noOld = Seq(("insert", "g1", 1L)).toDF("op", "g", "v")
    intercept[IllegalArgumentException] {
      MaterializedAgg.applyChanges(tgt, "mv", noOld, Seq("g"),
        Seq(MaterializedAgg.AggCol("sum", "v", "sv")))
    }
  }

  test("snapshot-spliced applyChanges maintains min/max/ndv views under updates and deletes") {
    val tgt = new Catalog(spark, tmpDir("mvmm"))
    val a = Seq(
      MaterializedAgg.AggCol("count", "", "n"),
      MaterializedAgg.AggCol("min", "v", "mn"),
      MaterializedAgg.AggCol("max", "v", "mx"),
      MaterializedAgg.AggCol("ndv", "v", "nd"))
    // base: g1 = {10, 20, 20}, g2 = {30}
    val base = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L),
      (5L, "g1", 20L)).toDF("k", "g", "v")
    MaterializedAgg.refresh(tgt, "mv", base, Seq("g"), a)
    // k=1 (g1's MIN) deleted — delta maintenance could never recover the
    // new min; k=2 moves g1→g2; k=4 inserts into g3. Snapshot = post-
    // change base state.
    val snapshot = Seq((2L, "g2", 25L), (3L, "g2", 30L), (4L, "g3", 7L),
      (5L, "g1", 20L)).toDF("k", "g", "v")
    val feed = Seq(
      ("delete", 1L, "g1", 10L, Some("g1"), Some(10L)),
      ("update", 2L, "g2", 25L, Some("g1"), Some(20L)),
      ("insert", 4L, "g3", 7L, None: Option[String], None: Option[Long]))
      .toDF("op", "k", "g", "v", "g__old", "v__old")
    MaterializedAgg.applyChanges(tgt, "mv", feed, snapshot, Seq("g"), a)
    val out = MaterializedAgg.read(tgt, "mv", Seq("g"), a).where($"n" > 0)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect.toSeq
    val fresh = snapshot.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"),
        countDistinct("v").as("nd")) // < k distinct → KMV exact
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(out == fresh)
  }

  test("snapshot splice re-aggregates touched groups only and rewrites only their buckets") {
    val tgt = new Catalog(spark, tmpDir("mvmm2"))
    val n = 8
    val a = Seq(
      MaterializedAgg.AggCol("count", "", "cnt"),
      MaterializedAgg.AggCol("min", "v", "mn"))
    val base = (1 to 200).map(i => (i.toLong, s"g${i % 20}", i.toLong))
      .toDF("k", "g", "v")
    MaterializedAgg.refresh(tgt, "mv", base, Seq("g"), a, numBuckets = n)
    def bucketState(): Map[String, Set[(String, Long)]] = {
      val dir = new java.io.File(tgt.dirPath("mv"))
      dir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__gbucket="))
        .map(b => b.getName -> b.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    }
    val before = bucketState()
    assert(before.size > 1)
    // delete g3's minimum (k=3, v=3); snapshot = base without it. The
    // re-aggregation must touch ONLY g3 — assert via the scan filter AND
    // the bucket dirs.
    val snapshot = base.where($"k" =!= 3L)
    val feed = Seq(("delete", 3L, "g3", 3L, Some("g3"), Some(3L)))
      .toDF("op", "k", "g", "v", "g__old", "v__old")
    MaterializedAgg.applyChanges(tgt, "mv", feed, snapshot, Seq("g"), a,
      numBuckets = n, kmvK = 256)
    val after = bucketState()
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed.size == 1,
      s"one-group CDC splice must rewrite exactly one bucket dir; touched: $changed")
    val g3 = MaterializedAgg.read(tgt, "mv", Seq("g"), a).where($"g" === "g3")
      .as[(String, Long, Long)].head()
    // g3 was {3, 23, 43, ..., 183} (10 rows); without k=3 the min is 23
    assert(g3 == (("g3", 9L, 23L)))
  }

  test("count-only views accept feeds without __old twins") {
    val tgt = new Catalog(spark, tmpDir("mvcnt"))
    val a = Seq(MaterializedAgg.AggCol("count", "", "n"))
    MaterializedAgg.refresh(tgt, "mv",
      Seq(("g1", 1L), ("g1", 2L), ("g2", 3L)).toDF("g", "k"), Seq("g"), a)
    // every feed column is a CDC key (g, k) — changes(includeOld = true)
    // over such a table has NO value columns, hence no __old twins; the
    // count-only maintenance must accept it (group keys are immutable)
    val feed = Seq(("delete", "g1", 1L), ("insert", "g2", 9L))
      .toDF("op", "g", "k")
    MaterializedAgg.applyChanges(tgt, "mv", feed, Seq("g"), a)
    val out = MaterializedAgg.read(tgt, "mv", Seq("g"), a).orderBy("g")
      .as[(String, Long)].collect.toSeq
    assert(out == Seq(("g1", 1L), ("g2", 2L)))
  }

  test("a single-group micro-batch rewrites only the bucket it hashes into") {
    val tgt = new Catalog(spark, tmpDir("mv"))
    val n = 8
    val base = (1 to 200).map(i => (s"g${i % 20}", i.toLong)).toDF("g", "v")
    MaterializedAgg.refresh(tgt, "mv", base, Seq("g"), aggs, numBuckets = n)

    def bucketState(): Map[String, Set[(String, Long)]] = {
      val dir = new java.io.File(tgt.dirPath("mv"))
      dir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__gbucket="))
        .map(b => b.getName -> b.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    }
    val before = bucketState()
    assert(before.size > 1, "test needs the view spread over several buckets")

    MaterializedAgg.refresh(tgt, "mv", Seq(("g3", 999L)).toDF("g", "v"),
      Seq("g"), aggs, numBuckets = n)
    val after = bucketState()
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed.size == 1,
      s"one-group refresh must touch exactly one bucket dir; touched: $changed")

    // and the merge is still correct
    val out = MaterializedAgg.read(tgt, "mv").where($"g" === "g3")
      .as[(String, Long, Long, Long, Long)].head()
    val expect = base.where($"g" === "g3").agg(
      count(lit(1)) + 1, sum("v") + 999L, min("v"), greatest(max("v"), lit(999L)))
      .as[(Long, Long, Long, Long)].head()
    assert((out._2, out._3, out._4, out._5) == expect)
  }
}
