package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition-scoped upsert: a Hive-partitioned graft table merges an
  * incoming batch by rewriting ONLY the partitions the batch touches —
  * untouched partitions' files must survive byte-for-byte — while
  * producing exactly the same table state as the unpartitioned full
  * rewrite.
  */
class PartitionedUpsertSpec extends SparkSpec {

  private def fileSnapshot(dir: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.startsWith("part-"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("scoped upsert rewrites only touched partitions; equals full merge") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1 to 1200).map { i =>
      (i.toLong, Seq("click", "buy", "view", "scroll")(i % 4), i.toDouble)
    }
    val incoming = rows.toDF("k", "typ", "v")
    val upd = (1 to 100).map(i => (i * 4L, "click", i * 1000.0)) // k%4==0 -> click
      .toDF("k", "typ", "v")
      .unionByName(Seq((5000L, "click", 1.0), (5004L, "click", 2.0)).toDF("k", "typ", "v"))

    // partitioned table
    val pt = new Catalog(spark, tmpDir("graft-part"))
    Loader.load(pt, "t", incoming, idOrder = Seq("k"), partitionBy = Seq("typ"))
    val dir = new java.io.File(pt.dirPath("t"))
    assert(dir.listFiles().count(f => f.getName.startsWith("typ=")) == 4)
    val before = fileSnapshot(dir)

    Loader.load(pt, "t", upd, upsertFields = Seq("k", "typ"), idOrder = Seq("k"))
    val after = fileSnapshot(dir)

    // every file outside typ=click is the SAME file (path + mtime)
    val untouchedBefore = before.filter(!_._1.contains("typ=click"))
    val untouchedAfter = after.filter(!_._1.contains("typ=click"))
    assert(untouchedBefore == untouchedAfter,
      "files in untouched partitions must not be rewritten")
    // the click partition did change
    assert(before.keySet.filter(_.contains("typ=click")) !=
      after.keySet.filter(_.contains("typ=click")))

    // reference: same loads through an UNPARTITIONED table
    val ref = new Catalog(spark, tmpDir("graft-flat"))
    Loader.load(ref, "t", incoming, idOrder = Seq("k"))
    Loader.load(ref, "t", upd, upsertFields = Seq("k", "typ"), idOrder = Seq("k"))

    def snap(c: Catalog) = c.table("t").select("id", "k", "typ", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(snap(pt) == snap(ref), "partition-scoped merge must equal the full merge")
    // partition column type survives the directory round trip (sidecar cast)
    assert(pt.table("t").schema("typ").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(pt.table("t").schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("multi-column spec: scoped upsert rewrites only touched LEAF partitions") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1 to 800).map { i =>
      (i.toLong, Seq("eu", "us")(i % 2), Seq("a", "b")((i / 2) % 2), i.toDouble)
    }
    val incoming = rows.toDF("k", "region", "typ", "v")
    // updates + one insert, ALL in the (eu, a) leaf
    val upd = (1 to 50).map(i => {
      val k = i * 4 // k%2==0 -> eu, (k/2)%2==0 -> a
      (k.toLong, "eu", "a", k * 1000.0)
    }).toDF("k", "region", "typ", "v")
      .unionByName(Seq((9001L, "eu", "a", 1.0)).toDF("k", "region", "typ", "v"))
    assert(incoming.where(col("region") === "eu" && col("typ") === "a")
      .select("k").as[Long].collect().toSet
      .intersect(upd.select("k").as[Long].collect().toSet).size == 50)

    val pt = new Catalog(spark, tmpDir("graft-mpart"))
    Loader.load(pt, "t", incoming, idOrder = Seq("k"),
      partitionBy = Seq("region", "typ"))
    val dir = new java.io.File(pt.dirPath("t"))
    // nested layout: region=*/typ=*
    assert(dir.listFiles().count(_.getName.startsWith("region=")) == 2)
    assert(new java.io.File(dir, "region=eu").listFiles()
      .count(_.getName.startsWith("typ=")) == 2)
    val before = fileSnapshot(dir)

    Loader.load(pt, "t", upd, upsertFields = Seq("k", "region", "typ"),
      idOrder = Seq("k"))
    val after = fileSnapshot(dir)
    val touched = (p: String) => p.contains("region=eu") && p.contains("typ=a")
    assert(before.filterNot(kv => touched(kv._1)) ==
      after.filterNot(kv => touched(kv._1)),
      "files outside the touched leaf must survive byte-for-byte")
    assert(before.keySet.filter(touched) != after.keySet.filter(touched),
      "the touched leaf must actually rewrite")

    // same end state as the flat full merge
    val ref = new Catalog(spark, tmpDir("graft-mflat"))
    Loader.load(ref, "t", incoming, idOrder = Seq("k"))
    Loader.load(ref, "t", upd, upsertFields = Seq("k", "region", "typ"),
      idOrder = Seq("k"))
    def snap(c: Catalog) = c.table("t").select("id", "k", "region", "typ", "v")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
      .toSet
    assert(snap(pt) == snap(ref), "multi-col scoped merge must equal the full merge")
  }

  test("a stranded NESTED .__part- aside restores its leaf on the next load") {
    val spark0 = spark
    import spark0.implicits._
    val pt = new Catalog(spark, tmpDir("graft-mstrand"))
    val rows = (1 to 100).map(i =>
      (i.toLong, Seq("eu", "us")(i % 2), Seq("a", "b")((i / 2) % 2), i.toDouble))
      .toDF("k", "region", "typ", "v")
    Loader.load(pt, "t", rows, idOrder = Seq("k"), partitionBy = Seq("region", "typ"))
    val before = pt.table("t").collect().map(_.toSeq).toSet
    // crash window: nested leaf moved aside, new copy never renamed in
    val dir = new java.io.File(pt.dirPath("t"))
    val aside = new java.io.File(pt.dirPath("t") + ".__part-cafebabe")
    assert(new java.io.File(aside, "region=eu").mkdirs())
    val live = new java.io.File(dir, "region=eu/typ=a")
    assert(live.renameTo(new java.io.File(aside, "region=eu/typ=a")))
    Loader.load(pt, "t", Seq((1000L, "us", "b", 1.0)).toDF("k", "region", "typ", "v"),
      idOrder = Seq("k"))
    assert(!aside.exists(), "aside dir should be cleaned after recovery")
    val after = pt.table("t").collect().map(_.toSeq).toSet
    assert(before.subsetOf(after), "the stranded leaf's rows must survive")
    assert(after.size == before.size + 1)
  }

  test("partitioned append stays O(batch) and conflicting re-layout errors") {
    val spark0 = spark
    import spark0.implicits._
    val pt = new Catalog(spark, tmpDir("graft-part2"))
    val b1 = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("k", "typ", "v")
    Loader.load(pt, "t", b1, idOrder = Seq("k"), partitionBy = Seq("typ"))
    val dir = new java.io.File(pt.dirPath("t"))
    val before = fileSnapshot(dir)

    // plain append: existing files untouched, ids continue
    val b2 = (101 to 200).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("k", "typ", "v")
    Loader.load(pt, "t", b2, idOrder = Seq("k"))
    val after = fileSnapshot(dir)
    assert(before.forall { case (p, m) => after.get(p).contains(m) },
      "append must not rewrite existing partition files")
    val ids = pt.table("t").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 200L))

    // a different partitioning for an existing table must fail loudly
    assertThrows[IllegalArgumentException] {
      Loader.load(pt, "t", b2, idOrder = Seq("k"), partitionBy = Seq("k"))
    }
  }

  test("the scoped slice's isin predicate prunes partitions at the scan") {
    val spark0 = spark
    import spark0.implicits._
    val pt = new Catalog(spark, tmpDir("graft-prune"))
    val rows = (1 to 400).map(i =>
      (i.toLong, Seq("a", "b", "c", "d")(i % 4), i.toDouble)).toDF("k", "typ", "v")
    Loader.load(pt, "t", rows, idOrder = Seq("k"), partitionBy = Seq("typ"))
    // the exact slice shape partitionScopedUpsert builds
    val slice = pt.table("t").where(col("typ").isin("a"))
    val plan = slice.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("typ"), s"partition filter did not reach the scan:\n$plan")
    assert(!pf.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"empty partition filters:\n$plan")
    assert(slice.count() == 100)
  }

  test("flat -> partitioned re-layout migrates via full rewrite, not append") {
    val spark0 = spark
    import spark0.implicits._
    val pt = new Catalog(spark, tmpDir("graft-migrate"))
    val b1 = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("k", "typ", "v")
    Loader.load(pt, "t", b1, idOrder = Seq("k")) // FLAT layout
    // same schema + partitionBy: must NOT drop typ=... subdirs next to the
    // flat files (corrupt structure) — the table re-writes partitioned
    val b2 = (101 to 120).map(i => (i.toLong, "a", i.toDouble)).toDF("k", "typ", "v")
    Loader.load(pt, "t", b2, idOrder = Seq("k"), partitionBy = Seq("typ"))
    val dir = new java.io.File(pt.dirPath("t"))
    assert(dir.listFiles().count(_.getName.startsWith("typ=")) == 2)
    assert(!dir.listFiles().exists(f => f.isFile && f.getName.startsWith("part-")),
      "flat files must not coexist with partition subdirs")
    assert(pt.table("t").count() == 120)
    // the migrated table now scoped-upserts like any partitioned table
    Loader.load(pt, "t", Seq((2L, "a", 42.0)).toDF("k", "typ", "v"),
      upsertFields = Seq("k", "typ"), idOrder = Seq("k"))
    assert(pt.table("t").where(col("k") === 2L).head().getAs[Double]("v") == 42.0)
  }

  test("a stranded .__part- aside restores its partition on the next load") {
    val spark0 = spark
    import spark0.implicits._
    val pt = new Catalog(spark, tmpDir("graft-strand"))
    val rows = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("k", "typ", "v")
    Loader.load(pt, "t", rows, idOrder = Seq("k"), partitionBy = Seq("typ"))
    val before = pt.table("t").collect().map(_.toSeq).toSet
    // simulate the crash window: live partition moved aside, new copy never
    // renamed in (process died between the two renames)
    val dir = new java.io.File(pt.dirPath("t"))
    val aside = new java.io.File(pt.dirPath("t") + ".__part-deadbeef")
    assert(aside.mkdirs())
    val live = new java.io.File(dir, "typ=a")
    assert(live.renameTo(new java.io.File(aside, "typ=a")))
    // next load must restore typ=a from the aside BEFORE cleaning strays
    Loader.load(pt, "t", Seq((1000L, "b", 1.0)).toDF("k", "typ", "v"),
      idOrder = Seq("k"))
    assert(!aside.exists(), "aside dir should be cleaned after recovery")
    val after = pt.table("t").collect().map(_.toSeq).toSet
    assert(before.subsetOf(after), "the stranded partition's rows must survive")
    assert(after.size == before.size + 1)
  }

  test("compact collapses accumulated small files, flat and partitioned") {
    val spark0 = spark
    import spark0.implicits._
    // flat table: 10 appends -> many files; compact to one
    val flat = new Catalog(spark, tmpDir("graft-compact"))
    for (b <- 0 until 10)
      Loader.load(flat, "t",
        ((b * 100 + 1) to (b * 100 + 100)).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
        idOrder = Seq("k"))
    val dir = new java.io.File(flat.dirPath("t"))
    def parts(d: java.io.File): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).count(_.getName.startsWith("part-"))
    }
    assert(parts(dir) >= 10)
    val before = flat.table("t").collect().map(_.toSeq).toSet
    Loader.compact(flat, "t", targetFileBytes = 64L * 1024 * 1024)
    assert(parts(dir) == 1, s"expected 1 file after compaction, got ${parts(dir)}")
    assert(flat.table("t").collect().map(_.toSeq).toSet == before)

    // partitioned table: files collapse WITHIN partitions, layout survives
    val pt = new Catalog(spark, tmpDir("graft-compact2"))
    for (b <- 0 until 5)
      Loader.load(pt, "t",
        ((b * 100 + 1) to (b * 100 + 100))
          .map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
          .toDF("k", "typ", "v"),
        idOrder = Seq("k"), partitionBy = Seq("typ"))
    val pdir = new java.io.File(pt.dirPath("t"))
    assert(parts(pdir) >= 10)
    val pBefore = pt.table("t").collect().map(_.toSeq).toSet
    Loader.compact(pt, "t", targetFileBytes = 64L * 1024 * 1024)
    assert(parts(pdir) == 2, s"expected 1 file per partition, got ${parts(pdir)}")
    assert(pdir.listFiles().count(_.getName.startsWith("typ=")) == 2)
    assert(pt.table("t").collect().map(_.toSeq).toSet == pBefore)
    // still upsertable afterwards (sidecar survived the rewrite)
    Loader.load(pt, "t", Seq((2L, "a", 999.0)).toDF("k", "typ", "v"),
      upsertFields = Seq("k", "typ"), idOrder = Seq("k"))
    assert(pt.table("t").where(col("k") === 2L).head().getAs[Double]("v") == 999.0)
  }
}
