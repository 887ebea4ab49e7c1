package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hash-bucketed layout: a table with NO natural partition column
  * physically partitions on a derived bucket id (portable hash of the key
  * tuple mod N). Upserts whose keys cover the bucket keys rewrite only the
  * touched buckets; readers never see the bucket column; results equal the
  * flat-table full merge exactly.
  */
class BucketedUpsertSpec extends SparkSpec {

  private def fileSnapshot(dir: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.startsWith("part-"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private val BC = graft.sources.ParquetSource.BucketCol

  test("bucketed upsert rewrites only touched buckets; equals flat full merge") {
    val spark0 = spark
    import spark0.implicits._
    val incoming = (1 to 1200).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val upd = Seq((4L, 4000.0), (8L, 8000.0), (5000L, 1.0)).toDF("k", "v")

    val bt = new Catalog(spark, tmpDir("graft-bucket"))
    Loader.load(bt, "t", incoming, idOrder = Seq("k"),
      bucketBy = Some((Seq("k"), 8)))
    val dir = new java.io.File(bt.dirPath("t"))
    assert(dir.listFiles().count(_.getName.startsWith(s"$BC=")) == 8,
      "all 8 bucket dirs should materialize for 1200 keys")
    val before = fileSnapshot(dir)

    // later load needs NO bucketBy: the sidecar is authoritative
    Loader.load(bt, "t", upd, upsertFields = Seq("k"), idOrder = Seq("k"))
    val after = fileSnapshot(dir)

    // at most 3 buckets touched -> at least 5 bucket dirs byte-identical
    val changedBuckets = (before.toSet union after.toSet)
      .diff(before.toSet intersect after.toSet)
      .map(_._1.split(s"$BC=")(1).split("/")(0)).toSet
    assert(changedBuckets.size <= 3,
      s"a 3-key batch must touch <= 3 buckets, got $changedBuckets")
    val untouched = before.filter(f => !changedBuckets.exists(b => f._1.contains(s"$BC=$b")))
    assert(untouched.forall { case (p, m) => after.get(p).contains(m) },
      "files in untouched buckets must survive byte-for-byte")

    // reader surface: no bucket column
    assert(!bt.table("t").columns.contains(BC))

    // same end state as the flat merge
    val ref = new Catalog(spark, tmpDir("graft-bflat"))
    Loader.load(ref, "t", incoming, idOrder = Seq("k"))
    Loader.load(ref, "t", upd, upsertFields = Seq("k"), idOrder = Seq("k"))
    def snap(c: Catalog) = c.table("t").select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(snap(bt) == snap(ref), "bucket-scoped merge must equal the flat merge")
  }

  test("bucketed append stays O(batch): existing files untouched") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-bapp"))
    Loader.load(bt, "t", (1 to 400).map(i => (i.toLong, i.toString)).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    val dir = new java.io.File(bt.dirPath("t"))
    val before = fileSnapshot(dir)
    Loader.load(bt, "t", Seq((9001L, "x"), (9002L, "y")).toDF("k", "s"),
      idOrder = Seq("k"))
    val after = fileSnapshot(dir)
    assert(before.forall { case (p, m) => after.get(p).contains(m) },
      "append must not rewrite any existing file")
    assert(after.size > before.size, "append must add new files")
    assert(bt.table("t").count() == 402)
    // ids continue past the existing max
    assert(bt.table("t").agg(max("id")).head().getLong(0) == 402L)
  }

  test("conflicting bucket spec errors; partitionBy + bucketBy errors") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-bconf"))
    Loader.load(bt, "t", Seq((1L, "a")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    intercept[IllegalArgumentException] {
      Loader.load(bt, "t", Seq((2L, "b")).toDF("k", "s"),
        idOrder = Seq("k"), bucketBy = Some((Seq("k"), 8)))
    }
    intercept[IllegalArgumentException] {
      Loader.load(bt, "t2", Seq((1L, "a")).toDF("k", "s"),
        idOrder = Seq("k"), partitionBy = Seq("s"), bucketBy = Some((Seq("k"), 4)))
    }
  }

  test("flat -> bucketed migration via full rewrite; compact keeps the layout") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-bmig"))
    Loader.load(bt, "t", (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      idOrder = Seq("k"))
    val dir = new java.io.File(bt.dirPath("t"))
    assert(!dir.listFiles().exists(_.getName.startsWith(s"$BC=")))
    // migrate
    Loader.load(bt, "t", Seq((200L, 2.0)).toDF("k", "v"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    assert(dir.listFiles().exists(_.getName.startsWith(s"$BC=")),
      "migration must produce bucket dirs")
    assert(graft.sources.ParquetSource.readBucketSpec(spark, bt.dirPath("t"))
      .contains((Seq("k"), 4)))
    assert(bt.table("t").count() == 101)
    // compact preserves bucket dirs + sidecar
    Loader.compact(bt, "t", targetFileBytes = 1L << 20)
    assert(dir.listFiles().exists(_.getName.startsWith(s"$BC=")),
      "compaction must keep the bucket layout")
    assert(graft.sources.ParquetSource.readBucketSpec(spark, bt.dirPath("t"))
      .contains((Seq("k"), 4)))
    assert(bt.table("t").count() == 101)
    assert(!bt.table("t").columns.contains(BC))
  }

  test("bucketLookup scans exactly one bucket dir and finds every key") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-blkp"))
    val rows = (1 to 500).map(i => (i.toLong, s"v$i"))
    Loader.load(bt, "t", rows.toDF("k", "s"), idOrder = Seq("k"),
      bucketBy = Some((Seq("k"), 8)))
    // every key resolves through the bucket-pruned path
    for (k <- Seq(1L, 137L, 500L)) {
      val hit = Loader.bucketLookup(bt, "t", Map("k" -> k))
      assert(hit.count() == 1)
      assert(hit.select("s").head().getString(0) == s"v$k")
      // the scan touches files of exactly ONE bucket directory
      val dirs = hit.inputFiles.map(_.split("/").init.last).toSet
      assert(dirs.size == 1 && dirs.head.startsWith(s"$BC="),
        s"lookup must read one bucket dir, read: $dirs")
    }
    // a missing key returns empty, not an error
    assert(Loader.bucketLookup(bt, "t", Map("k" -> 99999L)).count() == 0)
    // wrong key set errors
    intercept[IllegalArgumentException] {
      Loader.bucketLookup(bt, "t", Map("s" -> "v1"))
    }
    // non-bucketed table errors
    val ft = new Catalog(spark, tmpDir("graft-blkp2"))
    Loader.load(ft, "t", rows.toDF("k", "s"), idOrder = Seq("k"))
    intercept[IllegalArgumentException] {
      Loader.bucketLookup(ft, "t", Map("k" -> 1L))
    }
  }

  test("writer-side bucket read keeps the PHYSICAL column and partition-prunes") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-bprune"))
    Loader.load(bt, "t", (1 to 400).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 8)))
    val ex = graft.sources.ParquetSource.read(spark, bt.dirPath("t"), keepBucket = true)
    assert(ex.columns.contains(graft.sources.ParquetSource.BucketCol))
    val sliced = ex.where(col(graft.sources.ParquetSource.BucketCol) === 3)
    val plan = sliced.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory-level prune),
    // not as a post-scan Filter over all buckets
    // the predicate lands in the scan's PartitionFilters (directory-level
    // prune; inputFiles is not pruning-aware, so assert on the plan)
    assert(plan.contains("PartitionFilters: [isnotnull(__gbucket") ||
      plan.contains("PartitionFilters: [(__gbucket"),
      s"bucket predicate must partition-prune:\n$plan")
    assert(sliced.count() ==
      ex.where(col(graft.sources.ParquetSource.BucketCol) === 3).count())
    // a plain read drops the column only when the sidecar is present; a
    // data column named __gbucket on a NON-bucketed table survives
    val plainDir = tmpDir("graft-bplain")
    (1 to 10).map(i => (i.toLong, i.toLong)).toDF("k", "__gbucket")
      .write.parquet(s"$plainDir/t")
    val plain = graft.sources.ParquetSource.read(spark, s"$plainDir/t")
    assert(plain.columns.contains("__gbucket"),
      "a genuine data column named __gbucket must not be dropped")
  }

  test("multi-key bucketing scopes on the combined key hash") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-bmk"))
    val rows = (1 to 300).map(i => (i.toLong, (i % 7).toString, i.toDouble))
    Loader.load(bt, "t", rows.toDF("k", "g", "v"), idOrder = Seq("k"),
      bucketBy = Some((Seq("k", "g"), 6)))
    Loader.load(bt, "t", Seq((3L, "3", 99.0)).toDF("k", "g", "v"),
      upsertFields = Seq("k", "g"), idOrder = Seq("k"))
    val got = bt.table("t").where(col("k") === 3L).select("v").head().getDouble(0)
    assert(got == 99.0)
    assert(bt.table("t").count() == 300)
  }
}
