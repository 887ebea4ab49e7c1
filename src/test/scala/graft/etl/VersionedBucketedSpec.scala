package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The layout-composition contract: a versioned table carrying the
  * hash-bucket layout gives BUCKET-SCOPED upserts under snapshot isolation
  * — only the touched buckets' files are rewritten per commit, every other
  * bucket's files carry into the new manifest untouched. */
class VersionedBucketedSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vtb"))

  private def bucketOf(path: String): Option[String] =
    path.split('/').find(_.startsWith(Loader.BucketCol + "="))

  test("bucketed load records the layout and lands files under bucket dirs") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 4)))
    val fs = VersionedTable.files(tgt, "t", 1L)
    assert(fs.nonEmpty && fs.forall(f => bucketOf(f).isDefined),
      s"every data file must live under a ${Loader.BucketCol}= dir: $fs")
    // readers see the data schema only — the bucket id is physical layout
    assert(VersionedTable.read(tgt, "t").columns.toSet == Set("id", "k", "s"))
    assert(VersionedTable.read(tgt, "t").count() == 40L)
    // a conflicting re-layout is an error, not a silent rewrite
    intercept[IllegalArgumentException] {
      VersionedTable.load(tgt, "t", Seq((99L, "x")).toDF("k", "s"),
        bucketBy = Some((Seq("s"), 4)))
    }
  }

  test("a 1-key upsert rewrites exactly one bucket's files and commits one manifest") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    val v1Files = VersionedTable.files(tgt, "t", 1L).toSet
    val v2 = VersionedTable.load(tgt, "t", Seq((7L, "UPDATED")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    assert(v2 == 2L, "exactly one new manifest")
    val v2Files = VersionedTable.files(tgt, "t", 2L).toSet
    val replaced = v1Files -- v2Files // v1 files the upsert dropped
    val fresh = v2Files -- v1Files    // files the upsert wrote
    // the key's bucket, from the physical layout of the files it replaced
    val hitBuckets = (replaced ++ fresh).flatMap(bucketOf)
    assert(hitBuckets.size == 1,
      s"a 1-key upsert must touch exactly one bucket dir, got $hitBuckets")
    // every untouched bucket's files are carried over byte-identically
    val carried = v1Files.intersect(v2Files)
    assert(carried == v1Files.filter(f => !hitBuckets.contains(bucketOf(f).get)),
      "all files outside the touched bucket must carry into the new manifest")
    assert(carried.nonEmpty)
    // and the merge itself is correct: update applied, everything else kept
    val head = VersionedTable.read(tgt, "t")
    assert(head.count() == 40L)
    assert(head.where(col("k") === 7L).select("s").as[String].head() == "UPDATED")
    assert(head.where(col("s").startsWith("v")).count() == 39L)
    // prior version still reads its own state (snapshot isolation)
    assert(VersionedTable.readVersion(tgt, "t", 1L)
      .where(col("k") === 7L).select("s").as[String].head() == "v7")
  }

  test("bucketed upsert inserts fresh keys with continuing ids; appends stay O(batch)") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    // append (no upsert keys): every prior file carries, batch lands bucketed
    val v1Files = VersionedTable.files(tgt, "t", 1L).toSet
    VersionedTable.load(tgt, "t",
      (21L to 24L).map(i => (i, s"v$i")).toDF("k", "s"), idOrder = Seq("k"))
    val v2Files = VersionedTable.files(tgt, "t", 2L).toSet
    assert(v1Files.subsetOf(v2Files))
    assert((v2Files -- v1Files).forall(f => bucketOf(f).isDefined))
    // upsert mixing an update and an insert
    VersionedTable.load(tgt, "t", Seq((3L, "U3"), (30L, "NEW")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val head = VersionedTable.read(tgt, "t").orderBy("id")
    assert(head.count() == 25L)
    assert(head.agg(max("id")).head().getLong(0) == 25L)
    assert(head.where(col("k") === 3L).select("s").as[String].head() == "U3")
    assert(head.where(col("k") === 30L).select("id").as[Long].head() == 25L)
  }

  test("change feed and file-pruned delete compose with the bucket layout") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    VersionedTable.load(tgt, "t", Seq((7L, "U7")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    // the v1→v2 feed diffs ONLY the touched bucket's unshared files
    val feed = VersionedTable.changes(tgt, "t", 1L, 2L, Seq("k"))
    val ops = feed.select("op", "k").as[(String, Long)].collect().toSet
    assert(ops == Set(("update", 7L)))
    val v2Files = VersionedTable.files(tgt, "t", 2L).toSet
    // delete one key: only the file(s) containing it are rewritten
    VersionedTable.delete(tgt, "t", col("k") === 13L)
    val v3Files = VersionedTable.files(tgt, "t", 3L).toSet
    val dropped = v2Files -- v3Files
    assert(dropped.nonEmpty && dropped.flatMap(bucketOf).size == 1,
      s"delete must rewrite only the matching bucket's files: $dropped")
    assert(VersionedTable.read(tgt, "t").count() == 39L)
    // layout survives the delete commit
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 4)))
  }

  test("upsert keys not covering the bucket keys fall back to a full (still bucketed) rewrite") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 20L).map(i => (i, i % 3, s"v$i")).toDF("k", "g", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    val v1Files = VersionedTable.files(tgt, "t", 1L).toSet
    VersionedTable.load(tgt, "t", Seq((0L, 0L, "g0")).toDF("k", "g", "s"),
      upsertFields = Seq("g", "k"), idOrder = Seq("k"))
    // covered (g,k ⊇ k): scoped. Now an upsert on g alone — NOT covering k:
    VersionedTable.load(tgt, "t", Seq((99L, 1L, "G1")).toDF("k", "g", "s"),
      upsertFields = Seq("g"), idOrder = Seq("k"))
    val head = VersionedTable.files(tgt, "t",
      VersionedTable.currentVersion(tgt, "t").get).toSet
    assert(head.intersect(v1Files).isEmpty,
      "a non-covering upsert must rewrite the full file set")
    assert(head.forall(f => bucketOf(f).isDefined), "layout must survive the rewrite")
    // SQL UPDATE semantics on the non-unique key g=1
    val rows = VersionedTable.read(tgt, "t")
    assert(rows.where(col("g") === 1L && col("s") =!= "G1").count() == 0)
  }

  test("compact coalesces small files as a new version; right-sized files carry") {
    val tgt = freshCat()
    // 5 appends → 5+ small files sharing one bucketless flat layout
    (1 to 5).foreach { i =>
      VersionedTable.load(tgt, "t",
        (1L to 10L).map(j => (i * 100L + j, s"v$i-$j")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    val before = VersionedTable.files(tgt, "t", 5L)
    assert(before.size >= 5)
    val v6 = VersionedTable.compact(tgt, "t", targetFileBytes = 64L * 1024 * 1024)
    assert(v6 == 6L)
    val after = VersionedTable.files(tgt, "t", 6L)
    assert(after.size < before.size,
      s"compaction must shrink the file count: ${before.size} -> ${after.size}")
    // state identical; prior versions untouched
    assert(VersionedTable.read(tgt, "t").orderBy("id")
      .as[(Long, Long, String)].collect().toSeq ==
      VersionedTable.readVersion(tgt, "t", 5L).orderBy("id")
        .as[(Long, Long, String)].collect().toSeq)
    assert(VersionedTable.readVersion(tgt, "t", 1L).count() == 10L)
    // idempotent: a second compact finds nothing worth rewriting
    assert(VersionedTable.compact(tgt, "t", 64L * 1024 * 1024) == 6L)
    // vacuum reclaims the replaced small files
    assert(VersionedTable.vacuum(tgt, "t", keepLast = 1) >= before.size - 1)
  }

  test("compact preserves the bucket layout: one file per bucket dir") {
    val tgt = freshCat()
    (1 to 4).foreach { i =>
      VersionedTable.load(tgt, "t",
        (1L to 12L).map(j => (i * 100L + j, s"v$i-$j")).toDF("k", "s"),
        idOrder = Seq("k"),
        bucketBy = if (i == 1) Some((Seq("k"), 3)) else None)
    }
    val v5 = VersionedTable.compact(tgt, "t", 64L * 1024 * 1024)
    assert(v5 == 5L)
    val after = VersionedTable.files(tgt, "t", 5L)
    assert(after.forall(f => bucketOf(f).isDefined), "layout must survive compaction")
    val perBucket = after.groupBy(f => bucketOf(f).get).view.mapValues(_.size)
    assert(perBucket.values.forall(_ == 1),
      s"each bucket dir must compact to ONE file, got $perBucket")
    assert(VersionedTable.read(tgt, "t").count() == 48L)
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 3)))
  }

  test("lookup prunes to the key's bucket files, driver-side from the manifest") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    val v = VersionedTable.currentVersion(tgt, "t").get
    val hit = VersionedTable.lookup(tgt, "t", v, Map("k" -> 7L))
    assert(hit.select("s").as[String].collect().toSeq == Seq("v7"))
    // plan-level pruning: the lookup scans ONLY one bucket's files
    val scanned = hit.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    val allFiles = VersionedTable.files(tgt, "t", v)
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath)
    val buckets = allFiles.filter(scanned.contains)
      .flatMap(p => p.split('/').find(_.startsWith(Loader.BucketCol + "=")))
    assert(buckets.toSet.size == 1 && scanned.size < allFiles.size,
      s"lookup must scan one bucket's files: ${scanned.size}/${allFiles.size}")
    // a key hashing to a bucket with files but absent → empty, not error
    assert(VersionedTable.lookup(tgt, "t", v, Map("k" -> 99999L)).isEmpty)
  }

  test("concurrent upserts to different buckets both commit via re-merge") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = Seq(3L, 4L, 5L, 6L).map { k =>
      Future {
        VersionedTable.load(tgt, "t", Seq((k, s"W$k")).toDF("k", "s"),
          upsertFields = Seq("k"), idOrder = Seq("k"))
      }
    }
    val committed = Await.result(Future.sequence(writers), 180.seconds)
    assert(committed.toSet.size == 4, "each writer must win a distinct version")
    assert(VersionedTable.versions(tgt, "t") == (1L to 5L))
    val head = VersionedTable.read(tgt, "t")
    assert(head.count() == 40L)
    // no lost update: every writer's row landed
    assert(head.where(col("s").startsWith("W")).select("k")
      .as[Long].collect().toSet == Set(3L, 4L, 5L, 6L))
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 4)))
  }

  test("flat table migrates to bucketed via one full rewrite; layout then sticks") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    assert(VersionedTable.bucketSpec(tgt, "t").isEmpty)
    VersionedTable.load(tgt, "t", Seq((11L, "v11")).toDF("k", "s"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 3)))
    assert(VersionedTable.bucketSpec(tgt, "t").contains((Seq("k"), 3)))
    val v2Files = VersionedTable.files(tgt, "t", 2L)
    assert(v2Files.forall(f => bucketOf(f).isDefined),
      "migration must rewrite every file into the bucket layout")
    assert(VersionedTable.read(tgt, "t").count() == 11L)
    // v1 still time-travels to its flat state
    assert(VersionedTable.readVersion(tgt, "t", 1L).count() == 10L)
  }
}
