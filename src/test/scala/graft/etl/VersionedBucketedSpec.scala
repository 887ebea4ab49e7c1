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
