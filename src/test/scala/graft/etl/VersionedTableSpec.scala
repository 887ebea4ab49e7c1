package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vt"))

  test("append commits a new version whose manifest reuses the parent's files") {
    val tgt = freshCat()
    val v1 = VersionedTable.load(tgt, "t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), idOrder = Seq("k"))
    val v2 = VersionedTable.load(tgt, "t",
      Seq((3L, "c")).toDF("k", "s"), idOrder = Seq("k"))
    assert(v1 == 1L && v2 == 2L)
    val f1 = VersionedTable.files(tgt, "t", 1L).toSet
    val f2 = VersionedTable.files(tgt, "t", 2L).toSet
    assert(f1.subsetOf(f2), "append must reference the parent's files, not rewrite them")
    assert((f2 -- f1).nonEmpty, "append must add the batch's files")
  }

  test("time travel reads each committed state; ids continue across versions") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((3L, "c")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((2L, "B2"), (4L, "d")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val s1 = VersionedTable.readVersion(tgt, "t", 1L)
      .orderBy("id").select("id", "k", "s").as[(Long, Long, String)].collect.toSeq
    val s3 = VersionedTable.readVersion(tgt, "t", 3L)
      .orderBy("id").select("id", "k", "s").as[(Long, Long, String)].collect.toSeq
    assert(s1 == Seq((1L, 1L, "a"), (2L, 2L, "b")))
    assert(s3 == Seq((1L, 1L, "a"), (2L, 2L, "B2"), (3L, 3L, "c"), (4L, 4L, "d")))
    assert(VersionedTable.currentVersion(tgt, "t").contains(3L))
  }

  test("delete commits a filtered version; prior versions keep the rows") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      idOrder = Seq("k"))
    val v2 = VersionedTable.delete(tgt, "t", col("k") <= 2)
    assert(v2 == 2L)
    assert(VersionedTable.readVersion(tgt, "t", 2L).select("k")
      .as[Long].collect.toSeq == Seq(3L))
    assert(VersionedTable.readVersion(tgt, "t", 1L).count() == 3L)
  }

  test("changes classifies insert, update, delete and skips unchanged keys") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((2L, "B2"), (4L, "d")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.delete(tgt, "t", col("k") === 1L)
    val ch = VersionedTable.changes(tgt, "t", 1L, 3L, Seq("k"))
      .select("op", "k", "s").orderBy("k")
      .as[(String, Long, String)].collect.toSeq
    assert(ch == Seq(("delete", 1L, "a"), ("update", 2L, "B2"), ("insert", 4L, "d")))
  }

  test("vacuum drops old manifests and unreferenced files; current version survives") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      idOrder = Seq("k"))
    // upsert = copy-on-write full rewrite: v1's files become unreferenced
    VersionedTable.load(tgt, "t", Seq((1L, "A")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val before = VersionedTable.files(tgt, "t", 1L)
    val removed = VersionedTable.vacuum(tgt, "t", keepLast = 1)
    assert(removed >= before.size, s"expected >=${before.size} files removed, got $removed")
    assert(VersionedTable.versions(tgt, "t") == Seq(2L))
    assert(VersionedTable.read(tgt, "t").count() == 2L)
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(tgt, "t", 1L)
    }
  }

  test("vacuum after appends keeps shared files (nothing unreferenced)") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((2L, "b")).toDF("k", "s"), idOrder = Seq("k"))
    val removed = VersionedTable.vacuum(tgt, "t", keepLast = 1)
    assert(removed == 0, "append-only history shares every file with the head version")
    assert(VersionedTable.read(tgt, "t").count() == 2L)
  }

  test("schema evolution on append rewrites into the widened schema") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a")).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((2L, "b", 9L)).toDF("k", "s", "extra"),
      idOrder = Seq("k"))
    val head = VersionedTable.read(tgt, "t").orderBy("id")
    assert(head.columns.toSet == Set("id", "k", "s", "extra"))
    val rows = head.select("k", "extra").as[(Long, Option[Long])].collect.toSeq
    assert(rows == Seq((1L, None), (2L, Some(9L))))
    // v1 still reads its own (narrow) schema
    assert(VersionedTable.readVersion(tgt, "t", 1L).columns.toSet == Set("id", "k", "s"))
  }
}
