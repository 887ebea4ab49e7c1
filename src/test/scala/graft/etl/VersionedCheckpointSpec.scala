package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-log POINTER (`_vlast`): reads of a long-lived versioned table
  * must not pay a directory listing per plan — at one commit a minute for
  * a year that is ~500k names listed on every `versions()` call. The
  * pointer records the retained `[lo, hi]` range; readers probe exists()
  * forward from both ends, so every crash-lag shape (commit landed but
  * pointer write lost, vacuum died mid-delete) HEALS instead of
  * mis-answering. Contracts pinned here:
  *
  *   - a multi-commit table answers `versions()`/`currentVersion` with
  *     ZERO directory listings (counter-asserted);
  *   - a stale pointer (behind the head, or pointing at vacuumed
  *     versions) heals by probing — same answer as a listing;
  *   - a deleted pointer falls back to one authoritative listing;
  *   - vacuum re-points; the pointer survives a vacuum+append sequence;
  *   - the id floor is monotone across rewrites (a delete-then-rewrite
  *     can never lower it and reissue an old id).
  */
class VersionedCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vckpt"))

  private def pointerFile(tgt: Catalog) =
    new java.io.File(s"${tgt.dirPath("t")}.__vmeta/_vlast")

  /** Overwrite the pointer THROUGH the Hadoop FileSystem so its checksum
    * sidecar stays consistent — a raw java.nio write would corrupt the
    * local-FS CRC and read back as an unreadable pointer (itself handled,
    * but not the crash shape these tests simulate). */
  private def writeStalePointer(tgt: Catalog, content: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(s"${tgt.dirPath("t")}.__vmeta/_vlast")
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(hp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("versions() on a pointer-present table answers without listing the meta dir") {
    val tgt = freshCat()
    (1 to 12).foreach { i =>
      VersionedTable.load(tgt, "t", Seq((i.toLong, s"v$i")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    assert(pointerFile(tgt).exists(), "commits must maintain the pointer")
    val before = VersionedTable.metaListings.get()
    (1 to 5).foreach { _ =>
      assert(VersionedTable.versions(tgt, "t") == (1L to 12L))
      assert(VersionedTable.currentVersion(tgt, "t").contains(12L))
    }
    assert(VersionedTable.metaListings.get() == before,
      "pointer-present reads must never fall back to a directory listing")
    // and the pointer content is the real range
    val txt = new String(java.nio.file.Files.readAllBytes(
      pointerFile(tgt).toPath), "UTF-8")
    assert(txt.contains("\"lo\":1") && txt.contains("\"hi\":12"), txt)
  }

  test("a stale or missing pointer heals; answers always match a listing") {
    val tgt = freshCat()
    (1 to 8).foreach { i =>
      VersionedTable.load(tgt, "t", Seq((i.toLong, s"v$i")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    // stale hi (pointer write lost after the v6 commit): probes forward
    writeStalePointer(tgt, """{"lo":1,"hi":6}""")
    assert(VersionedTable.versions(tgt, "t") == (1L to 8L))
    // missing pointer: one authoritative listing
    assert(pointerFile(tgt).delete())
    val before = VersionedTable.metaListings.get()
    assert(VersionedTable.versions(tgt, "t") == (1L to 8L))
    assert(VersionedTable.metaListings.get() == before + 1)
    // the next commit re-establishes it (legacy-adoption path)
    VersionedTable.load(tgt, "t", Seq((99L, "x")).toDF("k", "s"),
      idOrder = Seq("k"))
    assert(pointerFile(tgt).exists())
    val after = VersionedTable.metaListings.get()
    assert(VersionedTable.versions(tgt, "t") == (1L to 9L))
    assert(VersionedTable.metaListings.get() == after)
  }

  test("vacuum re-points; a crash-lagged lo heals by probing") {
    val tgt = freshCat()
    (1 to 10).foreach { i =>
      VersionedTable.load(tgt, "t", Seq((i.toLong, s"v$i")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    VersionedTable.vacuum(tgt, "t", keepLast = 4)
    val base = VersionedTable.metaListings.get()
    assert(VersionedTable.versions(tgt, "t") == (7L to 10L))
    assert(VersionedTable.metaListings.get() == base, "vacuum must re-point")
    // crash shape: manifests 1..6 deleted but the pointer write was lost —
    // lo probes forward past the gap, no listing
    writeStalePointer(tgt, """{"lo":1,"hi":10}""")
    assert(VersionedTable.versions(tgt, "t") == (7L to 10L))
    assert(VersionedTable.metaListings.get() == base)
    // reads and appends keep working
    assert(VersionedTable.read(tgt, "t").count() == 10L)
    VersionedTable.load(tgt, "t", Seq((11L, "v11")).toDF("k", "s"),
      idOrder = Seq("k"))
    assert(VersionedTable.versions(tgt, "t") == (7L to 11L))
  }

  test("id floor is monotone: a rewrite that drops the max-id row never reissues it") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      idOrder = Seq("k"))                       // ids 1, 2
    // upsert-rewrite the whole table down to one row: the v2 batch keeps
    // id 2's row out of the rewrite via delete-then-rewrite shapes
    VersionedTable.delete(tgt, "t", col("k") === 2L) // id 2's row gone (v2)
    // full (flat, schema-change) rewrite: new files' footer max id is 1
    VersionedTable.load(tgt, "t",
      Seq((3L, "c", "extra")).toDF("k", "s", "z"), idOrder = Seq("k")) // v3
    val ids = VersionedTable.read(tgt, "t").select("id").as[Long].collect().toSet
    assert(!ids.contains(2L) || ids.size == 3,
      s"id 2 must not be reissued to a new row, got $ids")
    assert(VersionedTable.readManifest(tgt, "t", 3L).get.maxId.exists(_ >= 2L),
      "the committed floor must stay >= the pre-rewrite floor")
  }
}
