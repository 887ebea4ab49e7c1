package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Zero-copy (shallow) clone contracts:
  *   - a clone is one manifest commit: NO data files land under the
  *     clone's data dir, yet it reads back identical to the source
  *     version (zone maps included — pruning works from the first read);
  *   - source and clone evolve independently: writes to the clone stage
  *     files in the CLONE's dir and never touch the source's files or
  *     version history, and vice versa;
  *   - the clone's vacuum sweeps only its own data dir — shared source
  *     files survive it by construction.
  */
class VersionedCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vclone"))

  private def dataFilesUnder(cat: Catalog, table: String): Seq[String] = {
    val d = new java.io.File(s"${cat.dirPath(table)}.__vdata")
    if (!d.exists()) Nil
    else {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).map(_.getPath).filter(_.endsWith(".parquet"))
    }
  }

  test("clone is metadata-only, reads identically, and prunes from its zone maps") {
    val src = freshCat()
    VersionedTable.load(src, "t", (1L to 50L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(src, "t", (51L to 90L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val dst = freshCat()
    val v = VersionedTable.cloneTable(src, "t", dst, "c", 2L)
    assert(v == 1L)
    assert(dataFilesUnder(dst, "c").isEmpty,
      "a shallow clone must not copy a single data file")
    val a = VersionedTable.read(src, "t").collect().map(_.toSeq).toSet
    val b = VersionedTable.read(dst, "c").collect().map(_.toSeq).toSet
    assert(a == b)
    // zone maps carried: the first batch's file skips on a high-key probe
    assert(VersionedTable.skippedFiles(dst, "c", 1L, col("k") > 60L).nonEmpty)
    assert(VersionedTable.readWhere(dst, "c", 1L, col("k") > 60L).count() == 30L)
  }

  test("clone and source evolve independently; clone writes stay in the clone's dir") {
    val src = freshCat()
    VersionedTable.load(src, "t", (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val srcFilesBefore = dataFilesUnder(src, "t").toSet
    val dst = freshCat()
    VersionedTable.cloneTable(src, "t", dst, "c", 1L)
    // id continuity: the clone's next load continues past the source floor
    VersionedTable.load(dst, "c", Seq((100L, "new")).toDF("k", "s"),
      idOrder = Seq("k"))
    val ids = VersionedTable.read(dst, "c").select("id")
      .as[Long].collect().toSet
    assert(ids == (1L to 41L).toSet, s"clone ids must continue, got max ${ids.max}")
    // a delete on the clone rewrites the matched (shared) file INTO THE
    // CLONE's dir; the source's physical files and history are untouched
    VersionedTable.deleteKeys(dst, "c", Seq(Tuple1(5L)).toDF("k"), Seq("k"))
    assert(VersionedTable.read(dst, "c").where(col("k") === 5L).count() == 0L)
    assert(dataFilesUnder(src, "t").toSet == srcFilesBefore,
      "writes to the clone must never touch the source's files")
    assert(VersionedTable.versions(src, "t") == Seq(1L))
    assert(VersionedTable.read(src, "t").where(col("k") === 5L).count() == 1L)
    // and the clone's vacuum reclaims only clone-owned files
    val removed = VersionedTable.vacuum(dst, "c", keepLast = 1)
    assert(dataFilesUnder(src, "t").toSet == srcFilesBefore,
      "the clone's vacuum must not reach into the source's data dir")
    assert(VersionedTable.read(dst, "c").count() == 40L)
    assert(removed >= 0)
  }

  test("a source vacuum protects live clones' shared files; dropped clones release them") {
    val src = freshCat()
    val dst = freshCat()
    VersionedTable.load(src, "t", (1L to 40L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.cloneTable(src, "t", dst, "c", 1L)
    // provenance is in the clone's own v1 manifest
    val cm = VersionedTable.readManifest(dst, "c", 1L).get
    assert(cm.props.get("clone_src_table").contains("t") &&
      cm.props.get("clone_src_version").contains("1"))
    // source rewrites everything (delete-all + reload), then vacuums down
    // to versions that no longer reference v1's files
    VersionedTable.delete(src, "t", col("k") >= 1L)
    VersionedTable.load(src, "t", (100L to 110L).map(i => (i, s"n$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val removedGuarded = VersionedTable.vacuum(src, "t", keepLast = 1)
    // the clone still reads all 40 rows: its shared files survived
    assert(VersionedTable.readVersion(dst, "c", 1L).count() == 40L,
      "a guarded source vacuum must not strand a live clone")
    // drop the clone (delete its meta dir) → the next vacuum reclaims
    val cloneMeta = new java.io.File(s"${dst.dirPath("c")}.__vmeta")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(cloneMeta)
    val removedAfterDrop = VersionedTable.vacuum(src, "t", keepLast = 1)
    assert(removedAfterDrop > 0,
      s"dropping the clone must release its shared files " +
        s"(guarded=$removedGuarded, afterDrop=$removedAfterDrop)")
    // the marker expired with the clone
    val markers = new java.io.File(s"${src.dirPath("t")}.__vmeta").listFiles()
      .map(_.getName).filter(_.startsWith("clone-"))
    assert(markers.isEmpty, s"dead clone markers must be cleaned: ${markers.toSeq}")
    // and ignoreClones=true skips the guard entirely
    val src2 = freshCat(); val dst2 = freshCat()
    VersionedTable.load(src2, "t", (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.cloneTable(src2, "t", dst2, "c", 1L)
    VersionedTable.delete(src2, "t", col("k") >= 1L)
    VersionedTable.load(src2, "t", Seq((99L, "x")).toDF("k", "s"), idOrder = Seq("k"))
    assert(VersionedTable.vacuum(src2, "t", keepLast = 1, ignoreClones = true) > 0,
      "ignoreClones must restore the unguarded sweep")
  }

  test("cloning a clone keeps absolute references resolvable") {
    val src = freshCat()
    VersionedTable.load(src, "t", (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val mid = freshCat()
    VersionedTable.cloneTable(src, "t", mid, "c1", 1L)
    val dst = freshCat()
    VersionedTable.cloneTable(mid, "c1", dst, "c2", 1L)
    assert(VersionedTable.read(dst, "c2").count() == 10L)
    assert(dataFilesUnder(dst, "c2").isEmpty)
    // a second clone into an existing table is refused
    intercept[Exception] {
      VersionedTable.cloneTable(src, "t", dst, "c2", 1L)
    }
  }

  test("a clone carries the source's recorded upsert keys") {
    val src = freshCat()
    VersionedTable.load(src, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val dst = freshCat()
    VersionedTable.cloneTable(src, "t", dst, "c", 1L)
    // the clone is byte-identical to a keyed table — CDC key-defaulting
    // (graft-cdc without a keys option) must keep working on it
    assert(VersionedTable.recordedUpsertKeys(dst, "c").contains(Seq("k")),
      "clone manifests must carry the source's commit-carried metadata")
    assert(VersionedTable.tableProps(dst, "c").contains("clone_src_table"),
      "provenance props ride alongside")
  }
}
