package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: scattered row-level DML on a
  * `write.mode = merge-on-read` table commits O(row + DV) bytes — one
  * merged position sidecar per touched file, UNTOUCHED FILES CARRIED
  * VERBATIM — while every read surface (head SELECT, time travel,
  * library read, CDC) applies the vectors exactly. Copy-on-write stays
  * the default; compaction materializes DVs back into plain files.
  * Contracts pinned here:
  *
  *   - a 1-row SQL UPDATE carries every pre-existing data file verbatim
  *     (file-set equality minus the appended row-file) and records one
  *     DV entry;
  *   - a 1-row SQL DELETE commits a DV only — NO new data files;
  *   - time travel + batch CDC are exact across DV commits (the feed
  *     emits the update/delete rows, nothing else);
  *   - a second DML on the same file MERGES positions (old DV ∪ new);
  *   - full coverage drops the file from the manifest outright;
  *   - compaction rewrites DV'd files (dv entries gone, rows exact),
  *     vacuum reclaims unreferenced sidecars but keeps referenced ones;
  *   - manifest-answered aggregates decline on DV'd versions (fallback
  *     scan answers exactly);
  *   - MERGE INTO: matched updates become DV + reinsert, inserts append.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gdv")
  spark.conf.set("spark.sql.catalog.gdv", classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gdv.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def mkTable(name: String): Unit = {
    spark.sql(s"CREATE TABLE gdv.default.$name (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    // three separate INSERTs → three data files (plus the empty v1 file)
    spark.sql(s"INSERT INTO gdv.default.$name VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO gdv.default.$name VALUES (3, 30), (4, 40)")
    spark.sql(s"INSERT INTO gdv.default.$name VALUES (5, 50), (6, 60)")
  }

  private def state(name: String): Seq[(Long, Long)] =
    spark.sql(s"SELECT k, v FROM gdv.default.$name ORDER BY k")
      .as[(Long, Long)].collect().toSeq

  test("1-row UPDATE commits a DV + one tiny appended file; all other files verbatim") {
    mkTable("u")
    val pre = VersionedTable.files(lib, "u", 4L).toSet
    spark.sql("UPDATE gdv.default.u SET v = 999 WHERE k = 3")
    val post = VersionedTable.files(lib, "u", 5L).toSet
    assert(pre.subsetOf(post),
      "every pre-existing data file must carry into the DV commit verbatim")
    assert((post -- pre).size == 1,
      s"exactly one appended row-file expected, got ${(post -- pre).size}")
    val dvs = VersionedTable.deletionVectors(lib, "u", 5L)
    assert(dvs.size == 1 && dvs.values.head._2 == 1L,
      s"one DV entry with one deleted position expected: $dvs")
    assert(state("u") ==
      Seq((1L, 10L), (2L, 20L), (3L, 999L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // time travel: the pre-update state is untouched
    assert(spark.sql("SELECT k, v FROM gdv.default.u VERSION AS OF 4 ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // the library read agrees with the SQL read
    assert(VersionedTable.read(lib, "u").select("k", "v").orderBy("k")
      .as[(Long, Long)].collect().toSeq == state("u"))
  }

  test("1-row DELETE commits a DV only — zero new data files") {
    spark.sql("CREATE TABLE gdv.default.d (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gdv.default.d VALUES (1, 10), (2, 20), (7, 70)")
    spark.sql("INSERT INTO gdv.default.d VALUES (3, 30), (4, 40)")
    val pre = VersionedTable.files(lib, "d", 3L).toSet
    spark.sql("DELETE FROM gdv.default.d WHERE k = 2")
    assert(VersionedTable.files(lib, "d", 4L).toSet == pre,
      "a DV delete must not add or remove a single data file")
    val dvs = VersionedTable.deletionVectors(lib, "d", 4L)
    assert(dvs.size == 1 && dvs.values.head._2 == 1L)
    assert(state("d") ==
      Seq((1L, 10L), (3L, 30L), (4L, 40L), (7L, 70L)))
    // a second DELETE on the same file MERGES positions into one new DV
    spark.sql("DELETE FROM gdv.default.d WHERE k = 1")
    val dvs2 = VersionedTable.deletionVectors(lib, "d", 5L)
    assert(dvs2.size == 1 && dvs2.values.head._2 == 2L,
      s"merged DV must hold both positions: $dvs2")
    assert(dvs2.values.head._1 != dvs.values.head._1,
      "DV sidecars are immutable — the merge writes a NEW sidecar")
    assert(VersionedTable.files(lib, "d", 5L).toSet == pre,
      "the partially-deleted file still carries (one live row left)")
    assert(state("d") == Seq((3L, 30L), (4L, 40L), (7L, 70L)))
    // full coverage: deleting the file's last live row drops the FILE
    spark.sql("DELETE FROM gdv.default.d WHERE k = 7")
    assert(VersionedTable.files(lib, "d", 6L).size == pre.size - 1,
      "a fully-DV'd file must drop from the manifest outright")
    assert(VersionedTable.deletionVectors(lib, "d", 6L).isEmpty,
      "the dropped file's DV goes with it; no other file has one")
    assert(state("d") == Seq((3L, 30L), (4L, 40L)))
  }

  test("batch CDC is exact across DV commits") {
    mkTable("c")
    spark.sql("UPDATE gdv.default.c SET v = 111 WHERE k = 1")
    spark.sql("DELETE FROM gdv.default.c WHERE k = 6")
    val feed = spark.read.format("graft-cdc")
      .option("dir", warehouse).option("table", "c")
      .option("keys", "k")
      .option("startingVersion", "4").option("endingVersion", "6").load()
      .select("op", "k", "v").as[(String, Long, Long)].collect().toSet
    assert(feed == Set(("update", 1L, 111L), ("delete", 6L, 60L)),
      s"the DV feed must carry exactly the changed keys: $feed")
    // the library change feed agrees
    val lf = VersionedTable.changes(lib, "c", 4L, 6L, Seq("k"))
      .select("op", "k", "v").as[(String, Long, Long)].collect().toSet
    assert(lf == feed, s"library changes must match the stream feed: $lf")
  }

  test("MERGE INTO on merge-on-read: DV for matches, append for inserts") {
    mkTable("m")
    Seq((2L, 222L), (7L, 777L)).toDF("k", "v").createOrReplaceTempView("dv_src")
    spark.sql("""
      MERGE INTO gdv.default.m t USING dv_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(state("m") == Seq((1L, 10L), (2L, 222L), (3L, 30L), (4L, 40L),
      (5L, 50L), (6L, 60L), (7L, 777L)))
    val dvs = VersionedTable.deletionVectors(lib, "m", 5L)
    assert(dvs.size == 1 && dvs.values.head._2 == 1L,
      s"the matched row must delete by DV: $dvs")
    val pre = VersionedTable.files(lib, "m", 4L).toSet
    assert(pre.subsetOf(VersionedTable.files(lib, "m", 5L).toSet),
      "MERGE must carry every untouched file verbatim")
  }

  test("compaction materializes DVs; vacuum reclaims unreferenced sidecars") {
    mkTable("k")
    spark.sql("UPDATE gdv.default.k SET v = 42 WHERE k = 3")
    assert(VersionedTable.deletionVectors(lib, "k", 5L).nonEmpty)
    val cv = VersionedTable.compact(lib, "k", 128L * 1024 * 1024)
    assert(cv == 6L, "compaction commits a new version")
    assert(VersionedTable.deletionVectors(lib, "k", 6L).isEmpty,
      "compaction must materialize (and drop) every DV")
    assert(state("k") ==
      Seq((1L, 10L), (2L, 20L), (3L, 42L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // with only the head retained, the DV sidecar is unreferenced
    val dd = new java.io.File(s"${lib.dirPath("k")}.__vdata")
    def sidecars() = Option(dd.listFiles()).getOrElse(Array.empty)
      .count(_.getName.endsWith(".dv"))
    assert(sidecars() == 1, "the v5 DV sidecar exists before vacuum")
    VersionedTable.vacuum(lib, "k", keepLast = 1)
    assert(sidecars() == 0, "vacuum must reclaim the unreferenced sidecar")
    assert(state("k") ==
      Seq((1L, 10L), (2L, 20L), (3L, 42L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // and a vacuum that RETAINS a DV'd version keeps its sidecar
    spark.sql("DELETE FROM gdv.default.k WHERE k = 1")
    assert(sidecars() == 1)
    VersionedTable.vacuum(lib, "k", keepLast = 1)
    assert(sidecars() == 1, "the head's DV sidecar must survive vacuum")
    assert(state("k") ==
      Seq((2L, 20L), (3L, 42L), (4L, 40L), (5L, 50L), (6L, 60L)))
  }

  test("a DV'd table still scans COLUMNAR — the vector applies by selection, not row mode") {
    mkTable("vz")
    spark.sql("DELETE FROM gdv.default.vz WHERE k = 3")
    spark.sql("UPDATE gdv.default.vz SET v = 11 WHERE k = 1")
    assert(VersionedTable.deletionVectors(lib, "vz", 6L).size == 2,
      "fixture: two files must carry DVs")
    val df = spark.sql("SELECT k, v FROM gdv.default.vz WHERE k >= 1")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan.supportsColumnar,
      "a deletion-vector'd scan must stay vectorized (selection-vector DV)")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "the executed plan must include the columnar-to-row boundary")
    assert(df.orderBy("k").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 11L), (2L, 20L), (4L, 40L), (5L, 50L), (6L, 60L)),
      "DV-filtered columnar read must return exactly the live rows")
    // library read path over the same DV'd version agrees
    assert(VersionedTable.read(lib, "vz").select("k", "v").orderBy("k")
      .as[(Long, Long)].collect().toSeq == state("vz"))
  }

  test("metadata-answered aggregates decline on DV'd versions; the scan answers") {
    mkTable("a")
    spark.sql("DELETE FROM gdv.default.a WHERE k = 4")
    val r = spark.sql(
      "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM gdv.default.a")
      .as[(Long, Long, Long)].head()
    assert(r == ((5L, 1L, 6L)), s"aggregates must reflect the DV: $r")
    // upsert on the DV'd table must not resurrect the deleted row
    VersionedTable.load(lib, "a",
      Seq((5L, 555L)).toDF("k", "v"), upsertFields = Seq("k"))
    assert(state("a") ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 555L), (6L, 60L)))
  }
}
