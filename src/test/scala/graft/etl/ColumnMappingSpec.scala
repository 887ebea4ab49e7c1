package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only `ALTER TABLE RENAME COLUMN` / `DROP COLUMN` via
  * name-mode column mapping (F54): a rename/drop commits ONE manifest —
  * every data file carries forward VERBATIM — because columns keep their
  * immutable PHYSICAL in-file names and only the manifest's logical
  * labels change. The reference has no ALTER surface at all; this is the
  * table-format maturity the big systems (Delta column mapping) put
  * under schema evolution at 100 TB, where a rename that rewrote the
  * table would cost a full pass. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("cmap")
  spark.conf.set("spark.sql.catalog.gcm",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcm.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def files(t: String): Seq[String] = {
    val v = VersionedTable.currentVersion(lib, t).get
    VersionedTable.readManifest(lib, t, v).get.files
  }

  test("RENAME COLUMN is metadata-only; both file eras read under the new name") {
    spark.sql("CREATE TABLE gcm.default.r1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcm.default.r1 VALUES (1, 'a'), (2, 'b')")
    val before = files("r1")
    val vPre = VersionedTable.currentVersion(lib, "r1").get

    spark.sql("ALTER TABLE gcm.default.r1 RENAME COLUMN v TO label")
    assert(files("r1") == before,
      "a rename must carry every data file VERBATIM (metadata-only commit)")

    // head reads under the new name; the old name is gone
    assert(spark.sql("SELECT k, label FROM gcm.default.r1 ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    intercept[Exception] {
      spark.sql("SELECT v FROM gcm.default.r1").collect()
    }

    // a post-rename append writes the STABLE physical name — both eras
    // stay interchangeable on disk
    spark.sql("INSERT INTO gcm.default.r1 VALUES (3, 'c')")
    assert(spark.sql("SELECT k, label FROM gcm.default.r1 ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val newFile = (files("r1").toSet -- before).head
    val raw = spark.read.parquet(s"$warehouse/r1.__vdata/$newFile")
    assert(raw.columns.contains("v") && !raw.columns.contains("label"),
      s"new files must carry the PHYSICAL name 'v', got ${raw.columns.toSeq}")

    // time travel is era-consistent: the pre-rename version keeps its name
    assert(spark.sql(s"SELECT v FROM gcm.default.r1 VERSION AS OF $vPre")
      .as[String].collect().sorted.toSeq == Seq("a", "b"))
    intercept[Exception] {
      spark.sql(s"SELECT label FROM gcm.default.r1 VERSION AS OF $vPre").collect()
    }
  }

  test("zone maps re-key on rename: pruning keeps working under the new name") {
    // two commits with disjoint k ranges -> two prunable file sets
    spark.sql("CREATE TABLE gcm.default.z1 (k BIGINT, amt BIGINT)")
    spark.sql("INSERT INTO gcm.default.z1 SELECT id, id * 1000 FROM range(0, 100)")
    spark.sql("INSERT INTO gcm.default.z1 SELECT id, id * 1000 FROM range(1000, 1100)")
    spark.sql("ALTER TABLE gcm.default.z1 RENAME COLUMN amt TO amount")
    val v = VersionedTable.currentVersion(lib, "z1").get
    val skipped = VersionedTable.skippedFiles(lib, "z1", v,
      col("amount") > lit(500000L))
    assert(skipped.nonEmpty,
      "the renamed column's re-keyed zone maps must still prune files")
    // and the answer is exact through both surfaces: only the second
    // commit's rows (1000..1099 -> 1,000,000+) pass
    assert(VersionedTable.readWhere(lib, "z1", v, col("amount") > lit(500000L))
      .count() == 100L)
    assert(spark.sql(
      "SELECT count(*) FROM gcm.default.z1 WHERE amount > 500000")
      .head().getLong(0) == 100L)
  }

  test("DROP COLUMN is metadata-only; a re-added namesake never resurrects") {
    spark.sql("CREATE TABLE gcm.default.d1 (k BIGINT, v STRING, w BIGINT)")
    spark.sql("INSERT INTO gcm.default.d1 VALUES (1, 'a', 10), (2, 'b', 20)")
    val before = files("d1")

    spark.sql("ALTER TABLE gcm.default.d1 DROP COLUMN w")
    assert(files("d1") == before,
      "a drop must carry every data file VERBATIM (metadata-only commit)")
    assert(spark.sql("SELECT * FROM gcm.default.d1").columns.toSeq
      .filterNot(_ == Loader.IdCol) == Seq("k", "v"))
    intercept[Exception] {
      spark.sql("SELECT w FROM gcm.default.d1").collect()
    }

    // re-add the SAME logical name: the old bytes (still in the files)
    // must NOT come back — the namesake maps to a fresh physical name
    spark.sql("ALTER TABLE gcm.default.d1 ADD COLUMN w BIGINT")
    assert(spark.sql("SELECT w FROM gcm.default.d1 WHERE k = 1")
      .head().isNullAt(0),
      "re-added namesake must read NULL for pre-drop rows, not the dead bytes")
    spark.sql("INSERT INTO gcm.default.d1 VALUES (3, 'c', 30)")
    assert(spark.sql(
      "SELECT k, w FROM gcm.default.d1 ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ==
      Seq((1L, -1L), (2L, -1L), (3L, 30L)))
    // the namesake's PHYSICAL name is fresh in new files
    val newFile = (files("d1").toSet -- before).head
    val raw = spark.read.parquet(s"$warehouse/d1.__vdata/$newFile")
    assert(!raw.columns.contains("w") &&
      raw.columns.exists(_.startsWith("w__p")),
      s"namesake must write a fresh physical name, got ${raw.columns.toSeq}")
  }

  test("refusal matrix: id, keys, bucket keys, CHECK columns, collisions") {
    // keyed + bucketed library table with a CHECK constraint
    val inc = Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("k", "v", "n")
    VersionedTable.load(lib, "rm1", inc, upsertFields = Seq("k"),
      bucketBy = Some((Seq("k"), 4)),
      extraProps = Map(VersionedTable.CheckConstraintProp -> "n >= 0"))
    def refuse(f: => Any, msg: String): Unit = {
      val e = intercept[Exception](f)
      assert(e.getMessage != null && e.getMessage.toLowerCase.contains(msg),
        s"expected refusal mentioning '$msg', got: ${e.getMessage}")
    }
    refuse(VersionedTable.renameColumn(lib, "rm1", Loader.IdCol, "x"),
      "surrogate id")
    refuse(VersionedTable.renameColumn(lib, "rm1", "k", "kk"), "key")
    refuse(VersionedTable.dropColumn(lib, "rm1", "k"), "key")
    refuse(VersionedTable.renameColumn(lib, "rm1", "n", "m"), "check")
    refuse(VersionedTable.renameColumn(lib, "rm1", "v", "n"), "already exists")
    refuse(VersionedTable.renameColumn(lib, "rm1", "nope", "x"), "no column")
    // drop-last-column guard
    val one = Seq(1L).toDF("only")
    VersionedTable.load(lib, "rm2", one)
    refuse(VersionedTable.dropColumn(lib, "rm2", "only"), "last column")
    // the value column CAN rename on the keyed/bucketed table
    VersionedTable.renameColumn(lib, "rm1", "v", "tag")
    assert(VersionedTable.read(lib, "rm1").columns.contains("tag"))
    // and a keyed upsert after the rename still merges correctly
    VersionedTable.load(lib, "rm1",
      Seq((1L, "A", 7L), (3L, "c", 8L)).toDF("k", "tag", "n"),
      upsertFields = Seq("k"))
    assert(VersionedTable.read(lib, "rm1").select("k", "tag").as[(Long, String)]
      .collect().sorted.toSeq == Seq((1L, "A"), (2L, "b"), (3L, "c")))
  }

  test("library path: rename, lookup, change feed across the rename") {
    val inc = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    VersionedTable.load(lib, "lp1", inc, upsertFields = Seq("k"))
    val v1 = VersionedTable.currentVersion(lib, "lp1").get
    VersionedTable.renameColumn(lib, "lp1", "v", "label")
    VersionedTable.load(lib, "lp1",
      Seq((2L, "B"), (3L, "c")).toDF("k", "label"), upsertFields = Seq("k"))
    val v3 = VersionedTable.currentVersion(lib, "lp1").get

    // point lookup under the new name
    assert(VersionedTable.lookup(lib, "lp1", v3, Map("k" -> 2L))
      .select("label").as[String].head() == "B")

    // change feed across the rename: each side presents its own era's
    // names; the renamed column surfaces as the documented drop+add
    // (old values don't retract forward across a re-label)
    val feed = VersionedTable.changes(lib, "lp1", v1, v3, Seq("k"))
    assert(feed.columns.contains("label"))
    val ops = feed.select("op", "k").as[(String, Long)].collect()
      .map(_.swap).toMap
    assert(ops(3L) == "insert")
    assert(ops(2L) == "update")
  }

  test("merge-on-read DML on a renamed table: DVs + translated filters") {
    spark.sql("CREATE TABLE gcm.default.m1 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gcm.default.m1 SELECT id, concat('s', id) " +
      "FROM range(0, 100)")
    spark.sql("ALTER TABLE gcm.default.m1 RENAME COLUMN v TO s")
    val before = files("m1")

    spark.sql("DELETE FROM gcm.default.m1 WHERE s = 's7'")
    assert(files("m1") == before,
      "a 1-row MOR delete on the renamed table must keep every file verbatim")
    val v = VersionedTable.currentVersion(lib, "m1").get
    assert(VersionedTable.deletionVectors(lib, "m1", v).values.map(_._2).sum == 1L)
    assert(spark.sql("SELECT count(*) FROM gcm.default.m1").head().getLong(0) == 99L)
    assert(spark.sql("SELECT count(*) FROM gcm.default.m1 WHERE s = 's7'")
      .head().getLong(0) == 0L)

    spark.sql("UPDATE gcm.default.m1 SET s = 'patched' WHERE k = 11")
    assert(spark.sql("SELECT s FROM gcm.default.m1 WHERE k = 11")
      .as[String].head() == "patched")
    assert(spark.sql("SELECT count(*) FROM gcm.default.m1").head().getLong(0) == 99L)
  }

  test("recluster after a rename keeps the renamed column's zone maps") {
    spark.sql("CREATE TABLE gcm.default.rc (k BIGINT, amt BIGINT)")
    spark.sql("INSERT INTO gcm.default.rc SELECT id, id * 100 FROM range(0, 2000)")
    spark.sql("ALTER TABLE gcm.default.rc RENAME COLUMN amt TO amount")
    VersionedTable.recluster(lib, "rc", Seq("amount"), targetFileBytes = 16 * 1024)
    val v = VersionedTable.currentVersion(lib, "rc").get
    // the rewritten (physical-named) files' footer stats must re-key to
    // the LOGICAL name — pruning on the renamed column keeps working
    assert(VersionedTable.skippedFiles(lib, "rc", v,
      col("amount") > lit(150000L)).nonEmpty,
      "reclustered files must record zone maps under the renamed name")
    assert(VersionedTable.readWhere(lib, "rc", v,
      col("amount") > lit(150000L)).count() ==
      spark.sql("SELECT count(*) FROM gcm.default.rc WHERE amount > 150000")
        .head().getLong(0))
  }

  test("streams survive a rename of their columns; a re-pointed name fails loudly") {
    // ONE long-running append-tail stream: its captured (schema, mapping)
    // pair must outlive renames that happen underneath it
    VersionedTable.load(lib, "st1", Seq((1L, "a")).toDF("k", "v"))
    val ckpt = tmpDir("cmap-ckpt")
    val q = spark.readStream.format("graft")
      .option("dir", warehouse).option("table", "st1")
      .load().select("k", "v")
      .writeStream.format("memory").queryName("cmap_st1")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cmap_st1").as[(Long, String)].collect().toSet ==
        Set((1L, "a")))

      // RENAME v away MID-STREAM: the stream's captured logical name 'v'
      // still maps to physical 'v' (stable names) — appends keep flowing
      VersionedTable.renameColumn(lib, "st1", "v", "label")
      VersionedTable.load(lib, "st1", Seq((2L, "b")).toDF("k", "label"))
      q.processAllAvailable()
      assert(spark.table("cmap_st1").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b")),
        "a rename under a running stream must not break the tail " +
          "(physical names are stable)")

      // now ADD a namesake 'v' (fresh physical): the stream's 'v' would
      // silently decode the WRONG column — the guard must fail the batch
      VersionedTable.widenSchema(lib, "st1",
        Seq(StructField("v", StringType, nullable = true)))
      VersionedTable.load(lib, "st1",
        Seq((3L, "c", "other")).toDF("k", "label", "v"))
      val e = intercept[Throwable] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("column mapping")),
        s"expected the mapping-stability refusal, got: $e")
    } finally q.stop()
  }
}
