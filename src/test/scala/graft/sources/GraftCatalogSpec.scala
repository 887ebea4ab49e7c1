package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._

/** The graft TableCatalog: versioned tables managed in PURE SQL —
  * CREATE / INSERT / SELECT (head, VERSION AS OF, TIMESTAMP AS OF) /
  * CTAS / SHOW TABLES / DROP, every INSERT one versioned commit. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gcat")
  spark.conf.set("spark.sql.catalog.gq", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gq.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("CREATE TABLE + INSERT INTO commit versions; SELECT reads the head") {
    spark.sql("CREATE TABLE gq.default.ev (k BIGINT, s STRING)")
    assert(VersionedTable.versions(lib, "ev") == Seq(1L), "create = v1 (empty)")
    assert(spark.sql("SELECT * FROM gq.default.ev").count() == 0L)
    spark.sql("INSERT INTO gq.default.ev VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gq.default.ev VALUES (3, 'c')")
    assert(VersionedTable.versions(lib, "ev") == Seq(1L, 2L, 3L),
      "each INSERT is one versioned commit")
    assert(spark.sql("SELECT k, s FROM gq.default.ev ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // duplicate CREATE fails; IF NOT EXISTS doesn't
    intercept[Exception] {
      spark.sql("CREATE TABLE gq.default.ev (k BIGINT)")
    }
    spark.sql("CREATE TABLE IF NOT EXISTS gq.default.ev (k BIGINT)")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    // pin manifest-recorded commit times through the clock seam:
    // v1@1000s, v2@2000s, v3@3000s (SQL commands commit on this thread)
    VersionedTable.commitClock.withValue(() => 1000000L) {
      spark.sql("CREATE TABLE gq.default.tt (k BIGINT)")
    }
    VersionedTable.commitClock.withValue(() => 2000000L) {
      spark.sql("INSERT INTO gq.default.tt VALUES (1)")
    }
    VersionedTable.commitClock.withValue(() => 3000000L) {
      spark.sql("INSERT INTO gq.default.tt VALUES (2)")
    }
    assert(spark.sql("SELECT k FROM gq.default.tt VERSION AS OF 2")
      .as[Long].collect().toSeq == Seq(1L))
    assert(spark.sql("SELECT count(*) FROM gq.default.tt VERSION AS OF 1")
      .head().getLong(0) == 0L)
    // scramble the file mtimes: TIMESTAMP AS OF must read the RECORDED
    // commit times, not what a copy/restore happened to leave on disk
    val md = new java.io.File(s"$warehouse/tt.__vmeta")
    (1 to 3).foreach { v =>
      val art = Seq(s"v$v.delta.json", s"v$v.manifest.json")
        .map(new java.io.File(md, _)).filter(_.exists)
      assert(art.nonEmpty && art.forall(_.setLastModified((4 - v) * 999L)))
    }
    val t2 = "1970-01-01 00:41:40" // 2500 s = between v2 (2000s) and v3 (3000s)
    assert(spark.sql(
      s"SELECT k FROM gq.default.tt TIMESTAMP AS OF '$t2'")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("TIMESTAMP AS OF resolves against the table's NAMESPACE") {
    // the timestamp overload must look the table up in the identifier's
    // namespace directory, like every other table operation — against
    // the root dir a namespaced table's time travel fails outright
    spark.sql("CREATE NAMESPACE gq.tns")
    VersionedTable.commitClock.withValue(() => 1000000L) {
      spark.sql("CREATE TABLE gq.tns.tt (k BIGINT)")
    }
    VersionedTable.commitClock.withValue(() => 2000000L) {
      spark.sql("INSERT INTO gq.tns.tt VALUES (7)")
    }
    VersionedTable.commitClock.withValue(() => 3000000L) {
      spark.sql("INSERT INTO gq.tns.tt VALUES (8)")
    }
    assert(spark.sql(
      "SELECT k FROM gq.tns.tt TIMESTAMP AS OF '1970-01-01 00:41:40'")
      .as[Long].collect().toSeq == Seq(7L))
  }

  test("CTAS, SHOW TABLES and DROP TABLE") {
    spark.range(5).select(col("id").as("n"))
      .createOrReplaceTempView("gcat_src")
    spark.sql("CREATE TABLE gq.default.ctas AS SELECT n FROM gcat_src")
    assert(spark.sql("SELECT sum(n) FROM gq.default.ctas").head().getLong(0) == 10L)
    assert(VersionedTable.currentVersion(lib, "ctas").exists(_ >= 1L))
    val shown = spark.sql("SHOW TABLES IN gq.default")
      .select("tableName").as[String].collect().toSet
    assert(shown.contains("ctas"), s"SHOW TABLES must list it: $shown")
    spark.sql("DROP TABLE gq.default.ctas")
    assert(VersionedTable.currentVersion(lib, "ctas").isEmpty)
    intercept[Exception] { spark.sql("SELECT * FROM gq.default.ctas").collect() }
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only widening") {
    spark.sql("CREATE TABLE gq.default.alt (k BIGINT, s STRING)")
    spark.sql("INSERT INTO gq.default.alt VALUES (1, 'a'), (2, 'b')")
    val preFiles = VersionedTable.files(lib, "alt", 2L).toSet
    spark.sql("ALTER TABLE gq.default.alt ADD COLUMN z BIGINT")
    // metadata-only: v3 carries v2's files VERBATIM — nothing rewritten
    assert(VersionedTable.files(lib, "alt", 3L).toSet == preFiles,
      "the ALTER must not add, drop, or rewrite a single data file")
    // pre-ALTER rows read the new column as null
    assert(spark.sql("SELECT k, s, z FROM gq.default.alt ORDER BY k")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))) ==
      Seq((1L, "a", None), (2L, "b", None)))
    // an INSERT with the widened arity lands; both eras read together
    spark.sql("INSERT INTO gq.default.alt VALUES (3, 'c', 30)")
    assert(spark.sql("SELECT k, s, z FROM gq.default.alt ORDER BY k")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))) ==
      Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
    // time travel: the pre-ALTER version still reads its NARROW schema
    assert(spark.sql("SELECT * FROM gq.default.alt VERSION AS OF 2")
      .columns.toSeq == Seq("k", "s"))
    // multiple adds in one statement
    spark.sql("ALTER TABLE gq.default.alt ADD COLUMNS (u STRING, w DOUBLE)")
    assert(spark.sql("SELECT * FROM gq.default.alt").columns.toSeq ==
      Seq("k", "s", "z", "u", "w"))
    // the widened column feeds DML: zone maps have no stats for it on
    // old files (admit-all), so the filter still sees every row
    spark.sql("UPDATE gq.default.alt SET u = 'x' WHERE z IS NULL")
    assert(spark.sql("SELECT count(*) FROM gq.default.alt WHERE u = 'x'")
      .head().getLong(0) == 2L)
    // RENAME / DROP are metadata-only via column mapping now (F54 —
    // ColumnMappingSpec owns the deep coverage); here just the catalog
    // wiring: rename reads under the new name, drop removes the column
    spark.sql("ALTER TABLE gq.default.alt RENAME COLUMN s TO s2")
    assert(spark.sql("SELECT s2 FROM gq.default.alt WHERE k = 1")
      .head().getString(0) == "a")
    spark.sql("ALTER TABLE gq.default.alt DROP COLUMN w")
    assert(spark.sql("SELECT * FROM gq.default.alt").columns.toSeq ==
      Seq("k", "s2", "z", "u"))
    // type changes stay refused by design (they would re-interpret
    // already-committed files)
    intercept[Exception] {
      spark.sql("ALTER TABLE gq.default.alt ALTER COLUMN k TYPE STRING")
    }
    // ...as are the unsound adds: reserved id, NOT NULL, duplicate,
    // positioned (FIRST/AFTER), nested
    intercept[Exception] {
      spark.sql("ALTER TABLE gq.default.alt ADD COLUMN id BIGINT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gq.default.alt ADD COLUMN nn BIGINT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gq.default.alt ADD COLUMN s2 STRING")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gq.default.alt ADD COLUMN f BIGINT FIRST")
    }
    // nothing above committed: the head is still the rename+drop state
    assert(spark.sql("SELECT * FROM gq.default.alt").columns.toSeq ==
      Seq("k", "s2", "z", "u"))
  }

  test("namespaces: two-DB model in pure SQL — create, use, join across, drop") {
    spark.sql("CREATE NAMESPACE gq.src")
    spark.sql("CREATE NAMESPACE gq.tgt")
    val nss = spark.sql("SHOW NAMESPACES IN gq")
      .select("namespace").as[String].collect().toSet
    assert(Set("default", "src", "tgt").subsetOf(nss), s"got $nss")
    // same table NAME in two namespaces: fully independent state
    spark.sql("CREATE TABLE gq.src.ev (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE gq.tgt.ev (k BIGINT, lbl STRING)")
    spark.sql("INSERT INTO gq.src.ev VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("INSERT INTO gq.tgt.ev VALUES (1, 'a'), (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM gq.src.ev").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM gq.tgt.ev").head().getLong(0) == 2L)
    // cross-namespace join
    assert(spark.sql("""
      SELECT s.k, s.v, t.lbl FROM gq.src.ev s JOIN gq.tgt.ev t ON s.k = t.k
      ORDER BY s.k""").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 10L, "a"), (3L, 30L, "c")))
    // SHOW TABLES per namespace; versioned semantics hold inside one
    assert(spark.sql("SHOW TABLES IN gq.src").select("tableName")
      .as[String].collect().toSeq == Seq("ev"))
    assert(spark.sql("SELECT count(*) FROM gq.src.ev VERSION AS OF 1")
      .head().getLong(0) == 0L)
    // an unknown namespace refuses at CREATE; duplicates refuse
    intercept[Exception] { spark.sql("CREATE TABLE gq.nope.t (k BIGINT)") }
    intercept[Exception] { spark.sql("CREATE NAMESPACE gq.src") }
    // declared namespace metadata refuses LOUDLY (never silently dropped)
    val metaErr = intercept[Exception] {
      spark.sql("CREATE NAMESPACE gq.meta WITH PROPERTIES ('k' = 'v')")
    }
    assert(metaErr.getMessage.contains("no metadata"),
      s"properties must refuse by name: ${metaErr.getMessage}")
    intercept[Exception] {
      spark.sql("CREATE NAMESPACE gq.meta2 COMMENT 'nope'")
    }
    assert(!spark.sql("SHOW NAMESPACES IN gq").select("namespace")
      .as[String].collect().toSet.exists(Set("meta", "meta2")),
      "a refused CREATE NAMESPACE must create nothing")
    // DROP NAMESPACE: refuses while tables remain. The catalog throws
    // the contract's NonEmptyNamespaceException, which Spark RECOGNIZES
    // and rewraps as the standard SCHEMA_NOT_EMPTY condition (with the
    // CASCADE hint) — a bare require() would surface as an opaque
    // IllegalArgumentException instead.
    val dropErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP NAMESPACE gq.src")
    }
    assert(dropErr.getCondition == "SCHEMA_NOT_EMPTY",
      s"non-empty drop must surface as SCHEMA_NOT_EMPTY, got $dropErr")
    spark.sql("DROP TABLE gq.src.ev")
    spark.sql("DROP NAMESPACE gq.src")
    assert(!spark.sql("SHOW NAMESPACES IN gq")
      .select("namespace").as[String].collect().toSet.contains("src"))
    spark.sql("DROP TABLE gq.tgt.ev")
    spark.sql("DROP NAMESPACE gq.tgt")
  }

  test("CREATE TABLE rejects the reserved surrogate-id column name") {
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE gq.default.badid (id BIGINT, s STRING)")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("reserved")),
      s"expected the reserved-column refusal, got: ${messages(err)}")
    assert(VersionedTable.currentVersion(lib, "badid").isEmpty,
      "a rejected CREATE must leave nothing behind")
  }

  test("DELETE FROM commits a versioned logical delete; TRUNCATE-shape empties") {
    spark.sql("CREATE TABLE gq.default.del (k BIGINT, s STRING)")
    spark.sql("INSERT INTO gq.default.del VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("DELETE FROM gq.default.del WHERE k <= 1 OR s = 'c'")
    assert(spark.sql("SELECT k FROM gq.default.del").as[Long]
      .collect().toSeq == Seq(2L), "the matched rows are logically gone")
    assert(VersionedTable.versions(lib, "del") == Seq(1L, 2L, 3L),
      "the delete is one versioned commit — prior states still time-travel")
    assert(spark.sql("SELECT count(*) FROM gq.default.del VERSION AS OF 2")
      .head().getLong(0) == 3L)
    // unconditioned DELETE empties the table, head stays readable
    spark.sql("DELETE FROM gq.default.del")
    assert(spark.sql("SELECT count(*) FROM gq.default.del").head().getLong(0) == 0L)
    assert(VersionedTable.versions(lib, "del") == Seq(1L, 2L, 3L, 4L))
    spark.sql("DROP TABLE gq.default.del")
  }

  test("CALL procedures: history, rollback, vacuum in pure SQL") {
    spark.sql("CREATE TABLE gq.default.proc (k BIGINT)")
    spark.sql("INSERT INTO gq.default.proc VALUES (1), (2)")
    spark.sql("INSERT INTO gq.default.proc VALUES (3)")
    // history: one row per retained version, matching the library frame
    val h = spark.sql("CALL gq.system.history('proc')")
      .select("version", "n_files").as[(Long, Int)].collect().toSeq.sortBy(_._1)
    assert(h.map(_._1) == Seq(1L, 2L, 3L), s"three retained versions: $h")
    assert(h == VersionedTable.history(lib, "proc")
      .select("version", "n_files").as[(Long, Int)].collect().toSeq.sortBy(_._1),
      "CALL history must equal the library history frame")
    // rollback: undo the second INSERT — a NEW commit (v4 = state of v2)
    val rb = spark.sql("CALL gq.system.rollback('proc', 2)")
      .as[Long].head()
    assert(rb == 4L, "rollback commits a new head")
    assert(spark.sql("SELECT k FROM gq.default.proc").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    // vacuum: keep only the head (v4 = rollback to v2's state) — the
    // rolled-over v3 append's file is then unreferenced and reclaims.
    // DRY RUN first: same count, nothing deleted
    val would = spark.sql(
      "CALL gq.system.vacuum('proc', 1, dry_run => true)").as[Int].head()
    assert(would >= 1, s"dry run must report the reclaimable files: $would")
    assert(VersionedTable.versions(lib, "proc") == Seq(1L, 2L, 3L, 4L),
      "dry run must not drop manifests")
    val removed = spark.sql("CALL gq.system.vacuum('proc', 1)").as[Int].head()
    assert(removed == would, s"dry-run count must match the real reclaim: " +
      s"$would vs $removed")
    assert(VersionedTable.versions(lib, "proc") == Seq(4L))
    assert(spark.sql("SELECT k FROM gq.default.proc").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L),
      "the head still reads after the vacuum")
    // clone: zero-copy via SQL, then compact the clone toward one file
    assert(spark.sql("CALL gq.system.clone('proc', 'proc2', 4)")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT k FROM gq.default.proc2").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    val cv = spark.sql("CALL gq.system.compact('proc2', 134217728)")
      .as[Long].head()
    assert(cv == 2L, "compact commits a new clone version")
    assert(spark.sql("SELECT k FROM gq.default.proc2").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    spark.sql("DROP TABLE gq.default.proc2 PURGE")
    // time-based retention: expire_snapshots reclaims by RECORDED commit
    // time (head always kept), dry run touches nothing
    VersionedTable.commitClock.withValue(() => 1000000L) {
      spark.sql("CREATE TABLE gq.default.exp (k BIGINT)")
    }
    VersionedTable.commitClock.withValue(() => 2000000L) {
      spark.sql("INSERT INTO gq.default.exp VALUES (1)")
    }
    VersionedTable.commitClock.withValue(() => 3000000L) {
      spark.sql("INSERT INTO gq.default.exp VALUES (2)")
    }
    spark.sql(
      "CALL gq.system.expire_snapshots('exp', '2500000', dry_run => true)")
      .collect()
    assert(VersionedTable.versions(lib, "exp") == Seq(1L, 2L, 3L),
      "dry run must not drop versions")
    // the standard 'Z'-suffixed ISO instant must parse (LocalDateTime
    // alone throws on a zone designator — regression pin)
    spark.sql("CALL gq.system.expire_snapshots('exp', " +
      "'1970-01-01T00:41:40Z', dry_run => true)").collect()
    spark.sql("CALL gq.system.expire_snapshots('exp', '2500000')").collect()
    assert(VersionedTable.versions(lib, "exp") == Seq(3L),
      "only the commit at-or-after the instant survives")
    assert(spark.sql("SELECT sum(k) FROM gq.default.exp").head().getLong(0) == 3L,
      "head state intact after the expiry")
    // unknown procedure is a curated refusal
    val err = intercept[Exception] { spark.sql("CALL gq.system.nope('x')") }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("available")),
      s"expected the procedure listing, got: ${messages(err)}")
  }

  test("CHECK constraints gate every write at commit time") {
    spark.sql("CREATE TABLE gq.default.chk (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('check' = 'v >= 0 AND k < 1000')")
    spark.sql("INSERT INTO gq.default.chk VALUES (1, 10), (2, 0)")
    assert(spark.sql("SELECT count(*) FROM gq.default.chk").head().getLong(0) == 2L)
    // a violating INSERT refuses and commits NOTHING
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gq.default.chk VALUES (3, 5), (4, -1)")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("CHECK constraint"), s"got: ${msgs(e)}")
    assert(spark.sql("SELECT count(*) FROM gq.default.chk").head().getLong(0) == 2L,
      "the violating batch must not half-commit")
    assert(VersionedTable.versions(lib, "chk").size == 2,
      "no version for the refused insert")
    // UPDATE cannot write rows the constraint refuses
    val u = intercept[Exception] {
      spark.sql("UPDATE gq.default.chk SET v = -5 WHERE k = 1")
    }
    assert(msgs(u).contains("CHECK constraint"), s"got: ${msgs(u)}")
    // NULL satisfies (SQL CHECK semantics)
    spark.sql("INSERT INTO gq.default.chk VALUES (5, NULL)")
    assert(spark.sql("SELECT count(*) FROM gq.default.chk").head().getLong(0) == 3L)
    // a constraint referencing a missing column fails the CREATE, not
    // the first insert
    intercept[Exception] {
      spark.sql("CREATE TABLE gq.default.chk2 (k BIGINT) " +
        "TBLPROPERTIES ('check' = 'nope > 0')")
    }
  }

  test("DROP TABLE refuses while a live clone references the table; PURGE forces") {
    spark.sql("CREATE TABLE gq.default.clsrc (k BIGINT)")
    spark.sql("INSERT INTO gq.default.clsrc VALUES (1), (2)")
    VersionedTable.cloneTable(lib, "clsrc", lib, "clcopy", 2L)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // guarded: the drop names the clone and leaves both tables intact
    val err = intercept[Exception] { spark.sql("DROP TABLE gq.default.clsrc") }
    assert(messages(err).exists(m => m.contains("clcopy") && m.contains("PURGE")),
      s"expected the clone guard naming the clone, got: ${messages(err)}")
    assert(VersionedTable.read(lib, "clcopy").count() == 2L,
      "the clone must still read after the refused drop")
    // after dropping the clone, the source drop succeeds (marker expired)
    spark.sql("DROP TABLE gq.default.clcopy")
    spark.sql("DROP TABLE gq.default.clsrc")
    assert(VersionedTable.currentVersion(lib, "clsrc").isEmpty)
    // PURGE is the force escape: drops even with a live clone
    spark.sql("CREATE TABLE gq.default.psrc (k BIGINT)")
    spark.sql("INSERT INTO gq.default.psrc VALUES (7)")
    VersionedTable.cloneTable(lib, "psrc", lib, "pcopy", 2L)
    spark.sql("DROP TABLE gq.default.psrc PURGE")
    assert(VersionedTable.currentVersion(lib, "psrc").isEmpty,
      "PURGE must bypass the clone guard")
    spark.sql("DROP TABLE gq.default.pcopy PURGE")
  }
}
