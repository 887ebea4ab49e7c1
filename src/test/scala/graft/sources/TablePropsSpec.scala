package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** `ALTER TABLE SET/UNSET TBLPROPERTIES` (F57) and named CHECK
  * constraints via `ALTER TABLE ADD/DROP CONSTRAINT` (F58): both are
  * ONE-manifest metadata commits; the engine-known property keys
  * validate rather than store blind, a new CHECK validates the existing
  * rows before the manifest may advertise it, and every write gate
  * enforces the CONJUNCTION of the unnamed TBLPROPERTIES check and all
  * named constraints. */
class TablePropsSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gprops")
  spark.conf.set("spark.sql.catalog.gtp",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtp.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("SET/UNSET TBLPROPERTIES: one metadata commit, validated keys") {
    // user TBLPROPERTIES at CREATE persist like SET TBLPROPERTIES would
    spark.sql("CREATE TABLE gtp.default.p0 (k BIGINT) " +
      "TBLPROPERTIES ('origin' = 'crawl-7')")
    val created = spark.sql("SHOW TBLPROPERTIES gtp.default.p0")
      .as[(String, String)].collect().toMap
    assert(created.get("origin").contains("crawl-7"), s"got $created")

    spark.sql("CREATE TABLE gtp.default.p1 (k BIGINT, n BIGINT)")
    spark.sql("INSERT INTO gtp.default.p1 VALUES (1, 5)")
    val vPre = VersionedTable.currentVersion(lib, "p1").get

    spark.sql("ALTER TABLE gtp.default.p1 SET TBLPROPERTIES " +
      "('dv_max_fraction' = '0.3', 'team' = 'data-eng')")
    assert(VersionedTable.currentVersion(lib, "p1").contains(vPre + 1),
      "SET TBLPROPERTIES must be ONE metadata commit")
    val shown = spark.sql("SHOW TBLPROPERTIES gtp.default.p1")
      .as[(String, String)].collect().toMap
    assert(shown.get("dv_max_fraction").contains("0.3") &&
      shown.get("team").contains("data-eng"), s"got $shown")

    // validated keys refuse bad values; reserved keys refuse outright
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p1 SET TBLPROPERTIES " +
        "('dv_max_fraction' = 'lots')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p1 SET TBLPROPERTIES " +
        "('write.mode' = 'append-only')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p1 SET TBLPROPERTIES " +
        "('schema_json' = '{}')")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p1 SET TBLPROPERTIES " +
        "('upsert_keys' = 'k')")
    }

    spark.sql("ALTER TABLE gtp.default.p1 UNSET TBLPROPERTIES ('team')")
    val after = spark.sql("SHOW TBLPROPERTIES gtp.default.p1")
      .as[(String, String)].collect().toMap
    assert(!after.contains("team"))
  }

  test("SET 'check' validates existing rows; the gate follows the property") {
    spark.sql("CREATE TABLE gtp.default.p2 (k BIGINT, n BIGINT)")
    spark.sql("INSERT INTO gtp.default.p2 VALUES (1, -5)")
    val vPre = VersionedTable.currentVersion(lib, "p2").get
    // existing violating row: the declaration refuses, nothing commits
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p2 SET TBLPROPERTIES ('check' = 'n >= 0')")
    }
    assert(VersionedTable.currentVersion(lib, "p2").contains(vPre))
    // clean up the violator, then the declaration lands and gates writes
    spark.sql("DELETE FROM gtp.default.p2 WHERE n < 0")
    spark.sql("ALTER TABLE gtp.default.p2 SET TBLPROPERTIES ('check' = 'n >= 0')")
    intercept[Exception] {
      spark.sql("INSERT INTO gtp.default.p2 VALUES (2, -1)")
    }
    spark.sql("INSERT INTO gtp.default.p2 VALUES (3, 1)")
    // UNSET removes the gate
    spark.sql("ALTER TABLE gtp.default.p2 UNSET TBLPROPERTIES ('check')")
    spark.sql("INSERT INTO gtp.default.p2 VALUES (4, -9)")
    // survivors: (3,1) and the post-UNSET (4,-9) — refused inserts never landed
    assert(spark.sql("SELECT count(*) FROM gtp.default.p2").head().getLong(0) == 2L)
  }

  test("SET write.mode='merge-on-read' flips MOR on for an existing table") {
    spark.sql("CREATE TABLE gtp.default.p3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gtp.default.p3 SELECT id, concat('s', id) FROM range(0, 50)")
    spark.sql("ALTER TABLE gtp.default.p3 SET TBLPROPERTIES " +
      "('write.mode' = 'merge-on-read')")
    val pre = VersionedTable.files(lib, "p3",
      VersionedTable.currentVersion(lib, "p3").get).toSet
    spark.sql("DELETE FROM gtp.default.p3 WHERE k = 7")
    val v = VersionedTable.currentVersion(lib, "p3").get
    assert(VersionedTable.files(lib, "p3", v).toSet == pre,
      "after the flip, DELETE must commit deletion vectors (files verbatim)")
    assert(VersionedTable.deletionVectors(lib, "p3", v).nonEmpty)
    assert(spark.sql("SELECT count(*) FROM gtp.default.p3").head().getLong(0) == 49L)
  }

  test("ADD/DROP CONSTRAINT: named checks, existing-row validation, conjunction") {
    spark.sql("CREATE TABLE gtp.default.p4 (k BIGINT, n BIGINT) " +
      "TBLPROPERTIES ('check' = 'k > 0')")
    spark.sql("INSERT INTO gtp.default.p4 VALUES (1, -5)")
    val vPre = VersionedTable.currentVersion(lib, "p4").get
    // existing violating row refuses the ADD, nothing commits
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p4 ADD CONSTRAINT n_pos CHECK (n >= 0)")
    }
    assert(VersionedTable.currentVersion(lib, "p4").contains(vPre))
    spark.sql("DELETE FROM gtp.default.p4 WHERE n < 0")
    spark.sql("ALTER TABLE gtp.default.p4 ADD CONSTRAINT n_pos CHECK (n >= 0)")
    // BOTH gates enforce: the named one and the TBLPROPERTIES one
    intercept[Exception] {
      spark.sql("INSERT INTO gtp.default.p4 VALUES (2, -1)") // breaks n_pos
    }
    intercept[Exception] {
      spark.sql("INSERT INTO gtp.default.p4 VALUES (-2, 1)") // breaks 'check'
    }
    spark.sql("INSERT INTO gtp.default.p4 VALUES (2, 1)")
    // duplicate name refuses; unknown DROP refuses; IF EXISTS no-ops
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p4 ADD CONSTRAINT n_pos CHECK (n > 5)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p4 DROP CONSTRAINT nope")
    }
    spark.sql("ALTER TABLE gtp.default.p4 DROP CONSTRAINT IF EXISTS nope")
    // dropping the named one re-admits its violations (the unnamed
    // TBLPROPERTIES gate stays)
    spark.sql("ALTER TABLE gtp.default.p4 DROP CONSTRAINT n_pos")
    spark.sql("INSERT INTO gtp.default.p4 VALUES (3, -7)")
    // survivors: (2,1) and the post-DROP (3,-7)
    assert(spark.sql("SELECT count(*) FROM gtp.default.p4").head().getLong(0) == 2L)
    intercept[Exception] {
      spark.sql("INSERT INTO gtp.default.p4 VALUES (-3, 1)")
    }
  }

  test("ADD CONSTRAINT refuses the reserved name 'check' and the surrogate id column") {
    spark.sql("CREATE TABLE gtp.default.prsv (k BIGINT, n BIGINT)")
    spark.sql("INSERT INTO gtp.default.prsv VALUES (1, 5)")
    val vPre = VersionedTable.currentVersion(lib, "prsv").get
    // 'check' is how constraints() reports the legacy TBLPROPERTIES
    // gate — one name must never denote two distinct constraints
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.prsv ADD CONSTRAINT check CHECK (n > 0)")
    }
    intercept[Exception] {
      VersionedTable.addCheckConstraint(lib, "prsv", "CHECK", "n > 0")
    }
    // the engine's surrogate id is invisible to CREATE-time checks; the
    // ALTER entry points must refuse it identically
    intercept[Exception] {
      VersionedTable.addCheckConstraint(lib, "prsv", "id_gate", "id > 0")
    }
    intercept[Exception] {
      VersionedTable.setTableProps(lib, "prsv", Map("check" -> "id > 0"), Nil)
    }
    assert(VersionedTable.currentVersion(lib, "prsv").contains(vPre),
      "every refusal above must commit nothing")
  }

  test("review pins: renamed-column CHECK gates, atomic DROP COLUMNS, eager SET-check discipline") {
    // a CHECK added AFTER a rename must gate inserts through the
    // translated staged read (the staged files carry the PHYSICAL name)
    spark.sql("CREATE TABLE gtp.default.p7 (k BIGINT, a BIGINT)")
    spark.sql("INSERT INTO gtp.default.p7 VALUES (1, 5)")
    spark.sql("ALTER TABLE gtp.default.p7 RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE gtp.default.p7 ADD CONSTRAINT b_pos CHECK (b >= 0)")
    spark.sql("INSERT INTO gtp.default.p7 VALUES (2, 7)") // passes the gate
    intercept[Exception] {
      spark.sql("INSERT INTO gtp.default.p7 VALUES (3, -1)")
    }
    assert(spark.sql("SELECT count(*) FROM gtp.default.p7").head().getLong(0) == 2L)

    // DROP COLUMNS with one refused name must leave the table UNTOUCHED
    val inc = Seq((1L, "x", 9L)).toDF("k", "v", "n")
    VersionedTable.load(lib, "p8", inc, upsertFields = Seq("k"))
    val vPre = VersionedTable.currentVersion(lib, "p8").get
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p8 DROP COLUMNS (v, k)") // k is a key
    }
    assert(VersionedTable.currentVersion(lib, "p8").contains(vPre),
      "a refused multi-drop must commit nothing")
    assert(spark.sql("SELECT v FROM gtp.default.p8").count() == 1L)
    // the all-clean multi-drop is ONE commit
    spark.sql("ALTER TABLE gtp.default.p8 DROP COLUMNS (v, n)")
    assert(VersionedTable.currentVersion(lib, "p8").contains(vPre + 1))
    assert(spark.sql("SELECT * FROM gtp.default.p8").columns.toSeq == Seq("k"))

    // SET TBLPROPERTIES('check') gets the full eager discipline
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.default.p8 SET TBLPROPERTIES " +
        "('check' = 'rand() < 0.5')")
    }
    // and the internal spelling refuses at CREATE (unvalidated smuggle)
    intercept[Exception] {
      spark.sql("CREATE TABLE gtp.default.p9 (k BIGINT) " +
        "TBLPROPERTIES ('check_constraint' = 'nope > 0')")
    }
  }

  test("ALTER COLUMN COMMENT is a metadata-only commit surfacing in DESCRIBE") {
    spark.sql("CREATE TABLE gtp.default.p6 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gtp.default.p6 VALUES (1, 'a')")
    val pre = VersionedTable.files(lib, "p6",
      VersionedTable.currentVersion(lib, "p6").get).toSet
    spark.sql("ALTER TABLE gtp.default.p6 ALTER COLUMN v COMMENT 'the label'")
    val v = VersionedTable.currentVersion(lib, "p6").get
    assert(VersionedTable.files(lib, "p6", v).toSet == pre,
      "a column comment must not rewrite data")
    val desc = spark.sql("DESCRIBE TABLE gtp.default.p6")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(desc.get("v").contains("the label"), s"got $desc")
    assert(spark.sql("SELECT v FROM gtp.default.p6").count() == 1L)
  }

  test("constraints surface on the table; library sees the conjunction") {
    spark.sql("CREATE TABLE gtp.default.p5 (k BIGINT, n BIGINT)")
    spark.sql("ALTER TABLE gtp.default.p5 ADD CONSTRAINT a CHECK (n >= 0)")
    spark.sql("ALTER TABLE gtp.default.p5 ADD CONSTRAINT b CHECK (k > 0)")
    // the LIBRARY load path enforces named constraints too (one gate)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.load(lib, "p5", Seq((0L, 1L)).toDF("k", "n"))
    }
    assert(e.getMessage.contains("CHECK constraint"), e.getMessage)
    VersionedTable.load(lib, "p5", Seq((1L, 1L)).toDF("k", "n"))
    assert(spark.sql("SELECT count(*) FROM gtp.default.p5").head().getLong(0) == 1L)
  }
}
