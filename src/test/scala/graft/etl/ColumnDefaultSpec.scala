package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** COLUMN DEFAULT VALUES (F55): `ALTER TABLE ADD COLUMN ... DEFAULT v`
  * stays a METADATA-ONLY commit — the default freezes as the field's
  * EXISTS_DEFAULT metadata in the recorded schema and Spark's own
  * parquet readers fill it for files physically lacking the column,
  * while post-ADD writes materialize the column (the loader always
  * writes the full recorded schema). CURRENT_DEFAULT drives future
  * INSERTs and re-points via SET/DROP DEFAULT without touching history. */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("cdef")
  spark.conf.set("spark.sql.catalog.gcd",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcd.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def files(t: String): Seq[String] = {
    val v = VersionedTable.currentVersion(lib, t).get
    VersionedTable.readManifest(lib, t, v).get.files
  }

  test("ADD COLUMN DEFAULT is metadata-only; pre-ADD rows read the default") {
    spark.sql("CREATE TABLE gcd.default.d1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcd.default.d1 VALUES (1, 'a'), (2, 'b')")
    val before = files("d1")
    val vPre = VersionedTable.currentVersion(lib, "d1").get

    spark.sql("ALTER TABLE gcd.default.d1 ADD COLUMN n BIGINT DEFAULT 42")
    assert(files("d1") == before,
      "ADD COLUMN DEFAULT must carry every data file VERBATIM")

    // pre-ADD rows fill the frozen default — SQL and library reads agree
    assert(spark.sql("SELECT k, n FROM gcd.default.d1 ORDER BY k")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 42L), (2L, 42L)))
    assert(VersionedTable.read(lib, "d1").select("k", "n")
      .as[(Long, Long)].collect().sorted.toSeq == Seq((1L, 42L), (2L, 42L)))

    // post-ADD rows materialize physically: explicit value, omitted
    // column (CURRENT_DEFAULT), the DEFAULT keyword, and explicit NULL
    spark.sql("INSERT INTO gcd.default.d1 VALUES (3, 'c', 7)")
    spark.sql("INSERT INTO gcd.default.d1 (k, v) VALUES (4, 'd')")
    spark.sql("INSERT INTO gcd.default.d1 VALUES (5, 'e', DEFAULT)")
    spark.sql("INSERT INTO gcd.default.d1 VALUES (6, 'f', NULL)")
    val got = spark.sql("SELECT k, n FROM gcd.default.d1 ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq((1L, 42L), (2L, 42L), (3L, 7L), (4L, 42L),
      (5L, 42L), (6L, -1L)),
      s"explicit NULL must stay NULL and omissions must default: $got")

    // filters and aggregates are exact over the mixed eras (the
    // manifest's aggregate answers DECLINE for the defaulted column —
    // old files record no stats for it — so the scan answers)
    assert(spark.sql("SELECT count(*) FROM gcd.default.d1 WHERE n = 42")
      .head().getLong(0) == 4L)
    assert(spark.sql("SELECT count(*) FROM gcd.default.d1 WHERE n IS NULL")
      .head().getLong(0) == 1L)
    val agg = spark.sql(
      "SELECT count(n), min(n), max(n) FROM gcd.default.d1").head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == ((5L, 7L, 42L)))

    // time travel: the pre-ADD version has no such column
    assert(!spark.sql(s"SELECT * FROM gcd.default.d1 VERSION AS OF $vPre")
      .columns.contains("n"))
  }

  test("CREATE TABLE with DEFAULT drives omitted-column INSERTs") {
    spark.sql("CREATE TABLE gcd.default.d2 " +
      "(k BIGINT, tag STRING DEFAULT 'none')")
    spark.sql("INSERT INTO gcd.default.d2 (k) VALUES (1)")
    spark.sql("INSERT INTO gcd.default.d2 VALUES (2, 'real')")
    assert(spark.sql("SELECT k, tag FROM gcd.default.d2 ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "none"), (2L, "real")))
  }

  test("SET DEFAULT re-points future inserts only; EXISTS stays frozen") {
    spark.sql("CREATE TABLE gcd.default.d3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcd.default.d3 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gcd.default.d3 ADD COLUMN n BIGINT DEFAULT 42")
    spark.sql("INSERT INTO gcd.default.d3 (k, v) VALUES (2, 'b')") // 42
    spark.sql("ALTER TABLE gcd.default.d3 ALTER COLUMN n SET DEFAULT 7")
    spark.sql("INSERT INTO gcd.default.d3 (k, v) VALUES (3, 'c')") // 7
    // the pre-ADD row STILL reads the frozen 42 — SET DEFAULT must not
    // rewrite history
    assert(spark.sql("SELECT k, n FROM gcd.default.d3 ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((1L, 42L), (2L, 42L), (3L, 7L)))
    spark.sql("ALTER TABLE gcd.default.d3 ALTER COLUMN n DROP DEFAULT")
    spark.sql("INSERT INTO gcd.default.d3 (k, v) VALUES (4, 'd')")
    assert(spark.sql("SELECT n FROM gcd.default.d3 WHERE k = 4")
      .head().isNullAt(0), "a dropped default leaves omissions NULL")
    // and the frozen existence default STILL serves the pre-ADD row
    assert(spark.sql("SELECT n FROM gcd.default.d3 WHERE k = 1")
      .head().getLong(0) == 42L)
  }

  test("SET DEFAULT refuses non-constant / unresolvable expressions at ALTER time") {
    spark.sql("CREATE TABLE gcd.default.d6 (k BIGINT, n BIGINT)")
    spark.sql("INSERT INTO gcd.default.d6 VALUES (1, 2)")
    val vPre = VersionedTable.currentVersion(lib, "d6").get
    // non-deterministic: rand() would hand every INSERT a different
    // "default" — refused eagerly, not at the next INSERT's analysis
    intercept[Exception] {
      VersionedTable.setColumnDefault(lib, "d6", "n", "cast(rand() * 10 as bigint)")
    }
    // a column reference is not a constant — same eager refusal
    intercept[Exception] {
      VersionedTable.setColumnDefault(lib, "d6", "n", "k + 1")
    }
    // unparseable text refuses too
    intercept[Exception] {
      VersionedTable.setColumnDefault(lib, "d6", "n", "not ) sql (")
    }
    assert(VersionedTable.currentVersion(lib, "d6").contains(vPre),
      "a refused SET DEFAULT must commit nothing")
    // a constant EXPRESSION (not just a literal) is fine and drives inserts
    VersionedTable.setColumnDefault(lib, "d6", "n", "10 + 32")
    spark.sql("INSERT INTO gcd.default.d6 (k) VALUES (2)")
    assert(spark.sql("SELECT n FROM gcd.default.d6 WHERE k = 2")
      .head().getLong(0) == 42L)
  }

  test("defaults survive a rename of the defaulted column (mapping composes)") {
    spark.sql("CREATE TABLE gcd.default.d4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gcd.default.d4 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gcd.default.d4 ADD COLUMN n BIGINT DEFAULT 9")
    spark.sql("ALTER TABLE gcd.default.d4 RENAME COLUMN n TO m")
    assert(spark.sql("SELECT m FROM gcd.default.d4 WHERE k = 1")
      .head().getLong(0) == 9L,
      "the EXISTS_DEFAULT must ride the rename (metadata preserved)")
    spark.sql("INSERT INTO gcd.default.d4 (k, v) VALUES (2, 'b')")
    assert(spark.sql("SELECT m FROM gcd.default.d4 WHERE k = 2")
      .head().getLong(0) == 9L,
      "the CURRENT_DEFAULT must ride the rename too")
  }

  test("change feed aligns pre-ADD rows with the frozen default, not null") {
    val inc = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    VersionedTable.load(lib, "d5", inc, upsertFields = Seq("k"))
    val v1 = VersionedTable.currentVersion(lib, "d5").get
    spark.conf.set("spark.sql.catalog.gcd.dir", warehouse)
    spark.sql("ALTER TABLE gcd.default.d5 ADD COLUMN n BIGINT DEFAULT 42")
    // rewrite k=1 (update), add k=3 (insert) — k=2's files change too
    // (flat CoW rewrites the table), but its defaulted value is the same
    VersionedTable.load(lib, "d5",
      Seq((1L, "A", 42L), (3L, "c", 5L)).toDF("k", "v", "n"),
      upsertFields = Seq("k"))
    val v3 = VersionedTable.currentVersion(lib, "d5").get
    val feed = VersionedTable.changes(lib, "d5", v1, v3, Seq("k"))
    val ops = feed.select("op", "k").as[(String, Long)].collect()
      .map(_.swap).toMap
    assert(ops(1L) == "update" && ops(3L) == "insert")
    assert(!ops.contains(2L),
      "a row whose defaulted value didn't change must NOT surface as an " +
        s"update (old side must align with the frozen default): $ops")
  }
}
