package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** NAMED BRANCHES: ergonomic sugar over the clone + fast_forward
  * write-audit-publish cycle — `create_branch` zero-copy clones the
  * head under a name, `VERSION AS OF '<name>'` reads the branch's LIVE
  * head on both surfaces, writes target the branch table, and
  * `fast_forward(table, name)` publishes. Tags and branches share one
  * ref namespace (collisions refuse both ways). */
class BranchSpec extends SparkSpec {

  private val warehouse = tmpDir("gbr")
  spark.conf.set("spark.sql.catalog.gbr",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gbr.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("create/read/write/publish: the full WAP cycle by one name") {
    spark.sql("CREATE TABLE gbr.default.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gbr.default.t VALUES (1, 'a'), (2, 'b')")
    val bt = spark.sql("CALL gbr.system.create_branch('t', 'dev')")
      .head().getString(0)
    assert(bt == "t__branch_dev", bt)
    // audit writes land on the BRANCH; the source is untouched
    spark.sql(s"INSERT INTO gbr.default.$bt VALUES (3, 'c')")
    spark.sql(s"DELETE FROM gbr.default.$bt WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gbr.default.t")
      .head().getLong(0) == 2L)
    // VERSION AS OF 'dev' reads the branch's LIVE head — SQL surface
    assert(spark.sql(
      "SELECT count(*) FROM gbr.default.t VERSION AS OF 'dev'")
      .head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT v FROM gbr.default.t VERSION AS OF 'dev' WHERE k = 3")
      .head().getString(0) == "c")
    // reader-option surface resolves the same ref
    assert(spark.read.format("graft")
      .option("dir", warehouse).option("table", "t")
      .option("versionAsOf", "dev").load()
      .where("k = 3").count() == 1L)
    // listing reports (name, branch_table, created_at)
    val rows = spark.sql("CALL gbr.system.branches('t')").collect()
    assert(rows.length == 1 && rows.head.getString(0) == "dev" &&
      rows.head.getString(1) == bt)
    // publish by the branch NAME — one metadata commit
    spark.sql("CALL gbr.system.fast_forward('t', 'dev')")
    val after = spark.sql(
      "SELECT k, v FROM gbr.default.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq((2L, "b"), (3L, "c")), after.toString)
  }

  test("refusals: duplicate branch, tag/branch collisions, unknown ref") {
    spark.sql("CREATE TABLE gbr.default.r (k BIGINT)")
    spark.sql("INSERT INTO gbr.default.r VALUES (1)")
    spark.sql("CALL gbr.system.create_branch('r', 'dev')")
    val e1 = intercept[Exception](spark.sql(
      "CALL gbr.system.create_branch('r', 'dev')"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // a branch name cannot become a tag, and vice versa
    val e2 = intercept[Exception](spark.sql(
      "CALL gbr.system.create_tag('r', 'dev', 2)"))
    assert(e2.getMessage.contains("share the ref namespace"), e2.getMessage)
    spark.sql("CALL gbr.system.create_tag('r', 'pinned', 2)")
    val e3 = intercept[Exception](spark.sql(
      "CALL gbr.system.create_branch('r', 'pinned')"))
    assert(e3.getMessage.contains("share the ref namespace"), e3.getMessage)
    // unknown refs list both kinds
    val e4 = intercept[Exception](spark.sql(
      "SELECT * FROM gbr.default.r VERSION AS OF 'nope'"))
    assert(e4.getMessage.contains("branches: dev"), e4.getMessage)
    // drop_branch releases the ref; the branch table remains
    assert(spark.sql("CALL gbr.system.drop_branch('r', 'dev')")
      .head().getBoolean(0))
    intercept[Exception](spark.sql(
      "SELECT * FROM gbr.default.r VERSION AS OF 'dev'"))
    assert(spark.sql("SELECT count(*) FROM gbr.default.r__branch_dev")
      .head().getLong(0) == 1L)
  }

  test("a stale publish refuses; tags still resolve beside branches") {
    spark.sql("CREATE TABLE gbr.default.s (k BIGINT)")
    spark.sql("INSERT INTO gbr.default.s VALUES (1)")
    spark.sql("CALL gbr.system.create_branch('s', 'wip')")
    spark.sql("INSERT INTO gbr.default.s__branch_wip VALUES (2)")
    // the SOURCE advances after the clone point → publish refuses
    spark.sql("INSERT INTO gbr.default.s VALUES (9)")
    val e = intercept[Exception](spark.sql(
      "CALL gbr.system.fast_forward('s', 'wip')"))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // tags keep resolving to versions of THIS table
    spark.sql("CALL gbr.system.create_tag('s', 'before', 2)")
    assert(spark.sql(
      "SELECT count(*) FROM gbr.default.s VERSION AS OF 'before'")
      .head().getLong(0) == 1L)
    assert(spark.sql(
      "SELECT count(*) FROM gbr.default.s VERSION AS OF 'wip'")
      .head().getLong(0) == 2L)
  }
}
