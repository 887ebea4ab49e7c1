package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** WRITE-AUDIT-PUBLISH over zero-copy clones: `clone` stages a branch,
  * writes land and are audited there, `fast_forward` publishes the
  * branch's head back onto the source as ONE metadata commit — refused
  * if the source advanced (git's fast-forward rule), with the branch's
  * files ownership-guarded afterwards (the clone guard, reversed). */
class WapSpec extends SparkSpec {

  private val warehouse = tmpDir("gwap")
  spark.conf.set("spark.sql.catalog.gwap",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gwap.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("the WAP cycle: clone, write, audit, fast-forward publish") {
    spark.sql("CREATE TABLE gwap.default.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gwap.default.t SELECT id, id * 1.0 FROM range(0, 100)")
    val srcV = VersionedTable.currentVersion(lib, "t").get
    spark.sql(s"CALL gwap.system.clone('t', 't_dev', $srcV)")
    // stage writes on the branch — the source is untouched
    spark.sql("INSERT INTO gwap.default.t_dev SELECT id, id * 1.0 FROM range(100, 150)")
    spark.sql("DELETE FROM gwap.default.t_dev WHERE k < 10")
    spark.sql("UPDATE gwap.default.t_dev SET v = -1.0 WHERE k = 50")
    assert(spark.sql("SELECT count(*) FROM gwap.default.t")
      .head().getLong(0) == 100L, "the source must be untouched pre-publish")
    // audit the branch, then publish
    assert(spark.sql("SELECT count(*) FROM gwap.default.t_dev")
      .head().getLong(0) == 140L)
    val committed = spark.sql("CALL gwap.system.fast_forward('t', 't_dev')")
      .head().getLong(0)
    assert(committed == srcV + 1, "one commit publishes the whole branch")
    // the source's head IS the branch state
    assert(spark.sql("SELECT count(*) FROM gwap.default.t")
      .head().getLong(0) == 140L)
    assert(spark.sql("SELECT v FROM gwap.default.t WHERE k = 50")
      .head().getDouble(0) == -1.0)
    assert(spark.sql("SELECT count(*) FROM gwap.default.t WHERE k < 10")
      .head().getLong(0) == 0L)
    // history survives: the pre-publish state still time-travels
    assert(spark.sql(
      s"SELECT count(*) FROM gwap.default.t VERSION AS OF $srcV")
      .head().getLong(0) == 100L)
    // a refused re-publish: the source advanced past the clone point
    val e = intercept[Exception](spark.sql(
      "CALL gwap.system.fast_forward('t', 't_dev')").collect())
    assert(e.getMessage.contains("advanced"), e.getMessage)
  }

  test("ownership after publish: branch DROP refuses, branch vacuum keeps") {
    spark.sql("CREATE TABLE gwap.default.s (k BIGINT)")
    spark.sql("INSERT INTO gwap.default.s VALUES (1), (2)")
    val v = VersionedTable.currentVersion(lib, "s").get
    spark.sql(s"CALL gwap.system.clone('s', 's_dev', $v)")
    spark.sql("INSERT INTO gwap.default.s_dev VALUES (3)")
    spark.sql("CALL gwap.system.fast_forward('s', 's_dev')")
    // the published files live in the branch's data dir: DROP refuses
    val e = intercept[Exception](spark.sql("DROP TABLE gwap.default.s_dev"))
    assert(e.getMessage.contains("clone"), e.getMessage)
    // branch vacuum treats the source's references as live
    VersionedTable.vacuum(lib, "s_dev", keepLast = 1)
    assert(spark.sql("SELECT count(*) FROM gwap.default.s")
      .head().getLong(0) == 3L, "published files must survive branch vacuum")
  }

  test("refusals: not-a-branch and wrong-source publishes") {
    spark.sql("CREATE TABLE gwap.default.a (k BIGINT)")
    spark.sql("INSERT INTO gwap.default.a VALUES (1)")
    spark.sql("CREATE TABLE gwap.default.b (k BIGINT)")
    spark.sql("INSERT INTO gwap.default.b VALUES (2)")
    // b is not a clone of a
    val e1 = intercept[Exception](spark.sql(
      "CALL gwap.system.fast_forward('a', 'b')").collect())
    assert(e1.getMessage.contains("not a clone"), e1.getMessage)
    // a clone of b cannot publish onto a
    spark.sql("CALL gwap.system.clone('b', 'b_dev', 2)")
    val e2 = intercept[Exception](spark.sql(
      "CALL gwap.system.fast_forward('a', 'b_dev')").collect())
    assert(e2.getMessage.contains("not a clone"), e2.getMessage)
  }
}
