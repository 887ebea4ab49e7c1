package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** Row-level ops with SUBQUERY conditions: a `DELETE ... WHERE k IN
  * (SELECT ...)` / `UPDATE ... WHERE EXISTS (...)` can't travel the
  * pushed-filter metadata-delete path — Spark routes them through the
  * row-level operation rewrites (a join against the subquery), which
  * the engine's group-based and delta-based ops both serve. */
class RowLevelSubquerySpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gsubq")
  spark.conf.set("spark.sql.catalog.gsubq",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gsubq.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("CoW: DELETE IN-subquery and UPDATE EXISTS") {
    spark.sql("CREATE TABLE gsubq.default.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gsubq.default.t SELECT id, id * 1.0 FROM range(0, 100)")
    Seq(3L, 5L, 7L).toDF("bad").createOrReplaceTempView("denylist")
    spark.sql(
      "DELETE FROM gsubq.default.t WHERE k IN (SELECT bad FROM denylist)")
    assert(spark.sql("SELECT count(*) FROM gsubq.default.t")
      .head().getLong(0) == 97L)
    assert(spark.sql(
      "SELECT count(*) FROM gsubq.default.t WHERE k IN (3, 5, 7)")
      .head().getLong(0) == 0L)
    Seq(10L, 11L).toDF("hot").createOrReplaceTempView("hotlist")
    spark.sql("UPDATE gsubq.default.t SET v = -1.0 " +
      "WHERE EXISTS (SELECT 1 FROM hotlist WHERE hot = k)")
    assert(spark.sql("SELECT count(*) FROM gsubq.default.t WHERE v = -1.0")
      .head().getLong(0) == 2L)
    // history: both statements were versioned commits
    assert(VersionedTable.versions(lib, "t").size == 4)
  }

  test("MOR: DELETE IN-subquery commits deletion vectors") {
    spark.sql("CREATE TABLE gsubq.default.m (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gsubq.default.m SELECT id, id * 1.0 FROM range(0, 100)")
    val preFiles = VersionedTable.files(lib, "m",
      VersionedTable.currentVersion(lib, "m").get).toSet
    Seq(1L, 2L).toDF("bad").createOrReplaceTempView("denylist_m")
    spark.sql(
      "DELETE FROM gsubq.default.m WHERE k IN (SELECT bad FROM denylist_m)")
    val v = VersionedTable.currentVersion(lib, "m").get
    assert(VersionedTable.files(lib, "m", v).toSet == preFiles,
      "MOR subquery delete must carry every data file verbatim")
    assert(VersionedTable.deletionVectors(lib, "m", v).nonEmpty,
      "the delete must commit deletion vectors")
    assert(spark.sql("SELECT count(*) FROM gsubq.default.m")
      .head().getLong(0) == 98L)
  }
}
