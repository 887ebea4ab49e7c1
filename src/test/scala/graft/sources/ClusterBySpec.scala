package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._

/** `CLUSTER BY (cols)` DDL — Delta's liquid-clustering shape expanded
  * onto the identity-transform range-cluster layout: every write
  * arranges files on the declared columns so zone maps prune, the
  * declaration reports back as ONE ClusterByTransform, and `ALTER TABLE
  * ... CLUSTER BY` re-points it metadata-only (old files stay exactly
  * as prunable; only later writes re-arrange). */
class ClusterBySpec extends SparkSpec {

  private val warehouse = tmpDir("gcby")
  spark.conf.set("spark.sql.catalog.gcby",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcby.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("writes cluster on the declared columns; zone maps prune") {
    spark.sql(
      "CREATE TABLE gcby.default.t (k BIGINT, v DOUBLE) CLUSTER BY (k)")
    // unsorted insert — the layout must still cluster it
    spark.sql("INSERT INTO gcby.default.t " +
      "SELECT (id * 37) % 20000, id * 1.5 FROM range(0, 20000)")
    val v = VersionedTable.currentVersion(lib, "t").get
    val all = VersionedTable.files(lib, "t", v)
    val skipped = VersionedTable.skippedFiles(lib, "t", v, col("k") >= 15000L)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"clustered layout must make zone maps prune: ${skipped.size}/${all.size}")
    assert(spark.sql(
      "SELECT count(*) FROM gcby.default.t WHERE k >= 15000").head().getLong(0)
      == spark.sql("SELECT count(*) FROM gcby.default.t").head().getLong(0) / 4)
  }

  test("the declaration reports back as CLUSTER BY, and guards hold") {
    spark.sql(
      "CREATE TABLE gcby.default.d (a BIGINT, b STRING, v DOUBLE) " +
        "CLUSTER BY (a, b)")
    val table = spark.sessionState.catalogManager.catalog("gcby")
      .asInstanceOf[GraftCatalog].loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("default"), "d"))
    val parts = table.partitioning()
    assert(parts.length == 1 && parts.head.name() == "cluster_by",
      parts.mkString(","))
    assert(parts.head.references().map(_.fieldNames().head).toSeq ==
      Seq("a", "b"))
    // cluster columns join the rename/drop refusal matrix
    intercept[Exception](spark.sql(
      "ALTER TABLE gcby.default.d RENAME COLUMN a TO aa"))
    intercept[Exception](spark.sql(
      "ALTER TABLE gcby.default.d DROP COLUMN b"))
    // the marker prop is engine-owned
    intercept[Exception](spark.sql(
      "ALTER TABLE gcby.default.d SET TBLPROPERTIES ('cluster_by_cols'='v')"))
  }

  test("ALTER TABLE CLUSTER BY re-points metadata-only; NONE clears") {
    spark.sql(
      "CREATE TABLE gcby.default.e (k BIGINT, ts BIGINT, v DOUBLE) " +
        "CLUSTER BY (k)")
    spark.sql("INSERT INTO gcby.default.e " +
      "SELECT (id * 37) % 10000, id, id * 1.5 FROM range(0, 10000)")
    val v1 = VersionedTable.currentVersion(lib, "e").get
    val pre = VersionedTable.files(lib, "e", v1).toSet
    spark.sql("ALTER TABLE gcby.default.e CLUSTER BY (ts)")
    val v2 = VersionedTable.currentVersion(lib, "e").get
    assert(VersionedTable.files(lib, "e", v2).toSet == pre,
      "re-pointing CLUSTER BY must carry every file verbatim")
    // later writes arrange by the NEW columns
    spark.sql("INSERT INTO gcby.default.e " +
      "SELECT (id * 37) % 10000, 100000 + id, id * 1.5 FROM range(0, 10000)")
    val v3 = VersionedTable.currentVersion(lib, "e").get
    val skipped = VersionedTable.skippedFiles(lib, "e", v3,
      col("ts") >= 108000L)
    assert(skipped.nonEmpty, "post-ALTER writes must cluster on ts")
    // CLUSTER BY NONE drops the declaration: renames free up again
    spark.sql("ALTER TABLE gcby.default.e CLUSTER BY NONE")
    spark.sql("ALTER TABLE gcby.default.e RENAME COLUMN ts TO event_ts")
    assert(spark.sql("SELECT count(*) FROM gcby.default.e " +
      "WHERE event_ts >= 100000").head().getLong(0) == 10000L)
  }
}
