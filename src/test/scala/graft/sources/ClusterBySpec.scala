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

  test("zorder layout: the SECOND clustered column prunes too") {
    // two independent uniform dimensions — a lexicographic range on
    // (x, y) gives y no file-level locality at all; the Morton curve
    // gives both dimensions ~sqrt locality
    spark.sql("CREATE TABLE gcby.default.z (x BIGINT, y BIGINT, v DOUBLE) " +
      "CLUSTER BY (x, y) TBLPROPERTIES ('cluster.layout' = 'zorder')")
    spark.sql("INSERT INTO gcby.default.z " +
      "SELECT (id * 37) % 4096, (id * 101) % 4096, id * 1.0 " +
      "FROM range(0, 40000)")
    val v = VersionedTable.currentVersion(lib, "z").get
    val all = VersionedTable.files(lib, "z", v)
    assert(all.size >= 3, s"need several files to measure pruning: $all")
    val skipY = VersionedTable.skippedFiles(lib, "z", v, col("y") < 1024L)
    assert(skipY.nonEmpty,
      s"zorder must give the second clustered column file-level " +
        s"locality: 0/${all.size} skipped for y < 1024")
    val skipX = VersionedTable.skippedFiles(lib, "z", v, col("x") < 1024L)
    assert(skipX.nonEmpty, "first column must keep pruning too")
    // content exact under the curve layout
    assert(spark.sql("SELECT count(*) FROM gcby.default.z").head().getLong(0)
      == 40000L)
    assert(spark.sql(
      "SELECT count(*) FROM gcby.default.z WHERE x < 1024 AND y < 1024")
      .head().getLong(0) ==
      spark.range(0, 40000).selectExpr(
        "(id * 37) % 4096 AS x", "(id * 101) % 4096 AS y")
        .where("x < 1024 AND y < 1024").count())
    // compaction preserves the curve: still prunable on y afterwards
    spark.sql("INSERT INTO gcby.default.z " +
      "SELECT (id * 37) % 4096, (id * 101) % 4096, id * 1.0 " +
      "FROM range(40000, 44000)")
    spark.sql(s"CALL gcby.system.compact('z', ${64L * 1024 * 1024})")
    val v2 = VersionedTable.currentVersion(lib, "z").get
    val all2 = VersionedTable.files(lib, "z", v2)
    if (all2.size >= 3)
      assert(VersionedTable.skippedFiles(lib, "z", v2, col("y") < 1024L)
        .nonEmpty, "compaction must compact along the z-curve")
    assert(spark.sql("SELECT count(*) FROM gcby.default.z").head().getLong(0)
      == 44000L)
  }

  test("zorder layout guards: needs >= 2 columns, supported types") {
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gcby.default.z1 (x BIGINT, v DOUBLE) " +
        "CLUSTER BY (x) TBLPROPERTIES ('cluster.layout' = 'zorder')"))
    assert(e1.getMessage.contains(">= 2"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE gcby.default.z2 (x BIGINT, b BOOLEAN, v DOUBLE) " +
        "CLUSTER BY (x, b) TBLPROPERTIES ('cluster.layout' = 'zorder')"))
    assert(e2.getMessage.contains("numeric or string"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE gcby.default.z3 (x BIGINT, y BIGINT) " +
        "CLUSTER BY (x, y) TBLPROPERTIES ('cluster.layout' = 'hilbert')"))
    assert(e3.getMessage.contains("'range' or 'zorder'"), e3.getMessage)
    // ALTER re-point onto zorder validates against the declaration too
    spark.sql("CREATE TABLE gcby.default.z4 (x BIGINT, v DOUBLE) CLUSTER BY (x)")
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE gcby.default.z4 SET TBLPROPERTIES ('cluster.layout' = 'zorder')"))
    assert(e4.getMessage.contains(">= 2"), e4.getMessage)
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
