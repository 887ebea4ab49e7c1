package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, Loader, VersionedTable}
import org.apache.spark.sql.functions._

/** `INSERT OVERWRITE` as a SAME-SCHEMA versioned content replace (F60):
  * one commit swaps the rows while the declaration carries — CHECK
  * constraints gate the staged bytes, the bucket layout re-buckets the
  * new rows, column mapping keeps writing stable physical names — and
  * HISTORY SURVIVES (time travel and rollback cross the overwrite).
  * Previously refused outright; the versioned-native implementation is
  * strictly better than the refusal. */
class InsertOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gover")
  spark.conf.set("spark.sql.catalog.gio",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gio.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("INSERT OVERWRITE swaps rows in one commit; history survives") {
    spark.sql("CREATE TABLE gio.default.t1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gio.default.t1 VALUES (1, 'a'), (2, 'b')")
    val vPre = VersionedTable.currentVersion(lib, "t1").get
    val preMaxId = VersionedTable.read(lib, "t1")
      .agg(max(col(Loader.IdCol))).head().getLong(0)

    spark.sql("INSERT OVERWRITE gio.default.t1 VALUES (10, 'x'), (11, 'y'), (12, 'z')")
    assert(spark.sql("SELECT k FROM gio.default.t1 ORDER BY k")
      .as[Long].collect().toSeq == Seq(10L, 11L, 12L))
    assert(VersionedTable.currentVersion(lib, "t1").contains(vPre + 1),
      "the overwrite must land as ONE versioned commit")
    assert(spark.sql(s"SELECT k FROM gio.default.t1 VERSION AS OF $vPre")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "time travel must cross the overwrite")
    // monotone ids: the overwrite's rows take ids above the old floor
    val postMin = VersionedTable.read(lib, "t1")
      .agg(min(col(Loader.IdCol))).head().getLong(0)
    assert(postMin > preMaxId)
    // an empty overwrite leaves a readable empty table
    spark.sql("INSERT OVERWRITE gio.default.t1 SELECT k, v FROM gio.default.t1 WHERE k < 0")
    assert(spark.sql("SELECT count(*) FROM gio.default.t1").head().getLong(0) == 0L)
    assert(spark.sql("SELECT * FROM gio.default.t1").columns.toSeq == Seq("k", "v"))
  }

  test("the declaration carries: CHECK gates it, bucket layout re-buckets") {
    // bucketed keyed table with a constraint, built through the library
    VersionedTable.load(lib, "t2",
      Seq((1L, 5L), (2L, 6L)).toDF("k", "n"),
      upsertFields = Seq("k"), bucketBy = Some((Seq("k"), 4)),
      extraProps = Map(VersionedTable.CheckConstraintProp -> "n >= 0"))
    val vPre = VersionedTable.currentVersion(lib, "t2").get
    // violating overwrite refuses; the old head is untouched
    intercept[Exception] {
      spark.sql("INSERT OVERWRITE gio.default.t2 VALUES (3, -1)")
    }
    assert(VersionedTable.currentVersion(lib, "t2").contains(vPre))
    assert(spark.sql("SELECT count(*) FROM gio.default.t2").head().getLong(0) == 2L)
    // a clean overwrite keeps the BUCKET layout: the new files land in
    // bucket directories and the bucket-pruned lookup still works
    spark.sql("INSERT OVERWRITE gio.default.t2 VALUES (7, 70), (8, 80)")
    val v = VersionedTable.currentVersion(lib, "t2").get
    val rel = VersionedTable.files(lib, "t2", v)
    assert(rel.forall(_.contains("__gbucket=")),
      s"overwrite must re-bucket through the recorded layout: $rel")
    assert(VersionedTable.lookup(lib, "t2", v, Map("k" -> 7L))
      .select("n").as[Long].head() == 70L)
    // and a keyed upsert on the overwritten table still merges
    VersionedTable.load(lib, "t2", Seq((7L, 71L)).toDF("k", "n"),
      upsertFields = Seq("k"))
    assert(VersionedTable.read(lib, "t2").select("k", "n").as[(Long, Long)]
      .collect().sorted.toSeq == Seq((7L, 71L), (8L, 80L)))
  }

  test("overwrite re-adding a dropped name commits the fresh physical mapping") {
    spark.sql("CREATE TABLE gio.default.t4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gio.default.t4 VALUES (1, 'old')")
    spark.sql("ALTER TABLE gio.default.t4 DROP COLUMN v")
    // the path-based acceptAnySchema writer in overwrite mode can
    // re-introduce the retired NAME; its data must land under a fresh
    // physical name that the commit RECORDS — a manifest missing the
    // mapping entry would read the column as NULL forever
    Seq((2L, "new")).toDF("k", "v").write.format("graft")
      .mode("overwrite").option("dir", warehouse).option("table", "t4").save()
    assert(VersionedTable.read(lib, "t4").select("k", "v")
      .as[(Long, String)].collect().toSeq == Seq((2L, "new")),
      "the re-added column's bytes must be reachable at head")
    assert(spark.sql("SELECT v FROM gio.default.t4").as[String]
      .collect().toSeq == Seq("new"))
    val v = VersionedTable.currentVersion(lib, "t4").get
    val raw = spark.read.parquet(VersionedTable.files(lib, "t4", v).head)
    assert(!raw.columns.contains("v"),
      s"the file must carry a FRESH physical (not the retired 'v'): ${raw.columns.toSeq}")
  }

  test("overwrite on a renamed table keeps physical names stable") {
    spark.sql("CREATE TABLE gio.default.t3 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gio.default.t3 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gio.default.t3 RENAME COLUMN v TO label")
    spark.sql("INSERT OVERWRITE gio.default.t3 VALUES (2, 'B')")
    assert(spark.sql("SELECT label FROM gio.default.t3").as[String]
      .collect().toSeq == Seq("B"))
    val v = VersionedTable.currentVersion(lib, "t3").get
    // files() returns absolute paths — read the committed file raw
    val raw = spark.read.parquet(VersionedTable.files(lib, "t3", v).head)
    assert(raw.columns.contains("v") && !raw.columns.contains("label"),
      s"overwrite files must carry the stable PHYSICAL name: ${raw.columns.toSeq}")
  }
}
