package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** `remove_orphan_files`: reclaim data-dir files referenced by NO
  * retained version (crashed commits' staged batches) while keeping
  * EVERY version readable — vacuum's sweep with the full keep set. */
class OrphanFilesSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gorph")
  spark.conf.set("spark.sql.catalog.gorph",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gorph.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("orphans reclaim; every version stays readable; dry_run only reports") {
    VersionedTable.load(lib, "t", Seq((1L, "a")).toDF("k", "v"))
    VersionedTable.load(lib, "t", Seq((2L, "b")).toDF("k", "v"))
    // plant an orphan where a crashed commit would leave one
    val dataDir = new java.io.File(s"$warehouse/t.__vdata")
    val orphan = new java.io.File(dataDir, "batch-dead/part-orphan.parquet")
    orphan.getParentFile.mkdirs()
    Seq((99L, "zz")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(orphan.getParent)
    val planted = dataDir.listFiles().count(_.getName.startsWith("batch-dead"))
    assert(planted == 1)
    // the GRACE WINDOW: with the default 24h cutoff a freshly-written
    // unreferenced file is indistinguishable from a concurrent writer's
    // staged batch — it must NOT reclaim
    assert(spark.sql("CALL gorph.system.remove_orphan_files('t')")
      .head().getInt(0) == 0, "a young unreferenced file must survive " +
      "the default grace window")
    assert(new java.io.File(orphan.getParent).exists())
    // an explicit future cutoff (the operator asserting the table is
    // quiet): dry_run reports without deleting
    val cut = (System.currentTimeMillis() + 60000).toString
    val wouldGo = spark.sql(
      s"CALL gorph.system.remove_orphan_files('t', true, '$cut')")
      .head().getInt(0)
    assert(wouldGo >= 1, s"dry_run must count the orphan: $wouldGo")
    assert(new java.io.File(orphan.getParent).exists())
    // the real sweep reclaims it and keeps both versions readable
    val gone = spark.sql(
      s"CALL gorph.system.remove_orphan_files('t', false, '$cut')")
      .head().getInt(0)
    assert(gone == wouldGo, s"sweep must match the dry run: $gone vs $wouldGo")
    assert(VersionedTable.versions(lib, "t") == Seq(1L, 2L))
    assert(VersionedTable.readVersion(lib, "t", 1L).count() == 1L)
    assert(VersionedTable.readVersion(lib, "t", 2L).count() == 2L)
  }
}
