package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCOPED compaction (`OPTIMIZE ... WHERE`): only files whose zone maps
  * admit the predicate are rewrite candidates — out-of-scope files carry
  * VERBATIM — so maintaining one hot partition is O(that partition) on a
  * table of any size. */
class ScopedCompactSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gscmp")
  spark.conf.set("spark.sql.catalog.gscmp",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gscmp.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("WHERE scopes the rewrite; out-of-scope files carry verbatim") {
    // two 'partitions' (p = 1 | 2), several micro-appends each — files
    // per append, ranges disjoint by p through the identity transform
    val spec = Map(VersionedTable.PartitionSpecProp ->
      VersionedTable.partSpecJson(Seq(
        VersionedTable.PartTransform("identity", "p"))))
    for (i <- 0 until 4; p <- Seq(1L, 2L))
      VersionedTable.load(lib, "t",
        Seq.tabulate(50)(j => (p, i * 100L + j)).toDF("p", "v"),
        extraProps = if (i == 0 && p == 1) spec else Map.empty)
    val v0 = VersionedTable.currentVersion(lib, "t").get
    val before = VersionedTable.files(lib, "t", v0)
    val p2Before = before.filter(f =>
      VersionedTable.skippedFiles(lib, "t", v0, col("p") === 1L).contains(f))
    assert(p2Before.nonEmpty, "p=2 files must be provably out of scope")
    // scoped compact: only p=1 candidates rewrite
    spark.sql("CALL gscmp.system.compact('t', 134217728, 'p = 1')")
    val v1 = VersionedTable.currentVersion(lib, "t").get
    assert(v1 == v0 + 1)
    val after = VersionedTable.files(lib, "t", v1)
    // every provably-p=2 file carried verbatim
    assert(p2Before.forall(after.contains),
      "out-of-scope files must carry verbatim")
    // the p=1 side actually compacted: strictly fewer files overall
    assert(after.size < before.size,
      s"scoped compaction must merge in-scope files: ${after.size}/${before.size}")
    // content exact, both partitions
    assert(VersionedTable.read(lib, "t").count() == 400L)
    assert(VersionedTable.readWhere(lib, "t", col("p") === 1L).count() == 200L)
    // fixed point: a second scoped run commits nothing new
    spark.sql("CALL gscmp.system.compact('t', 134217728, 'p = 1')")
    assert(VersionedTable.currentVersion(lib, "t").get == v1,
      "scoped compaction must reach a fixed point")
    // the unscoped procedure form still works (default empty scope)
    spark.sql("CALL gscmp.system.compact('t', 134217728)")
    assert(VersionedTable.read(lib, "t").count() == 400L)
  }

  test("a scope outside the zone-map algebra refuses, never widens") {
    for (i <- 0 until 3)
      VersionedTable.load(lib, "u",
        Seq.tabulate(20)(j => (i * 100L + j, s"r$j")).toDF("k", "v"))
    // analyzes fine against the recorded schema, but `%` exports no
    // zone predicate — admitting every file would be the silent
    // O(table) rewrite the scope exists to avoid
    val e = intercept[Exception](
      spark.sql("CALL gscmp.system.compact('u', 134217728, 'k % 2 = 0')"))
    assert(e.getMessage.contains("zone-map algebra"), e.getMessage)
    // nothing committed
    assert(VersionedTable.currentVersion(lib, "u").contains(3L))
  }
}
