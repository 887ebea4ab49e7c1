package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AUTO-COMPACTION triggers (opt-in table props): after a load/DML
  * commit the writer inspects the new head and, when
  * `compact.trigger.small_files` or `compact.trigger.dv_bytes` is
  * crossed, runs ONE compaction commit — bounding how far micro-appends
  * or a year of MOR deletes can silently accrete. Unset props keep
  * compaction fully manual (every other suite exercises that default). */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gautoc")
  spark.conf.set("spark.sql.catalog.gac",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gac.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def files(t: String): Seq[String] = {
    val v = VersionedTable.currentVersion(lib, t).get
    VersionedTable.readManifest(lib, t, v).get.files
  }

  test("small-file trigger: micro-appends bin-pack; table diffs to nothing") {
    spark.sql("CREATE TABLE gac.default.t1 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('compact.trigger.small_files' = '7')")
    // five single-partition micro-appends (+ the CREATE's empty
    // schema-bearing file, itself small) stay under the threshold of 7
    (1 to 5).foreach(i => spark.sql(
      s"INSERT INTO gac.default.t1 SELECT /*+ REPARTITION(1) */ " +
        s"id + ${i * 100}, concat('v', id) FROM range(0, 10)"))
    val before = files("t1").size
    assert(before >= 5, s"micro-appends must accrete first: $before")
    val vPre = VersionedTable.currentVersion(lib, "t1").get
    // the sixth crosses the threshold: the load commits, then ONE
    // compaction commit bin-packs the small files
    spark.sql("INSERT INTO gac.default.t1 SELECT /*+ REPARTITION(1) */ " +
      "id + 600, concat('v', id) FROM range(0, 10)")
    val vPost = VersionedTable.currentVersion(lib, "t1").get
    assert(vPost == vPre + 2,
      s"load + auto-compaction must be two commits (v$vPre -> v$vPost)")
    assert(files("t1").size < before,
      s"compaction must shrink the file count: ${files("t1").size} vs $before")
    // the table's CONTENT is untouched: 60 rows, every key exactly once
    val got = spark.sql("SELECT k FROM gac.default.t1 ORDER BY k")
      .as[Long].collect().toSeq
    val want = (1 to 6).flatMap(i => (0L until 10L).map(_ + i * 100L)).sorted
    assert(got == want, "auto-compaction must not change the rows")
    // time travel still reads the pre-compaction head exactly
    assert(spark.sql(s"SELECT count(*) FROM gac.default.t1 VERSION AS OF $vPre")
      .head().getLong(0) == 50L)
  }

  test("dv-bytes trigger: MOR deletes accrete DVs, then materialize away") {
    spark.sql("CREATE TABLE gac.default.t2 (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read', " +
      "'compact.trigger.dv_bytes' = '2000')")
    spark.sql("INSERT INTO gac.default.t2 " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 10000)")
    // a small DELETE commits a DV and stays below the byte threshold
    spark.sql("DELETE FROM gac.default.t2 WHERE k < 500")
    val vDv = VersionedTable.currentVersion(lib, "t2").get
    assert(VersionedTable.deletionVectors(lib, "t2", vDv).nonEmpty,
      "below the threshold the DV must stay")
    // the second DELETE pushes total DV positions past the threshold:
    // the DML commits, then compaction materializes every DV away
    spark.sql("DELETE FROM gac.default.t2 WHERE k >= 500 AND k < 3000")
    val vPost = VersionedTable.currentVersion(lib, "t2").get
    assert(vPost == vDv + 2,
      s"DML + auto-compaction must be two commits (v$vDv -> v$vPost)")
    assert(VersionedTable.deletionVectors(lib, "t2", vPost).isEmpty,
      "compaction must materialize the DVs away")
    assert(spark.sql("SELECT count(*) FROM gac.default.t2").head()
      .getLong(0) == 7000L)
    assert(spark.sql("SELECT min(k) FROM gac.default.t2").head()
      .getLong(0) == 3000L)
  }

  test("CoW DELETEs trigger too; bucketed tables stop at their file floor") {
    // copy-on-write library DELETE rewrites only the boundary file —
    // the untouched small files still cross the threshold and the
    // delete path must run the post-commit check like load does
    spark.sql("CREATE TABLE gac.default.t4 (k BIGINT, v STRING)")
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO gac.default.t4 SELECT /*+ REPARTITION(1) */ " +
        s"id + ${i * 100}, concat('v', id) FROM range(0, 50)"))
    // declare the trigger AFTER the accretion (SET TBLPROPERTIES itself
    // never compacts), so the NEXT DML commit is what must fire it
    VersionedTable.setTableProps(lib, "t4",
      Map(VersionedTable.CompactSmallFilesProp -> "3"), Nil)
    val before = files("t4").size
    val vPre = VersionedTable.currentVersion(lib, "t4").get
    VersionedTable.delete(lib, "t4", col("k") >= 100L && col("k") <= 105L)
    val vPost = VersionedTable.currentVersion(lib, "t4").get
    assert(vPost == vPre + 2,
      s"DELETE + auto-compaction must be two commits (v$vPre -> v$vPost)")
    assert(files("t4").size < before,
      s"compaction must shrink the count: ${files("t4").size} vs $before")
    assert(spark.sql("SELECT count(*) FROM gac.default.t4").head()
      .getLong(0) == 144L)

    // a bucketed table's reachable floor is ONE FILE PER BUCKET: at or
    // under it the trigger must NOT fire — compaction could never
    // shrink the count, so firing would rewrite the same bytes on
    // every commit for nothing
    spark.sql("CREATE TABLE gac.default.t5 (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('compact.trigger.small_files' = '2')")
    spark.sql("INSERT INTO gac.default.t5 " +
      "SELECT /*+ REPARTITION(1) */ id, concat('v', id) FROM range(0, 100)")
    // the insert's 4 bucket files + the CREATE's empty file cross the
    // threshold once; the compaction lands AT the 4-file floor
    val v = VersionedTable.currentVersion(lib, "t5").get
    assert(v == 3L && files("t5").size == 4,
      s"one compaction to the floor expected (v$v, ${files("t5").size} files)")
    // at the floor the trigger must NOT fire again: a 1-row delete
    // rewrites one bucket file (count stays 4 = floor) and commits
    // exactly ONE version — no futile re-compaction of the same bytes
    VersionedTable.delete(lib, "t5", col("k") === 0L)
    val v2 = VersionedTable.currentVersion(lib, "t5").get
    assert(v2 == v + 1,
      s"at the bucket floor the delete must be ONE commit (v$v -> v$v2)")
    assert(files("t5").size == 4)
  }

  test("eq-tombstone trigger: CDC statements accrete, then materialize") {
    VersionedTable.load(lib, "eq",
      Seq.tabulate(200)(i => (i.toLong, i * 1.0)).toDF("k", "v"),
      idOrder = Seq("k"),
      extraProps = Map(
        VersionedTable.CompactEqTombstonesProp -> "3"))
    def liveTombs: Int = {
      val v = VersionedTable.currentVersion(lib, "eq").get
      VersionedTable.eqTombstoneKeyCols(lib, "eq", v).size
    }
    // two statements stay under the threshold of 3 — tombstones live
    VersionedTable.upsertEqualityDelete(lib, "eq",
      Seq.tabulate(50)(i => (i.toLong, -1.0)).toDF("k", "v"), Seq("k"))
    VersionedTable.upsertEqualityDelete(lib, "eq",
      Seq.tabulate(50)(i => (50L + i, -2.0)).toDF("k", "v"), Seq("k"))
    assert(liveTombs > 0, "under the threshold: tombstones stay live")
    // the third crosses it — auto-compaction materializes them all
    VersionedTable.upsertEqualityDelete(lib, "eq",
      Seq.tabulate(50)(i => (100L + i, -3.0)).toDF("k", "v"), Seq("k"))
    assert(liveTombs == 0,
      "crossing compact.trigger.eq_tombstones must materialize")
    // state exact through the auto-materialization
    val s = VersionedTable.read(lib, "eq").select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.size == 200 && s(25L) == -1.0 && s(75L) == -2.0 &&
      s(125L) == -3.0 && s(175L) == 175.0, s.take(5).toString)
    // and the trigger reaches a fixed point (no futile re-fire)
    val v0 = VersionedTable.currentVersion(lib, "eq").get
    VersionedTable.load(lib, "eq", Seq((500L, 500.0)).toDF("k", "v"))
    assert(VersionedTable.currentVersion(lib, "eq").get == v0 + 1,
      "a plain append after materialization must not re-trigger")
  }

  test("the props validate; unset keeps compaction manual") {
    intercept[Exception] {
      spark.sql("CREATE TABLE gac.default.bad (k BIGINT) " +
        "TBLPROPERTIES ('compact.trigger.small_files' = 'lots')")
    }
    spark.sql("CREATE TABLE gac.default.t3 (k BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE gac.default.t3 SET TBLPROPERTIES " +
        "('compact.trigger.dv_bytes' = '-5')")
    }
    // no trigger props: micro-appends accrete freely (manual regime)
    (1 to 8).foreach(i => spark.sql(
      s"INSERT INTO gac.default.t3 SELECT /*+ REPARTITION(1) */ " +
        s"id + ${i * 10} FROM range(0, 3)"))
    assert(files("t3").size >= 8,
      "without trigger props nothing may auto-compact")
  }
}
