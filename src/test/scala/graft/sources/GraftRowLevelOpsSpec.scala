package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._

/** SQL UPDATE / MERGE on versioned catalog tables — group-based
  * copy-on-write: the scan's zone maps pick the affected files, Spark
  * re-derives their full contents, one commit swaps them; prior
  * versions still time-travel and the bucket layout survives.
  */
class GraftRowLevelOpsSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("growops")
  spark.conf.set("spark.sql.catalog.gr", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gr.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("UPDATE rewrites only the affected groups; prior versions time-travel") {
    spark.sql("CREATE TABLE gr.default.up (k BIGINT, s STRING)")
    // three appends with DISJOINT key ranges → three separately-prunable
    // file groups
    (0 to 2).foreach { i =>
      VersionedTable.load(lib, "up",
        (1L to 50L).map(j => (i * 1000L + j, s"v$j")).toDF("k", "s"),
        idOrder = Seq("k"))
    }
    val before = VersionedTable.files(lib, "up", 4L).toSet
    spark.sql("UPDATE gr.default.up SET s = 'X' WHERE k > 1000 AND k <= 1050")
    assert(VersionedTable.versions(lib, "up") == (1L to 5L),
      "the UPDATE is one versioned commit")
    val after = VersionedTable.files(lib, "up", 5L).toSet
    assert((before & after).nonEmpty,
      "unaffected groups must carry through untouched (zone-pruned scan)")
    assert((before -- after).size < before.size,
      "only the affected groups are replaced")
    val rows = spark.sql("SELECT k, s FROM gr.default.up ORDER BY k")
      .as[(Long, String)].collect()
    assert(rows.count(_._2 == "X") == 50)
    assert(rows.filter(r => r._1 <= 50 || r._1 > 2000).forall(_._2 != "X"),
      "rows outside the condition keep their values")
    // time travel still reads the pre-update state
    assert(spark.sql(
      "SELECT count(*) FROM gr.default.up VERSION AS OF 4 WHERE s = 'X'")
      .head().getLong(0) == 0L)
  }

  test("MERGE INTO: matched update + not-matched insert, bucketed layout preserved") {
    spark.sql("CREATE TABLE gr.default.mg (k BIGINT, v BIGINT)")
    VersionedTable.load(lib, "mg",
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"),
      bucketBy = Some((Seq("k"), 4)))
    spark.range(15, 26).select(col("id").as("k"), (col("id") * 100L).as("v"))
      .createOrReplaceTempView("mg_src")
    spark.sql("""
      MERGE INTO gr.default.mg t USING mg_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.sql("SELECT k, v FROM gr.default.mg ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    val want = ((1L to 14L).map(i => (i, i * 10L)) ++
      (15L to 25L).map(i => (i, i * 100L))).toSeq
    assert(got == want, s"matched rows update, unmatched insert:\n$got\n$want")
    assert(VersionedTable.bucketSpec(lib, "mg").contains((Seq("k"), 4)),
      "the bucket layout survives the copy-on-write rewrite")
    // ids stay unique and the floor is monotone (rewritten rows re-stamp)
    val ids = VersionedTable.read(lib, "mg").select("id").as[Long].collect()
    assert(ids.distinct.length == ids.length, "ids must stay unique")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: SCD sync on CoW and MOR tables") {
    // the third clause family: target rows with NO source match are
    // conditionally deleted (stale keys) or deactivated — the standard
    // SCD-maintenance shape; semantics must be identical on both write
    // modes, with MOR committing the NMBS effects as deletion vectors
    def seed(t: String, props: String): Unit = {
      spark.sql(s"CREATE TABLE gr.default.$t " +
        s"(k BIGINT, v BIGINT, active BOOLEAN)$props")
      // ONE seed file, so the untouched keys (11-14) guarantee partial
      // coverage — a fully-covered MOR file correctly DROPS instead of
      // carrying with a DV, which is not the shape this test pins
      spark.sql(s"INSERT INTO gr.default.$t " +
        "SELECT /*+ REPARTITION(1) */ id, id * 10, true FROM range(1, 21)")
    }
    seed("sc", "")
    seed("sm", " TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.range(15, 26).select(col("id").as("k"), (col("id") * 100L).as("v"))
      .createOrReplaceTempView("sc_src")
    // the second NMBS clause is CONDITIONAL so some rows stay untouched —
    // an unconditional NMBS update covers every row of a MOR file, which
    // (correctly) drops the file outright instead of committing a DV
    def merge(t: String): Unit = spark.sql(s"""
      MERGE INTO gr.default.$t t USING sc_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v, active) VALUES (s.k, s.v, true)
      WHEN NOT MATCHED BY SOURCE AND t.k <= 5 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.k <= 10 THEN UPDATE SET active = false""")
    merge("sc")
    val preFiles = VersionedTable.files(lib, "sm",
      VersionedTable.currentVersion(lib, "sm").get).toSet
    merge("sm")
    // keys 1-5 deleted; 6-10 deactivated; 11-14 untouched; 15-20 updated;
    // 21-25 inserted
    val want = ((6L to 10L).map(i => (i, i * 10L, false)) ++
      (11L to 14L).map(i => (i, i * 10L, true)) ++
      (15L to 25L).map(i => (i, i * 100L, true))).toSeq
    for (t <- Seq("sc", "sm")) {
      val got = spark.sql(s"SELECT k, v, active FROM gr.default.$t ORDER BY k")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(got == want, s"$t:\n$got\n$want")
    }
    val postV = VersionedTable.currentVersion(lib, "sm").get
    assert(preFiles.subsetOf(VersionedTable.files(lib, "sm", postV).toSet),
      "MOR NMBS must carry every pre-existing file verbatim")
    assert(VersionedTable.deletionVectors(lib, "sm", postV).nonEmpty,
      "MOR NMBS deletes/updates must commit deletion vectors")
  }

  test("MERGE WITH SCHEMA EVOLUTION widens metadata-only, then merges") {
    spark.sql("CREATE TABLE gr.default.se (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gr.default.se SELECT id, id * 10 FROM range(1, 11)")
    val vPre = VersionedTable.currentVersion(lib, "se").get
    val preFiles = VersionedTable.files(lib, "se", vPre).toSet
    spark.range(8, 14).select(col("id").as("k"), (col("id") * 100L).as("v"),
      concat(lit("t"), col("id")).as("tag")).createOrReplaceTempView("se_src")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO gr.default.se t USING se_src s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT k, v, tag FROM gr.default.se ORDER BY k")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    val want = (1L to 7L).map(i => (i, i * 10L, null)) ++
      (8L to 13L).map(i => (i, i * 100L, s"t$i"))
    assert(got == want, s"evolved merge:\n$got\n$want")
    // without the WITH SCHEMA EVOLUTION clause the capability must not
    // leak: plain MERGE name-aligns INSERT * (the extra source column is
    // ignored) and the target schema does NOT evolve
    spark.sql("CREATE TABLE gr.default.se2 (k BIGINT, v BIGINT)")
    spark.sql("""
      MERGE INTO gr.default.se2 t USING se_src s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT * FROM gr.default.se2").columns.toSeq ==
      Seq("k", "v"),
      "plain MERGE must never auto-evolve the schema")
    assert(spark.sql("SELECT count(*) FROM gr.default.se2")
      .head().getLong(0) == 6L)
  }

  test("MERGE runtime-filters to the groups that contain matches") {
    spark.sql("CREATE TABLE gr.default.rf (k BIGINT, v BIGINT)")
    // three appends with disjoint key ranges → three file groups; the
    // merge source touches ONLY the middle range, and its ON condition
    // pushes nothing statically — runtime group filtering must keep the
    // other groups' files out of the rewrite
    (0 to 2).foreach { i =>
      VersionedTable.load(lib, "rf",
        (1L to 50L).map(j => (i * 1000L + j, j)).toDF("k", "v"),
        idOrder = Seq("k"))
    }
    val before = VersionedTable.files(lib, "rf", 4L).toSet
    spark.range(1010, 1021).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("rf_src")
    spark.sql("""
      MERGE INTO gr.default.rf t USING rf_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = -1""")
    val after = VersionedTable.files(lib, "rf", 5L).toSet
    assert((before & after).nonEmpty,
      "groups without matches must survive the merge untouched " +
        s"(runtime _file filtering): kept ${(before & after).size} of ${before.size}")
    val got = spark.sql("SELECT k, v FROM gr.default.rf ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    assert(got.count(_._2 == -1L) == 11, "exactly the matched rows update")
    assert(got.size == 150, "no rows lost from unmatched groups")
    spark.sql("DROP TABLE gr.default.rf")
  }

  test("no-op DML commits nothing; insert-only MERGE appends instead of rewriting") {
    spark.sql("CREATE TABLE gr.default.nop (k BIGINT, v BIGINT)")
    (0 to 1).foreach { i =>
      VersionedTable.load(lib, "nop",
        (1L to 20L).map(j => (i * 1000L + j, j)).toDF("k", "v"),
        idOrder = Seq("k"))
    }
    assert(VersionedTable.versions(lib, "nop") == (1L to 3L))
    // UPDATE matching nothing (outside every zone range): NO new version
    spark.sql("UPDATE gr.default.nop SET v = -1 WHERE k = 999999")
    assert(VersionedTable.versions(lib, "nop") == (1L to 3L),
      "a DML that matches nothing must not inflate the version history")
    // MERGE whose source matches NO target key: the empty runtime filter
    // narrows the rewrite to zero groups — every prior file survives and
    // the new rows land as a plain append-shaped commit
    val before = VersionedTable.files(lib, "nop", 3L).toSet
    spark.range(5000, 5003).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("nop_src")
    spark.sql("""MERGE INTO gr.default.nop t USING nop_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val after = VersionedTable.files(lib, "nop", 4L).toSet
    assert(before.subsetOf(after),
      s"insert-only MERGE must keep every existing file: kept " +
        s"${(before & after).size} of ${before.size}")
    assert(spark.sql("SELECT count(*) FROM gr.default.nop").head().getLong(0) == 43L)
    spark.sql("DROP TABLE gr.default.nop")
  }

  test("_file metadata column: queryable, and absent unless asked for") {
    spark.sql("CREATE TABLE gr.default.mf (k BIGINT)")
    spark.sql("INSERT INTO gr.default.mf VALUES (1), (2)")
    spark.sql("INSERT INTO gr.default.mf VALUES (3)")
    assert(spark.sql("SELECT * FROM gr.default.mf").columns.toSeq == Seq("k"),
      "metadata columns must not leak into SELECT *")
    val rows = spark.sql("SELECT k, _file FROM gr.default.mf")
      .as[(Long, String)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq(1L, 2L, 3L))
    assert(rows.forall(_._2.endsWith(".parquet")),
      s"_file must carry the data file path: $rows")
    // rows of different commits live in different files
    val byFile = rows.groupBy(_._2)
    assert(byFile.size >= 2, s"two commits → at least two files: $byFile")
    spark.sql("DROP TABLE gr.default.mf")
  }

  test("a DELETE the filter algebra can't express falls back to the rewrite path") {
    spark.sql("CREATE TABLE gr.default.dl (k BIGINT, s STRING)")
    spark.sql("INSERT INTO gr.default.dl VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    // k % 2 = 0 is not a pushed-filter shape → SupportsDelete refuses via
    // canDeleteWhere and Spark routes through the row-level rewrite
    spark.sql("DELETE FROM gr.default.dl WHERE k % 2 = 0")
    assert(spark.sql("SELECT k FROM gr.default.dl ORDER BY k").as[Long]
      .collect().toSeq == Seq(1L, 3L),
      "the rewrite-path delete must remove exactly the matching rows")
  }
}
