package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Catalog, MaterializedAgg, VersionedTable}

/** Oracle-checked queries for the versioned-table layer (time travel,
  * change-data-feed, logical delete) and incremental materialized views —
  * extension scope: the table-format machinery under a mutable 100 TB lake.
  *
  * Oracle strategy: the DuckDB twin REPLAYS each version's logical state
  * from the base tables (the manifests are physical bookkeeping; the
  * correctness claim is that every version reads back exactly the state
  * its load sequence defined, and that the change feed equals the
  * state diff).
  */
object StorageQueries {

  type Q = (SparkSession, String) => DataFrame

  private def srcCat(spark: SparkSession, sfDir: String) = new Catalog(spark, sfDir)
  private def tmpCat(spark: SparkSession) =
    new Catalog(spark, java.nio.file.Files.createTempDirectory("graft-q").toString)

  /** One versioned fixture per (JVM, sfDir): the three versioned queries
    * (time travel, change feed, drift) read the SAME immutable 4-version
    * table — benches measure the query, not three rebuilds of its input.
    * (Same per-JVM memoization pattern as ExtensionQueries.exportDirs.) */
  private val versionedDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def versionedFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = versionedDirs.computeIfAbsent(key,
      _ => buildVersioned(spark, sfDir).dir)
    new Catalog(spark, dir)
  }

  /** Queries that read a shared memoized fixture (bench attribution). */
  val fixtureQueries: Set[String] = Set("q_time_travel", "q_change_feed",
    "q_version_drift", "q_matview_cdc", "q_matview_cdc_minmax",
    "q_matview_cdc_stream", "q_stream_cdc_source", "q_versioned_skipping",
    "q_versioned_recluster", "q_stream_cdc_v2", "q_matview_exactly_once",
    "q_versioned_delete_where", "q_versioned_or_skip",
    "q_versioned_log_checkpoint", "q_versioned_v2_read", "q_cdc_batch_read",
    "q_versioned_v2_write", "q_versioned_history", "q_versioned_sql_catalog",
    "q_stream_sink_v2", "q_versioned_sql_ops", "q_stream_append_tail",
    "q_versioned_sql_merge", "q_versioned_sql_merge_full",
    "q_versioned_merge_evolve", "q_partition_transform",
    "q_versioned_spj", "q_versioned_sql_join",
    "q_versioned_point_lookup", "q_versioned_check",
    "q_versioned_agg_pushdown", "q_alter_add_column", "q_versioned_mor",
    "q_versioned_sql_namespaces", "q_alter_column_mapping",
    "q_alter_column_default", "q_alter_widen_type", "q_insert_overwrite",
    "q_versioned_tag", "q_generated_column", "q_identity_column",
    "q_cluster_by", "q_versioned_sql_subquery", "q_versioned_wap",
    "q_decimal_skipping", "q_history_operations", "q_identity_mor_merge",
    "q_zorder_cluster", "q_versioned_branch", "q_eq_upsert",
    "q_eq_upsert_sql", "q_eq_upsert_evolve", "q_change_feed_eq",
    "q_eq_delete", "q_change_feed_eq_delete", "q_eq_merge",
    "q_eq_delete_sql")

  /** Force-build the shared versioned fixture NOW (idempotent) — the bench
    * calls this in warmup so the one-time 4-version build is timed as
    * `fixture_build_s` instead of landing on whichever fixture query runs
    * first alphabetically. */
  def prebuildFixture(spark: SparkSession, sfDir: String): Unit = {
    versionedFixture(spark, sfDir)
    skippingFixture(spark, sfDir)
    reclusterFixture(spark, sfDir)
    deleteWhereFixture(spark, sfDir)
    checkpointFixture(spark, sfDir)
    v2WriteFixture(spark, sfDir)
    streamSinkFixture(spark, sfDir)
    sqlOpsFixture(spark, sfDir)
    sqlMergeFullFixture(spark, sfDir)
    sqlSpjFixture(spark, sfDir)
    sqlPtxFixture(spark, sfDir)
    sqlJoinFixture(spark, sfDir)
    sqlPointFixture(spark, sfDir)
    sqlCheckFixture(spark, sfDir)
    sqlAlterFixture(spark, sfDir)
    sqlMorFixture(spark, sfDir)
    sqlNsFixture(spark, sfDir)
    sqlColMapFixture(spark, sfDir)
    sqlColDefFixture(spark, sfDir)
    sqlWidenFixture(spark, sfDir)
    sqlOverwriteFixture(spark, sfDir)
    sqlTagFixture(spark, sfDir)
    sqlGenFixture(spark, sfDir)
    sqlIdnFixture(spark, sfDir)
    sqlIdmFixture(spark, sfDir)
    sqlZocFixture(spark, sfDir)
    sqlBrFixture(spark, sfDir)
    sqlEquFixture(spark, sfDir)
    sqlEquSqlFixture(spark, sfDir)
    sqlEqmFixture(spark, sfDir)
    sqlEquEvFixture(spark, sfDir)
    sqlEqdFixture(spark, sfDir)
    sqlEqDsFixture(spark, sfDir)
    sqlCbyFixture(spark, sfDir)
    sqlSubqFixture(spark, sfDir)
    sqlWapFixture(spark, sfDir)
    sqlDzFixture(spark, sfDir)
    sqlHopFixture(spark, sfDir); ()
  }

  /** Build the 4-version orders table every versioned query reads:
    *   v1 load  o_orderkey ≤ 2000
    *   v2 append (2000, 3000]
    *   v3 upsert (2500, 3500]  (updates (2500,3000], inserts (3000,3500])
    *   v4 delete o_orderkey ≤ 500
    */
  private def buildVersioned(spark: SparkSession, sfDir: String): Catalog = {
    val src = srcCat(spark, sfDir)
    src.registerViews()
    val tgt = tmpCat(spark)
    val base = spark.sql(
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
    VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 2000),
      idOrder = Seq("o_orderkey"))
    VersionedTable.load(tgt, "t",
      base.where(col("o_orderkey") > 2000 && col("o_orderkey") <= 3000),
      idOrder = Seq("o_orderkey"))
    VersionedTable.load(tgt, "t",
      base.where(col("o_orderkey") > 2500 && col("o_orderkey") <= 3500)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
    VersionedTable.delete(tgt, "t", col("o_orderkey") <= 500)
    tgt
  }

  /** Separate memoized fixture for the zone-map query: three APPENDS with
    * disjoint o_orderkey ranges (append-only so each batch's files stay
    * distinct and the ranges stay disjoint — the shared 4-version fixture
    * ends in a flat upsert's full rewrite, which collapses every range
    * into one batch and leaves nothing to skip). */
  private val skipDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def skippingFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = skipDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      // ranges sized to the smallest sf (orders keys are dense from 0;
      // sf0.001 tops out at 1499) so every batch has rows at every sf
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 500),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1000),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 1000 && col("o_orderkey") <= 1400),
        idOrder = Seq("o_orderkey"))
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the recluster query: two appends whose o_orderkey ranges
    * fully OVERLAP (odd keys, then even keys — every file spans the whole
    * domain, nothing skippable), then one `recluster` by o_orderkey sized
    * to land multiple files — after which zone maps skip. Reclustered
    * ONCE at build time and memoized, so repeated runs are idempotent. */
  private val reclusterDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def reclusterFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = reclusterDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
        .where(col("o_orderkey") <= 1400) // dense from 0 at every sf
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") % 2 === 1),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") % 2 === 0),
        idOrder = Seq("o_orderkey"))
      VersionedTable.recluster(tgt, "t", Seq("o_orderkey"), 4L * 1024)
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the metadata-only delete query: the three disjoint
    * appends of the skipping fixture, then `delete(o_orderkey <= 600)` —
    * batch 1 is FULLY covered by its zone map (dropped from the manifest
    * with zero data I/O), batch 2 is the boundary (one rewrite), batch 3
    * carries untouched. Deleted once at build time and memoized. */
  private val delWhereDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def deleteWhereFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = delWhereDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 500),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1000),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 1000 && col("o_orderkey") <= 1400),
        idOrder = Seq("o_orderkey"))
      VersionedTable.delete(tgt, "t", col("o_orderkey") <= 600)
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the manifest-log pointer query: 14 single-slice appends
    * — enough commit history that a listing-per-read would visibly
    * multiply FS ops; `versions()` must answer from the `_vlast` pointer
    * alone. */
  private val ckptDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def checkpointFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = ckptDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql("SELECT o_orderkey, o_totalprice FROM orders")
      (1 to 14).foreach { i =>
        VersionedTable.load(tgt, "t",
          base.where(col("o_orderkey") > (i - 1) * 100L &&
            col("o_orderkey") <= i * 100L),
          idOrder = Seq("o_orderkey"))
      }
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the V2 write query: two df.write.format("graft") saves
    * (bucketed create, then a keyed upsert), memoized per (JVM, sfDir). */
  private val v2WriteDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def v2WriteFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = v2WriteDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      base.where(col("o_orderkey") <= 1000)
        .write.format("graft").mode("append")
        .option("dir", tgt.dir).option("table", "t")
        .option("idOrder", "o_orderkey").option("upsertKeys", "o_orderkey")
        .option("bucketBy", "o_orderkey").option("numBuckets", "8").save()
      base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1500)
        .withColumn("o_orderstatus", lit("U"))
        .write.format("graft").mode("append")
        .option("dir", tgt.dir).option("table", "t")
        .option("idOrder", "o_orderkey").option("upsertKeys", "o_orderkey").save()
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the NATIVE STREAMING SINK query (ST13): the same
    * two-batch upsert shape as [[v2WriteFixture]], delivered through
    * `writeStream.format("graft")` as two MemoryStream epochs — then a
    * CRASH REPLAY is injected (the engine's commit record for the last
    * epoch deleted, stream restarted) to prove the epoch-stamped sink
    * skips re-delivery instead of committing a duplicate version. */
  private val streamSinkDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def streamSinkFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = streamSinkDirs.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ck").toString
      def start() = input.toDF()
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
        .writeStream.format("graft")
        .option("dir", tgt.dir).option("table", "t")
        .option("idOrder", "o_orderkey").option("upsertKeys", "o_orderkey")
        .option("bucketBy", "o_orderkey").option("numBuckets", "8")
        .option("checkpointLocation", ckpt).start()
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val q = start()
      try {
        input.addData(rows(base.where(col("o_orderkey") <= 1000)): _*)
        q.processAllAvailable()
        input.addData(rows(
          base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1500)
            .withColumn("o_orderstatus", lit("U"))): _*)
        q.processAllAvailable()
      } finally { q.stop(); q.awaitTermination() }
      // crash replay of the last epoch: engine commit record lost (plus
      // its checksum twin), restart re-delivers epoch 1
      new java.io.File(s"$ckpt/commits/1").delete()
      new java.io.File(s"$ckpt/commits/.1.crc").delete()
      val q2 = start()
      try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }
      tgt.dir
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the SQL-catalog query: a pure-SQL pipeline (CTAS +
    * INSERT) against a GraftCatalog registered per (JVM, sfDir) — the
    * catalog name encodes the sfDir because Spark caches catalog
    * instances by name. */
  private val sqlCatNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlCatalogFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlCatNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gfix${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcat").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      // commit times PINNED through the clock seam so the query's
      // `TIMESTAMP AS OF` leg resolves deterministically: CTAS @ 1000 s,
      // INSERT @ 2000 s — a timestamp between them reads the CTAS state
      VersionedTable.commitClock.withValue(() => 1000000L) {
        spark.sql(s"CREATE TABLE $name.default.t AS " +
          "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800")
      }
      VersionedTable.commitClock.withValue(() => 2000000L) {
        spark.sql(s"INSERT INTO $name.default.t " +
          "SELECT o_orderkey, o_totalprice FROM orders " +
          "WHERE o_orderkey > 800 AND o_orderkey <= 1200")
      }
      name
    })
  }

  /** Epoch-millis → the `TIMESTAMP AS OF` literal Spark will read back
    * as that instant — rendered in the SESSION timezone, so the query
    * is deterministic whatever zone the driver runs in. */
  private def tsLiteral(spark: SparkSession, epochMs: Long): String =
    java.time.Instant.ofEpochMilli(epochMs)
      .atZone(java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Fixture for the SQL-PROCEDURES query (F37): its own catalog (the
    * rollback mutates state, so it cannot share [[sqlCatalogFixture]]) —
    * CTAS (v1+v2 = k ≤ 800), INSERT (v3 adds 800 < k ≤ 1200), then
    * `CALL rollback` back to v2 in pure SQL (v4). */
  private val sqlOpsNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlOpsFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlOpsNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gops${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlops").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.t AS " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800")
      spark.sql(s"INSERT INTO $name.default.t " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 800 AND o_orderkey <= 1200")
      // atomic CTAS (the staging catalog) = ONE data-bearing commit:
      // v1 = CTAS rows, v2 = the INSERT, v3 = the rollback below
      spark.sql(s"CALL $name.system.rollback('t', 1)")
      // zero-copy clone of the post-rollback state, then compact it and
      // DELETE a slice — all pure SQL; the clone must read v1's rows
      // minus the deleted range
      spark.sql(s"CALL $name.system.clone('t', 't2', 3)")
      spark.sql(s"CALL $name.system.compact('t2', ${128L * 1024 * 1024})")
      spark.sql(s"DELETE FROM $name.default.t2 WHERE o_orderkey <= 400")
      name
    })
  }

  /** Fixture for the SQL row-level-DML query (F39): atomic CTAS seed
    * (v1), then MERGE INTO (matched update + not-matched insert, v2) and
    * a ranged UPDATE (v3) — pure SQL, group-based copy-on-write. */
  private val sqlMergeNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlMergeFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlMergeNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gmrg${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlmerge").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.t AS " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
          |WHERE o_orderkey > 500 AND o_orderkey <= 1500""".stripMargin)
        .createOrReplaceTempView("graft_merge_src")
      spark.sql(s"""
        MERGE INTO $name.default.t t USING graft_merge_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice)
          VALUES (s.o_orderkey, s.o_totalprice)""")
      spark.sql(
        s"UPDATE $name.default.t SET o_totalprice = 0 WHERE o_orderkey <= 100")
      name
    })
  }

  /** Fixture for the FULL-MERGE query (F39 third clause): ONE MERGE
    * statement with all three clause families — matched update,
    * not-matched insert, and `WHEN NOT MATCHED BY SOURCE` (the standard
    * SCD-deactivation shape: delete stale keys, deactivate the rest) —
    * on BOTH write modes: a copy-on-write table and a merge-on-read
    * twin, which must commit the NMBS deletes/updates as deletion
    * vectors with every pre-existing file carried verbatim. */
  private val sqlMergeFullNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlMergeFullFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlMergeFullNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gmf${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlmergefull").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      val seed = "SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS active " +
        "FROM orders WHERE o_orderkey <= 1000"
      spark.sql(s"CREATE TABLE $name.default.t AS $seed")
      spark.sql(s"CREATE TABLE $name.default.tm " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, active BIGINT) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      // ONE seed file: the untouched band (400 < k <= 500) then
      // guarantees partial coverage, so the MOR MERGE must commit a DV
      // with the file carried verbatim (fully-covered files correctly
      // DROP instead — not the shape this fixture asserts)
      spark.sql(s"INSERT INTO $name.default.tm " +
        seed.replace("SELECT ", "SELECT /*+ REPARTITION(1) */ "))
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
          |WHERE o_orderkey > 500 AND o_orderkey <= 1500""".stripMargin)
        .createOrReplaceTempView("graft_mergefull_src")
      // the deactivation clause is CONDITIONAL (k <= 400) so part of the
      // MOR file stays untouched — an unconditional NMBS update covers
      // every row, which (correctly) drops the file instead of a DV
      def mergeInto(table: String): Unit = spark.sql(s"""
        MERGE INTO $name.default.$table t USING graft_mergefull_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, active)
          VALUES (s.o_orderkey, s.o_totalprice, 1)
        WHEN NOT MATCHED BY SOURCE AND t.o_orderkey <= 250 THEN DELETE
        WHEN NOT MATCHED BY SOURCE AND t.o_orderkey <= 400
          THEN UPDATE SET active = 0""")
      mergeInto("t")
      val cat = new Catalog(spark, dir)
      val preV = VersionedTable.currentVersion(cat, "tm").get
      val pre = VersionedTable.files(cat, "tm", preV).toSet
      mergeInto("tm")
      val postV = VersionedTable.currentVersion(cat, "tm").get
      require(pre.subsetOf(VersionedTable.files(cat, "tm", postV).toSet),
        "merge-on-read MERGE (incl. NOT MATCHED BY SOURCE) must carry " +
          "every pre-existing file verbatim")
      require(VersionedTable.deletionVectors(cat, "tm", postV).nonEmpty,
        "the NMBS deletes/updates must commit as deletion vectors")
      // MERGE WITH SCHEMA EVOLUTION: the source carries a column the
      // target lacks; the analyzer widens the table METADATA-ONLY (the
      // AddColumn TableChange → widenSchema) and merges against the
      // evolved schema — pre-existing unmatched rows read NULL
      spark.sql(s"CREATE TABLE $name.default.te AS " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800")
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
          |CAST(o_orderkey % 7 AS BIGINT) AS grade FROM orders
          |WHERE o_orderkey > 400 AND o_orderkey <= 1200""".stripMargin)
        .createOrReplaceTempView("graft_mergeevo_src")
      spark.sql(s"""
        MERGE WITH SCHEMA EVOLUTION INTO $name.default.te t
        USING graft_mergeevo_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      name
    })
  }

  /** Fixture for the SQL-JOIN query (F40): a lineitem-derived fact table
    * (two commits) and a supplier dim, BOTH versioned catalog tables —
    * the join the scan's reported statistics exist for (the dim
    * auto-broadcasts at plan time; GraftScanPlanningSpec pins the plan
    * shape, this query pins the results through the oracle). */
  private val sqlJoinNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlJoinFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlJoinNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gjn${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqljoin").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.fact AS " +
        "SELECT l_orderkey, l_suppkey, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_orderkey <= 1000")
      spark.sql(s"INSERT INTO $name.default.fact " +
        "SELECT l_orderkey, l_suppkey, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_orderkey > 1000 AND l_orderkey <= 2000")
      spark.sql(s"CREATE TABLE $name.default.dim AS " +
        "SELECT s_suppkey, s_nationkey FROM supplier")
      name
    })
  }

  /** Fixture for the SQL POINT-LOOKUP query (F42): a hash-bucketed keyed
    * table inside a SQL catalog dir — loaded through the library (the
    * catalog's CREATE has no bucket clause by design) and then read in
    * PURE SQL, where an eq/IN on the bucket key plans only the pinned
    * buckets' files (GraftScanPlanningSpec pins the plan; this query
    * pins the results, including an upsert's overwrite). */
  private val sqlPointNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlPointFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlPointNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gplk${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlpoint").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      val cat = new Catalog(spark, dir)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders " +
          "WHERE o_orderkey <= 1500")
      VersionedTable.load(cat, "pt", base,
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"),
        bucketBy = Some((Seq("o_orderkey"), 8)))
      VersionedTable.load(cat, "pt",
        base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1000)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
      name
    })
  }

  /** Fixture for the CHECK-constraint query (F44): a table whose
    * constraint (`o_totalprice >= 0 AND o_orderkey <= 1000`) refuses one
    * of three INSERT batches atomically — the violating batch commits NO
    * version and NO rows (the caught exception IS the fixture's point);
    * the surviving state is exactly the two valid batches. */
  private val sqlCheckNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlCheckFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlCheckNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gchk${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcheck").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.ck " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('check' = 'o_totalprice >= 0 AND o_orderkey <= 1000')")
      spark.sql(s"INSERT INTO $name.default.ck " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500")
      val refused = scala.util.Try(spark.sql(s"INSERT INTO $name.default.ck " +
        "SELECT o_orderkey, -o_totalprice FROM orders " +
        "WHERE o_orderkey > 500 AND o_orderkey <= 700")).isFailure
      require(refused, "the violating batch must refuse")
      spark.sql(s"INSERT INTO $name.default.ck " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 700 AND o_orderkey <= 1000")
      name
    })
  }

  /** Fixture for the SQL ALTER query (F49): CREATE (v1) → INSERT (v2) →
    * `ALTER TABLE ADD COLUMN` (v3 — METADATA-ONLY: the commit carries
    * v2's files verbatim and records the widened schema; asserted here
    * file-for-file) → widened INSERT (v4). Pure-SQL schema evolution,
    * the catalog twin of the loader's `ensure` widening. */
  private val sqlAlterNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlAlterFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlAlterNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"galt${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlalter").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.al " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.al " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 600")
      val cat = new Catalog(spark, dir)
      val preFiles = VersionedTable.files(cat, "al", 2L).toSet
      spark.sql(s"ALTER TABLE $name.default.al ADD COLUMN o_orderstatus STRING")
      require(VersionedTable.files(cat, "al", 3L).toSet == preFiles,
        "ALTER ADD COLUMN must be metadata-only (files carried verbatim)")
      spark.sql(s"INSERT INTO $name.default.al " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "WHERE o_orderkey > 600 AND o_orderkey <= 1200")
      (name, dir)
    })
  }

  /** Fixture for the COLUMN-DEFAULT query (F55): ADD COLUMN ... DEFAULT
    * on a populated table (metadata-only, files verbatim — asserted),
    * then an insert carrying real values: the head mixes
    * default-filled pre-ADD rows with materialized post-ADD rows. */
  private val sqlCdefNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlColDefFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlCdefNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gcdef${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcdef").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.cd " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.cd " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 600")
      val cat = new Catalog(spark, dir)
      val pre = VersionedTable.files(cat, "cd", 2L).toSet
      spark.sql(
        s"ALTER TABLE $name.default.cd ADD COLUMN src STRING DEFAULT 'legacy'")
      require(VersionedTable.files(cat, "cd", 3L).toSet == pre,
        "ADD COLUMN DEFAULT must be metadata-only (files carried verbatim)")
      spark.sql(s"INSERT INTO $name.default.cd " +
        "SELECT o_orderkey, o_totalprice, 'fresh' FROM orders " +
        "WHERE o_orderkey > 600 AND o_orderkey <= 1200")
      (name, dir)
    })
  }

  /** Fixture for the INSERT-OVERWRITE query (F60): a populated table
    * content-replaced by one INSERT OVERWRITE commit — the head holds
    * only the new rows, VERSION AS OF still reads the pre-overwrite
    * state (history survives the swap). */
  private val sqlOverwriteNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlOverwriteFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlOverwriteNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"giow${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqliow").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.ow " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.ow " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800")
      spark.sql(s"INSERT OVERWRITE $name.default.ow " +
        "SELECT o_orderkey, o_totalprice * 2 FROM orders " +
        "WHERE o_orderkey > 400 AND o_orderkey <= 1200")
      (name, dir)
    })
  }

  /** Fixture for the NAMED-REF query (F65): a tag stamped on the
    * pre-overwrite version, the table overwritten, then VACUUMED down to
    * keep_last=1 — the tag must PIN the tagged version through the
    * vacuum (asserted here), and the query reads head + tag eras. */
  private val sqlTagNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlTagFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlTagNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gtagq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqltag").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.tg " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.tg " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800")
      spark.sql(s"CALL $name.system.create_tag('tg', 'raw_load', 2)")
      spark.sql(s"INSERT OVERWRITE $name.default.tg " +
        "SELECT o_orderkey, o_totalprice * 2 FROM orders " +
        "WHERE o_orderkey > 400 AND o_orderkey <= 1200")
      // the tag must pin v2 through a keep-only-head vacuum — the
      // retention guarantee the named ref exists for
      spark.sql(s"CALL $name.system.vacuum('tg', 1)").collect()
      val cat = new Catalog(spark, dir)
      require(VersionedTable.versions(cat, "tg").contains(2L),
        "vacuum must keep the tagged version")
      (name, dir)
    })
  }

  /** Fixture for the GENERATED-COLUMN query (F66): a column computed by
    * the ENGINE on every write — the INSERT omits it (computed), the
    * UPDATE changes its base column (recomputed by the copy-on-write
    * row op), and the oracle re-derives both eras from the source rows.
    * FLOOR keeps the double→bigint step engine-independent (Spark CAST
    * truncates, DuckDB CAST rounds). */
  private val sqlGenNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlGenFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlGenNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"ggenq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlgen").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.gn " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, cents BIGINT " +
        "GENERATED ALWAYS AS (CAST(FLOOR(o_totalprice * 100) AS BIGINT)))")
      spark.sql(s"INSERT INTO $name.default.gn (o_orderkey, o_totalprice) " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(s"UPDATE $name.default.gn " +
        "SET o_totalprice = o_totalprice * 2 WHERE o_orderkey <= 300")
      (name, dir)
    })
  }

  /** Fixture for the IDENTITY-COLUMN query (F67): the engine assigns
    * rid = 1, 2, ... in the write's partition-major order — the INSERTs
    * are ORDER BY o_orderkey with disjoint increasing key ranges, so the
    * assignment is deterministically row_number() over o_orderkey and
    * the DuckDB oracle can recompute it; the UPDATE then proves a
    * copy-on-write rewrite KEEPS existing rows' identity values. */
  private val sqlIdnNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlIdnFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlIdnNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gidnq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlidn").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.idn " +
        "(rid BIGINT GENERATED ALWAYS AS IDENTITY, " +
        "o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.idn (o_orderkey, o_totalprice) " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey <= 1000 ORDER BY o_orderkey")
      spark.sql(s"INSERT INTO $name.default.idn (o_orderkey, o_totalprice) " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 1000 AND o_orderkey <= 1400 ORDER BY o_orderkey")
      spark.sql(s"UPDATE $name.default.idn " +
        "SET o_totalprice = o_totalprice * 3 WHERE o_orderkey <= 200")
      (name, dir)
    })
  }

  /** Fixture for the MERGE-ON-READ IDENTITY query (F67/F50): a keyed
    * MERGE into an identity SCD table on the MOR layout — matched rows
    * reinsert CARRYING their engine-assigned rid (deletion vectors mask
    * the old positions, pre-existing files carry verbatim — asserted),
    * while inserted rows draw FRESH values from the statement's
    * high-water reservation, strided disjointly across tasks. Fresh
    * values are unique and beyond the watermark but task-interleaved
    * (not SQL-predictable), so the query surfaces them as rid_new /
    * rid_uniq booleans the oracle CAN recompute. */
  private val sqlIdmNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlIdmFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlIdmNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gidmq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlidm").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.idm " +
        "(rid BIGINT GENERATED ALWAYS AS IDENTITY, " +
        "o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      // deterministic rid for the base: global ORDER BY makes the zip's
      // partition-major order the key order → rid = row_number
      spark.sql(s"INSERT INTO $name.default.idm (o_orderkey, o_totalprice) " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey <= 1000 ORDER BY o_orderkey")
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS p FROM orders
          |WHERE o_orderkey > 500 AND o_orderkey <= 1300""".stripMargin)
        .createOrReplaceTempView("graft_idm_src")
      val cat = new Catalog(spark, dir)
      val pre = VersionedTable.files(cat, "idm", 2L).toSet
      spark.sql(s"""
        MERGE INTO $name.default.idm t USING graft_idm_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.p
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice)
          VALUES (s.o_orderkey, s.p)""")
      require(pre.subsetOf(VersionedTable.files(cat, "idm", 3L).toSet),
        "MOR identity MERGE must carry every pre-existing file verbatim")
      require(VersionedTable.deletionVectors(cat, "idm", 3L).nonEmpty,
        "MOR identity MERGE must record deletion vectors")
      (name, dir)
    })
  }

  /** Fixture for the CLUSTER BY query (F68): a liquid-clustered table
    * whose declaration is re-pointed mid-history (`ALTER TABLE ...
    * CLUSTER BY`) — both eras' rows must read back exactly; pruning is
    * spec-asserted in ClusterBySpec, content here. */
  private val sqlCbyNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlCbyFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlCbyNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gcbyq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcby").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.cb " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) CLUSTER BY (o_totalprice)")
      spark.sql(s"INSERT INTO $name.default.cb " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1200")
      spark.sql(s"ALTER TABLE $name.default.cb CLUSTER BY (o_orderkey)")
      spark.sql(s"INSERT INTO $name.default.cb " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 1200 AND o_orderkey <= 1400")
      (name, dir)
    })
  }

  /** Fixture for the SUBQUERY row-op query: a merge-on-read table whose
    * DELETE condition is an IN-subquery — unexpressible as a pushed
    * filter, so Spark routes it through the delta row-level operation
    * and the matches commit as deletion vectors (files verbatim,
    * asserted). The oracle recomputes the survivor set with the same
    * subquery over the source. */
  private val sqlSubqNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlSubqFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlSubqNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gsubq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlsubq").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.sq " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $name.default.sq " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1200")
      val cat = new Catalog(spark, dir)
      val pre = VersionedTable.files(cat, "sq",
        VersionedTable.currentVersion(cat, "sq").get).toSet
      spark.sql(s"DELETE FROM $name.default.sq WHERE o_orderkey IN " +
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)")
      val v = VersionedTable.currentVersion(cat, "sq").get
      require(VersionedTable.files(cat, "sq", v).toSet == pre,
        "the MOR subquery delete must carry every data file verbatim")
      require(VersionedTable.deletionVectors(cat, "sq", v).nonEmpty,
        "the subquery delete must commit deletion vectors")
      (name, dir)
    })
  }

  /** Fixture for the WRITE-AUDIT-PUBLISH query (F70): writes staged on
    * a zero-copy clone (insert + delete + update), then published onto
    * the source with ONE fast_forward commit — the head reads the
    * branch state, the pre-publish version still time-travels, and the
    * oracle recomputes both eras from the source rows. */
  private val sqlWapNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlWapFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlWapNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gwapq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlwap").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.wp " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.wp " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(s"CALL $name.system.clone('wp', 'wp_dev', 2)")
      spark.sql(s"INSERT INTO $name.default.wp_dev " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 1000 AND o_orderkey <= 1300")
      spark.sql(s"DELETE FROM $name.default.wp_dev WHERE o_orderkey <= 200")
      spark.sql(s"UPDATE $name.default.wp_dev " +
        "SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey > 900 AND o_orderkey <= 1000")
      val committed = spark.sql(
        s"CALL $name.system.fast_forward('wp', 'wp_dev')").head().getLong(0)
      require(committed == 3L, s"the publish must be ONE commit: $committed")
      (name, dir)
    })
  }

  /** Fixture for the DECIMAL-SKIPPING query (F71): a DECIMAL(12,2)
    * column loaded in disjoint ranges — the fixture ASSERTS decimal
    * zone-map pruning fires on the library surface, and the query's SQL
    * predicate prunes through the DSv2 pushed-filter path; values
    * surface as exact cents so both engines hash identically. */
  private val sqlDzNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlDzFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlDzNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gdzq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqldz").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.dz " +
        "(o_orderkey BIGINT, amt DECIMAL(12,2), wamt DECIMAL(25,2))")
      Seq("o_orderkey <= 500",
        "o_orderkey > 500 AND o_orderkey <= 1000",
        "o_orderkey > 1000 AND o_orderkey <= 1400").foreach(w =>
        spark.sql(s"INSERT INTO $name.default.dz " +
          "SELECT o_orderkey, CAST(o_orderkey + 0.25 AS DECIMAL(12,2)), " +
          "CAST(o_orderkey + 10000000000000000000.25 AS DECIMAL(25,2)) " +
          s"FROM orders WHERE $w"))
      val cat = new Catalog(spark, dir)
      val v = VersionedTable.currentVersion(cat, "dz").get
      val skipped = VersionedTable.skippedFiles(cat, "dz", v,
        col("amt") >= new java.math.BigDecimal("1000.25"))
      require(skipped.nonEmpty,
        "decimal zone maps must prune the low-range files")
      // the WIDE column (p > 18, FLBA-backed bounds) must prune too —
      // its unscaled range exceeds 64 bits by construction
      val wskipped = VersionedTable.skippedFiles(cat, "dz", v,
        col("wamt") >= new java.math.BigDecimal("10000000000000001000.25"))
      require(wskipped.nonEmpty,
        "wide-decimal zone maps must prune the low-range files")
      (name, dir)
    })
  }

  /** Fixture for the OPERATION-HISTORY query: a table taken through a
    * KNOWN op sequence (create, insert, row-op update, delete,
    * rollback) — the oracle hardcodes the expected (version, operation,
    * total_rows) rows as constants, so the driver's gate pins the
    * DESCRIBE HISTORY operation column end-to-end. */
  private val sqlHopNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlHopFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlHopNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"ghopq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlhop").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.hp " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")                    // v1
      spark.sql(s"INSERT INTO $name.default.hp " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey <= 1000")                                    // v2
      spark.sql(s"UPDATE $name.default.hp SET o_totalprice = 0.0 " +
        "WHERE o_orderkey <= 100")                                     // v3
      spark.sql(s"DELETE FROM $name.default.hp WHERE o_orderkey <= 200") // v4
      spark.sql(s"CALL $name.system.rollback('hp', 3)")                // v5
      (name, dir)
    })
  }

  /** Fixture for the TYPE-WIDENING query (F59): an INT column widened to
    * BIGINT metadata-only (files verbatim — asserted), then an insert
    * carrying values beyond the int range: the head reads narrow-era
    * files upcast and wide-era files natively, in one scan. */
  private val sqlWidenNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlWidenFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlWidenNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gwide${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlwiden").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.wd " +
        "(o_orderkey BIGINT, qty INT, amt DECIMAL(10,2))")
      // +0.25 is exact in binary, so Spark's and DuckDB's double→decimal
      // casts agree bit-for-bit (no rounding-mode dependence)
      spark.sql(s"INSERT INTO $name.default.wd " +
        "SELECT o_orderkey, CAST(o_orderkey AS INT), " +
        "CAST(o_orderkey + 0.25 AS DECIMAL(10,2)) FROM orders " +
        "WHERE o_orderkey <= 600")
      val cat = new Catalog(spark, dir)
      val pre = VersionedTable.files(cat, "wd", 2L).toSet
      spark.sql(s"ALTER TABLE $name.default.wd ALTER COLUMN qty TYPE BIGINT")
      require(VersionedTable.files(cat, "wd", 3L).toSet == pre,
        "ALTER COLUMN TYPE (widening) must be metadata-only")
      // F59 decimal widening: same scale, wider precision — the old
      // files' INT64-backed decimal(10,2) values read back as (16,2)
      spark.sql(s"ALTER TABLE $name.default.wd ALTER COLUMN amt TYPE DECIMAL(16,2)")
      require(VersionedTable.files(cat, "wd", 4L).toSet == pre,
        "decimal widening must be metadata-only too")
      spark.sql(s"INSERT INTO $name.default.wd " +
        "SELECT o_orderkey, o_orderkey * 10000000000, " +
        "CAST(o_orderkey * 10000000 + 0.75 AS DECIMAL(16,2)) FROM orders " +
        "WHERE o_orderkey > 600 AND o_orderkey <= 1200")
      (name, dir)
    })
  }

  /** Fixture for the COLUMN-MAPPING query (F54): a catalog table taken
    * through the full metadata-only schema-change lifecycle — RENAME
    * COLUMN (files verbatim, stable physical names), an insert under the
    * new name, DROP COLUMN (files verbatim, physical name retired), a
    * re-ADD of the SAME name (fresh physical — the dead bytes must never
    * resurface), and a final insert carrying real values for the
    * namesake. The oracle recomputes every era from the source parquet,
    * so a resurrection or a mistranslated read hash-mismatches. */
  private val sqlCmapNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlColMapFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlCmapNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gcmap${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlcmap").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.cm " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)")
      spark.sql(s"INSERT INTO $name.default.cm " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "WHERE o_orderkey <= 500")
      val cat = new Catalog(spark, dir)
      val pre3 = VersionedTable.files(cat, "cm", 2L).toSet
      spark.sql(s"ALTER TABLE $name.default.cm RENAME COLUMN o_totalprice TO price")
      require(VersionedTable.files(cat, "cm", 3L).toSet == pre3,
        "RENAME COLUMN must be metadata-only (files carried verbatim)")
      spark.sql(s"INSERT INTO $name.default.cm " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "WHERE o_orderkey > 500 AND o_orderkey <= 900")
      val pre5 = VersionedTable.files(cat, "cm", 4L).toSet
      spark.sql(s"ALTER TABLE $name.default.cm DROP COLUMN o_orderstatus")
      require(VersionedTable.files(cat, "cm", 5L).toSet == pre5,
        "DROP COLUMN must be metadata-only (files carried verbatim)")
      spark.sql(s"ALTER TABLE $name.default.cm ADD COLUMN o_orderstatus STRING")
      spark.sql(s"INSERT INTO $name.default.cm " +
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
        "WHERE o_orderkey > 900 AND o_orderkey <= 1200")
      (name, dir)
    })
  }

  /** Fixture for the MERGE-ON-READ query (F50): a
    * `write.mode = 'merge-on-read'` table seeded by two INSERTs, then a
    * scattered UPDATE, a MERGE (matched update + unmatched insert), and
    * a 1-row DELETE — every row-level statement lands as DELETION
    * VECTORS (position sidecars) + appended rows, with all untouched
    * files carried verbatim (asserted file-for-file on the UPDATE). */
  private val sqlMorNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlMorFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlMorNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gmor${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlmor").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.t " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $name.default.t " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500")
      spark.sql(s"INSERT INTO $name.default.t " +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > 500 AND o_orderkey <= 1000")
      val cat = new Catalog(spark, dir)
      val pre = VersionedTable.files(cat, "t", 3L).toSet
      spark.sql(s"UPDATE $name.default.t SET o_totalprice = 0 " +
        "WHERE o_orderkey % 100 = 7")
      require(pre.subsetOf(VersionedTable.files(cat, "t", 4L).toSet),
        "merge-on-read UPDATE must carry every pre-existing file verbatim")
      require(VersionedTable.deletionVectors(cat, "t", 4L).nonEmpty,
        "merge-on-read UPDATE must record deletion vectors")
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
          |WHERE o_orderkey > 800 AND o_orderkey <= 1200""".stripMargin)
        .createOrReplaceTempView("graft_mor_src")
      spark.sql(s"""
        MERGE INTO $name.default.t t USING graft_mor_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice)
          VALUES (s.o_orderkey, s.o_totalprice)""")
      spark.sql(s"DELETE FROM $name.default.t WHERE o_orderkey = 3")
      name
    })
  }

  /** Fixture for the STORAGE-PARTITIONED-JOIN query (F64): an orders
    * fact and a customer-rollup dim, BOTH hash-bucketed on the join key
    * via `PARTITIONED BY (bucket(8, ...))` — the join must plan with
    * ZERO exchanges (asserted in-query) and zip true twins. */
  private val sqlSpjNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlSpjFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlSpjNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gspj${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlspj").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.fct " +
        "(o_custkey BIGINT, o_totalprice DOUBLE) " +
        "PARTITIONED BY (bucket(8, o_custkey))")
      spark.sql(s"INSERT INTO $name.default.fct " +
        "SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 4000")
      spark.sql(s"CREATE TABLE $name.default.dim " +
        "(c_custkey BIGINT, c_nationkey BIGINT) " +
        "PARTITIONED BY (bucket(8, c_custkey))")
      spark.sql(s"INSERT INTO $name.default.dim " +
        "SELECT c_custkey, CAST(c_nationkey AS BIGINT) FROM customer")
      name
    })
  }

  /** Fixture for the PARTITION-TRANSFORM query: an `events`-derived
    * table declared `PARTITIONED BY (days(ts))` — hidden partitioning.
    * Writes range-cluster files on the derived day, so the zone maps on
    * the RAW ts column prune a plain `WHERE ts >= ...` scan (asserted
    * in-query); no directory tree, no user-managed derived column. */
  private val sqlPtxNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlPtxFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlPtxNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gptx${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlptx").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.ev " +
        "(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE) " +
        "PARTITIONED BY (days(ts))")
      spark.sql(s"INSERT INTO $name.default.ev " +
        "SELECT event_id, ts, user_id, value FROM events")
      (name, dir)
    })
  }

  /** Fixture for the Z-ORDER CLUSTER BY query: a two-dimension
    * liquid-clustered table with `cluster.layout = 'zorder'` — every
    * write arranges on the Morton interleave of the clustered columns,
    * so zone maps prune BOTH dimensions (a lexicographic range gives
    * the second column none). The skip assertions live in the query
    * itself, driver-gated at both scales. */
  private val sqlZocNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, String)]()

  private def sqlZocFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlZocNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gzoc${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlzoc").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.z " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE) " +
        "CLUSTER BY (o_custkey, o_totalprice) " +
        "TBLPROPERTIES ('cluster.layout' = 'zorder')")
      spark.sql(s"INSERT INTO $name.default.z " +
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      (name, dir)
    })
  }

  /** Fixture for the BRANCH-REF query: the write-audit-publish cycle
    * driven entirely by NAMES — `create_branch` clones the head,
    * audit writes land on the branch, `fast_forward(table, name)`
    * publishes; a second branch stays unpublished and is read through
    * `VERSION AS OF '<name>'`. */
  private val sqlBrNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlBrFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlBrNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gbrq${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlbr").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.br " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.br " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      // published branch: doubled tail + a delete, one-commit publish
      val bt = spark.sql(s"CALL $name.system.create_branch('br', 'audit')")
        .head().getString(0)
      spark.sql(s"INSERT INTO $name.default.$bt " +
        "SELECT o_orderkey, o_totalprice * 2 FROM orders " +
        "WHERE o_orderkey > 1000 AND o_orderkey <= 1200")
      spark.sql(s"DELETE FROM $name.default.$bt WHERE o_orderkey <= 100")
      spark.sql(s"CALL $name.system.fast_forward('br', 'audit')")
      // unpublished branch: read through the ref only
      val wt = spark.sql(s"CALL $name.system.create_branch('br', 'wip')")
        .head().getString(0)
      spark.sql(s"INSERT INTO $name.default.$wt " +
        "SELECT o_orderkey, o_totalprice * 3 FROM orders " +
        "WHERE o_orderkey > 1200 AND o_orderkey <= 1300")
      name
    })
  }

  /** Fixture for the EQUALITY-TOMBSTONE upsert query: a keyed upsert
    * committed WITHOUT reading the target (batch data files + one key
    * tombstone per statement — the Iceberg equality-delete shape, the
    * O(batch) CDC-ingest path), read back through the SQL surface where
    * the tasks resolve the tombstones; a second statement stacks; a
    * scoped compact materializes PART of the table while the rest keeps
    * resolving at read. */
  private val sqlEquNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlEquFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlEquNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gequ${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlequ").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      val cat = new Catalog(spark, dir)
      VersionedTable.load(cat, "eq", spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000"),
        idOrder = Seq("o_orderkey"))
      // two write-without-read statements: updates double, inserts extend
      VersionedTable.upsertEqualityDelete(cat, "eq", spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
          |WHERE o_orderkey > 500 AND o_orderkey <= 1200""".stripMargin),
        keys = Seq("o_orderkey"))
      VersionedTable.upsertEqualityDelete(cat, "eq", spark.sql(
        """SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
          |WHERE o_orderkey > 1100 AND o_orderkey <= 1300""".stripMargin),
        keys = Seq("o_orderkey"))
      val v = VersionedTable.currentVersion(cat, "eq").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eq", v).nonEmpty,
        "the fixture must leave live tombstones for the read to resolve")
      name
    })
  }

  private val sqlEqdNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The DELETE-bearing equality history (5 versions, all write-without-
    * read — no statement ever probes the target):
    *   v1 keyed load  o_orderkey ≤ 1000   (verified key-unique base)
    *   v2 eq upsert   (500, 1200] → 2×    (updates + inserts)
    *   v3 eq DELETE   k % 7 = 0, k ≤ 900  (tombstone-only commit)
    *   v4 MIXED batch (1100, 1300] → 3× WHILE deleting (950, 1000]
    *      (one commit: tombstone = both key sets, data = upserts only)
    *   v5 CALL eq_delete k > 1250         (the pure-SQL spelling)
    * Left live (no compact) so reads resolve the full delete/upsert
    * stack in-task. */
  private def sqlEqdFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlEqdNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"geqd${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqleqd").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      val cat = new Catalog(spark, dir)
      VersionedTable.load(cat, "eqd", spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000"),
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
      VersionedTable.upsertEqualityDelete(cat, "eqd", spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
          |WHERE o_orderkey > 500 AND o_orderkey <= 1200""".stripMargin),
        keys = Seq("o_orderkey"))
      VersionedTable.deleteKeysEquality(cat, "eqd", spark.sql(
        """SELECT o_orderkey FROM orders
          |WHERE o_orderkey % 7 = 0 AND o_orderkey <= 900""".stripMargin),
        Seq("o_orderkey"))
      VersionedTable.upsertEqualityDelete(cat, "eqd", spark.sql(
        """SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
          |WHERE o_orderkey > 1100 AND o_orderkey <= 1300""".stripMargin),
        keys = Seq("o_orderkey"),
        deleteKeyRows = Some(spark.sql(
          """SELECT o_orderkey FROM orders
            |WHERE o_orderkey > 950 AND o_orderkey <= 1000""".stripMargin)))
      spark.sql(s"CALL $name.system.eq_delete('eqd', " +
        "'SELECT o_orderkey FROM orders WHERE o_orderkey > 1250', " +
        "'o_orderkey')")
      val v = VersionedTable.currentVersion(cat, "eqd").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eqd", v).nonEmpty,
        "the fixture must leave live tombstones for the read to resolve")
      name
    })
  }

  /** Fixture for the ROUTED SQL DELETE query (F87): a table that opted
    * in via `write.delete.mode = equality` takes plain `DELETE FROM`
    * statements whose conditions are pure equality tuples (IN lists,
    * OR-of-equalities) as WRITE-WITHOUT-READ tombstone commits — the
    * fixture asserts the head operations are `eq-delete` (a silent
    * fallback to the boundary-rewrite path would still pass the
    * oracle). Tombstones stay live; reads resolve. */
  private val sqlEqDsNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlEqDsFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlEqDsNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"geqr${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqleqr").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.eqs " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.delete.mode' = 'equality')")
      spark.sql(s"INSERT INTO $name.default.eqs " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(s"""CALL $name.system.eq_upsert('eqs',
        'SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
         WHERE o_orderkey > 500 AND o_orderkey <= 1200', 'o_orderkey')""")
      spark.sql(s"DELETE FROM $name.default.eqs WHERE o_orderkey IN " +
        "(10, 20, 30, 40, 50, 60, 70, 80, 90, 100)")
      spark.sql(s"DELETE FROM $name.default.eqs " +
        "WHERE o_orderkey = 600 OR o_orderkey = 700")
      val cat = new Catalog(spark, dir)
      val ops = VersionedTable.history(cat, "eqs")
        .orderBy(col("version").desc).select("operation")
        .limit(2).collect().map(_.getString(0)).toSeq
      require(ops == Seq("eq-delete", "eq-delete"),
        s"the fixture's DELETEs must route to the equality path, got $ops")
      val v = VersionedTable.currentVersion(cat, "eqs").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eqs", v).nonEmpty,
        "the routed-delete fixture must leave live tombstones")
      name
    })
  }

  /** Fixture for the EVOLVING equality-upsert query: statement 2 WIDENS
    * the schema (a new `flag` column — pre-evolution rows read null),
    * statement 3 OMITS it (null-filled, delete+insert semantics) — the
    * loader-ensure evolution contract on the write-without-read path.
    * Tombstones stay live; reads resolve. */
  private val sqlEquEvNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlEquEvFixture(spark: SparkSession, sfDir: String): Catalog = {
    val key = (spark.sparkContext.applicationId, sfDir)
    val dir = sqlEquEvNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val d = java.nio.file.Files.createTempDirectory("graft-sqleqev").toString
      val cat = new Catalog(spark, d)
      VersionedTable.load(cat, "eqv", spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800"),
        idOrder = Seq("o_orderkey"))
      VersionedTable.upsertEqualityDelete(cat, "eqv", spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 'x' AS flag
          |FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 900""".stripMargin),
        keys = Seq("o_orderkey"))
      VersionedTable.upsertEqualityDelete(cat, "eqv", spark.sql(
        """SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
          |WHERE o_orderkey > 900 AND o_orderkey <= 1100""".stripMargin),
        keys = Seq("o_orderkey"))
      val v = VersionedTable.currentVersion(cat, "eqv").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eqv", v).nonEmpty,
        "the evolve fixture must leave live tombstones")
      d
    })
    new Catalog(spark, dir)
  }

  /** Fixture for the PURE-SQL equality-upsert query: the same history
    * as [[sqlEquFixture]] driven ENTIRELY through SQL — CREATE/INSERT
    * for the base, then `CALL eq_upsert(...)` twice (the F76 procedure
    * surface: a SQL user reaches the write-without-read ingest path
    * with no library import). Tombstones stay live; reads resolve. */
  private val sqlEquSqlNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlEquSqlFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlEquSqlNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"geqs${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqleqs").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.eq " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE)")
      spark.sql(s"INSERT INTO $name.default.eq " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(s"""CALL $name.system.eq_upsert('eq',
        'SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
         WHERE o_orderkey > 500 AND o_orderkey <= 1200', 'o_orderkey')""")
      spark.sql(s"""CALL $name.system.eq_upsert('eq',
        'SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
         WHERE o_orderkey > 1100 AND o_orderkey <= 1300', 'o_orderkey')""")
      val cat = new Catalog(spark, dir)
      val v = VersionedTable.currentVersion(cat, "eq").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eq", v).nonEmpty,
        "the SQL eq_upsert fixture must leave live tombstones")
      name
    })
  }

  /** Fixture for the ROUTED-MERGE query: the same history as
    * [[sqlEquSqlFixture]], but statement 3 is a standard SQL
    * `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` that [[graft.sources.RouteEqualityMerge]] routes to
    * the write-without-read equality path (the table opted in with
    * `write.merge.mode = equality`; keys were recorded by the first
    * `CALL eq_upsert`). The fixture asserts the route actually took the
    * equality path (head operation `eq-upsert`) — a silent fallback to
    * the reading rewrite would still pass the oracle. */
  private val sqlEqmNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlEqmFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlEqmNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"geqm${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqleqm").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE TABLE $name.default.eqm " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.merge.mode' = 'equality')")
      spark.sql(s"INSERT INTO $name.default.eqm " +
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      spark.sql(s"""CALL $name.system.eq_upsert('eqm',
        'SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM orders
         WHERE o_orderkey > 500 AND o_orderkey <= 1200', 'o_orderkey')""")
      spark.sql(s"""MERGE INTO $name.default.eqm t
        USING (SELECT o_orderkey, o_totalprice * 3 AS o_totalprice
               FROM orders
               WHERE o_orderkey > 1100 AND o_orderkey <= 1300) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val cat = new Catalog(spark, dir)
      val op = VersionedTable.history(cat, "eqm")
        .orderBy(col("version").desc).select("operation").head().getString(0)
      require(op == "eq-upsert",
        s"the fixture's MERGE must route to the equality path, got '$op'")
      val v = VersionedTable.currentVersion(cat, "eqm").get
      require(VersionedTable.eqTombstoneKeyCols(cat, "eqm", v).nonEmpty,
        "the routed-merge fixture must leave live tombstones")
      name
    })
  }

  /** Fixture for the SQL NAMESPACES query (F51): two namespaces in one
    * catalog — the reference's two-DB model (easy_etl/__init__.py:8-10
    * wires a source and a target database) in pure SQL: `src` holds a
    * lineitem-derived fact, `tgt` a supplier dim, same table NAME in
    * both to prove full independence; the query joins across. */
  private val sqlNsNames =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def sqlNsFixture(spark: SparkSession, sfDir: String): String = {
    val key = (spark.sparkContext.applicationId, sfDir)
    sqlNsNames.computeIfAbsent(key, { _ =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val name = s"gns${math.abs(sfDir.hashCode)}"
      val dir = java.nio.file.Files.createTempDirectory("graft-sqlns").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.dir", dir)
      spark.sql(s"CREATE NAMESPACE $name.src")
      spark.sql(s"CREATE NAMESPACE $name.tgt")
      spark.sql(s"CREATE TABLE $name.src.d AS " +
        "SELECT l_orderkey, l_suppkey, l_quantity FROM lineitem " +
        "WHERE l_orderkey <= 1500")
      spark.sql(s"CREATE TABLE $name.tgt.d AS " +
        "SELECT s_suppkey, s_nationkey FROM supplier")
      require(!spark.sql(s"SHOW TABLES IN $name.default")
        .select("tableName").collect().map(_.getString(0)).contains("d"),
        "namespaced tables must not leak into default")
      name
    })
  }

  /** The DuckDB replay of each version's state (CTE names v1..v4). */
  private val versionedStates: String =
    """g1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000),
      |g2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |       WHERE o_orderkey > 2000 AND o_orderkey <= 3000),
      |g3 AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
      |       FROM orders WHERE o_orderkey > 2500 AND o_orderkey <= 3500),
      |v1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, g1.* FROM g1),
      |v2 AS (SELECT * FROM v1
      |       UNION ALL
      |       SELECT (SELECT count(*) FROM g1) + row_number() OVER (ORDER BY o_orderkey) AS id, g2.*
      |       FROM g2),
      |upd AS (SELECT v2.id, v2.o_orderkey,
      |               coalesce(g3.o_orderstatus, v2.o_orderstatus) AS o_orderstatus,
      |               coalesce(g3.o_totalprice, v2.o_totalprice) AS o_totalprice
      |        FROM v2 LEFT JOIN g3 USING (o_orderkey)),
      |fresh AS (SELECT (SELECT max(id) FROM v2) + row_number() OVER (ORDER BY g3.o_orderkey) AS id,
      |                 g3.* FROM g3 LEFT JOIN v2 USING (o_orderkey)
      |          WHERE v2.id IS NULL),
      |v3 AS (SELECT * FROM upd UNION ALL SELECT * FROM fresh),
      |v4 AS (SELECT * FROM v3 WHERE o_orderkey > 500)""".stripMargin

  val queries: Map[String, Q] = Map(

    // F16 time travel: all four versions read back via their manifests;
    // every version's file set is immutable once committed (append reuses
    // the parent's files — spec-asserted in VersionedTableSpec)
    "q_time_travel" -> { (spark, sfDir) =>
      val tgt = versionedFixture(spark, sfDir)
      (1L to 4L).map { v =>
        VersionedTable.readVersion(tgt, "t", v)
          .withColumn("version", lit(v))
      }.reduce(_.unionByName(_))
        .select("version", "id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("version", "id")
    },

    // F17 change-data-feed: the v2→v4 diff carries all three ops —
    // (2500,3000] updated, (3000,3500] inserted, ≤500 deleted — computed
    // from the two manifests' UNSHARED files only (VersionedTable.changes
    // prunes shared files: immutable, so they can't produce a feed row;
    // plan-asserted in VersionedTableSpec). Bench note: this query is
    // alphabetically first of the three sharing the versioned fixture, so
    // its time is ~0.8 s of diff plus the one-time 4-version build
    // (~5 s of small-data load orchestration at sf0.1 — cost of the
    // fixture, not of the feed).
    "q_change_feed" -> { (spark, sfDir) =>
      val tgt = versionedFixture(spark, sfDir)
      VersionedTable.changes(tgt, "t", 2L, 4L, Seq("o_orderkey"))
        .select("op", "o_orderkey", "id", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // version drift monitor: one-pass column profiles of two versions of
    // the SAME table side by side (row counts, null counts, min/max, KMV
    // ndv) — the observability query a lake runs after every load to catch
    // silent upstream drift; here v2→v4 shows the upsert doubling prices
    // and the delete dropping low keys
    "q_version_drift" -> { (spark, sfDir) =>
      val tgt = versionedFixture(spark, sfDir)
      Seq(2L, 4L).map { v =>
        val d = VersionedTable.readVersion(tgt, "t", v)
          .select(col("o_orderkey"), col("o_orderstatus"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
        graft.operators.Profile.profile(d,
            Seq("o_orderkey", "o_orderstatus", "cents"), k = 256)
          .withColumn("version", lit(v))
      }.reduce(_.unionByName(_))
        .select("version", "column", "n", "nulls", "min_s", "max_s", "ndv_est")
        .orderBy("version", "column")
    },

    // F18 incremental materialized view: three O(batch) refreshes must
    // land exactly where one O(base) recomputation lands (the oracle IS
    // the full recomputation)
    "q_matview_incremental" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        """SELECT l_returnflag, l_linestatus, l_orderkey,
          |       CAST(l_quantity AS BIGINT) AS qty FROM lineitem""".stripMargin)
      val aggs = Seq(
        MaterializedAgg.AggCol("count", "", "n_rows"),
        MaterializedAgg.AggCol("sum", "qty", "sum_qty"),
        MaterializedAgg.AggCol("min", "l_orderkey", "min_ok"),
        MaterializedAgg.AggCol("max", "l_orderkey", "max_ok"))
      val cuts = Seq(
        col("l_orderkey") <= 2000,
        col("l_orderkey") > 2000 && col("l_orderkey") <= 4000,
        col("l_orderkey") > 4000)
      cuts.foreach { c =>
        MaterializedAgg.refresh(tgt, "v", base.where(c),
          Seq("l_returnflag", "l_linestatus"), aggs)
      }
      MaterializedAgg.read(tgt, "v")
        .orderBy("l_returnflag", "l_linestatus")
    },

    // F18b: partial-state aggregates in the view — avg stored as (sum,cnt)
    // partials over an integral source (exact cross-engine), ndv as a
    // mergeable KMV buffer unioned across refreshes; three O(batch)
    // refreshes must finalize exactly where one full recomputation lands
    "q_matview_avg_ndv" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        """SELECT l_returnflag, l_linestatus, l_orderkey,
          |       CAST(l_quantity AS BIGINT) AS qty FROM lineitem""".stripMargin)
      val gb = Seq("l_returnflag", "l_linestatus")
      val aggs = Seq(
        MaterializedAgg.AggCol("avg", "qty", "avg_qty"),
        MaterializedAgg.AggCol("ndv", "l_orderkey", "ndv_ok"))
      val cuts = Seq(
        col("l_orderkey") <= 2000,
        col("l_orderkey") > 2000 && col("l_orderkey") <= 4000,
        col("l_orderkey") > 4000)
      cuts.foreach { c => MaterializedAgg.refresh(tgt, "v", base.where(c), gb, aggs) }
      MaterializedAgg.read(tgt, "v", gb, aggs)
        .orderBy("l_returnflag", "l_linestatus")
    },

    // F18c: CDC-maintained view — initialize from the v2 snapshot, then
    // apply the v2→v4 change feed (updates that MOVE rows between groups,
    // inserts, deletes) with retraction semantics; the result must land
    // exactly on a fresh aggregation of v4 (the oracle). O(feed) per
    // maintenance step — the piece that keeps a dashboard consistent under
    // a mutable 100 TB base, not just an append-only one.
    "q_matview_cdc" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val viewTgt = tmpCat(spark)
      val gb = Seq("o_orderstatus")
      val aggs = Seq(
        MaterializedAgg.AggCol("count", "", "n_rows"),
        MaterializedAgg.AggCol("sum", "cents", "sum_cents"),
        MaterializedAgg.AggCol("avg", "cents", "avg_cents"))
      def withCents(d: DataFrame, c: String, out: String) =
        d.withColumn(out, floor(col(c) * 100).cast("long"))
      val base2 = withCents(
        VersionedTable.readVersion(vt, "t", 2L), "o_totalprice", "cents")
      MaterializedAgg.refresh(viewTgt, "v", base2, gb, aggs)
      val feed = withCents(withCents(
          VersionedTable.changes(vt, "t", 2L, 4L, Seq("o_orderkey"),
            includeOld = true),
          "o_totalprice", "cents"), "o_totalprice__old", "cents__old")
      MaterializedAgg.applyChanges(viewTgt, "v", feed, gb, aggs)
      // active groups only: a fully-retracted group keeps a zero row (the
      // keyed upsert cannot delete), which a fresh aggregation never has
      MaterializedAgg.read(viewTgt, "v", gb, aggs)
        .where(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    },

    // F24 manifest zone maps: per-file [min,max] column ranges recorded
    // at commit time (parquet footers, metadata-only) let a filtered read
    // skip whole files on the DRIVER before any scan task launches —
    // Delta/Iceberg-style data skipping on the versioned layer. The
    // fixture is three appends with disjoint o_orderkey ranges; the
    // range predicate must scan only the middle batch's files (enforced
    // in-query: a regression that stops skipping fails the registry run,
    // not just a spec). The oracle replays the three appends' state.
    "q_versioned_skipping" -> { (spark, sfDir) =>
      val tgt = skippingFixture(spark, sfDir)
      val pred = col("o_orderkey") > 600L && col("o_orderkey") <= 900L
      require(VersionedTable.skippedFiles(tgt, "t", 3L, pred).nonEmpty,
        "zone maps must skip the out-of-range batches' files")
      VersionedTable.readWhere(tgt, "t", 3L, pred)
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F29 recluster (OPTIMIZE ZORDER's 1-D case): two fully-overlapping
    // appends leave zone maps unable to skip; one range-sort rewrite
    // gives every file a narrow disjoint key range, after which the same
    // predicate skips most files (enforced in-query). Logical state is
    // unchanged — the oracle replays the two appends and filters.
    "q_versioned_recluster" -> { (spark, sfDir) =>
      val tgt = reclusterFixture(spark, sfDir)
      val head = VersionedTable.currentVersion(tgt, "t").get
      val pred = col("o_orderkey") > 650L && col("o_orderkey") <= 750L
      require(VersionedTable.skippedFiles(tgt, "t", head, pred).nonEmpty,
        "reclustered files must be skippable on the clustered key")
      VersionedTable.readWhere(tgt, "t", head, pred)
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F21 versioned × bucketed layout composition: a versioned table
    // carrying the hash-bucket layout takes BUCKET-SCOPED upserts — the
    // v2 commit rewrites only the buckets the batch hashes into and
    // carries every other file forward (spec-asserted file-level in
    // VersionedBucketedSpec); the oracle replays the merged state. The
    // 100 TB point: snapshot isolation and O(touched-buckets) writes in
    // one layer, instead of choosing between them.
    "q_upsert_versioned_bucketed" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 2000),
        idOrder = Seq("o_orderkey"), bucketBy = Some((Seq("o_orderkey"), 8)))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 1500 && col("o_orderkey") <= 2500)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
      VersionedTable.read(tgt, "t")
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F17b change feed across SCHEMA EVOLUTION: v2 updates a slice, v3
    // widens the schema and appends; the v1→v3 feed aligns the schemas
    // (added column null-filled on the old side) instead of refusing —
    // updates, inserts, and the widened column all land in one feed.
    "q_change_feed_evolve" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 2000),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 500 && col("o_orderkey") <= 1000)
          .withColumn("o_orderstatus", lit("U")),
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") > 2000 && col("o_orderkey") <= 2500)
          .withColumn("o_priok", (col("o_orderkey") % 10).cast("long")),
        idOrder = Seq("o_orderkey"))
      VersionedTable.changes(tgt, "t", 1L, 3L, Seq("o_orderkey"))
        .select("op", "o_orderkey", "id", "o_orderstatus", "o_totalprice",
          "o_priok")
        .orderBy("o_orderkey")
    },

    // F18d: CDC-maintained view carrying NON-RETRACTABLE aggregates
    // (min/max/ndv) — the retractables fold as signed deltas, min/max/ndv
    // re-aggregate from the post-change snapshot for the TOUCHED GROUPS
    // ONLY and splice over the view (spec-asserted single-bucket rewrite
    // in MaterializedAggSpec); the result must land exactly on a fresh
    // aggregation of v4.
    "q_matview_cdc_minmax" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val viewTgt = tmpCat(spark)
      val gb = Seq("o_orderstatus")
      val aggs = Seq(
        MaterializedAgg.AggCol("count", "", "n_rows"),
        MaterializedAgg.AggCol("min", "cents", "min_cents"),
        MaterializedAgg.AggCol("max", "cents", "max_cents"),
        MaterializedAgg.AggCol("ndv", "o_orderkey", "ndv_ok"))
      def withCents(d: DataFrame, c: String, out: String) =
        d.withColumn(out, floor(col(c) * 100).cast("long"))
      val base2 = withCents(
        VersionedTable.readVersion(vt, "t", 2L), "o_totalprice", "cents")
      MaterializedAgg.refresh(viewTgt, "v", base2, gb, aggs)
      val feed = withCents(withCents(
          VersionedTable.changes(vt, "t", 2L, 4L, Seq("o_orderkey"),
            includeOld = true),
          "o_totalprice", "cents"), "o_totalprice__old", "cents__old")
      val snapshot = withCents(
        VersionedTable.readVersion(vt, "t", 4L), "o_totalprice", "cents")
      MaterializedAgg.applyChanges(viewTgt, "v", feed, snapshot, gb, aggs)
      MaterializedAgg.read(viewTgt, "v", gb, aggs)
        .where(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    },

    // ST8 streaming CDC source: the versioned table's commit history read
    // back as version-watermarked incremental batches and drained into a
    // MIRROR table (bootstrap + one change batch per version, idempotent
    // keyed apply) — the mirror's head state must hash-match the source's
    // (the oracle replays v4). The source twin of the streaming matview
    // sink: together they close the loop table → feed → table.
    "q_stream_cdc_source" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val dst = tmpCat(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc").toString
      graft.streaming.CdcSource.mirrorOnce(vt, "t", Seq("o_orderkey"),
        dst, "m", ckpt)
      VersionedTable.read(dst, "m")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ST9 CDC-source-driven view maintenance: the ST8 drain loop with the
    // F18c/F18d maintainers as the consumer — base table commits stream
    // into a live dashboard view (bootstrap snapshot, then per-version
    // retraction feeds; min routes through the snapshot splice); the
    // drained view must land exactly on a fresh aggregation of v4.
    "q_matview_cdc_stream" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val viewTgt = tmpCat(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcv").toString
      val gb = Seq("o_orderstatus")
      val aggs = Seq(
        MaterializedAgg.AggCol("count", "", "n_rows"),
        MaterializedAgg.AggCol("sum", "cents", "sum_cents"),
        MaterializedAgg.AggCol("min", "cents", "min_cents"))
      def project(d: DataFrame): DataFrame = {
        val a = if (d.columns.contains("o_totalprice"))
          d.withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
        else d
        if (a.columns.contains("o_totalprice__old"))
          a.withColumn("cents__old",
            floor(col("o_totalprice__old") * 100).cast("long"))
        else a
      }
      graft.streaming.CdcSource.maintainView(vt, "t", Seq("o_orderkey"),
        viewTgt, "v", gb, aggs, ckpt, project)
      MaterializedAgg.read(viewTgt, "v", gb, aggs)
        .where(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    },

    // F26 the reference pipeline API over a VERSIONED target: the same
    // extract → load / incremental-{} → upsert flow every reference user
    // runs, with the target constructed as VersionedCatalog — each load
    // lands as a version (both proven here by emitting v1 AND v2), the
    // incremental watermark reads from the head manifest's footers, ids
    // continue across versions. Zero API change.
    "q_etl_versioned" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      val tgt = new graft.etl.VersionedCatalog(spark,
        java.nio.file.Files.createTempDirectory("graft-vq").toString)
      val p = new graft.etl.EtlProcess(src, tgt, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
      p.load()
      p.extract("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderkey > {} AND o_orderkey <= 2000",
        writePkField = Some("o_orderkey"))
      p.load()
      Seq(1L, 2L).map { v =>
        VersionedTable.readVersion(tgt, "t", v).withColumn("version", lit(v))
      }.reduce(_.unionByName(_))
        .select("version", "id", "o_orderkey", "o_totalprice")
        .orderBy("version", "id")
    },

    // ST10 the REAL DataSource-V2 streaming CDC source: the same
    // versioned history as ST8, drained through an actual
    // spark.readStream query (format "graft-cdc") with engine-managed
    // checkpoints and Trigger.AvailableNow, foreachBatch-applied into a
    // mirror with the idempotent keyed apply — end-to-end exactly-once
    // through Structured Streaming's own offset log. Oracle: v4 replay.
    "q_stream_cdc_v2" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val dst = tmpCat(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcv2").toString
      // NO `keys` option: the fixture's v3 keyed upsert recorded
      // o_orderkey in the manifest, and the source defaults from it
      val q = spark.readStream.format("graft-cdc")
        .option("dir", vt.dir).option("table", "t").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          graft.streaming.CdcSource.applyFeed(dst, "m", df, Seq("o_orderkey"))
        }
        .start()
      q.awaitTermination()
      VersionedTable.read(dst, "m")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ST13 the NATIVE streaming sink: writeStream.format("graft") lands
    // each epoch as ONE versioned commit with full loader semantics
    // (bucketed keyed upsert, continuing ids), stamped with its epoch id
    // — the injected crash replay (fixture) must be skipped, so exactly
    // two versions exist. Oracle: the two-batch merge replay (same as
    // q_versioned_v2_write).
    "q_stream_sink_v2" -> { (spark, sfDir) =>
      val tgt = streamSinkFixture(spark, sfDir)
      require(VersionedTable.versions(tgt, "t") == Seq(1L, 2L),
        "one versioned commit per epoch; the replayed epoch must be " +
          s"skipped — got versions ${VersionedTable.versions(tgt, "t")}")
      VersionedTable.read(tgt, "t")
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // ST14 the APPEND-TAIL streaming read: readStream.format("graft")
    // over the 3-append fixture — bootstrap snapshot (v1), then one
    // batch per appended version (paced), plain rows with no op column;
    // the drained tail must reconstruct the table exactly (oracle: the
    // three-slice state replay). Batch count enforced in-query.
    "q_stream_append_tail" -> { (spark, sfDir) =>
      val tgt = skippingFixture(spark, sfDir)
      val out = java.nio.file.Files.createTempDirectory("graft-tail").toString + "/rows"
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = spark.readStream.format("graft")
        .option("dir", tgt.dir).option("table", "t")
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-tail-ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) { batches.incrementAndGet()
            b.write.mode("append").parquet(out) }
        }
        .start()
      q.awaitTermination()
      require(batches.get() == 3,
        s"bootstrap + two paced append batches expected, got ${batches.get()}")
      spark.read.parquet(out)
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F39 SQL row-level DML: MERGE INTO (matched update + not-matched
    // insert) and a ranged UPDATE on a versioned catalog table —
    // group-based copy-on-write through the zone-pruned scan, one
    // versioned commit per statement (4 versions total, enforced); the
    // pre-merge state still time-travels. Oracle replays the merge and
    // update relationally.
    "q_versioned_sql_merge" -> { (spark, sfDir) =>
      val name = sqlMergeFixture(spark, sfDir)
      val head = spark.sql(
        s"""SELECT 'head' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |FROM $name.default.t""".stripMargin)
      val pre = spark.sql(
        s"""SELECT 'pre' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |FROM $name.default.t VERSION AS OF 1""".stripMargin)
      head.unionByName(pre).orderBy("part", "k")
    },

    // F39 full MERGE: ONE statement with matched-update, not-matched-
    // insert AND the third clause family `WHEN NOT MATCHED BY SOURCE`
    // (conditional DELETE of stale keys + deactivation UPDATE of the
    // rest — the standard SCD sync), run identically on a copy-on-write
    // table and a merge-on-read twin (which must answer byte-identically
    // while committing deletion vectors — asserted in the fixture). The
    // oracle replays the merge relationally.
    "q_versioned_sql_merge_full" -> { (spark, sfDir) =>
      val name = sqlMergeFullFixture(spark, sfDir)
      val cow = spark.sql(
        s"""SELECT 'cow' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v, active
           |FROM $name.default.t""".stripMargin)
      val mor = spark.sql(
        s"""SELECT 'mor' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v, active
           |FROM $name.default.tm""".stripMargin)
      cow.unionByName(mor).orderBy("part", "k")
    },

    // MERGE WITH SCHEMA EVOLUTION (the AUTOMATIC_SCHEMA_EVOLUTION
    // capability): the source's extra column lands as a metadata-only
    // ADD COLUMN before the rewrite — unmatched pre-existing rows read
    // NULL, matched/inserted rows carry the source values. The oracle
    // replays the evolved merge relationally.
    "q_versioned_merge_evolve" -> { (spark, sfDir) =>
      val name = sqlMergeFullFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v, grade
        FROM $name.default.te ORDER BY k""")
    },

    // F64 STORAGE-PARTITIONED JOIN: both tables hash-bucketed on the
    // join key — the plan must contain ZERO exchanges (asserted
    // in-query: the whole point is eliminating the two fact shuffles at
    // 100 TB), the bucket ids must zip true twins (hash-checked by the
    // oracle's relational replay), and aggregation on top is exact.
    "q_versioned_spj" -> { (spark, sfDir) =>
      val name = sqlSpjFixture(spark, sfDir)
      // the JOIN itself must be exchange-free (the rollup on top then
      // legitimately shuffles once for its own non-bucket grouping key)
      val bare = spark.sql(s"""
        SELECT f.o_custkey FROM $name.default.fct f
        JOIN $name.default.dim d ON f.o_custkey = d.c_custkey""")
      val nShuffles = "Exchange hashpartitioning".r
        .findAllIn(bare.queryExecution.executedPlan.toString).size
      require(nShuffles == 0,
        s"the co-bucketed join must plan ZERO exchanges, found $nShuffles")
      spark.sql(s"""
        SELECT d.c_nationkey, count(*) AS n,
               sum(CAST(floor(f.o_totalprice * 100) AS BIGINT)) AS v
        FROM $name.default.fct f JOIN $name.default.dim d
          ON f.o_custkey = d.c_custkey
        GROUP BY d.c_nationkey ORDER BY d.c_nationkey""")
    },

    // HIDDEN PARTITIONING: `PARTITIONED BY (days(ts))` records a
    // derivation, every write range-clusters files on the derived day,
    // and a scan filtering on the RAW ts column prunes files through
    // the ordinary zone maps (asserted in-query — the 100 TB shape:
    // event-time queries touch O(days asked), not O(table)). The
    // oracle replays the filtered aggregate relationally.
    "q_partition_transform" -> { (spark, sfDir) =>
      val (name, dir) = sqlPtxFixture(spark, sfDir)
      val lib = new Catalog(spark, dir)
      val v = VersionedTable.currentVersion(lib, "ev").get
      val all = VersionedTable.files(lib, "ev", v)
      val cut = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
      val skipped = VersionedTable.skippedFiles(lib, "ev", v, col("ts") >= cut)
      require(skipped.nonEmpty && skipped.size < all.size,
        s"the raw-ts predicate must file-skip on the transform layout " +
          s"(${skipped.size} of ${all.size})")
      spark.sql(s"""
        SELECT CAST(CAST(ts AS DATE) AS STRING) AS day, count(*) AS n,
               CAST(sum(user_id) AS BIGINT) AS su,
               min(event_id) AS mn, max(event_id) AS mx
        FROM $name.default.ev
        WHERE ts >= TIMESTAMP'2024-01-21 00:00:00'
        GROUP BY CAST(ts AS DATE) ORDER BY day""")
    },

    // Z-ORDER CLUSTER BY — the multi-dimensional layout: with
    // cluster.layout='zorder' every write arranges on the Morton
    // interleave, so the SECOND clustered column file-skips too
    // (asserted in-query on BOTH dimensions — the lexicographic layout
    // this replaces prunes only the first). The oracle recomputes the
    // surviving rows; the layout never changes results.
    "q_zorder_cluster" -> { (spark, sfDir) =>
      val (name, dir) = sqlZocFixture(spark, sfDir)
      val lib = new Catalog(spark, dir)
      val v = VersionedTable.currentVersion(lib, "z").get
      val all = VersionedTable.files(lib, "z", v)
      require(all.size >= 3, s"need several files to measure pruning: $all")
      val skipSecond = VersionedTable.skippedFiles(lib, "z", v,
        col("o_totalprice") < 50000.0)
      require(skipSecond.nonEmpty,
        s"zorder must file-skip on the SECOND clustered column " +
          s"(0 of ${all.size} skipped for o_totalprice < 50000)")
      val skipFirst = VersionedTable.skippedFiles(lib, "z", v,
        col("o_custkey") < 15L)
      require(skipFirst.nonEmpty,
        s"zorder must keep the first column prunable (0 of ${all.size})")
      spark.sql(s"""
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.z
        WHERE o_totalprice < 50000.0
        ORDER BY o_orderkey""")
    },

    // EQUALITY-TOMBSTONE keyed upsert — the write-without-read CDC
    // ingest path: each statement commits batch files + a key tombstone
    // (never probing the target), reads resolve the tombstones in-task,
    // and the end state must equal the ordinary keyed merge. The oracle
    // replays last-writer-wins by key.
    "q_eq_upsert" -> { (spark, sfDir) =>
      val name = sqlEquFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.eq
        ORDER BY o_orderkey""")
    },

    // the write-without-read upsert from PURE SQL: `CALL eq_upsert(...)`
    // drives the same history as q_eq_upsert with no library import —
    // the fixture CREATEs, INSERTs, and CALLs twice; the read resolves
    // the live tombstones in-task. Shares q_eq_upsert's oracle shape.
    "q_eq_upsert_sql" -> { (spark, sfDir) =>
      val name = sqlEquSqlFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.eq
        ORDER BY o_orderkey""")
    },

    // standard SQL MERGE ROUTED to the write-without-read path
    // (RouteEqualityMerge): the table opted in via
    // write.merge.mode=equality, the merge is the star-shaped keyed
    // upsert, so it commits batch + tombstone with NO target read —
    // the fixture proves the route (head operation = eq-upsert) and
    // the read resolves the live tombstones. Shares q_eq_upsert's
    // oracle shape.
    "q_eq_merge" -> { (spark, sfDir) =>
      val name = sqlEqmFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.eqm
        ORDER BY o_orderkey""")
    },

    // schema evolution ON the write-without-read path: statement 2
    // widens (new `flag` column — pre-evolution rows, including the
    // tombstoned era's survivors, read null), statement 3 omits it
    // (null-filled). Oracle replays last-writer-wins with the same
    // null pattern.
    "q_eq_upsert_evolve" -> { (spark, sfDir) =>
      val cat = sqlEquEvFixture(spark, sfDir)
      VersionedTable.read(cat, "eqv")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("flag"))
        .orderBy("o_orderkey")
    },

    // EQUALITY DELETE — the write-without-read keyed delete beside the
    // upsert: tombstone-only commits (library + CALL eq_delete) and one
    // MIXED-op statement (upsert + delete keys, one commit — the
    // Debezium batch shape) stack over the upsert history; the read
    // resolves all five eras in-task. Oracle replays last-writer-wins
    // WITH the deletes.
    "q_eq_delete" -> { (spark, sfDir) =>
      val name = sqlEqdFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.eqd
        ORDER BY o_orderkey""")
    },

    // plain SQL `DELETE FROM` ROUTED to the write-without-read equality
    // path (F87): the opted-in fixture's IN-list and OR-of-equalities
    // DELETEs each committed ONE key-tombstone file with no target read
    // (fixture-asserted head operations = `eq-delete`); the query reads
    // the resolved end state with the tombstones still live.
    "q_eq_delete_sql" -> { (spark, sfDir) =>
      val name = sqlEqDsFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.eqs
        ORDER BY o_orderkey""")
    },

    // the change feed EMITS the write-without-read deletes: one span
    // over the delete-bearing history (v2 → v5) must surface tombstone-
    // only deletes (v3), the mixed statement's deletes+updates (v4), and
    // the SQL delete (v5) — with the deleted rows' OLD values. Rows both
    // inserted and deleted inside the span (the (1250,1300] triples)
    // must NOT appear.
    "q_change_feed_eq_delete" -> { (spark, sfDir) =>
      val name = sqlEqdFixture(spark, sfDir)
      val dir = spark.conf.get(s"spark.sql.catalog.$name.dir")
      val cat = new Catalog(spark, dir)
      VersionedTable.changes(cat, "eqd", 2L, 5L, Seq("o_orderkey"))
        .select(col("op"), col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy("op", "o_orderkey")
    },

    // change feed ACROSS live equality tombstones — the composition the
    // write-without-read ingest path exists for (CDC ingest feeding
    // incremental downstream consumers), with NO compact between ingest
    // and feed read: shared files whose applicable tombstone sets
    // differ enter both diff sides (zone-pruned by the delta
    // tombstones' key envelopes) and each side reads its version's
    // RESOLVED state. Two spans over the eq fixture's history: v1→v3
    // folds both statements last-writer-wins; v2→v3 retracts from v2's
    // resolved (doubled) values. The oracle replays the same
    // last-writer-wins states and diffs them by value.
    "q_change_feed_eq" -> { (spark, sfDir) =>
      val name = sqlEquFixture(spark, sfDir)
      val dir = spark.conf.get(s"spark.sql.catalog.$name.dir")
      val cat = new Catalog(spark, dir)
      def span(tag: String, a: Long, b: Long) =
        VersionedTable.changes(cat, "eq", a, b, Seq("o_orderkey"))
          .select(lit(tag).as("span"), col("op"), col("o_orderkey"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
      span("v1v3", 1L, 3L).unionByName(span("v2v3", 2L, 3L))
        .orderBy("span", "o_orderkey")
    },

    // NAMED BRANCHES over write-audit-publish — the cycle by one name:
    // create_branch clones the head, audit writes land on the branch,
    // fast_forward(table, name) publishes as ONE commit; an unpublished
    // second branch reads through VERSION AS OF '<name>' (the live
    // branch head, not a pinned version). The oracle replays both eras.
    "q_versioned_branch" -> { (spark, sfDir) =>
      val name = sqlBrFixture(spark, sfDir)
      val head = spark.sql(s"""SELECT 'head' AS era, o_orderkey,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.br""")
      val wip = spark.sql(s"""SELECT 'wip' AS era, o_orderkey,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM $name.default.br VERSION AS OF 'wip'""")
      head.unionByName(wip).orderBy("era", "o_orderkey")
    },

    // F37 SQL stored PROCEDURES: the ops surface in pure SQL — the
    // fixture rolls the table back via `CALL rollback`, the query reads
    // the post-rollback head and `CALL history`'s metadata row counts
    // (v1 CTAS data — one atomic commit via the staging catalog —
    // v2 insert, v3 rollback). The oracle replays all three counts.
    "q_versioned_sql_ops" -> { (spark, sfDir) =>
      val name = sqlOpsFixture(spark, sfDir)
      val head = spark.sql(
        s"""SELECT 'head' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |FROM $name.default.t""".stripMargin)
      val cloned = spark.sql(
        s"""SELECT 'clone' AS part, o_orderkey AS k,
           |  CAST(floor(o_totalprice * 100) AS BIGINT) AS v
           |FROM $name.default.t2""".stripMargin)
      val hist = spark.sql(s"CALL $name.system.history('t')")
        .select(lit("hist").as("part"), col("version").as("k"),
          col("total_rows").as("v"))
      head.unionByName(cloned).unionByName(hist).orderBy("part", "k")
    },

    // F30 metadata-only range delete: zone maps PROVE batch 1 lies
    // entirely under the predicate, so it drops from the manifest with
    // zero data I/O; only the boundary batch rewrites (both enforced
    // in-query from the manifests). Oracle replays the appends and
    // filters.
    "q_versioned_delete_where" -> { (spark, sfDir) =>
      val tgt = deleteWhereFixture(spark, sfDir)
      val f3 = VersionedTable.files(tgt, "t", 3L).toSet
      val f4 = VersionedTable.files(tgt, "t", 4L).toSet
      val dropped = f3 -- f4
      val added = f4 -- f3
      require(dropped.size > added.size,
        "the covered batch must drop WITHOUT a replacement rewrite " +
          s"(dropped=${dropped.size} added=${added.size})")
      VersionedTable.readVersion(tgt, "t", 4L)
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F31 OR + IS NULL file skipping: the disjunction's interval union
    // and the recorded null counts both exclude the middle batch — the
    // read must skip it (enforced in-query) and still answer exactly.
    "q_versioned_or_skip" -> { (spark, sfDir) =>
      val tgt = skippingFixture(spark, sfDir)
      val pred = (col("o_orderkey") > 100L && col("o_orderkey") <= 200L) ||
        (col("o_orderkey") > 1100L && col("o_orderkey") <= 1200L) ||
        col("o_orderstatus").isNull
      require(VersionedTable.skippedFiles(tgt, "t", 3L, pred).nonEmpty,
        "the OR's interval union must skip the middle batch")
      VersionedTable.readWhere(tgt, "t", 3L, pred)
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // ST11 exactly-once view maintenance under a crash-replay: after a
    // full drain, version 4's deltas are re-applied (stamped) and the
    // watermark rewound — the re-drain must SKIP the already-stamped
    // groups, landing exactly on a fresh aggregation of v4 (the oracle).
    // Before the per-group version stamps this double-counted the sums.
    "q_matview_exactly_once" -> { (spark, sfDir) =>
      val vt = versionedFixture(spark, sfDir)
      val viewTgt = tmpCat(spark)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-x1").toString
      val gb = Seq("o_orderstatus")
      // retractable-only aggs: the drains are feed-only (no snapshot
      // scans), and SUM is precisely the state a replay double-counts —
      // the splice path has its own query (q_matview_cdc_minmax)
      val aggs = Seq(
        MaterializedAgg.AggCol("count", "", "n_rows"),
        MaterializedAgg.AggCol("sum", "cents", "sum_cents"))
      def project(d: DataFrame): DataFrame = {
        val a = if (d.columns.contains("o_totalprice"))
          d.withColumn("cents", floor(col("o_totalprice") * 100).cast("long"))
        else d
        if (a.columns.contains("o_totalprice__old"))
          a.withColumn("cents__old",
            floor(col("o_totalprice__old") * 100).cast("long"))
        else a
      }
      graft.streaming.CdcSource.maintainView(vt, "t", Seq("o_orderkey"),
        viewTgt, "v", gb, aggs, ckpt, project)
      // CRASH SHAPE: v4 re-applied (stamped), watermark write lost
      val feed4 = project(VersionedTable.changes(vt, "t", 3L, 4L,
        Seq("o_orderkey"), includeOld = true))
      MaterializedAgg.applyChanges(viewTgt, "v", feed4, gb, aggs,
        sourceVersion = Some(4L))
      val wm = new org.apache.hadoop.fs.Path(ckpt, "version-watermark")
      val hfs = wm.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = hfs.create(wm, true)
      try out.write("3".getBytes("UTF-8")) finally out.close()
      require(graft.streaming.CdcSource.maintainView(vt, "t",
        Seq("o_orderkey"), viewTgt, "v", gb, aggs, ckpt, project) == Seq(4L),
        "the rewound drain must replay exactly version 4")
      MaterializedAgg.read(viewTgt, "v", gb, aggs)
        .where(col("n_rows") > 0)
        .orderBy("o_orderstatus")
    },

    // F32 manifest-log pointer: a 14-commit table answers versions() from
    // the _vlast pointer (no O(commits) directory listing per read —
    // enforced in-query via the pointer's presence and answer); the head
    // read is the ordinary explicit-file-list scan. Oracle replays the
    // 14 appends, whose ascending key slices make global ids one
    // row_number.
    "q_versioned_log_checkpoint" -> { (spark, sfDir) =>
      val tgt = checkpointFixture(spark, sfDir)
      require(new java.io.File(s"${tgt.dirPath("t")}.__vmeta/_vlast").exists(),
        "commits must maintain the version-log pointer")
      require(VersionedTable.versions(tgt, "t") == (1L to 14L),
        "pointer-based versions() must see all 14 commits")
      VersionedTable.read(tgt, "t")
        .select("id", "o_orderkey", "o_totalprice")
        .orderBy("id")
    },

    // ST12 bounded BATCH change feed through the same V2 source — the
    // `table_changes(a, b)` shape: spark.read.format("graft-cdc") with
    // startingVersion/endingVersion returns the exact (a, b] state diff
    // through the same manifest planner and partition-local diff readers
    // as the stream. Oracle: the v2↔v4 full-outer diff (same as
    // q_change_feed, which pins the library API twin).
    "q_cdc_batch_read" -> { (spark, sfDir) =>
      val tgt = versionedFixture(spark, sfDir)
      // `keys` omitted — defaulted from the manifest-recorded upsert keys
      spark.read.format("graft-cdc")
        .option("dir", tgt.dir).option("table", "t")
        .option("startingVersion", "2").option("endingVersion", "4").load()
        .select("op", "o_orderkey", "id", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // F33 the `graft` DataSource-V2 BATCH format: versioned tables via
    // spark.read.format("graft") with time travel as an option — pushed
    // filters prune whole files through the zone maps (partition-count
    // tripwire in-query, over the THIRD predicate walker: the public
    // sources.Filter algebra) and continue into parquet row-group
    // skipping. Oracle: the skipping fixture's replay, filtered.
    "q_versioned_v2_read" -> { (spark, sfDir) =>
      val tgt = skippingFixture(spark, sfDir)
      val nFiles = VersionedTable.files(tgt, "t", 3L).size
      val df = spark.read.format("graft")
        .option("dir", tgt.dir).option("table", "t")
        .option("versionAsOf", "3").load()
        .where(col("o_orderkey") > 600L && col("o_orderkey") <= 900L)
      require(df.rdd.getNumPartitions < nFiles,
        "pushed filters must drop whole files from the batch plan")
      df.select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F34 the V2 WRITE path: df.write.format("graft") creates and then
    // keyed-upserts a bucketed versioned table — two saves, two
    // manifest commits, ids continuing, layout recorded — then the head
    // reads back through the same format. Oracle replays the two-save
    // merge. SQL-first tooling gets the full loader semantics without a
    // graft import on either side.
    "q_versioned_v2_write" -> { (spark, sfDir) =>
      val tgt = v2WriteFixture(spark, sfDir)
      require(VersionedTable.versions(tgt, "t") == Seq(1L, 2L),
        "each save must land as one versioned commit")
      require(VersionedTable.bucketSpec(tgt, "t").contains((Seq("o_orderkey"), 8)),
        "the option-declared bucket layout must be recorded")
      spark.read.format("graft")
        .option("dir", tgt.dir).option("table", "t").load()
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    },

    // F35 DESCRIBE HISTORY from pure metadata: one row per retained
    // version of the 14-commit fixture, with EXACT row counts summed
    // from the manifests' per-file counts (zero data I/O — the same
    // counts the null-check pruner uses). The oracle recomputes each
    // version's cumulative row count from the slices.
    "q_versioned_history" -> { (spark, sfDir) =>
      val tgt = checkpointFixture(spark, sfDir)
      val h = VersionedTable.history(tgt, "t")
      require(h.where(col("total_rows").isNull).isEmpty,
        "every commit must carry metadata row counts")
      h.select(col("version"), col("total_rows"))
        .orderBy("version")
    },

    // F36 the SQL CATALOG surface: versioned tables managed in pure SQL
    // via a registered GraftCatalog — atomic CTAS (v1, one data-bearing
    // commit through the staging catalog), INSERT (v2), head SELECT and
    // VERSION AS OF time travel, no graft API anywhere in the pipeline.
    // Oracle replays both states.
    "q_versioned_sql_catalog" -> { (spark, sfDir) =>
      val name = sqlCatalogFixture(spark, sfDir)
      // both SQL time-travel syntaxes: VERSION AS OF, and TIMESTAMP AS
      // OF at 1500 s — between the pinned CTAS (1000 s) and INSERT
      // (2000 s) commits, so it must read exactly the CTAS state
      val t15 = tsLiteral(spark, 1500000L)
      spark.sql(s"""
        SELECT 'head' AS state, o_orderkey, o_totalprice
        FROM $name.default.t
        UNION ALL
        SELECT 'pre' AS state, o_orderkey, o_totalprice
        FROM $name.default.t VERSION AS OF 1
        UNION ALL
        SELECT 'ts' AS state, o_orderkey, o_totalprice
        FROM $name.default.t TIMESTAMP AS OF '$t15'
        ORDER BY state, o_orderkey""")
    },

    // F40 catalog-SQL JOIN over two versioned tables: the fact (two
    // commits) joins the supplier dim entirely through the SQL catalog.
    // The scan's reported manifest statistics make the dim broadcast at
    // PLAN time with no hint (plan shape pinned in GraftScanPlanningSpec;
    // DPP injects a runtime filter on eligible shapes) — this query pins
    // the RESULTS of that planner path against the oracle's replay.
    "q_versioned_sql_join" -> { (spark, sfDir) =>
      val name = sqlJoinFixture(spark, sfDir)
      spark.sql(s"""
        SELECT d.s_nationkey, count(*) AS n_items,
               sum(f.l_quantity) AS sum_qty,
               sum(f.l_extendedprice) AS sum_price
        FROM $name.default.fact f JOIN $name.default.dim d
          ON f.l_suppkey = d.s_suppkey
        WHERE f.l_orderkey % 3 = 0
        GROUP BY d.s_nationkey
        ORDER BY d.s_nationkey""")
    },

    // F42 SQL point lookups on a bucketed keyed table: the IN on the
    // bucket key plans only the pinned buckets' files (plan pinned in
    // GraftScanPlanningSpec; 1/N of the table at scale) — this query
    // pins the RESULTS, with one key upsert-overwritten between loads
    // and one key absent (no silent wrong-bucket skip either way).
    "q_versioned_point_lookup" -> { (spark, sfDir) =>
      val name = sqlPointFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM $name.default.pt
        WHERE o_orderkey IN (250, 750, 1250, 999999)
        ORDER BY o_orderkey""")
    },

    // F44 CHECK constraints: the commit-time row gate in pure SQL —
    // a violating INSERT refuses atomically (no version, no partial
    // rows), valid ones land; the oracle replays the valid batches
    // only. NULL satisfies (SQL CHECK semantics).
    "q_versioned_check" -> { (spark, sfDir) =>
      val name = sqlCheckFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_totalprice FROM $name.default.ck
        ORDER BY o_orderkey""")
    },

    // F45 manifest-answered aggregates: global count(*)/min/max through
    // the SQL catalog plan as a driver LocalScan — ZERO data tasks (the
    // plan shape is pinned in GraftScanPlanningSpec; at 100 TB this is
    // one JSON read instead of a full-table scan). The oracle replays
    // the same aggregates relationally.
    "q_versioned_agg_pushdown" -> { (spark, sfDir) =>
      val name = sqlCatalogFixture(spark, sfDir)
      spark.sql(s"""
        SELECT count(*) AS n_rows,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        FROM $name.default.t""")
    },

    // F49 SQL ALTER TABLE ADD COLUMN — metadata-only schema widening
    // through the catalog: the widened head reads BOTH eras (pre-ALTER
    // rows null in the new column), VERSION AS OF still serves the
    // narrow pre-ALTER schema, and the batch CDC feed aligns the eras
    // under the widened schema (old files null-filled). The fixture
    // asserts the ALTER carried v2's files verbatim — no rewrite.
    "q_alter_add_column" -> { (spark, sfDir) =>
      val (name, dir) = sqlAlterFixture(spark, sfDir)
      val head = spark.sql(s"""
        SELECT 'head' AS era, o_orderkey, o_totalprice, o_orderstatus
        FROM $name.default.al""")
      val pre = spark.sql(s"""
        SELECT 'pre' AS era, o_orderkey, o_totalprice,
               CAST(NULL AS STRING) AS o_orderstatus
        FROM $name.default.al VERSION AS OF 2""")
      val feed = spark.read.format("graft-cdc")
        .option("dir", dir).option("table", "al")
        .option("keys", "o_orderkey")
        .option("startingVersion", "1").option("endingVersion", "4").load()
        .select(concat(lit("cdc_"), col("op")).as("era"),
          col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      head.unionByName(pre).unionByName(feed)
        .orderBy("era", "o_orderkey")
    },

    // F54 COLUMN MAPPING — metadata-only RENAME/DROP COLUMN (name-mode
    // mapping, Delta's design): a rename re-labels only the manifest
    // (the column keeps its immutable PHYSICAL in-file name; every data
    // file carries verbatim — fixture-asserted), a drop retires the
    // physical name so the re-added namesake reads NULL for old rows
    // instead of the dead bytes, and the head filter on the RENAMED
    // column exercises the translated pushdown + re-keyed zone maps.
    // Time travel stays era-consistent (VERSION AS OF 2 reads the
    // original names and the pre-drop values).
    // F55 COLUMN DEFAULT VALUES — `ALTER TABLE ADD COLUMN ... DEFAULT`
    // stays metadata-only: the default freezes as the recorded schema's
    // EXISTS_DEFAULT and Spark's parquet readers fill it for files
    // physically lacking the column (pre-ADD rows read 'legacy' without
    // a byte rewritten — fixture-asserted files-verbatim), while
    // post-ADD inserts materialize real values. The WHERE on the
    // defaulted column exercises the mixed-era filter path.
    // F60 INSERT OVERWRITE — a same-schema versioned CONTENT REPLACE:
    // one commit swaps the rows (declaration/props carried), and the
    // pre-overwrite version still reads exactly (history survives the
    // swap — Spark's classic overwrite idiom without losing time travel).
    "q_insert_overwrite" -> { (spark, sfDir) =>
      val (name, _) = sqlOverwriteFixture(spark, sfDir)
      val head = spark.sql(s"""SELECT 'head' AS era, o_orderkey, o_totalprice
        FROM $name.default.ow""")
      val pre = spark.sql(s"""SELECT 'pre' AS era, o_orderkey, o_totalprice
        FROM $name.default.ow VERSION AS OF 2""")
      head.unionByName(pre).orderBy("era", "o_orderkey")
    },

    // F65 NAMED REFS (tags) — `VERSION AS OF 'raw_load'` resolves an
    // immutable tag → version pointer; the fixture vacuumed to
    // keep_last=1 and asserted the tag PINNED the tagged version, so
    // this read crossing the vacuum is the retention guarantee itself.
    "q_versioned_tag" -> { (spark, sfDir) =>
      val (name, _) = sqlTagFixture(spark, sfDir)
      val head = spark.sql(s"""SELECT 'head' AS era, o_orderkey, o_totalprice
        FROM $name.default.tg""")
      val tagged = spark.sql(s"""SELECT 'tag' AS era, o_orderkey, o_totalprice
        FROM $name.default.tg VERSION AS OF 'raw_load'""")
      head.unionByName(tagged).orderBy("era", "o_orderkey")
    },

    // F66 GENERATED COLUMNS — `cents` is never supplied by a write: the
    // INSERT omits it (engine computes), the UPDATE doubles its BASE
    // column (the copy-on-write row op recomputes), and the oracle
    // re-derives the expression over both eras from the source rows.
    "q_generated_column" -> { (spark, sfDir) =>
      val (name, _) = sqlGenFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_totalprice, cents FROM $name.default.gn
        ORDER BY o_orderkey""")
    },

    // F71 DECIMAL ZONE MAPS — the fixture asserted library-surface
    // pruning; this SQL predicate prunes through the DSv2 pushed-filter
    // path (unscaled per-file domains, literal rescaled per file's
    // recorded scale), and the oracle recomputes the survivors.
    "q_decimal_skipping" -> { (spark, sfDir) =>
      val (name, _) = sqlDzFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, CAST(amt * 100 AS BIGINT) AS cents,
               CAST((wamt - 10000000000000000000) * 100 AS BIGINT) AS wcents
        FROM $name.default.dz
        WHERE amt >= CAST(1000.25 AS DECIMAL(12,2))
          AND wamt >= CAST(10000000000000001000.25 AS DECIMAL(25,2))
        ORDER BY o_orderkey""")
    },

    // OPERATION-labeled DESCRIBE HISTORY — a known op sequence (create,
    // insert, CoW update, delete, rollback); the oracle recomputes the
    // expected (version, operation, total_rows) rows, so the commit
    // self-labeling is driver-gated end-to-end, not just spec-pinned.
    "q_history_operations" -> { (spark, sfDir) =>
      val (name, dirPath) = sqlHopFixture(spark, sfDir)
      VersionedTable.history(new Catalog(spark, dirPath), "hp")
        .select("version", "operation", "total_rows")
        .orderBy("version")
    },

    // F70 WRITE-AUDIT-PUBLISH — insert/delete/update staged on a
    // zero-copy clone, published by ONE fast_forward commit
    // (fixture-asserted); head = branch state, the pre-publish version
    // still time-travels, both eras oracle-recomputed.
    "q_versioned_wap" -> { (spark, sfDir) =>
      val (name, _) = sqlWapFixture(spark, sfDir)
      val head = spark.sql(s"""SELECT 'head' AS era, o_orderkey, o_totalprice
        FROM $name.default.wp""")
      val pre = spark.sql(s"""SELECT 'pre' AS era, o_orderkey, o_totalprice
        FROM $name.default.wp VERSION AS OF 2""")
      head.unionByName(pre).orderBy("era", "o_orderkey")
    },

    // SUBQUERY row-level ops — `DELETE ... WHERE k IN (SELECT ...)` on a
    // merge-on-read table routes through the delta row-level operation
    // (no pushed-filter spelling exists) and commits deletion vectors;
    // the head read applies them and the oracle recomputes the
    // survivors with the same subquery.
    "q_versioned_sql_subquery" -> { (spark, sfDir) =>
      val (name, _) = sqlSubqFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_totalprice FROM $name.default.sq
        ORDER BY o_orderkey""")
    },

    // F68 CLUSTER BY — a liquid-clustered table re-pointed mid-history:
    // the filter runs across both clustering eras' files (zone-map
    // pruning fires on whichever era's arrangement covers it) and the
    // oracle recomputes the surviving rows from the source.
    "q_cluster_by" -> { (spark, sfDir) =>
      val (name, _) = sqlCbyFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_totalprice FROM $name.default.cb
        WHERE o_totalprice > 50000.0 OR o_orderkey > 1300
        ORDER BY o_orderkey""")
    },

    // F67 IDENTITY COLUMNS — rid is engine-assigned (never in any
    // INSERT), monotone across the two commits, and STABLE through the
    // copy-on-write UPDATE rewrite; the oracle recomputes it as
    // row_number() over the deterministically-ordered insert stream.
    "q_identity_column" -> { (spark, sfDir) =>
      val (name, _) = sqlIdnFixture(spark, sfDir)
      spark.sql(s"""
        SELECT rid, o_orderkey, o_totalprice FROM $name.default.idn
        ORDER BY rid""")
    },

    // F67+F50 MERGE-ON-READ IDENTITY — the keyed-SCD shape: matched
    // rows keep their engine-assigned rid through the delete+reinsert
    // delta path; inserted rows draw fresh values from the statement's
    // strided high-water reservation. Fresh values are task-interleaved
    // (not SQL-predictable), so they surface as booleans: beyond the
    // base watermark, and globally unique.
    "q_identity_mor_merge" -> { (spark, sfDir) =>
      val (name, _) = sqlIdmFixture(spark, sfDir)
      spark.sql(s"""
        WITH n AS (SELECT count(*) AS c FROM $name.default.idm
                   WHERE o_orderkey <= 1000)
        SELECT o_orderkey, o_totalprice,
               CASE WHEN rid <= (SELECT c FROM n) THEN rid
                    ELSE CAST(-1 AS BIGINT) END AS rid_known,
               rid > (SELECT c FROM n) AS rid_new,
               (COUNT(*) OVER (PARTITION BY rid)) = 1 AS rid_uniq
        FROM $name.default.idm
        ORDER BY o_orderkey""")
    },

    // F59 METADATA-ONLY TYPE WIDENING — ALTER COLUMN qty TYPE BIGINT
    // carries every file verbatim (fixture-asserted); narrow-era files
    // upcast in the readers, wide-era values exceed the int range, and
    // the filter runs over the mixed eras.
    "q_alter_widen_type" -> { (spark, sfDir) =>
      val (name, _) = sqlWidenFixture(spark, sfDir)
      // amt surfaces as exact CENTS so the decimal widening hashes
      // engine-independently (pre-widen rows: INT64-backed decimal(10,2)
      // bytes read through the (16,2) head schema)
      spark.sql(s"""
        SELECT o_orderkey, qty, CAST(amt * 100 AS BIGINT) AS amt_cents
        FROM $name.default.wd
        WHERE qty > 100 ORDER BY o_orderkey""")
    },

    "q_alter_column_default" -> { (spark, sfDir) =>
      val (name, _) = sqlColDefFixture(spark, sfDir)
      spark.sql(s"""
        SELECT o_orderkey, o_totalprice, src FROM $name.default.cd
        WHERE src IN ('legacy', 'fresh')
        ORDER BY o_orderkey""")
    },

    "q_alter_column_mapping" -> { (spark, sfDir) =>
      val (name, _) = sqlColMapFixture(spark, sfDir)
      val head = spark.sql(s"""
        SELECT 'head' AS era, o_orderkey, price, o_orderstatus
        FROM $name.default.cm WHERE price > 1000.0""")
      val pre = spark.sql(s"""
        SELECT 'pre' AS era, o_orderkey, o_totalprice AS price, o_orderstatus
        FROM $name.default.cm VERSION AS OF 2""")
      head.unionByName(pre).orderBy("era", "o_orderkey")
    },

    // F50 MERGE-ON-READ row-level ops: UPDATE / MERGE / DELETE on a
    // 'write.mode'='merge-on-read' table commit DELETION VECTORS
    // (per-file position sidecars) + appended rows — O(changed rows),
    // untouched files carried verbatim (asserted in the fixture) — and
    // every read surface applies them: the head SELECT reflects all
    // three statements, time travel reads the pre-DML snapshot exactly.
    "q_versioned_mor" -> { (spark, sfDir) =>
      val name = sqlMorFixture(spark, sfDir)
      spark.sql(s"""
        SELECT 'head' AS era, o_orderkey, o_totalprice FROM $name.default.t
        UNION ALL
        SELECT 'pre' AS era, o_orderkey, o_totalprice
        FROM $name.default.t VERSION AS OF 3
        ORDER BY era, o_orderkey""")
    },

    // F52 LIBRARY-PATH merge-on-read: VersionedTable.delete/deleteKeys on
    // a 'write.mode'='merge-on-read' table commit DELETION VECTORS like
    // SQL DELETE on the catalog surface — positions spill to fragment
    // sidecars executor-side, EVERY data file carried verbatim (asserted
    // in the fixture), time travel reads the pre-delete snapshot exactly.
    "q_versioned_mor_library" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1500")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 800),
        idOrder = Seq("o_orderkey"),
        extraProps = Map(
          VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead))
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") > 800),
        idOrder = Seq("o_orderkey"))
      val pre = VersionedTable.files(tgt, "t", 2L).toSet
      VersionedTable.delete(tgt, "t", col("o_orderkey") % 100 === 7)
      require(VersionedTable.files(tgt, "t", 3L).toSet == pre,
        "library MOR delete must carry every data file verbatim")
      require(VersionedTable.deletionVectors(tgt, "t", 3L).nonEmpty,
        "library MOR delete must record deletion vectors")
      VersionedTable.deleteKeys(tgt, "t",
        spark.range(1).select(lit(66L).as("o_orderkey"))
          .union(spark.range(1).select(lit(1200L).as("o_orderkey"))),
        Seq("o_orderkey"))
      require(VersionedTable.files(tgt, "t", 4L).toSet == pre,
        "library MOR deleteKeys must carry every data file verbatim")
      VersionedTable.read(tgt, "t")
        .select(lit("head").as("era"), col("o_orderkey"), col("o_totalprice"))
        .unionByName(VersionedTable.readVersion(tgt, "t", 2L)
          .select(lit("pre").as("era"), col("o_orderkey"), col("o_totalprice")))
        .orderBy("era", "o_orderkey")
    },

    // F53 MERGE-ON-READ KEYED UPSERT (library path): a keyed load on a
    // 'write.mode'='merge-on-read' table commits deletion vectors for
    // the matched rows' old versions + appends merged/fresh rows —
    // NO table or bucket rewrite (every pre-existing file verbatim,
    // asserted in the fixture) — with upsertMerged's exact semantics:
    // matched rows keep ids, fresh continue above the floor, duplicate
    // incoming keys collapse last-wins.
    "q_versioned_mor_upsert" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 1500")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 800),
        idOrder = Seq("o_orderkey"),
        extraProps = Map(
          VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead))
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") > 800),
        idOrder = Seq("o_orderkey"))
      val pre = VersionedTable.files(tgt, "t", 2L).toSet
      // updates (keys % 100 = 7) + fresh inserts (keys shifted by 10000)
      VersionedTable.load(tgt, "t",
        base.where(col("o_orderkey") % 100 === 7)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .unionByName(base.where(col("o_orderkey") <= 100)
            .withColumn("o_orderkey", col("o_orderkey") + 10000)),
        upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"))
      require(pre.subsetOf(VersionedTable.files(tgt, "t", 3L).toSet),
        "MOR upsert must carry every pre-existing data file verbatim")
      require(VersionedTable.deletionVectors(tgt, "t", 3L).nonEmpty,
        "MOR upsert must record deletion vectors for the matched rows")
      VersionedTable.read(tgt, "t")
        .select(lit("head").as("era"), col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
        .unionByName(VersionedTable.readVersion(tgt, "t", 2L)
          .select(lit("pre").as("era"), col("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice")))
        .orderBy("era", "o_orderkey")
    },

    // F51 SQL NAMESPACES — the reference's two-DB model in pure SQL:
    // `g.src.*` and `g.tgt.*` are sibling directories under one catalog
    // root, the SAME table name fully independent in each, and a
    // cross-namespace join reads both through one session (the fixture
    // also pins that namespaced tables never leak into default).
    "q_versioned_sql_namespaces" -> { (spark, sfDir) =>
      val name = sqlNsFixture(spark, sfDir)
      spark.sql(s"""
        SELECT t.s_nationkey, count(*) AS n_items,
               sum(s.l_quantity) AS sum_qty
        FROM $name.src.d s JOIN $name.tgt.d t ON s.l_suppkey = t.s_suppkey
        GROUP BY t.s_nationkey
        ORDER BY t.s_nationkey""")
    },

    // F19 rollback: undo a bad delete with an O(1) metadata commit — the
    // restored head must read back EXACTLY the pre-mistake state (the
    // oracle replays it), with the mistake still in history as its own
    // version. No data is read or rewritten by the rollback itself.
    "q_rollback" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir)
      src.registerViews()
      val tgt = tmpCat(spark)
      val base = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 1500")
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") <= 1000),
        idOrder = Seq("o_orderkey"))
      VersionedTable.load(tgt, "t", base.where(col("o_orderkey") > 1000),
        idOrder = Seq("o_orderkey"))
      VersionedTable.delete(tgt, "t", col("o_orderkey") > 500) // the mistake
      VersionedTable.rollback(tgt, "t", 2L)
      VersionedTable.read(tgt, "t")
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("id")
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q_versioned_recluster" ->
      """WITH b1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1400 AND o_orderkey % 2 = 1),
        |b2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey <= 1400 AND o_orderkey % 2 = 0),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, b1.* FROM b1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM b1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, b2.* FROM b2)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |WHERE o_orderkey > 650 AND o_orderkey <= 750
        |ORDER BY id""".stripMargin,

    "q_versioned_skipping" ->
      """WITH k1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 500),
        |k2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |k3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, k1.* FROM k1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k2.* FROM k2
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1) + (SELECT count(*) FROM k2)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k3.* FROM k3)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |WHERE o_orderkey > 600 AND o_orderkey <= 900
        |ORDER BY id""".stripMargin,

    "q_time_travel" ->
      s"""WITH $versionedStates
         |SELECT CAST(1 AS BIGINT) AS version, * FROM v1
         |UNION ALL SELECT CAST(2 AS BIGINT), * FROM v2
         |UNION ALL SELECT CAST(3 AS BIGINT), * FROM v3
         |UNION ALL SELECT CAST(4 AS BIGINT), * FROM v4
         |ORDER BY version, id""".stripMargin,

    "q_change_feed" ->
      s"""WITH $versionedStates
         |SELECT CASE WHEN a.id IS NULL THEN 'insert'
         |            WHEN b.id IS NULL THEN 'delete'
         |            ELSE 'update' END AS op,
         |       coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         |       coalesce(b.id, a.id) AS id,
         |       coalesce(b.o_orderstatus, a.o_orderstatus) AS o_orderstatus,
         |       coalesce(b.o_totalprice, a.o_totalprice) AS o_totalprice
         |FROM v2 a FULL OUTER JOIN v4 b ON a.o_orderkey = b.o_orderkey
         |WHERE a.id IS NULL OR b.id IS NULL
         |   OR a.id IS DISTINCT FROM b.id
         |   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
         |   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
         |ORDER BY o_orderkey""".stripMargin,

    "q_version_drift" -> {
      import graft.functions.{KmvSketch, PortableHash}
      def colSql(v: Long, src: String, c: String): String = {
        val hs = s"list(${PortableHash.hmodSql(s"CAST($c AS VARCHAR)")}) " +
          s"FILTER (WHERE $c IS NOT NULL)"
        s"""SELECT CAST($v AS BIGINT) AS version, '$c' AS "column",
           |  CAST(count($c) AS BIGINT) AS n,
           |  CAST(count(*) - count($c) AS BIGINT) AS nulls,
           |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s,
           |  CAST(${KmvSketch.estimateSql(hs, 256)} AS BIGINT) AS ndv_est
           |FROM $src""".stripMargin
      }
      val parts = for {
        (v, st) <- Seq(2L -> "s2", 4L -> "s4")
        c <- Seq("o_orderkey", "o_orderstatus", "cents")
      } yield colSql(v, st, c)
      s"""WITH $versionedStates,
         |s2 AS (SELECT o_orderkey, o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v2),
         |s4 AS (SELECT o_orderkey, o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v4)
         |${parts.mkString("\nUNION ALL\n")}
         |ORDER BY version, "column"""".stripMargin
    },

    "q_matview_incremental" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_matview_avg_ndv" -> {
      import graft.functions.{KmvSketch, PortableHash}
      // avg: exact integer sum ÷ count (same double division both engines);
      // ndv: the KMV estimator over the same portable hashes the Spark side
      // sketched — deterministic integer arithmetic, merge-order-free
      val hs = s"list(${PortableHash.hmodSql("CAST(l_orderkey AS VARCHAR)")}) " +
        "FILTER (WHERE l_orderkey IS NOT NULL)"
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
         |    / count(CAST(l_quantity AS BIGINT)) AS avg_qty,
         |  CAST(${KmvSketch.estimateSql(hs, 256)} AS BIGINT) AS ndv_ok
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    },

    "q_matview_cdc" ->
      s"""WITH $versionedStates,
         |c4 AS (SELECT o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v4)
         |SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  CAST(sum(cents) AS DOUBLE) / count(cents) AS avg_cents
         |FROM c4
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q_upsert_versioned_bucketed" ->
      """WITH b1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 2000),
        |     b2 AS (SELECT o_orderkey, 'U' AS o_orderstatus,
        |                   o_totalprice * 2 AS o_totalprice
        |            FROM orders WHERE o_orderkey > 1500 AND o_orderkey <= 2500),
        |     s1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, b1.* FROM b1),
        |     upd AS (SELECT s1.id, s1.o_orderkey,
        |                    coalesce(b2.o_orderstatus, s1.o_orderstatus) AS o_orderstatus,
        |                    coalesce(b2.o_totalprice, s1.o_totalprice) AS o_totalprice
        |             FROM s1 LEFT JOIN b2 USING (o_orderkey)),
        |     fresh AS (SELECT (SELECT max(id) FROM s1)
        |                      + row_number() OVER (ORDER BY b2.o_orderkey) AS id,
        |                      b2.* FROM b2 LEFT JOIN s1 USING (o_orderkey)
        |               WHERE s1.id IS NULL)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice
        |FROM (SELECT * FROM upd UNION ALL SELECT * FROM fresh)
        |ORDER BY id""".stripMargin,

    "q_change_feed_evolve" ->
      """WITH e1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 2000),
        |     w1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, e1.* FROM e1),
        |     u AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
        |           WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |     w2 AS (SELECT w1.id, w1.o_orderkey,
        |                   coalesce(u.o_orderstatus, w1.o_orderstatus) AS o_orderstatus,
        |                   coalesce(u.o_totalprice, w1.o_totalprice) AS o_totalprice
        |            FROM w1 LEFT JOIN u USING (o_orderkey)),
        |     e3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |                   CAST(o_orderkey % 10 AS BIGINT) AS o_priok
        |            FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 2500),
        |     w3 AS (SELECT id, o_orderkey, o_orderstatus, o_totalprice,
        |                   CAST(NULL AS BIGINT) AS o_priok FROM w2
        |            UNION ALL
        |            SELECT (SELECT max(id) FROM w2)
        |                   + row_number() OVER (ORDER BY o_orderkey) AS id,
        |                   e3.* FROM e3)
        |SELECT CASE WHEN a.id IS NULL THEN 'insert'
        |            WHEN b.id IS NULL THEN 'delete'
        |            ELSE 'update' END AS op,
        |       coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       coalesce(b.id, a.id) AS id,
        |       coalesce(b.o_orderstatus, a.o_orderstatus) AS o_orderstatus,
        |       coalesce(b.o_totalprice, a.o_totalprice) AS o_totalprice,
        |       b.o_priok AS o_priok
        |FROM w1 a FULL OUTER JOIN w3 b ON a.o_orderkey = b.o_orderkey
        |WHERE a.id IS NULL OR b.id IS NULL
        |   OR a.id IS DISTINCT FROM b.id
        |   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |   OR b.o_priok IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_matview_cdc_minmax" -> {
      import graft.functions.{KmvSketch, PortableHash}
      val hs = s"list(${PortableHash.hmodSql("CAST(o_orderkey AS VARCHAR)")}) " +
        "FILTER (WHERE o_orderkey IS NOT NULL)"
      s"""WITH $versionedStates,
         |c4 AS (SELECT o_orderkey, o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v4)
         |SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(cents) AS min_cents, max(cents) AS max_cents,
         |  CAST(${KmvSketch.estimateSql(hs, 256)} AS BIGINT) AS ndv_ok
         |FROM c4
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    },

    "q_stream_cdc_source" ->
      s"""WITH $versionedStates
         |SELECT o_orderkey, o_orderstatus, o_totalprice FROM v4
         |ORDER BY o_orderkey""".stripMargin,

    "q_stream_cdc_v2" ->
      s"""WITH $versionedStates
         |SELECT o_orderkey, o_orderstatus, o_totalprice FROM v4
         |ORDER BY o_orderkey""".stripMargin,

    "q_matview_exactly_once" ->
      s"""WITH $versionedStates,
         |c4 AS (SELECT o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v4)
         |SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM c4
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q_versioned_delete_where" ->
      """WITH k1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 500),
        |k2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |k3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, k1.* FROM k1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k2.* FROM k2
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1) + (SELECT count(*) FROM k2)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k3.* FROM k3)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |WHERE o_orderkey > 600
        |ORDER BY id""".stripMargin,

    "q_versioned_or_skip" ->
      """WITH k1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 500),
        |k2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |k3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, k1.* FROM k1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k2.* FROM k2
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1) + (SELECT count(*) FROM k2)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k3.* FROM k3)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |WHERE (o_orderkey > 100 AND o_orderkey <= 200)
        |   OR (o_orderkey > 1100 AND o_orderkey <= 1200)
        |   OR o_orderstatus IS NULL
        |ORDER BY id""".stripMargin,

    "q_cdc_batch_read" ->
      s"""WITH $versionedStates
         |SELECT CASE WHEN a.id IS NULL THEN 'insert'
         |            WHEN b.id IS NULL THEN 'delete'
         |            ELSE 'update' END AS op,
         |       coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         |       coalesce(b.id, a.id) AS id,
         |       coalesce(b.o_orderstatus, a.o_orderstatus) AS o_orderstatus,
         |       coalesce(b.o_totalprice, a.o_totalprice) AS o_totalprice
         |FROM v2 a FULL OUTER JOIN v4 b ON a.o_orderkey = b.o_orderkey
         |WHERE a.id IS NULL OR b.id IS NULL
         |   OR a.id IS DISTINCT FROM b.id
         |   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
         |   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
         |ORDER BY o_orderkey""".stripMargin,

    "q_versioned_v2_write" ->
      """WITH w1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     w2 AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500),
        |     s1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, w1.* FROM w1),
        |     upd AS (SELECT s1.id, s1.o_orderkey,
        |                    coalesce(w2.o_orderstatus, s1.o_orderstatus) AS o_orderstatus,
        |                    coalesce(w2.o_totalprice, s1.o_totalprice) AS o_totalprice
        |             FROM s1 LEFT JOIN w2 USING (o_orderkey)),
        |     fresh AS (SELECT (SELECT max(id) FROM s1)
        |                      + row_number() OVER (ORDER BY w2.o_orderkey) AS id,
        |                      w2.* FROM w2 LEFT JOIN s1 USING (o_orderkey)
        |               WHERE s1.id IS NULL)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice
        |FROM (SELECT * FROM upd UNION ALL SELECT * FROM fresh)
        |ORDER BY id""".stripMargin,

    "q_stream_append_tail" ->
      """WITH k1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 500),
        |k2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |k3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, k1.* FROM k1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k2.* FROM k2
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1) + (SELECT count(*) FROM k2)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k3.* FROM k3)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |ORDER BY id""".stripMargin,

    "q_versioned_sql_merge" ->
      """WITH c1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     src AS (SELECT o_orderkey, o_totalprice * 2 AS p FROM orders
        |             WHERE o_orderkey > 500 AND o_orderkey <= 1500),
        |     merged AS (
        |       SELECT c1.o_orderkey, coalesce(src.p, c1.o_totalprice) AS p
        |       FROM c1 LEFT JOIN src USING (o_orderkey)
        |       UNION ALL
        |       SELECT src.o_orderkey, src.p
        |       FROM src LEFT JOIN c1 USING (o_orderkey)
        |       WHERE c1.o_orderkey IS NULL),
        |     fin AS (SELECT o_orderkey,
        |               CASE WHEN o_orderkey <= 100 THEN 0 ELSE p END AS p
        |             FROM merged)
        |SELECT 'head' AS part, o_orderkey AS k,
        |       CAST(floor(p * 100) AS BIGINT) AS v FROM fin
        |UNION ALL
        |SELECT 'pre', o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)
        |FROM c1
        |ORDER BY part, k""".stripMargin,

    "q_versioned_merge_evolve" ->
      """SELECT o_orderkey AS k,
        |       CAST(floor((CASE WHEN o_orderkey <= 400 THEN o_totalprice
        |                   ELSE o_totalprice * 2 END) * 100) AS BIGINT) AS v,
        |       CASE WHEN o_orderkey <= 400 THEN NULL
        |            ELSE CAST(o_orderkey % 7 AS BIGINT) END AS grade
        |FROM orders WHERE o_orderkey <= 1200
        |ORDER BY k""".stripMargin,

    "q_versioned_spj" ->
      """SELECT c.c_nationkey, count(*) AS n,
        |       CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |FROM (SELECT o_custkey, o_totalprice FROM orders
        |      WHERE o_orderkey <= 4000) o
        |JOIN (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |      FROM customer) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,

    "q_partition_transform" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n,
        |       CAST(sum(user_id) AS BIGINT) AS su,
        |       min(event_id) AS mn, max(event_id) AS mx
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
        |GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin,

    "q_versioned_sql_merge_full" ->
      """WITH c1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     src AS (SELECT o_orderkey, o_totalprice * 2 AS p FROM orders
        |             WHERE o_orderkey > 500 AND o_orderkey <= 1500),
        |     fin AS (
        |       SELECT c1.o_orderkey, coalesce(src.p, c1.o_totalprice) AS p,
        |              CASE WHEN src.o_orderkey IS NULL
        |                    AND c1.o_orderkey <= 400 THEN 0
        |                   ELSE 1 END AS a
        |       FROM c1 LEFT JOIN src USING (o_orderkey)
        |       WHERE src.o_orderkey IS NOT NULL OR c1.o_orderkey > 250
        |       UNION ALL
        |       SELECT src.o_orderkey, src.p, 1
        |       FROM src LEFT JOIN c1 USING (o_orderkey)
        |       WHERE c1.o_orderkey IS NULL)
        |SELECT 'cow' AS part, o_orderkey AS k,
        |       CAST(floor(p * 100) AS BIGINT) AS v, CAST(a AS BIGINT) AS active
        |FROM fin
        |UNION ALL
        |SELECT 'mor', o_orderkey, CAST(floor(p * 100) AS BIGINT), CAST(a AS BIGINT)
        |FROM fin
        |ORDER BY part, k""".stripMargin,

    "q_versioned_sql_ops" ->
      """WITH c1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 800),
        |     c2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey > 800 AND o_orderkey <= 1200)
        |SELECT 'head' AS part, o_orderkey AS k,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM c1
        |UNION ALL
        |SELECT 'clone', o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)
        |FROM c1 WHERE o_orderkey > 400
        |UNION ALL SELECT 'hist', CAST(1 AS BIGINT), (SELECT count(*) FROM c1)
        |UNION ALL SELECT 'hist', CAST(2 AS BIGINT),
        |          (SELECT count(*) FROM c1) + (SELECT count(*) FROM c2)
        |UNION ALL SELECT 'hist', CAST(3 AS BIGINT), (SELECT count(*) FROM c1)
        |ORDER BY part, k""".stripMargin,

    "q_stream_sink_v2" ->
      """WITH w1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     w2 AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1500),
        |     s1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, w1.* FROM w1),
        |     upd AS (SELECT s1.id, s1.o_orderkey,
        |                    coalesce(w2.o_orderstatus, s1.o_orderstatus) AS o_orderstatus,
        |                    coalesce(w2.o_totalprice, s1.o_totalprice) AS o_totalprice
        |             FROM s1 LEFT JOIN w2 USING (o_orderkey)),
        |     fresh AS (SELECT (SELECT max(id) FROM s1)
        |                      + row_number() OVER (ORDER BY w2.o_orderkey) AS id,
        |                      w2.* FROM w2 LEFT JOIN s1 USING (o_orderkey)
        |               WHERE s1.id IS NULL)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice
        |FROM (SELECT * FROM upd UNION ALL SELECT * FROM fresh)
        |ORDER BY id""".stripMargin,

    "q_versioned_sql_catalog" ->
      """SELECT 'head' AS state, o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 1200
        |UNION ALL
        |SELECT 'pre' AS state, o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 800
        |UNION ALL
        |SELECT 'ts' AS state, o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 800
        |ORDER BY state, o_orderkey""".stripMargin,

    "q_versioned_sql_namespaces" ->
      """SELECT t.s_nationkey, count(*) AS n_items,
        |       sum(s.l_quantity) AS sum_qty
        |FROM (SELECT l_orderkey, l_suppkey, l_quantity FROM lineitem
        |      WHERE l_orderkey <= 1500) s
        |JOIN (SELECT s_suppkey, s_nationkey FROM supplier) t
        |  ON s.l_suppkey = t.s_suppkey
        |GROUP BY t.s_nationkey
        |ORDER BY t.s_nationkey""".stripMargin,

    "q_versioned_mor" ->
      """WITH head AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 100 = 7 THEN 0
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey <= 800 AND o_orderkey <> 3
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 3 AS o_totalprice FROM orders
        |  WHERE o_orderkey > 800 AND o_orderkey <= 1200)
        |SELECT 'head' AS era, o_orderkey, o_totalprice FROM head
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 1000
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_versioned_mor_library" ->
      """WITH state AS (SELECT o_orderkey, o_totalprice FROM orders
        |               WHERE o_orderkey <= 1500)
        |SELECT 'head' AS era, o_orderkey, o_totalprice FROM state
        |WHERE o_orderkey % 100 <> 7 AND o_orderkey NOT IN (66, 1200)
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice FROM state
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_versioned_mor_upsert" ->
      """WITH state AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |               FROM orders WHERE o_orderkey <= 1500),
        |head AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 100 = 7 THEN 'U'
        |              ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 100 = 7 THEN o_totalprice * 2
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM state
        |  UNION ALL
        |  SELECT o_orderkey + 10000, o_orderstatus, o_totalprice
        |  FROM state WHERE o_orderkey <= 100)
        |SELECT 'head' AS era, o_orderkey, o_orderstatus, o_totalprice FROM head
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_orderstatus, o_totalprice FROM state
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_alter_add_column" ->
      """WITH pre AS (SELECT o_orderkey, o_totalprice FROM orders
        |             WHERE o_orderkey <= 600),
        |post AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |         WHERE o_orderkey > 600 AND o_orderkey <= 1200),
        |head AS (SELECT o_orderkey, o_totalprice,
        |                CAST(NULL AS VARCHAR) AS o_orderstatus FROM pre
        |         UNION ALL
        |         SELECT o_orderkey, o_totalprice, o_orderstatus FROM post)
        |SELECT 'head' AS era, o_orderkey, o_totalprice, o_orderstatus FROM head
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice,
        |       CAST(NULL AS VARCHAR) AS o_orderstatus FROM pre
        |UNION ALL
        |SELECT 'cdc_insert' AS era, o_orderkey, o_totalprice, o_orderstatus
        |FROM head
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_insert_overwrite" ->
      """SELECT 'head' AS era, o_orderkey, o_totalprice * 2 AS o_totalprice
        |FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 1200
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey <= 800
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_versioned_tag" ->
      """SELECT 'head' AS era, o_orderkey, o_totalprice * 2 AS o_totalprice
        |FROM orders WHERE o_orderkey > 400 AND o_orderkey <= 1200
        |UNION ALL
        |SELECT 'tag' AS era, o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey <= 800
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_history_operations" ->
      """WITH n AS (SELECT count(*) AS c FROM orders WHERE o_orderkey <= 1000),
        |     d AS (SELECT count(*) AS c FROM orders
        |           WHERE o_orderkey > 200 AND o_orderkey <= 1000)
        |SELECT CAST(1 AS BIGINT) AS version, 'load' AS operation,
        |       CAST(0 AS BIGINT) AS total_rows
        |UNION ALL SELECT 2, 'load', (SELECT c FROM n)
        |UNION ALL SELECT 3, 'row-op (copy-on-write)', (SELECT c FROM n)
        |UNION ALL SELECT 4, 'delete', (SELECT c FROM d)
        |UNION ALL SELECT 5, 'rollback', (SELECT c FROM n)
        |ORDER BY version""".stripMargin,

    "q_decimal_skipping" ->
      """SELECT o_orderkey,
        |       CAST((o_orderkey + 0.25) * 100 AS BIGINT) AS cents,
        |       CAST((o_orderkey + 0.25) * 100 AS BIGINT) AS wcents
        |FROM orders
        |WHERE o_orderkey <= 1400 AND o_orderkey + 0.25 >= 1000.25
        |ORDER BY o_orderkey""".stripMargin,

    "q_versioned_wap" ->
      """SELECT 'head' AS era, o_orderkey,
        |       CASE WHEN o_orderkey > 900 AND o_orderkey <= 1000
        |            THEN o_totalprice * 2 ELSE o_totalprice END
        |         AS o_totalprice
        |FROM orders WHERE o_orderkey > 200 AND o_orderkey <= 1300
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_versioned_sql_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 1200
        |  AND o_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_cluster_by" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 1400
        |  AND (o_totalprice > 50000.0 OR o_orderkey > 1300)
        |ORDER BY o_orderkey""".stripMargin,

    "q_eq_upsert" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE
        |         WHEN o_orderkey > 1100 THEN o_totalprice * 3
        |         WHEN o_orderkey > 500 THEN o_totalprice * 2
        |         ELSE o_totalprice END) * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey <= 1300
        |ORDER BY o_orderkey""".stripMargin,

    "q_eq_upsert_sql" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE
        |         WHEN o_orderkey > 1100 THEN o_totalprice * 3
        |         WHEN o_orderkey > 500 THEN o_totalprice * 2
        |         ELSE o_totalprice END) * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey <= 1300
        |ORDER BY o_orderkey""".stripMargin,

    "q_eq_merge" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE
        |         WHEN o_orderkey > 1100 THEN o_totalprice * 3
        |         WHEN o_orderkey > 500 THEN o_totalprice * 2
        |         ELSE o_totalprice END) * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey <= 1300
        |ORDER BY o_orderkey""".stripMargin,

    "q_eq_delete" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE
        |         WHEN o_orderkey > 1100 THEN o_totalprice * 3
        |         WHEN o_orderkey > 500 THEN o_totalprice * 2
        |         ELSE o_totalprice END) * 100) AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderkey <= 1250
        |  AND NOT (o_orderkey % 7 = 0 AND o_orderkey <= 900)
        |  AND NOT (o_orderkey > 950 AND o_orderkey <= 1000)
        |ORDER BY o_orderkey""".stripMargin,

    "q_eq_delete_sql" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE WHEN o_orderkey > 500 THEN o_totalprice * 2
        |                        ELSE o_totalprice END) * 100) AS BIGINT)
        |         AS cents
        |FROM orders
        |WHERE o_orderkey <= 1200
        |  AND o_orderkey NOT IN (10, 20, 30, 40, 50, 60, 70, 80, 90, 100)
        |  AND o_orderkey NOT IN (600, 700)
        |ORDER BY o_orderkey""".stripMargin,

    "q_change_feed_eq_delete" ->
      """WITH del AS (
        |  SELECT 'delete' AS op, o_orderkey,
        |         CAST(FLOOR((CASE WHEN o_orderkey > 500 THEN o_totalprice * 2
        |                          ELSE o_totalprice END) * 100) AS BIGINT)
        |           AS cents
        |  FROM orders
        |  WHERE (o_orderkey % 7 = 0 AND o_orderkey <= 900)
        |     OR (o_orderkey > 950 AND o_orderkey <= 1000)),
        |upd AS (
        |  SELECT 'update' AS op, o_orderkey,
        |         CAST(FLOOR(o_totalprice * 3 * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey > 1100 AND o_orderkey <= 1200),
        |ins AS (
        |  SELECT 'insert' AS op, o_orderkey,
        |         CAST(FLOOR(o_totalprice * 3 * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey > 1200 AND o_orderkey <= 1250)
        |SELECT * FROM del UNION ALL SELECT * FROM upd
        |UNION ALL SELECT * FROM ins
        |ORDER BY op, o_orderkey""".stripMargin,

    "q_eq_upsert_evolve" ->
      """SELECT o_orderkey,
        |       CAST(FLOOR((CASE
        |         WHEN o_orderkey > 900 THEN o_totalprice * 3
        |         WHEN o_orderkey > 400 THEN o_totalprice * 2
        |         ELSE o_totalprice END) * 100) AS BIGINT) AS cents,
        |       CASE WHEN o_orderkey > 400 AND o_orderkey <= 900 THEN 'x'
        |            ELSE NULL END AS flag
        |FROM orders WHERE o_orderkey <= 1100
        |ORDER BY o_orderkey""".stripMargin,

    "q_change_feed_eq" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice AS p FROM orders
        |            WHERE o_orderkey <= 1000),
        |     b2 AS (SELECT o_orderkey, o_totalprice * 2 AS p FROM orders
        |            WHERE o_orderkey > 500 AND o_orderkey <= 1200),
        |     b3 AS (SELECT o_orderkey, o_totalprice * 3 AS p FROM orders
        |            WHERE o_orderkey > 1100 AND o_orderkey <= 1300),
        |     v2 AS (SELECT coalesce(b2.o_orderkey, v1.o_orderkey) AS o_orderkey,
        |                   coalesce(b2.p, v1.p) AS p
        |            FROM v1 FULL JOIN b2 ON v1.o_orderkey = b2.o_orderkey),
        |     v3 AS (SELECT coalesce(b3.o_orderkey, v2.o_orderkey) AS o_orderkey,
        |                   coalesce(b3.p, v2.p) AS p
        |            FROM v2 FULL JOIN b3 ON v2.o_orderkey = b3.o_orderkey),
        |     f13 AS (SELECT 'v1v3' AS span,
        |                    CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
        |                         WHEN v3.o_orderkey IS NULL THEN 'delete'
        |                         ELSE 'update' END AS op,
        |                    coalesce(v3.o_orderkey, v1.o_orderkey) AS o_orderkey,
        |                    CAST(FLOOR(coalesce(v3.p, v1.p) * 100) AS BIGINT) AS cents
        |             FROM v1 FULL JOIN v3 ON v1.o_orderkey = v3.o_orderkey
        |             WHERE v1.o_orderkey IS NULL OR v3.o_orderkey IS NULL
        |                OR v1.p <> v3.p),
        |     f23 AS (SELECT 'v2v3' AS span,
        |                    CASE WHEN v2.o_orderkey IS NULL THEN 'insert'
        |                         WHEN v3.o_orderkey IS NULL THEN 'delete'
        |                         ELSE 'update' END AS op,
        |                    coalesce(v3.o_orderkey, v2.o_orderkey) AS o_orderkey,
        |                    CAST(FLOOR(coalesce(v3.p, v2.p) * 100) AS BIGINT) AS cents
        |             FROM v2 FULL JOIN v3 ON v2.o_orderkey = v3.o_orderkey
        |             WHERE v2.o_orderkey IS NULL OR v3.o_orderkey IS NULL
        |                OR v2.p <> v3.p)
        |SELECT * FROM f13 UNION ALL SELECT * FROM f23
        |ORDER BY span, o_orderkey""".stripMargin,

    "q_versioned_branch" ->
      """WITH head AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey > 100 AND o_orderkey <= 1000
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 2 FROM orders
        |  WHERE o_orderkey > 1000 AND o_orderkey <= 1200),
        |     wip AS (
        |  SELECT * FROM head
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 3 FROM orders
        |  WHERE o_orderkey > 1200 AND o_orderkey <= 1300)
        |SELECT 'head' AS era, o_orderkey,
        |       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM head
        |UNION ALL
        |SELECT 'wip' AS era, o_orderkey,
        |       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM wip
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_zorder_cluster" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_totalprice < 50000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_identity_mor_merge" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice,
        |                     row_number() OVER (ORDER BY o_orderkey) AS rid
        |              FROM orders WHERE o_orderkey <= 1000),
        |     merged AS (
        |       SELECT b.o_orderkey,
        |              CASE WHEN b.o_orderkey > 500 THEN b.o_totalprice * 2
        |                   ELSE b.o_totalprice END AS o_totalprice,
        |              b.rid AS rid_known
        |       FROM base b
        |       UNION ALL
        |       SELECT o.o_orderkey, o.o_totalprice * 2,
        |              CAST(-1 AS BIGINT)
        |       FROM orders o
        |       WHERE o.o_orderkey > 1000 AND o.o_orderkey <= 1300)
        |SELECT o_orderkey, o_totalprice, rid_known,
        |       rid_known = -1 AS rid_new,
        |       TRUE AS rid_uniq
        |FROM merged ORDER BY o_orderkey""".stripMargin,

    "q_identity_column" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS rid,
        |       o_orderkey,
        |       CASE WHEN o_orderkey <= 200 THEN o_totalprice * 3
        |            ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey <= 1400
        |ORDER BY rid""".stripMargin,

    "q_generated_column" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderkey <= 300 THEN o_totalprice * 2
        |            ELSE o_totalprice END AS o_totalprice,
        |       CAST(FLOOR((CASE WHEN o_orderkey <= 300 THEN o_totalprice * 2
        |                        ELSE o_totalprice END) * 100) AS BIGINT)
        |         AS cents
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,

    "q_alter_widen_type" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderkey <= 600 THEN o_orderkey
        |            ELSE o_orderkey * 10000000000 END AS qty,
        |       CAST((CASE WHEN o_orderkey <= 600 THEN o_orderkey + 0.25
        |             ELSE o_orderkey * 10000000 + 0.75 END) * 100
        |            AS BIGINT) AS amt_cents
        |FROM orders WHERE o_orderkey <= 1200
        |  AND (CASE WHEN o_orderkey <= 600 THEN o_orderkey
        |            ELSE o_orderkey * 10000000000 END) > 100
        |ORDER BY o_orderkey""".stripMargin,

    "q_alter_column_default" ->
      """SELECT o_orderkey, o_totalprice,
        |       CASE WHEN o_orderkey <= 600 THEN 'legacy' ELSE 'fresh' END
        |         AS src
        |FROM orders WHERE o_orderkey <= 1200
        |ORDER BY o_orderkey""".stripMargin,

    "q_alter_column_mapping" ->
      """WITH head AS (
        |  SELECT o_orderkey, o_totalprice AS price,
        |         CASE WHEN o_orderkey > 900 THEN o_orderstatus END
        |           AS o_orderstatus
        |  FROM orders WHERE o_orderkey <= 1200)
        |SELECT 'head' AS era, o_orderkey, price, o_orderstatus FROM head
        |WHERE price > 1000.0
        |UNION ALL
        |SELECT 'pre' AS era, o_orderkey, o_totalprice AS price, o_orderstatus
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY era, o_orderkey""".stripMargin,

    "q_versioned_agg_pushdown" ->
      """SELECT count(*) AS n_rows,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM (SELECT * FROM orders WHERE o_orderkey <= 1200)""".stripMargin,

    "q_versioned_check" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey <= 500 OR (o_orderkey > 700 AND o_orderkey <= 1000)
        |ORDER BY o_orderkey""".stripMargin,

    "q_versioned_point_lookup" ->
      """SELECT o_orderkey, o_orderstatus,
        |       CASE WHEN o_orderkey > 500 AND o_orderkey <= 1000
        |            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey IN (250, 750, 1250, 999999) AND o_orderkey <= 1500
        |ORDER BY o_orderkey""".stripMargin,

    "q_versioned_sql_join" ->
      """SELECT s.s_nationkey, count(*) AS n_items,
        |       sum(l.l_quantity) AS sum_qty,
        |       sum(l.l_extendedprice) AS sum_price
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_orderkey <= 2000 AND l.l_orderkey % 3 = 0
        |GROUP BY s.s_nationkey
        |ORDER BY s.s_nationkey""".stripMargin,

    "q_versioned_v2_read" ->
      """WITH k1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 500),
        |k2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 500 AND o_orderkey <= 1000),
        |k3 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey > 1000 AND o_orderkey <= 1400),
        |state AS (
        |  SELECT row_number() OVER (ORDER BY o_orderkey) AS id, k1.* FROM k1
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k2.* FROM k2
        |  UNION ALL
        |  SELECT (SELECT count(*) FROM k1) + (SELECT count(*) FROM k2)
        |         + row_number() OVER (ORDER BY o_orderkey) AS id, k3.* FROM k3)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM state
        |WHERE o_orderkey > 600 AND o_orderkey <= 900
        |ORDER BY id""".stripMargin,

    "q_versioned_history" ->
      """SELECT CAST(i AS BIGINT) AS version,
        |       (SELECT count(*) FROM orders
        |        WHERE o_orderkey > 0 AND o_orderkey <= i * 100) AS total_rows
        |FROM generate_series(1, 14) t(i)
        |ORDER BY version""".stripMargin,

    "q_versioned_log_checkpoint" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey > 0 AND o_orderkey <= 1400
        |ORDER BY id""".stripMargin,

    "q_etl_versioned" ->
      """WITH e1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     e2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey > 1000 AND o_orderkey <= 2000),
        |     s1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, e1.* FROM e1),
        |     s2 AS (SELECT * FROM s1
        |            UNION ALL
        |            SELECT (SELECT count(*) FROM e1)
        |                   + row_number() OVER (ORDER BY o_orderkey) AS id,
        |                   e2.* FROM e2)
        |SELECT CAST(1 AS BIGINT) AS version, * FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), * FROM s2
        |ORDER BY version, id""".stripMargin,

    "q_matview_cdc_stream" ->
      s"""WITH $versionedStates,
         |c4 AS (SELECT o_orderstatus,
         |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM v4)
         |SELECT o_orderstatus,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  min(cents) AS min_cents
         |FROM c4
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,

    "q_rollback" ->
      """WITH r1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey <= 1000),
        |     r2 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |            WHERE o_orderkey > 1000 AND o_orderkey <= 1500),
        |     s1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, r1.* FROM r1),
        |     s2 AS (SELECT * FROM s1
        |            UNION ALL
        |            SELECT (SELECT count(*) FROM r1) + row_number() OVER (ORDER BY o_orderkey) AS id,
        |                   r2.* FROM r2)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM s2 ORDER BY id""".stripMargin
  )
}
