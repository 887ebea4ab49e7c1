package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlainBatchRead

/** HIDDEN PARTITIONING (partition transforms): `PARTITIONED BY
  * (days(ts))` at CREATE records a derivation in the manifest, every
  * write range-clusters files on the derived value, and the EXISTING
  * zone maps prune scans on RAW base-column predicates — the Iceberg
  * model re-expressed Spark-first (no directory tree, no user-managed
  * derived column). `bucket(n, col)` translates to the hash-bucket
  * layout (bucket-pruned point lookups). The declared columns join the
  * rename/drop refusal matrix like bucket keys. */
class PartitionTransformSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gptx")
  spark.conf.set("spark.sql.catalog.gpt",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gpt.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: GraftScan => s }
      .getOrElse(fail("no GraftScan in the plan"))
      .toBatch.planInputPartitions().toSeq.flatMap {
        case PlainBatchRead.FileInputPartition(s) => Seq(s.path)
        case PlainBatchRead.FilesInputPartition(fs) => fs.map(_.path)
        case PlainBatchRead.BucketFilesInputPartition(fs, _) => fs.map(_.path)
      }

  test("days(ts): writes range-cluster files; raw ts predicates prune") {
    spark.sql("CREATE TABLE gpt.default.ev " +
      "(k BIGINT, ts TIMESTAMP, v DOUBLE) PARTITIONED BY (days(ts))")
    // ~14 days of per-minute events, written UNSORTED in event time
    // (reverse id order) — the transform layout must still cluster them
    spark.sql("""INSERT INTO gpt.default.ev
      SELECT id, TIMESTAMP'2026-01-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST(20000 - id AS INT),0), id * 1.5
      FROM range(0, 20000)""")
    val v = VersionedTable.currentVersion(lib, "ev").get
    val all = VersionedTable.files(lib, "ev", v)
    // library-surface pruning: the zone maps on the RAW column skip
    val cut = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val skipped = VersionedTable.skippedFiles(lib, "ev", v, col("ts") >= cut)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"raw-predicate file skipping must fire: ${skipped.size} of ${all.size}")
    // SQL-surface pruning: the scan plans strictly fewer files
    val q = spark.sql(
      "SELECT * FROM gpt.default.ev WHERE ts >= TIMESTAMP'2026-01-10 00:00:00'")
    val planned = scannedFiles(q)
    assert(planned.nonEmpty && planned.size < all.size,
      s"the SQL scan must plan fewer files: ${planned.size} of ${all.size}")
    // and results stay exact through the prune: minutes 1..20000, the
    // cut at day 9 (minute 12960) leaves 12960..20000 inclusive
    assert(q.count() == 20000L - 9L * 1440L + 1L)
    // a second INSERT keeps the layout: pruning still fires at the head
    spark.sql("""INSERT INTO gpt.default.ev
      SELECT id + 20000, TIMESTAMP'2026-02-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST(id AS INT),0), id * 1.5
      FROM range(0, 2000)""")
    val v2 = VersionedTable.currentVersion(lib, "ev").get
    val feb = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    val skipFeb = VersionedTable.skippedFiles(lib, "ev", v2, col("ts") >= feb)
    // all.size counts v1's empty schema-bearing file too, which records
    // no stats and so can never PROVE a skip — every data file must
    assert(skipFeb.size >= all.size - 1,
      s"every january data file must skip under a february predicate " +
        s"(${skipFeb.size} of ${all.size})")
    assert(spark.sql("SELECT count(*) FROM gpt.default.ev " +
      "WHERE ts >= TIMESTAMP'2026-02-01 00:00:00'").head().getLong(0) == 2000L)
  }

  test("the declaration guards and surfaces: refusals, DESCRIBE, reserved prop") {
    // rename/drop of the transform column refuse like bucket keys
    intercept[Exception] {
      spark.sql("ALTER TABLE gpt.default.ev RENAME COLUMN ts TO t2")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gpt.default.ev DROP COLUMN ts")
    }
    // the spec is engine-owned: SET TBLPROPERTIES refuses it
    intercept[Exception] {
      spark.sql("ALTER TABLE gpt.default.ev SET TBLPROPERTIES " +
        "('partition_spec' = '[]')")
    }
    // DESCRIBE reports the transform back
    val desc = spark.sql("DESCRIBE EXTENDED gpt.default.ev")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("days(ts)"), s"DESCRIBE must show the transform:\n$desc")
    // unsupported transforms refuse at CREATE
    intercept[Exception] {
      spark.sql("CREATE TABLE gpt.default.bad (k BIGINT, s STRING) " +
        "PARTITIONED BY (zoom(s))")
    }
    // truncate needs a string column
    intercept[Exception] {
      spark.sql("CREATE TABLE gpt.default.bad2 (k BIGINT, s STRING) " +
        "PARTITIONED BY (truncate(4, k))")
    }
    // identity needs an ORDERABLE column — eager, not a generic
    // ordering error at the CREATE's empty write
    intercept[Exception] {
      spark.sql("CREATE TABLE gpt.default.bad3 " +
        "(k BIGINT, m MAP<STRING, STRING>) PARTITIONED BY (m)")
    }
  }

  test("truncate(n, s): string-prefix clustering prunes raw string predicates") {
    spark.sql("CREATE TABLE gpt.default.tr (s STRING, n BIGINT) " +
      "PARTITIONED BY (truncate(2, s))")
    spark.sql("INSERT INTO gpt.default.tr " +
      "SELECT concat(CASE WHEN id % 4 = 0 THEN 'aa' WHEN id % 4 = 1 THEN 'gg' " +
      "WHEN id % 4 = 2 THEN 'mm' ELSE 'zz' END, id), id FROM range(0, 8000)")
    val v = VersionedTable.currentVersion(lib, "tr").get
    val all = VersionedTable.files(lib, "tr", v)
    val skipped = VersionedTable.skippedFiles(lib, "tr", v, col("s") >= "zz")
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"prefix clustering must prune raw string predicates: " +
        s"${skipped.size} of ${all.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.tr WHERE s >= 'zz'")
      .head().getLong(0) == 2000L)
  }

  test("bucket(n, col) translates to the hash layout; point lookups prune") {
    spark.sql("CREATE TABLE gpt.default.bk (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gpt.default.bk " +
      "SELECT id, concat('v', id) FROM range(0, 200)")
    assert(VersionedTable.bucketSpec(lib, "bk").contains((Seq("k"), 4)),
      "the bucket transform must record the hash layout")
    val v = VersionedTable.currentVersion(lib, "bk").get
    assert(VersionedTable.lookup(lib, "bk", v, Map("k" -> 7L))
      .select("v").as[String].head() == "v7")
    // the SQL scan bucket-prunes on key equality
    val all = scannedFiles(spark.sql("SELECT * FROM gpt.default.bk"))
    val one = scannedFiles(
      spark.sql("SELECT * FROM gpt.default.bk WHERE k = 7"))
    assert(one.nonEmpty && one.size < all.size,
      s"bucket pruning must shrink the scan: ${one.size} of ${all.size}")
  }

  test("compaction preserves the transform layout: pruning survives bin-pack") {
    spark.sql("CREATE TABLE gpt.default.cp " +
      "(k BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    // several micro-appends accrete small files across 10 days
    (0 until 4).foreach(i => spark.sql(s"""
      INSERT INTO gpt.default.cp
      SELECT id + ${i * 3000}, TIMESTAMP'2026-03-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST((id + ${i * 3000}) % 14400 AS INT),0)
      FROM range(0, 3000)"""))
    val vPre = VersionedTable.currentVersion(lib, "cp").get
    val before = VersionedTable.files(lib, "cp", vPre).size
    VersionedTable.compact(lib, "cp", 48L * 1024)
    val v = VersionedTable.currentVersion(lib, "cp").get
    val after = VersionedTable.files(lib, "cp", v)
    assert(after.size < before,
      s"compaction must shrink the file count: ${after.size} vs $before")
    // the compacted files must STILL cover disjoint day ranges — a
    // plain coalesce would merge days and un-prune the table
    val cut = java.sql.Timestamp.valueOf("2026-03-06 00:00:00")
    val skipped = VersionedTable.skippedFiles(lib, "cp", v, col("ts") >= cut)
    assert(skipped.nonEmpty,
      s"pruning must survive compaction (files: ${after.size})")
    assert(spark.sql("SELECT count(*) FROM gpt.default.cp").head()
      .getLong(0) == 12000L, "compaction must not change the rows")
  }

  test("MOR DML respects the layout: merge-inserted rows prune; bucket+days compacts clustered") {
    spark.sql("CREATE TABLE gpt.default.md (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("""INSERT INTO gpt.default.md
      SELECT id, TIMESTAMP'2026-04-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST(id AS INT),0)
      FROM range(0, 5000)""")
    // a MERGE whose NOT-MATCHED inserts span ~10 further days — the MOR
    // staged-insert path must range-cluster them like any other write
    spark.sql("""SELECT id + 100000 AS k, TIMESTAMP'2026-05-01 00:00:00'
      + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts
      FROM range(0, 14000)""").createOrReplaceTempView("md_src")
    spark.sql("""MERGE INTO gpt.default.md t USING md_src s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    val v = VersionedTable.currentVersion(lib, "md").get
    val all = VersionedTable.files(lib, "md", v)
    val cut = java.sql.Timestamp.valueOf("2026-05-05 00:00:00")
    val skipped = VersionedTable.skippedFiles(lib, "md", v, col("ts") >= cut)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"MOR merge-inserted files must range-cluster: ${skipped.size} of ${all.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.md " +
      "WHERE ts >= TIMESTAMP'2026-05-05 00:00:00'").head()
      .getLong(0) == 14000L - 4L * 1440L)

    // composed bucket + days: compaction must keep BOTH contracts —
    // bucket dirs AND disjoint day ranges per file within a bucket
    spark.sql("CREATE TABLE gpt.default.bd (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (bucket(2, k), days(ts))")
    (0 until 3).foreach(i => spark.sql(s"""
      INSERT INTO gpt.default.bd
      SELECT id + ${i * 4000}, TIMESTAMP'2026-06-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST((id + ${i * 4000}) % 12000 AS INT),0)
      FROM range(0, 4000)"""))
    VersionedTable.compact(lib, "bd", 24L * 1024)
    val vb = VersionedTable.currentVersion(lib, "bd").get
    val allB = VersionedTable.files(lib, "bd", vb)
    assert(allB.forall(_.contains("__gbucket=")),
      s"bucket dirs must survive compaction: $allB")
    val cutB = java.sql.Timestamp.valueOf("2026-06-05 00:00:00")
    val skippedB = VersionedTable.skippedFiles(lib, "bd", vb, col("ts") >= cutB)
    assert(skippedB.nonEmpty,
      s"day pruning must survive bucketed compaction (${allB.size} files)")
    assert(spark.sql("SELECT count(*) FROM gpt.default.bd").head()
      .getLong(0) == 12000L)
  }

  test("partition-spec EVOLUTION: one metadata commit; old files untouched") {
    // a flat table accretes un-clustered files first
    spark.sql("CREATE TABLE gpt.default.pe (k BIGINT, ts TIMESTAMP)")
    spark.sql("""INSERT INTO gpt.default.pe
      SELECT id, TIMESTAMP'2026-07-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST((id * 37) % 20000 AS INT),0)
      FROM range(0, 8000)""")
    val vPre = VersionedTable.currentVersion(lib, "pe").get
    val preFiles = VersionedTable.files(lib, "pe", vPre).toSet
    // evolve: declare days(ts) AFTER the fact — metadata-only
    spark.sql("CALL gpt.system.set_partition_spec('pe', 'days(ts)')")
    val vSpec = VersionedTable.currentVersion(lib, "pe").get
    assert(vSpec == vPre + 1 &&
      VersionedTable.files(lib, "pe", vSpec).toSet == preFiles,
      "spec evolution must be ONE metadata commit, files verbatim")
    // the declared column joins the refusal matrix from now on
    intercept[Exception] {
      spark.sql("ALTER TABLE gpt.default.pe RENAME COLUMN ts TO t2")
    }
    // writes AFTER the change arrange: a later-month insert's files
    // prune under a raw predicate even though the old files cannot
    spark.sql("""INSERT INTO gpt.default.pe
      SELECT id + 8000, TIMESTAMP'2026-09-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST(id AS INT),0)
      FROM range(0, 10000)""")
    val v2 = VersionedTable.currentVersion(lib, "pe").get
    val all2 = VersionedTable.files(lib, "pe", v2)
    val cut = java.sql.Timestamp.valueOf("2026-09-04 00:00:00")
    val skipped = VersionedTable.skippedFiles(lib, "pe", v2, col("ts") >= cut)
    assert(skipped.nonEmpty && skipped.size < all2.size,
      s"post-evolution writes must range-cluster: ${skipped.size} of ${all2.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.pe " +
      "WHERE ts >= TIMESTAMP'2026-09-04 00:00:00'").head()
      .getLong(0) == 10000L - 3L * 1440L)
    // dropping the spec restores renameability and stops arranging
    spark.sql("CALL gpt.system.set_partition_spec('pe', '')")
    spark.sql("ALTER TABLE gpt.default.pe RENAME COLUMN ts TO t2")
    assert(spark.sql("SELECT * FROM gpt.default.pe").columns.toSeq ==
      Seq("k", "t2"))
    // an invalid evolved spec refuses with nothing committed
    val vNow = VersionedTable.currentVersion(lib, "pe").get
    intercept[Exception] {
      spark.sql("CALL gpt.system.set_partition_spec('pe', 'days(nope)')")
    }
    intercept[Exception] {
      spark.sql("CALL gpt.system.set_partition_spec('pe', 'zoom(k)')")
    }
    assert(VersionedTable.currentVersion(lib, "pe").contains(vNow))
  }

  test("a STREAM into a days(date) table lands arranged; DATE transforms work") {
    implicit val sqlCtx = spark.sqlContext
    // months() on a DATE column — the transform set covers both
    // temporal types, and the streaming sink commits through the same
    // arranged load path as batch writes
    spark.sql("CREATE TABLE gpt.default.st (k BIGINT, d DATE) " +
      "PARTITIONED BY (months(d))")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int)]
    val q = input.toDF().toDF("k", "off")
      .selectExpr("k", "date_add(DATE'2026-01-01', CAST(off AS INT)) AS d")
      .writeStream
      .option("checkpointLocation", tmpDir("gptck"))
      .toTable("gpt.default.st")
    input.addData((0L until 4000L).map(i => (i, (i % 300).toInt)): _*)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val v = VersionedTable.currentVersion(lib, "st").get
    val all = VersionedTable.files(lib, "st", v)
    val cut = java.sql.Date.valueOf("2026-08-01")
    val skipped = VersionedTable.skippedFiles(lib, "st", v, col("d") >= cut)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"the streamed batch must range-cluster by month: " +
        s"${skipped.size} of ${all.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.st " +
      "WHERE d >= DATE'2026-08-01'").head().getLong(0) ==
      (0L until 4000L).count(i => i % 300 >= 212))
  }

  test("CTAS with days(ts) lays out and prunes; composed days+identity works") {
    spark.sql("CREATE TABLE gpt.default.cts PARTITIONED BY (days(ts)) AS " +
      "SELECT * FROM gpt.default.ev WHERE k < 5000")
    val v = VersionedTable.currentVersion(lib, "cts").get
    val all = VersionedTable.files(lib, "cts", v)
    val cut = java.sql.Timestamp.valueOf("2026-01-12 00:00:00")
    val skipped = VersionedTable.skippedFiles(lib, "cts", v, col("ts") < cut)
    assert(skipped.nonEmpty && skipped.size < all.size,
      s"CTAS must lay out by the transform: ${skipped.size} of ${all.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.cts").head()
      .getLong(0) == 5000L)

    // composed transforms: identity(src) + days(ts) — both prune
    spark.sql("CREATE TABLE gpt.default.mx " +
      "(src STRING, ts TIMESTAMP, n BIGINT) PARTITIONED BY (src, days(ts))")
    spark.sql("""INSERT INTO gpt.default.mx
      SELECT IF(id % 2 = 0, 'web', 'app'),
             TIMESTAMP'2026-01-01 00:00:00'
               + make_interval(0,0,0,0,0,CAST(id AS INT),0), id
      FROM range(0, 10000)""")
    val vm = VersionedTable.currentVersion(lib, "mx").get
    val allM = VersionedTable.files(lib, "mx", vm)
    val skipSrc = VersionedTable.skippedFiles(lib, "mx", vm, col("src") === "web")
    assert(skipSrc.nonEmpty && skipSrc.size < allM.size,
      s"identity transform must prune on its column: ${skipSrc.size} of ${allM.size}")
    assert(spark.sql("SELECT count(*) FROM gpt.default.mx WHERE src = 'web'")
      .head().getLong(0) == 5000L)
  }
}
