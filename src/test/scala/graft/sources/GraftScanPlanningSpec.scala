package graft.sources

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The graft scan's PLANNER contracts — the two DSv2 interfaces that
  * decide whether a 100 TB catalog-SQL join plans sanely:
  *
  *  - [[SupportsReportStatistics]]: manifest-derived post-pruning
  *    size/rows. Without it a V2 relation reports
  *    `spark.sql.defaultSizeInBytes` (Long.Max) and a 1 KB dim table
  *    still sort-merge-shuffles the fact side.
  *  - `SupportsRuntimeV2Filtering`: join-time IN sets re-prune the FILE
  *    list through the same zone maps as static pushdown (dynamic file
  *    pruning, Iceberg's shape).
  */
class GraftScanPlanningSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gplan")
  spark.conf.set("spark.sql.catalog.gp", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gp.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  // a fact table committed as THREE appends = three files with disjoint
  // k ranges (zone maps make each append's file prunable by k)
  private def mkFact(): Unit = {
    spark.sql("CREATE TABLE gp.default.fact (k BIGINT, grp BIGINT, v BIGINT)")
    Seq(0L, 1L, 2L).foreach { g =>
      spark.sql(s"INSERT INTO gp.default.fact " +
        s"SELECT /*+ REPARTITION(1) */ id + ${g * 100}, $g, id FROM range(100)")
    }
  }

  // LiteralValue is private[sql] in Spark 4 — the public Literal
  // interface is the supported way to hand a value to scan.filter
  private def v2lit(v: Long): V2Literal[Long] = new V2Literal[Long] {
    override def value(): Long = v
    override def dataType(): org.apache.spark.sql.types.DataType = LongType
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): GraftScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.collectFirst { case s: GraftScan => s }
      .getOrElse(fail("no GraftScan in the plan"))

  test("estimateStatistics: exact manifest rows; pushdown shrinks the estimate") {
    mkFact()
    val full = spark.sql("SELECT * FROM gp.default.fact")
    val fullStats = scanOf(full).estimateStatistics()
    assert(fullStats.numRows.getAsLong == 300L,
      "row count must be the manifest's exact sum")
    val fullSize = fullStats.sizeInBytes.getAsLong
    assert(fullSize > 0L && fullSize < Long.MaxValue / 4,
      s"size must be a real estimate, not a default: $fullSize")

    // k < 100 admits only the first append's file → stats shrink with it
    val pruned = spark.sql("SELECT * FROM gp.default.fact WHERE k < 100")
    val prunedStats = scanOf(pruned).estimateStatistics()
    assert(prunedStats.numRows.getAsLong == 100L,
      "pruned stats must count only surviving files' rows")
    assert(prunedStats.sizeInBytes.getAsLong < fullSize,
      "pruned size must shrink with the file list")

    // column pruning shrinks the width estimate too
    val narrow = spark.sql("SELECT k FROM gp.default.fact")
    assert(scanOf(narrow).estimateStatistics().sizeInBytes.getAsLong < fullSize,
      "a 1-of-3-column projection must estimate smaller than the full scan")

    // wide VARIABLE data must not under-estimate: a table of 4 KB text
    // rows estimates at least its on-disk bytes, never rows × the
    // 20-byte string defaultSize (which would wrongly broadcast GBs)
    spark.sql("CREATE TABLE gp.default.wide (k BIGINT, txt STRING)")
    spark.sql("INSERT INTO gp.default.wide " +
      "SELECT id, repeat(uuid(), 120) FROM range(500)")
    val wideBytes = new java.io.File(s"$warehouse/wide.__vdata")
      .listFiles().flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .map(_.length).sum
    val wideEst = scanOf(spark.sql("SELECT * FROM gp.default.wide"))
      .estimateStatistics().sizeInBytes.getAsLong
    assert(wideEst >= wideBytes / 2,
      s"wide-text estimate $wideEst must track file bytes $wideBytes, " +
        "not 20-byte default widths")

    // the optimizer actually SEES these numbers (not defaultSizeInBytes)
    val rel = full.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }.head
    assert(rel.stats.rowCount.contains(BigInt(300)),
      s"logical stats must carry the exact row count: ${rel.stats}")

    // column stats: manifest-exact min/max + null counts for CBO
    val cs = scanOf(full).estimateStatistics().columnStats()
    val kStat = cs.asScala.collectFirst {
      case (r, s) if r.fieldNames().sameElements(Array("k")) => s
    }.getOrElse(fail(s"no column stats for k: ${cs.keySet()}"))
    assert(kStat.min.get == 0L && kStat.max.get == 299L,
      s"k domain must be manifest-exact: ${kStat.min} .. ${kStat.max}")
    assert(kStat.nullCount.getAsLong == 0L)
  }

  test("a small versioned dim AUTO-broadcasts in a catalog SQL join") {
    spark.sql("CREATE TABLE gp.default.dim (grp BIGINT, name STRING)")
    spark.sql("INSERT INTO gp.default.dim VALUES (0,'a'), (1,'b'), (2,'c')")
    val joined = spark.sql(
      """SELECT d.name, sum(f.v) AS s
        |FROM gp.default.fact f JOIN gp.default.dim d ON f.grp = d.grp
        |GROUP BY d.name""".stripMargin)
    // assert on the INITIAL physical plan (pre-AQE): only reported
    // statistics can have made this a broadcast join at plan time
    val planned = joined.queryExecution.sparkPlan
    val broadcasts = planned.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(broadcasts.nonEmpty,
      s"the 3-row dim must broadcast WITHOUT a hint — stats-driven:\n$planned")
    assert(joined.orderBy("name").as[(String, Long)].collect().toSeq ==
      Seq(("a", 4950L), ("b", 4950L), ("c", 4950L)))
  }

  /** Planned FILE count from raw partitions (bin-packing coalesces tiny
    * files into shared partitions since round 14). */
  private def nFiles(parts: Array[org.apache.spark.sql.connector.read.InputPartition]): Int =
    parts.map {
      case org.apache.spark.sql.graft.PlainBatchRead.FileInputPartition(_) => 1
      case org.apache.spark.sql.graft.PlainBatchRead.FilesInputPartition(fs) => fs.size
      case org.apache.spark.sql.graft.PlainBatchRead.BucketFilesInputPartition(fs, _) => fs.size
      case _ => 1
    }.sum

  test("runtime IN filter prunes files through the zone maps") {
    val df = spark.sql("SELECT * FROM gp.default.fact")
    val scan = scanOf(df)
    val batch = scan.toBatch
    // three appended data files; CREATE TABLE's empty schema-bearing
    // file is skipped by its RECORDED zero row count (exact, not zone-map)
    assert(nFiles(batch.planInputPartitions()) == 3,
      "three appended files, the 0-row create file skipped")

    assert(scan.filterAttributes().map(_.fieldNames().head).toSet ==
      Set("k", "grp", "v"), "every stat-eligible column is filterable")

    // join-time IN on k: values 5 and 7 live in the first file only
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("k"),
      v2lit(5L), v2lit(7L)))))
    assert(nFiles(batch.planInputPartitions()) == 1,
      "the IN set's range admits exactly one file")

    // rows still come back right (Spark re-applies the join anyway;
    // pruning only narrowed the file list)
    val scan2 = scanOf(spark.sql("SELECT * FROM gp.default.fact"))
    scan2.filter(Array(new Predicate("IN", Array(
      Expressions.column("k"), v2lit(250L)))))
    val kept = scan2.toBatch.planInputPartitions()
    assert(nFiles(kept) == 1, "k=250 lives in the third file")

    // an EMPTY IN is exact — no key survived, zero partitions launch
    val scan3 = scanOf(spark.sql("SELECT * FROM gp.default.fact"))
    scan3.filter(Array(new Predicate("IN", Array(Expressions.column("k")))))
    assert(scan3.toBatch.planInputPartitions().isEmpty,
      "empty IN = provably no matches = scan nothing")

    // an unrecognized shape prunes NOTHING (one-sided, never wrong-skips)
    val scan4 = scanOf(spark.sql("SELECT * FROM gp.default.fact"))
    scan4.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(nFiles(scan4.toBatch.planInputPartitions()) == 3)
  }

  test("Spark plans a dynamic-pruning subquery against the scan end-to-end") {
    spark.sql("CREATE TABLE gp.default.dimf (grp BIGINT, cat STRING)")
    spark.sql("INSERT INTO gp.default.dimf SELECT id, concat('c', id % 3) FROM range(3)")
    val q = spark.sql(
      """SELECT sum(f.v) AS s FROM gp.default.fact f
        |JOIN gp.default.dimf d ON f.grp = d.grp WHERE d.cat = 'c1'""".stripMargin)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning") || planStr.contains("DynamicPruning"),
      s"the optimizer must inject a runtime filter for the graft scan:\n$planStr")
    assert(q.head().getLong(0) == 4950L, "grp=1 alone survives d.cat='c1'")
  }

  test("an eq on the bucket keys prunes the scan to ONE bucket's files") {
    import org.apache.spark.sql.graft.PlainBatchRead
    val dir = tmpDir("gbkt")
    // 3 keyed loads over a 4-bucket layout: every bucket's files span
    // wide overlapping grp ranges, so zone maps CANNOT do this prune —
    // only the bucket hash can
    (0 until 3).foreach { r =>
      spark.range(200).selectExpr(s"id + ${r * 1000} AS k", "id % 16 AS grp",
        "id AS v")
        .write.format("graft").mode("append")
        .option("dir", dir).option("table", "bt")
        .option("upsertKeys", "k")
        .option("bucketBy", "grp").option("numBuckets", "4").save()
    }
    def parts(df: org.apache.spark.sql.DataFrame): Seq[String] =
      scanOf(df).toBatch.planInputPartitions().toSeq.flatMap {
        case PlainBatchRead.FileInputPartition(s) => Seq(s.path)
        case PlainBatchRead.FilesInputPartition(fs) => fs.map(_.path)
        case PlainBatchRead.BucketFilesInputPartition(fs, _) => fs.map(_.path)
      }
    val read = spark.read.format("graft")
      .option("dir", dir).option("table", "bt")
    val all = parts(read.load())
    val expectBucket =
      (graft.functions.PortableHash.hmodJvm("5") % 4).toInt
    val pruned = parts(read.load().where("grp = 5"))
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"bucket prune must shrink the file list: ${pruned.size} of ${all.size}")
    assert(pruned.forall(_.contains(s"__gbucket=$expectBucket")),
      s"every survivor must live in bucket $expectBucket: $pruned")
    assert(read.load().where("grp = 5").count() == 3 * 13,
      "results exact on top of the prune (13 ids per load hash to grp 5)")
    // IN on the single bucket key prunes to the union of its buckets
    val inPruned = parts(read.load().where("grp IN (5, 6)"))
    val b6 = (graft.functions.PortableHash.hmodJvm("6") % 4).toInt
    assert(inPruned.forall(p => p.contains(s"__gbucket=$expectBucket") ||
      p.contains(s"__gbucket=$b6")), s"IN survivors outside both buckets: $inPruned")
    // an eq on a NON-key column must not bucket-prune (one-sided safety)
    assert(parts(read.load().where("v = 7")).size == all.size,
      "a non-key eq has no bucket to pin")
    // stats consistency on the SAME bucket-pruned survivor set: no
    // column may report more nulls than the relation reports rows
    val st = scanOf(read.load().where("grp = 5")).estimateStatistics()
    val nRows = st.numRows.getAsLong
    st.columnStats().forEach { (_, cs) =>
      assert(!cs.nullCount.isPresent || cs.nullCount.getAsLong <= nRows,
        s"column nullCount must not exceed numRows ($nRows)")
    }
  }

  test("global count/min/max answer from the manifest with ZERO data tasks") {
    spark.sql("CREATE TABLE gp.default.agg (k BIGINT, txt STRING, d DOUBLE)")
    spark.sql("INSERT INTO gp.default.agg " +
      "SELECT id, IF(id % 3 = 0, NULL, concat('t', id)), id * 1.5 FROM range(500)")
    spark.sql("INSERT INTO gp.default.agg " +
      "SELECT id + 1000, concat('t', id), id * 1.5 FROM range(100)")

    def planOf(sql: String) = spark.sql(sql).queryExecution.executedPlan
    def isLocal(sql: String): Boolean = {
      val p = planOf(sql)
      p.collectFirst { case b: BatchScanExec => b }.isEmpty &&
        p.toString.contains("LocalTableScan")
    }

    // the metadata-answerable shapes: LocalTableScan, no BatchScan
    val q1 = "SELECT count(*) FROM gp.default.agg"
    assert(isLocal(q1), s"count(*) must answer from the manifest:\n${planOf(q1)}")
    assert(spark.sql(q1).head().getLong(0) == 600L)

    val q2 = "SELECT min(k), max(k), count(txt) FROM gp.default.agg"
    assert(isLocal(q2), s"min/max/count(col) must answer from the manifest:\n${planOf(q2)}")
    val r2 = spark.sql(q2).head()
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 1099L)
    assert(r2.getLong(2) == 600L - 167L, "count(txt) = rows minus recorded nulls")

    // time travel composes: the v2 manifest answers
    val q3 = "SELECT count(*) FROM gp.default.agg VERSION AS OF 2"
    assert(isLocal(q3) && spark.sql(q3).head().getLong(0) == 500L)

    // NOT metadata-answerable: filtered, averaged, float/double or
    // string extrema — all fall back to the real scan, results exact
    for ((sql, expect) <- Seq(
      ("SELECT count(*) FROM gp.default.agg WHERE k < 100", 100L),
      ("SELECT count(DISTINCT k) FROM gp.default.agg", 600L))) {
      assert(!isLocal(sql), s"must scan: $sql")
      assert(spark.sql(sql).head().getLong(0) == expect)
    }
    assert(!isLocal("SELECT min(d) FROM gp.default.agg"),
      "double extrema must scan (NaN elides from parquet stats)")
    assert(spark.sql("SELECT min(d) FROM gp.default.agg").head().getDouble(0) == 0.0)
    assert(!isLocal("SELECT max(txt) FROM gp.default.agg"),
      "string extrema must scan (recorded bounds truncate)")
    assert(!isLocal("SELECT avg(k) FROM gp.default.agg"),
      "avg is not metadata-answerable and must scan")
    assert(spark.sql("SELECT avg(k) FROM gp.default.agg").head().getDouble(0) > 0)
  }

  /** PLANNED FILE count (not partitions — bin-packing coalesces tiny
    * files into shared tasks, so partition counts stopped being a file
    * proxy in round 14): unwrap the scan's input partitions. */
  private def filesOf(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.map {
        case org.apache.spark.sql.graft.PlainBatchRead.FileInputPartition(_) => 1
        case org.apache.spark.sql.graft.PlainBatchRead.FilesInputPartition(fs) => fs.size
        case org.apache.spark.sql.graft.PlainBatchRead.BucketFilesInputPartition(fs, _) => fs.size
        case _ => 1
      }.sum
    }

  test("a pushed LIMIT truncates the file list by recorded row counts") {
    // fact has three 100-row files (mkFact): LIMIT 10 needs one of them
    val lim = spark.sql("SELECT * FROM gp.default.fact LIMIT 10")
    assert(filesOf(lim) == Seq(1),
      s"LIMIT 10 must plan one 100-row file: ${filesOf(lim)}")
    assert(lim.collect().length == 10, "Spark's exact limit still applies on top")
    // a limit UNDER a filter must not truncate (the filter drops rows,
    // recorded counts are pre-filter) — Spark keeps them separate, and
    // results stay exact
    val fl = spark.sql("SELECT * FROM gp.default.fact WHERE grp = 2 LIMIT 150")
    assert(fl.collect().length == 100, "only grp=2's 100 rows exist")
  }

  test("a pushed TOP-N reads only the files whose range can reach the top") {
    // fact: three files with disjoint k ranges (0-99, 100-199, 200-299)
    val desc = spark.sql("SELECT k FROM gp.default.fact ORDER BY k DESC LIMIT 5")
    assert(filesOf(desc) == Seq(1),
      s"the top-5 descending live in the last file alone: ${filesOf(desc)}")
    assert(desc.as[Long].collect().toSeq == Seq(299L, 298L, 297L, 296L, 295L),
      "Spark's exact sort+limit still applies on top")
    val asc = spark.sql("SELECT k FROM gp.default.fact ORDER BY k LIMIT 150")
    assert(filesOf(asc) == Seq(2),
      "150 ascending rows span exactly the two lowest files")
    assert(asc.as[Long].collect().toSeq == (0L until 150L))
    // a sort column with NULLS present voids the truncation (nulls rank
    // outside the range algebra) — results stay exact
    val nulled = spark.sql(
      "SELECT txt FROM gp.default.agg ORDER BY txt LIMIT 3")
    assert(nulled.collect().map(_.isNullAt(0)).forall(identity),
      "NULLS FIRST: the nulls must surface, never be pruned away")
  }

  test("CALL recluster: z-order rewrite from pure SQL") {
    spark.sql("CREATE TABLE gp.default.rc (x BIGINT, y BIGINT)")
    spark.sql("INSERT INTO gp.default.rc SELECT id % 97, id % 89 FROM range(2000)")
    val out = spark.sql(
      "CALL gp.system.recluster('rc', 'x,y', 65536)").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L),
      "recluster commits one new version and reports it")
    assert(spark.sql("SELECT sum(x + y) FROM gp.default.rc").head().getLong(0) ==
      VersionedTable.read(lib, "rc").agg(sum(col("x") + col("y")))
        .head().getLong(0), "logical state unchanged by re-layout")
  }
}
