package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CdcMicroBatch, PlainBatchRead}

/** File SPLIT + PACK planning for the `graft` DSv2 scans (the
  * Spark-native FilePartition policy re-derived): files above
  * `spark.sql.files.maxPartitionBytes` fan out across byte-range tasks,
  * tiny files bin-pack (charged `openCostInBytes` each), and results
  * stay exact under ranges — including deletion vectors and `_pos`,
  * whose row indexes are file-global. */
class ScanPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def slice(name: String, len: Long) =
    CdcMicroBatch.FileSlice(s"/data/$name.parquet", len)

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("planPartitions splits big files and packs small ones") {
    withConf("spark.sql.files.maxPartitionBytes" -> "100",
      "spark.sql.files.openCostInBytes" -> "10") {
      val parts = PlainBatchRead.planPartitions(spark, Seq(
        slice("big", 250L),   // → 3 ranges: 100, 100, 50
        slice("s1", 20L), slice("s2", 20L), slice("s3", 20L),
        slice("s4", 20L)))    // 4×(20+10)=120 > 100 → two bins
      val slices = parts.flatMap {
        case PlainBatchRead.FileInputPartition(f) => Seq(f)
        case PlainBatchRead.FilesInputPartition(fs) => fs
      }
      // every byte of every file is covered exactly once
      val byFile = slices.groupBy(_.path).view.mapValues(
        _.sortBy(_.start).map(s => (s.start, s.length)).toSeq).toMap
      assert(byFile("/data/big.parquet") == Seq((0L, 100L), (100L, 100L), (200L, 50L)))
      assert(byFile.filterKeys(_ != "/data/big.parquet").values
        .forall(_ == Seq((0L, 20L))))
      // full-budget ranges each get their own task; the 50-byte tail
      // range and the 4 small files bin-pack (first-fit-decreasing,
      // every bin within budget) → 4 partitions total, not 7
      assert(parts.length == 4, s"expected 4 packed partitions: ${parts.toSeq}")
      val binCosts = parts.map {
        case PlainBatchRead.FileInputPartition(f) => f.length + 10L
        case PlainBatchRead.FilesInputPartition(fs) =>
          fs.map(_.length + 10L).sum
      }
      assert(binCosts.forall(_ <= 110L), // one item may exceed alone, never a pack
        s"every packed bin must fit the budget: ${binCosts.toSeq}")
      // fileSize carried for ranged slices (parquet footer location)
      assert(slices.filter(_.path.contains("big")).forall(_.fileSize == 250L))
    }
  }

  test("a file smaller than the budget stays one whole-file partition") {
    val parts = PlainBatchRead.planPartitions(spark, Seq(slice("one", 1000L)))
    assert(parts.toSeq == Seq(PlainBatchRead.FileInputPartition(slice("one", 1000L))))
  }

  test("ranged reads stay exact end-to-end: DVs, _pos, filters, aggregates") {
    val wh = tmpDir("scanpart")
    spark.conf.set("spark.sql.catalog.gsp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.dir", wh)
    val lib = new Catalog(spark, wh)
    spark.sql("CREATE TABLE gsp.default.t (k BIGINT, v BIGINT, s STRING) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gsp.default.t " +
      "SELECT id, id * 3, repeat('x', 50) FROM range(0, 20000)")
    spark.sql("DELETE FROM gsp.default.t WHERE k % 9 = 4")
    val live = (0 until 20000).filterNot(_ % 9 == 4)
    def readAll() = spark.read.format("graft")
      .option("dir", wh).option("table", "t").load()
    val wholeParts = readAll().rdd.getNumPartitions
    withConf("spark.sql.files.maxPartitionBytes" -> (16 * 1024).toString,
      "spark.sql.files.openCostInBytes" -> "1024") {
      val df = readAll()
      assert(df.rdd.getNumPartitions > wholeParts,
        s"a 16 KB budget must split the scan (whole=$wholeParts)")
      // full-scan exactness (count + sum through the DV filter)
      val agg = df.agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
      assert(agg == ((live.size.toLong, live.map(_ * 3L).sum)), s"agg: $agg")
      // the scan stays COLUMNAR under ranges + DVs
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.get
      assert(scan.supportsColumnar, "ranged DV'd scan must stay vectorized")
      // _pos is file-global and exact under ranges: positions of live
      // rows in a single-data-file table are the row ids minus the
      // deleted predecessors... simpler invariant: (file, pos) unique
      // and pos matches k where no deletions precede it
      val fp = df.select(col("_file"), col("_pos"), col("k"))
        .as[(String, Long, Long)].collect()
      assert(fp.map(r => (r._1, r._2)).distinct.length == fp.length,
        "(_file, _pos) must stay unique under ranged reads")
      // filter pushdown composes with ranges
      assert(readAll().where("k >= 19990").count() ==
        live.count(_ >= 19990).toLong)
      // library read agrees
      assert(VersionedTable.read(lib, "t").count() == live.size.toLong)
    }
  }
}
