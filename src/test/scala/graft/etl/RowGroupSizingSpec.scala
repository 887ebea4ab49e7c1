package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sized writes must bound the parquet ROW GROUP, not just the file: a
  * scan task can only read row groups whose start offset falls in its
  * byte range, so a file written as one giant row group is one task on
  * every future scan no matter how the re-read splits it. Loader's sized
  * writes (targetFileBytes) and VersionedTable.compact cap
  * `parquet.block.size` at a quarter of the file target — every
  * at-target file carries several independently readable row groups. */
class RowGroupSizingSpec extends SparkSpec {
  import spark.implicits._

  private def rowGroupCounts(dir: String): Seq[(String, Int)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[(String, Int)]
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try out += ((st.getPath.toString, r.getFooter.getBlocks.size()))
        finally r.close()
      }
    }
    out.result()
  }

  // ~8 MB of incompressible row data: random-looking 1 KB strings
  private def wide(n: Int) = spark.range(n)
    .select(col("id").as("k"),
      sha2(concat_ws("-", col("id"), lit("pad")), 512).as("s0"))
    .withColumn("payload", concat((1 to 16).map(i =>
      sha2(concat_ws("-", col("k"), lit(i)), 512)): _*))

  test("sized Loader write: large files carry >1 row group") {
    val tgt = new Catalog(spark, tmpDir("grgs"))
    // 2 MB file target → 1 MB row-group floor; ~8 MB of data → ~4 files,
    // each ≈ target size with ≥2 row groups
    Loader.load(tgt, "t", wide(8000), targetFileBytes = Some(2L << 20))
    val gs = rowGroupCounts(tgt.dirPath("t"))
    assert(gs.nonEmpty)
    // every file at/above the target must be splittable on re-read
    val fs = new org.apache.hadoop.fs.Path(tgt.dirPath("t"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    gs.foreach { case (p, groups) =>
      val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen
      if (len >= (2L << 20)) assert(groups > 1,
        s"$p: $len bytes in $groups row group(s) — unsplittable on re-read")
    }
    assert(gs.exists(_._2 > 1), "no multi-row-group file written at all")
  }

  test("versioned compact: rewritten files carry >1 row group") {
    val tgt = new Catalog(spark, tmpDir("grgsv"))
    // two appends of 4 small files each; an 8 MB target makes all of them
    // compaction candidates (len < target/2) and rewrites them into
    // at-target files whose row groups are bounded at target/4 = 2 MB
    VersionedTable.load(tgt, "t", wide(4000))
    VersionedTable.load(tgt, "t", wide(4000).withColumn("k", col("k") + 4000L))
    VersionedTable.compact(tgt, "t", targetFileBytes = 8L << 20)
    val v = VersionedTable.currentVersion(tgt, "t").get
    val man = VersionedTable.readManifest(tgt, "t", v).get
    val dd = s"${tgt.dirPath("t")}.__vdata"
    val fs = new org.apache.hadoop.fs.Path(dd)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val counts = man.files.map { rel =>
      val p = new org.apache.hadoop.fs.Path(dd, rel)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try (fs.getFileStatus(p).getLen, r.getFooter.getBlocks.size())
      finally r.close()
    }
    counts.foreach { case (len, groups) =>
      if (len >= (8L << 20)) assert(groups > 1,
        s"compacted file: $len bytes in $groups row group(s)")
    }
    assert(counts.exists(_._2 > 1), "compaction produced no multi-row-group file")
    // contents unchanged by compaction
    assert(VersionedTable.read(tgt, "t").count() === 8000L)
  }
}
