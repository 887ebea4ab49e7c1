package graft.etl

import graft.SparkSpec
import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order compaction: files become local in EVERY clustered dimension, so
  * parquet min/max stats can prune on the second column too — the property
  * a lexicographic clusterBy sort cannot provide.
  */
class ZOrderSpec extends SparkSpec {

  /** Per-file (min, max) of `c` across the table's parquet files. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .filterNot(_.getName.startsWith("_"))
      .map { f =>
        val r = spark.read.parquet(f.getPath).agg(min(col(c)), max(col(c))).head()
        (r.getLong(0), r.getLong(1))
      }
  }

  test("zValue interleaves bits of both dimensions") {
    val spark0 = spark
    import spark0.implicits._
    // 4 corner points on a [0,3]x[0,3] grid, 2 bits per col
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L)).toDF("x", "y")
    val got = df.withColumn("z", ZOrder.zValue(df, Seq("x", "y"), bitsPerCol = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x contributes bits 0,2; y bits 1,3
    assert(got((0L, 0L)) == 0L)
    assert(got((3L, 0L)) == 5L)   // 0101
    assert(got((0L, 3L)) == 10L)  // 1010
    assert(got((3L, 3L)) == 15L)
  }

  test("string dimensions rank by UTF-8 prefix, pad-corrected") {
    val spark0 = spark
    import spark0.implicits._
    // the pad-correction case: "a" < "ab" < "b" lexicographically — the
    // unpadded hex would rank "ab" ABOVE "b" ("6162" = 24930 > "62" = 98)
    val df = Seq(("a", 0L), ("ab", 0L), ("b", 0L), ("zz", 0L))
      .toDF("s", "y")
    val z = df.withColumn("z", ZOrder.zValue(df, Seq("s", "y"), bitsPerCol = 8))
      .orderBy("z").select("s").collect().map(_.getString(0)).toSeq
    assert(z == Seq("a", "ab", "b", "zz"),
      s"z-order along a string dim must follow lexicographic order: $z")
    // a url-shaped column clusters by host prefix: same-host rows land in
    // adjacent z-ranges even with a second dimension varying
    val urls = for (h <- Seq("aaa.com", "mmm.net", "zzz.org"); i <- 0L until 50L)
      yield (s"http://$h/p$i", i)
    val u = urls.toDF("url", "n")
    val zs = u.withColumn("z", ZOrder.zValue(u, Seq("url", "n")))
      .orderBy("z").select("url").collect().map(_.getString(0))
    // after z-sort, each host's rows occupy ONE contiguous run per
    // z-region — count host CHANGES along the order; pure interleaving
    // would flip hosts constantly (>100 changes for 150 rows)
    val changes = zs.sliding(2).count { case Array(a, b) =>
      a.substring(7, 10) != b.substring(7, 10) }
    assert(changes <= 20,
      s"same-host urls must cluster along the z-order, got $changes host changes")
  }

  test("z-order compaction: files local in BOTH dims; lexicographic is not") {
    val spark0 = spark
    import spark0.implicits._
    // a 256x256 grid: under clusterBy(x, y) each file spans the FULL y
    // range; under z-order each file covers a bounded y window
    val grid = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val df = grid.toDF("x", "y")

    val lex = new Catalog(spark, tmpDir("graft-zlex"))
    Loader.load(lex, "t", df, idOrder = Seq("x", "y"), clusterBy = Seq("x", "y"),
      targetFileBytes = Some(64L << 10))
    val zc = new Catalog(spark, tmpDir("graft-zord"))
    Loader.load(zc, "t", df, idOrder = Seq("x", "y"))
    Loader.compactZOrder(zc, "t", targetFileBytes = 64L << 10, cols = Seq("x", "y"))

    def meanSpan(dir: String, c: String): Double = {
      val rs = fileRanges(dir, c)
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    }
    val nFiles = fileRanges(zc.dirPath("t"), "y").size
    assert(nFiles >= 4, s"need multiple files to compare layouts, got $nFiles")
    val lexY = meanSpan(lex.dirPath("t"), "y")
    val zY = meanSpan(zc.dirPath("t"), "y")
    val zX = meanSpan(zc.dirPath("t"), "x")
    // lexicographic: y spans ~the full 0..255 range per file
    assert(lexY > 200.0, s"lexicographic y-span should be ~full range: $lexY")
    // z-order: each file covers a bounded window in BOTH dims
    assert(zY < lexY / 2, s"z-order y-span must beat lexicographic: $zY vs $lexY")
    assert(zX < 200.0, s"z-order x-span must stay bounded: $zX")
    // contents identical
    assert(zc.table("t").count() == 256L * 256L)
    assert(zc.table("t").agg(sum(col("x") * col("y"))).head().getLong(0) ==
      lex.table("t").agg(sum(col("x") * col("y"))).head().getLong(0))
  }

  test("z-order compaction keeps a bucketed table's layout and sidecars") {
    val spark0 = spark
    import spark0.implicits._
    val bt = new Catalog(spark, tmpDir("graft-zbk"))
    val rows = (1 to 400).map(i => (i.toLong, (i % 17).toLong, (i % 31).toLong))
    Loader.load(bt, "t", rows.toDF("k", "a", "b"), idOrder = Seq("k"),
      bucketBy = Some((Seq("k"), 4)))
    Loader.compactZOrder(bt, "t", targetFileBytes = 1L << 20, cols = Seq("a", "b"))
    assert(graft.sources.ParquetSource.readBucketSpec(spark, bt.dirPath("t"))
      .contains((Seq("k"), 4)))
    assert(new java.io.File(bt.dirPath("t")).listFiles()
      .exists(_.getName.startsWith("__gbucket=")))
    assert(bt.table("t").count() == 400)
    // still point-lookup-able
    assert(Loader.bucketLookup(bt, "t", Map("k" -> 7L)).count() == 1)
  }
}
