package graft.etl

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

/** Parquet BLOOM FILTERS on declared columns — the point-lookup index
  * for value distributions that defeat min/max zone maps (URLs, doc ids:
  * uniformly hashed across every file, so range pruning admits all).
  * Declared once (`bloomBy`), recorded in the manifest, and stamped by
  * EVERY subsequent write without re-declaring; the filters live in the
  * parquet footers so Spark's own reader consults them for pushed eq/IN
  * with zero graft read-path code and zero manifest bloat. */
class BloomWriteSpec extends SparkSpec {

  private def bloomOffsets(file: String): Map[String, Long] = {
    val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      r.getFooter.getBlocks.asScala.headOption.fold(Map.empty[String, Long]) {
        b => b.getColumns.asScala.map(c =>
          c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      }
    } finally r.close()
  }

  test("bloomBy stamps footers on declared columns and carries forward") {
    val cat = new Catalog(spark, tmpDir("bloomw"))
    val docs = spark.range(300).select(
      col("id").as("k"),
      md5(col("id").cast("string")).as("url"),
      (col("id") % 7).as("v"))
    VersionedTable.load(cat, "d", docs, idOrder = Seq("k"),
      bloomBy = Seq("url"))
    val v1Files = VersionedTable.files(cat, "d", 1L)
    val off1 = bloomOffsets(v1Files.head)
    assert(off1.getOrElse("url", -1L) > 0L,
      s"declared column must carry a bloom filter: $off1")
    assert(off1.getOrElse("v", -1L) <= 0L,
      "undeclared columns must not pay for one")

    // an append WITHOUT re-declaring still stamps (recorded in the
    // manifest, latest declaration wins — the upsert_keys discipline)
    val more = spark.range(300, 500).select(
      col("id").as("k"),
      md5(col("id").cast("string")).as("url"),
      (col("id") % 7).as("v"))
    VersionedTable.load(cat, "d", more, idOrder = Seq("k"))
    val v2New = VersionedTable.files(cat, "d", 2L)
      .filterNot(v1Files.toSet)
    assert(v2New.nonEmpty)
    assert(bloomOffsets(v2New.head).getOrElse("url", -1L) > 0L,
      "appends must keep stamping the recorded bloom columns")

    // reads stay exact (parquet consults the bloom under pushed filters)
    val probe = docs.where(col("k") === 123).select("url")
      .head().getString(0)
    val hit = VersionedTable.read(cat, "d").where(col("url") === probe)
    assert(hit.count() == 1L && hit.head().getAs[Long]("k") == 123L)
    assert(VersionedTable.read(cat, "d")
      .where(col("url") === "no-such-hash").isEmpty)
  }

  test("the graft format write takes bloomBy as an option") {
    val dir = tmpDir("bloomfmt")
    spark.range(100).selectExpr("id AS k", "md5(cast(id AS string)) AS u")
      .write.format("graft").mode("append")
      .option("dir", dir).option("table", "t")
      .option("bloomBy", "u").save()
    val cat = new Catalog(spark, dir)
    val off = bloomOffsets(VersionedTable.files(cat, "t", 1L).head)
    assert(off.getOrElse("u", -1L) > 0L, s"format option must stamp: $off")
  }
}
