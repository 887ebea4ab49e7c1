package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** METADATA-ONLY TYPE WIDENING (F59): `ALTER TABLE ALTER COLUMN c TYPE t`
  * for the lossless matrix (byte/short/int→long, byte/short/int/float→
  * double) carries every file VERBATIM — parquet's readers upcast the
  * narrow physical values natively — while narrowings and lossy changes
  * refuse. Same-domain widenings keep the column's zone maps (pruning
  * keeps working); domain crossings strip the ranges (never compare
  * long-tagged bounds against double predicates) but keep null counts. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gwiden")
  spark.conf.set("spark.sql.catalog.gtw",
    classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtw.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def files(t: String): Seq[String] = {
    val v = VersionedTable.currentVersion(lib, t).get
    VersionedTable.readManifest(lib, t, v).get.files
  }

  test("int→long is metadata-only; both eras read wide; pruning survives") {
    spark.sql("CREATE TABLE gtw.default.w1 (k BIGINT, n INT)")
    spark.sql("INSERT INTO gtw.default.w1 SELECT id, CAST(id AS INT) FROM range(0, 100)")
    spark.sql("INSERT INTO gtw.default.w1 SELECT id, CAST(id AS INT) FROM range(1000, 1100)")
    val before = files("w1")

    spark.sql("ALTER TABLE gtw.default.w1 ALTER COLUMN n TYPE BIGINT")
    assert(files("w1") == before,
      "type widening must carry every data file VERBATIM")
    assert(spark.sql("SELECT * FROM gtw.default.w1").schema("n").dataType == LongType)
    // old (int-era) files read back as longs
    assert(spark.sql("SELECT sum(n) FROM gtw.default.w1").head().getLong(0) ==
      (0L until 100L).sum + (1000L until 1100L).sum)
    // post-widen appends land the wide type; both eras agree
    spark.sql("INSERT INTO gtw.default.w1 VALUES (5000, 5000000000)") // > Int.Max
    assert(spark.sql("SELECT n FROM gtw.default.w1 WHERE k = 5000")
      .head().getLong(0) == 5000000000L)
    // SAME-DOMAIN widening keeps zone maps: pruning on n still skips
    val v = VersionedTable.currentVersion(lib, "w1").get
    assert(VersionedTable.skippedFiles(lib, "w1", v, col("n") >= 1000L).nonEmpty,
      "int-era zone maps must keep pruning after an int→long widen")
    assert(VersionedTable.readWhere(lib, "w1", v, col("n") >= 1000L).count() == 101L)
  }

  test("int→double crosses stat domains: ranges strip, answers stay exact") {
    spark.sql("CREATE TABLE gtw.default.w2 (k BIGINT, n INT)")
    spark.sql("INSERT INTO gtw.default.w2 SELECT id, CAST(id AS INT) FROM range(0, 50)")
    val before = files("w2")
    spark.sql("ALTER TABLE gtw.default.w2 ALTER COLUMN n TYPE DOUBLE")
    assert(files("w2") == before)
    assert(spark.sql("SELECT sum(n) FROM gtw.default.w2").head().getDouble(0) ==
      (0 until 50).sum.toDouble)
    val v = VersionedTable.currentVersion(lib, "w2").get
    // the crossed-domain column's ranges are GONE (no skipping — and
    // crucially no wrong skipping), results exact through the filter
    assert(VersionedTable.skippedFiles(lib, "w2", v, col("n") > lit(1e6)).isEmpty)
    assert(spark.sql("SELECT count(*) FROM gtw.default.w2 WHERE n > 25.5")
      .head().getLong(0) == 24L)
    // null counts survived the crossing: IS NULL pruning still exact
    assert(spark.sql("SELECT count(*) FROM gtw.default.w2 WHERE n IS NULL")
      .head().getLong(0) == 0L)
  }

  test("narrowings and lossy changes refuse; keys refuse; float→double works") {
    val inc = Seq((1L, 1.5f, 10L)).toDF("k", "f", "n")
    VersionedTable.load(lib, "w3", inc, upsertFields = Seq("k"))
    // lossless float→double on a value column: fine
    VersionedTable.widenColumnType(lib, "w3", "f", DoubleType)
    assert(VersionedTable.read(lib, "w3").schema("f").dataType == DoubleType)
    assert(VersionedTable.read(lib, "w3").select("f").head().getDouble(0) == 1.5)
    def refuse(f: => Any, msg: String): Unit = {
      val e = intercept[Exception](f)
      assert(e.getMessage != null && e.getMessage.toLowerCase.contains(msg),
        s"expected refusal mentioning '$msg', got: ${e.getMessage}")
    }
    refuse(VersionedTable.widenColumnType(lib, "w3", "n", IntegerType), "lossless")
    refuse(VersionedTable.widenColumnType(lib, "w3", "n", StringType), "lossless")
    refuse(VersionedTable.widenColumnType(lib, "w3", "f", FloatType), "lossless")
    // the upsert key refuses even for a lossless widen — bucket/upsert
    // placement hashes stringified values, which upcasts can change
    refuse(VersionedTable.widenColumnType(lib, "w3", "k", DoubleType), "lossless")
    // long→double is NOT lossless (53-bit mantissa) — refused
    refuse(VersionedTable.widenColumnType(lib, "w3", "n", DoubleType), "lossless")
  }

  test("decimal widenings: precision growth, int→decimal; lossy shapes refuse") {
    spark.sql("CREATE TABLE gtw.default.w6 " +
      "(k BIGINT, amt DECIMAL(10,2), n INT, b BIGINT)")
    spark.sql("INSERT INTO gtw.default.w6 " +
      "SELECT id, CAST(id + 0.25 AS DECIMAL(10,2)), CAST(id AS INT), id " +
      "FROM range(0, 50)")
    val before = files("w6")

    // decimal(10,2) → decimal(16,2): metadata-only, both eras read wide
    spark.sql("ALTER TABLE gtw.default.w6 ALTER COLUMN amt TYPE DECIMAL(16,2)")
    assert(files("w6") == before,
      "decimal precision widening must carry every file VERBATIM")
    assert(spark.sql("SELECT * FROM gtw.default.w6").schema("amt").dataType ==
      DecimalType(16, 2))
    // int → decimal(12,0) is lossless (10 integral digits fit)
    spark.sql("ALTER TABLE gtw.default.w6 ALTER COLUMN n TYPE DECIMAL(12,0)")
    assert(files("w6") == before)
    // post-widen rows exceed the old precision; old rows still exact
    spark.sql("INSERT INTO gtw.default.w6 VALUES " +
      "(99, CAST(12345678901234.50 AS DECIMAL(16,2)), " +
      "CAST(99999999999 AS DECIMAL(12,0)), 99)")
    val cents = spark.sql(
      "SELECT CAST(sum(amt) * 100 AS DECIMAL(38,0)) FROM gtw.default.w6")
      .head().getDecimal(0)
    val want = new java.math.BigDecimal(
      ((0L until 50L).map(_ * 100 + 25).sum + 1234567890123450L))
    assert(cents.compareTo(want) == 0, s"got $cents want $want")
    assert(spark.sql("SELECT n FROM gtw.default.w6 WHERE k = 0")
      .head().getDecimal(0).longValueExact() == 0L)

    // lossy shapes refuse at the ENGINE's own gate (Spark's SQL analysis
    // would also refuse these via Cast.canUpCast — the library API must
    // hold the same line on its own)
    def refuse(col: String, to: DataType): Unit = {
      val e = intercept[Exception](
        VersionedTable.widenColumnType(lib, "w6", col, to))
      assert(e.getMessage != null &&
        e.getMessage.toLowerCase.contains("lossless"),
        s"expected a lossless-matrix refusal, got: ${e.getMessage}")
    }
    refuse("amt", DecimalType(16, 1)) // scale shrink re-interprets the fraction
    refuse("amt", DecimalType(12, 2)) // precision shrink
    refuse("amt", DecimalType(16, 4)) // scale growth eats integral headroom
    refuse("b", DecimalType(18, 0))   // long needs 20 integral digits
    refuse("amt", DoubleType)         // decimal → double is lossy
    // long → decimal(20,0) is fine
    spark.sql("ALTER TABLE gtw.default.w6 ALTER COLUMN b TYPE DECIMAL(20,0)")
    assert(spark.sql("SELECT sum(b) FROM gtw.default.w6")
      .head().getDecimal(0).longValueExact() == (0L until 50L).sum + 99L)
  }

  test("a mid-stream widen fails the batch loudly with the restart hint") {
    VersionedTable.load(lib, "w5", Seq((1L, 10)).toDF("k", "n"))
    val ckpt = tmpDir("gwiden-ckpt")
    val q = spark.readStream.format("graft")
      .option("dir", warehouse).option("table", "w5")
      .load().select("k", "n")
      .writeStream.format("memory").queryName("gwiden_w5")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gwiden_w5").count() == 1L)
      // widen n mid-stream, then append a wide value: the stream's
      // narrow captured schema cannot decode the new files — the guard
      // must fail the batch with the restart hint, not a deep parquet
      // column-convert error
      VersionedTable.widenColumnType(lib, "w5", "n", LongType)
      VersionedTable.load(lib, "w5", Seq((2L, 8000000000L)).toDF("k", "n"))
      val e = intercept[Throwable] { q.processAllAvailable() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("column types")),
        s"expected the type-drift refusal, got: $e")
    } finally q.stop()
  }

  test("a widened table still upserts, time travels, and feeds CDC") {
    val inc = Seq((1L, 10), (2L, 20)).toDF("k", "n")
    VersionedTable.load(lib, "w4", inc, upsertFields = Seq("k"))
    val v1 = VersionedTable.currentVersion(lib, "w4").get
    VersionedTable.widenColumnType(lib, "w4", "n", LongType)
    VersionedTable.load(lib, "w4",
      Seq((2L, 9000000000L), (3L, 30L)).toDF("k", "n"),
      upsertFields = Seq("k"))
    val v3 = VersionedTable.currentVersion(lib, "w4").get
    assert(VersionedTable.read(lib, "w4").select("k", "n").as[(Long, Long)]
      .collect().sorted.toSeq == Seq((1L, 10L), (2L, 9000000000L), (3L, 30L)))
    // time travel reads the NARROW era with its own schema
    assert(VersionedTable.readVersion(lib, "w4", v1).schema("n").dataType ==
      IntegerType)
    // the change feed crosses the widen: updates/inserts classify exactly
    val ops = VersionedTable.changes(lib, "w4", v1, v3, Seq("k"))
      .select("op", "k").as[(String, Long)].collect().map(_.swap).toMap
    assert(ops(2L) == "update" && ops(3L) == "insert" && !ops.contains(1L))
  }
}
