package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The watermark literal must round-trip EVERY temporal type a target
  * store can surface — the reference splices whatever `MAX(pk)` returns
  * into the SQL verbatim (easy_etl/__init__.py:80-87). Round 7's latent
  * bug: a TIMESTAMP_NTZ max fell through to the default branch and
  * rendered `2024-01-14 23:59:59` UNQUOTED into the template →
  * PARSE_SYNTAX_ERROR. NTZ reaches watermarkLiteral from stores that
  * bypass ParquetSource normalization (e.g. JDBC timestamp-without-tz).
  */
class NtzWatermarkSpec extends SparkSpec {

  private def proc: EtlProcess =
    new EtlProcess(new Catalog(spark, SfDir), new Catalog(spark, tmpDir("ntzwm")), "t")

  test("TimestampNTZ watermark renders as a quoted micro-precision literal") {
    import spark.implicits._
    val ntz = Seq("2024-01-14 23:59:59.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    val lit = proc.watermarkLiteral(ntz, "ts", sparkDialect = true)
    assert(lit === "TIMESTAMP '2024-01-14 23:59:59.123456'")
    // and the rendered literal parses back to the same instant in Spark SQL
    val parsed = spark.sql(s"SELECT unix_micros($lit) AS us").head().getLong(0)
    val orig = ntz.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0)
    assert(parsed === orig)
  }

  test("NULL TimestampNTZ max renders the epoch floor") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    val lit = proc.watermarkLiteral(empty, "ts", sparkDialect = true)
    assert(lit === "TIMESTAMP '1970-01-01 00:00:00'")
  }

  test("footer and scan watermark paths agree in a NON-UTC session, NTZ and UTC targets") {
    import org.apache.spark.sql.functions.col
    val oldTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val dir = tmpDir("wmzone")
      val tgt = new Catalog(spark, dir)

      // target A: externally-written NTZ parquet (the pandas-writer shape)
      import spark.implicits._
      Seq("2024-03-05 08:30:45.123456", "2024-03-06 21:00:00.000009")
        .toDF("s").select(col("s").cast(TimestampNTZType).as("ts"))
        .coalesce(1).write.parquet(s"$dir/ntz_t")
      val pA = new EtlProcess(new Catalog(spark, SfDir), tgt, "ntz_t")
      val tA = tgt.table("ntz_t")
      val scanA = pA.watermarkLiteral(tA, "ts", sparkDialect = true)
      val footA = pA.footerWatermarkLiteral(tA, "ts")
      // NTZ stats are wall-clock: both paths must render the wall-clock max
      assert(scanA == "TIMESTAMP '2024-03-06 21:00:00.000009'", scanA)
      assert(footA.contains(scanA), s"footer=$footA scan=$scanA")

      // target B: loader-written (adjusted-UTC micros) — paths must agree
      // on the zone-shifted rendering too
      val pB = new EtlProcess(new Catalog(spark, SfDir), tgt, "utc_t")
      Loader.load(tgt, "utc_t",
        Seq("2024-03-05 08:30:45.123456").toDF("s")
          .select(col("s").cast("timestamp").as("ts")),
        idOrder = Seq("ts"))
      val tB = tgt.table("utc_t")
      val scanB = pB.watermarkLiteral(tB, "ts", sparkDialect = true)
      val footB = pB.footerWatermarkLiteral(tB, "ts")
      assert(footB.contains(scanB), s"footer=$footB scan=$scanB")
    } finally spark.conf.set("spark.sql.session.timeZone", oldTz)
  }

  test("incremental timestamp extract round-trips end-to-end on staged events") {
    val p = proc
    p.idOrder = Seq("event_id")
    p.extract("SELECT event_id, ts, event_type FROM events " +
      "WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'")
    p.load()
    val firstBatch = p.result().count()
    p.extract("SELECT event_id, ts, event_type FROM events WHERE ts > {}",
      writePkField = Some("ts"))
    p.load()
    val total = p.result().count()
    val all = new Catalog(spark, SfDir).table("events").count()
    assert(total === all, s"watermark split lost rows: $firstBatch + Δ = $total ≠ $all")
  }
}
