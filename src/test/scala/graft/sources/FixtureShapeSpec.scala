package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the shape contract between the driver-staged fixtures and the
  * engine's read boundary. Round 7 broke 9 queries when the fixtures were
  * restaged with parquet TIMESTAMP(µs, isAdjustedToUTC=false) — Spark 4
  * surfaces that as TIMESTAMP_NTZ, which `unix_micros`/watermarks/windows
  * all reject. [[ParquetSource.read]] now normalizes every timestamp column
  * to TimestampType (lossless: all graft sessions run UTC), and these tests
  * make the NEXT fixture-type drift fail in `sbt test` rather than in the
  * driver's round report.
  */
class FixtureShapeSpec extends SparkSpec {

  test("staged events.ts reads as TimestampType regardless of parquet tz flag") {
    val events = new graft.etl.Catalog(spark, SfDir).table("events")
    assert(events.schema("ts").dataType === TimestampType,
      s"events.ts surfaced as ${events.schema("ts").dataType} — " +
        "ParquetSource must normalize NTZ/nanos to TimestampType")
  }

  test("unix_micros over staged events.ts analyzes and yields live values") {
    val events = new graft.etl.Catalog(spark, SfDir).table("events")
    val n = events
      .select(unix_micros(col("ts")).as("us"))
      .where(col("us") > 0)
      .count()
    assert(n > 0)
  }

  test("event-time window() over staged events.ts analyzes") {
    val events = new graft.etl.Catalog(spark, SfDir).table("events")
    val windows = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    assert(windows.count() > 0)
  }
}
