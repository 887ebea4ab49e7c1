package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The single event-time normalization point. Every operator and query
  * that projects a timestamp into epoch microseconds routes here, so an
  * input surfacing TIMESTAMP_NTZ (parquet written without a tz flag — the
  * pandas/pyarrow default — through any path that bypasses
  * [[graft.sources.ParquetSource]]'s boundary cast), DATE, or a castable
  * string can never again fail analysis at a raw `unix_micros(col)` call
  * site (the round-7 incident: a fixture restage flipped `events.ts` to
  * NTZ and took out every event-time query).
  *
  * Graft sessions pin `spark.sql.session.timeZone=UTC`, so the cast is a
  * lossless reinterpretation for NTZ wall-clock values and the projection
  * stays a codegen'd scan-side expression — no UDF, no shuffle.
  */
object TimeCols {

  /** `c` as a session-zone TimestampType column (no-op when already so). */
  def toUtcTimestamp(c: Column): Column =
    c.cast(org.apache.spark.sql.types.TimestampType)

  /** Epoch microseconds of `c`, NTZ/date/string-proof. */
  def usec(c: Column): Column = unix_micros(toUtcTimestamp(c))
}
