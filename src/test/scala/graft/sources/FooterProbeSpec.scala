package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The footer-statistics probes must apply the same hidden-path filter as
  * the scan path: a crashed job's `_temporary` staging files hold
  * UNCOMMITTED rows, and a watermark/id-floor/byte-total that read them
  * would be silently wrong in ways the scan-based fallback never is.
  */
class FooterProbeSpec extends SparkSpec {
  import spark.implicits._

  test("footerMaxLong matches the scan max and ignores _temporary staging files") {
    val dir = tmpDir("fps")
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(ParquetSource.footerMaxLong(spark, dir, "id").contains(100L))

    // simulate a crashed job: a staged part-file with HIGHER ids under
    // _temporary — uncommitted rows the probe must not see
    val staging = new java.io.File(dir, "_temporary/0/task_x")
    staging.mkdirs()
    Seq((999L, "uncommitted")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_temporary/0/task_x/stage")
    assert(ParquetSource.footerMaxLong(spark, dir, "id").contains(100L),
      "uncommitted _temporary rows leaked into the footer max")

    // the byte-total probe honors the same filter
    val committedBytes = ParquetSource.footerTotalByteSize(spark, dir)
    assert(committedBytes.exists(_ > 0))
    val fresh = tmpDir("fps2")
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(fresh)
    assert(committedBytes == ParquetSource.footerTotalByteSize(spark, fresh))
  }

  test("probes see files under partition dirs, including the bucket column's") {
    // Hive partition dirs carry '=' in the name — Spark's hidden-path rule
    // exempts them even when they start with '_' (the physical bucket
    // column __gbucket=N); probes must apply the SAME exemption or every
    // bucketed table silently loses its footer answers
    val dir = tmpDir("fpsb")
    Seq((1L, "a")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t/__gbucket=0")
    Seq((9L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t/__gbucket=1")
    assert(ParquetSource.footerMaxLong(spark, s"$dir/t", "id").contains(9L))
    assert(ParquetSource.footerTotalByteSize(spark, s"$dir/t").exists(_ > 0))
  }

  test("footerMaxLong bails on columns without usable numeric statistics") {
    val dir = tmpDir("fps3")
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    // string column: stats exist but Binary → bail (truncation hazard)
    assert(ParquetSource.footerMaxLong(spark, dir, "s").isEmpty)
    // absent column: no evidence
    assert(ParquetSource.footerMaxLong(spark, dir, "nope").isEmpty)
  }
}
