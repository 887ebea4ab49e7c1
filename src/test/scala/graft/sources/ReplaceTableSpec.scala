package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, Loader, VersionedTable}
import org.apache.spark.sql.functions._

/** ATOMIC `[CREATE OR] REPLACE TABLE ... [AS SELECT]` through the
  * staging catalog (F56): the create/replace — data included — lands as
  * ONE versioned commit, and unlike the drop+create fallback Spark runs
  * against non-staging catalogs, HISTORY SURVIVES: time travel crosses
  * the replace boundary and no data file is deleted (vacuum reclaims on
  * its own schedule). */
class ReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("grepl")
  spark.conf.set("spark.sql.catalog.grt",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.grt.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("CREATE OR REPLACE TABLE AS SELECT replaces atomically, history survives") {
    spark.sql("CREATE TABLE grt.default.t1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO grt.default.t1 VALUES (1, 'a'), (2, 'b')")
    val vPre = VersionedTable.currentVersion(lib, "t1").get
    val preMaxId = VersionedTable.read(lib, "t1")
      .agg(max(col(Loader.IdCol))).head().getLong(0)

    // a completely different schema, in one atomic statement
    spark.range(3).select((col("id") * 100).as("amount"),
      lit(true).as("flag")).createOrReplaceTempView("repl_src")
    spark.sql("CREATE OR REPLACE TABLE grt.default.t1 AS SELECT * FROM repl_src")

    // the head is the new table
    assert(spark.sql("SELECT * FROM grt.default.t1").columns.toSeq ==
      Seq("amount", "flag"))
    assert(spark.sql("SELECT sum(amount) FROM grt.default.t1")
      .head().getLong(0) == 300L)
    // ONE commit: the replace is exactly vPre + 1
    assert(VersionedTable.currentVersion(lib, "t1").contains(vPre + 1),
      "the staged replace must land as ONE versioned commit")
    // HISTORY SURVIVES: the pre-replace version still reads exactly
    assert(spark.sql(s"SELECT k, v FROM grt.default.t1 VERSION AS OF $vPre")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")),
      "time travel must cross the replace boundary")
    // id floor stays MONOTONE: no id from the old era is ever reissued
    val postMinId = VersionedTable.read(lib, "t1")
      .agg(min(col(Loader.IdCol))).head().getLong(0)
    assert(postMinId > preMaxId,
      s"replaced rows must take ids above the old floor ($postMinId <= $preMaxId)")
  }

  test("CREATE OR REPLACE on a missing table creates; REPLACE refuses") {
    spark.range(2).select(col("id").as("n")).createOrReplaceTempView("repl_src2")
    spark.sql("CREATE OR REPLACE TABLE grt.default.t2 AS SELECT * FROM repl_src2")
    assert(spark.sql("SELECT count(*) FROM grt.default.t2").head().getLong(0) == 2L)
    assert(VersionedTable.currentVersion(lib, "t2").contains(1L),
      "CTAS through the staging path is ONE commit, not create+insert")
    intercept[Exception] {
      spark.sql("REPLACE TABLE grt.default.nope AS SELECT * FROM repl_src2")
    }
  }

  test("plain REPLACE TABLE (no AS SELECT) commits an empty new-schema table") {
    spark.sql("CREATE TABLE grt.default.t3 (k BIGINT)")
    spark.sql("INSERT INTO grt.default.t3 VALUES (7)")
    val vPre = VersionedTable.currentVersion(lib, "t3").get
    spark.sql("REPLACE TABLE grt.default.t3 (name STRING, score DOUBLE)")
    assert(spark.sql("SELECT * FROM grt.default.t3").columns.toSeq ==
      Seq("name", "score"))
    assert(spark.sql("SELECT count(*) FROM grt.default.t3").head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT k FROM grt.default.t3 VERSION AS OF $vPre")
      .as[Long].collect().toSeq == Seq(7L))
  }

  test("a CHECK TBLPROPERTY gates the replaced data atomically") {
    spark.sql("CREATE TABLE grt.default.t4 (k BIGINT)")
    spark.sql("INSERT INTO grt.default.t4 VALUES (1)")
    val vPre = VersionedTable.currentVersion(lib, "t4").get
    spark.range(5).select((col("id") - 2).as("n"))
      .createOrReplaceTempView("repl_src4") // holds negatives
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE TABLE grt.default.t4 " +
        "TBLPROPERTIES ('check' = 'n >= 0') AS SELECT * FROM repl_src4")
    }
    // the refusal left the table UNTOUCHED at its old head
    assert(VersionedTable.currentVersion(lib, "t4").contains(vPre),
      "a refused replace must commit nothing")
    assert(spark.sql("SELECT k FROM grt.default.t4").as[Long]
      .collect().toSeq == Seq(1L))
    // and a passing replace records the constraint for later writes
    spark.sql("CREATE OR REPLACE TABLE grt.default.t4 " +
      "TBLPROPERTIES ('check' = 'n >= 0') " +
      "AS SELECT * FROM repl_src4 WHERE n >= 0")
    assert(spark.sql("SELECT count(*) FROM grt.default.t4").head().getLong(0) == 3L)
    intercept[Exception] {
      spark.sql("INSERT INTO grt.default.t4 VALUES (-5)")
    }
  }
}
