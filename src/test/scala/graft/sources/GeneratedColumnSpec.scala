package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** GENERATED COLUMNS (`GENERATED ALWAYS AS (expr)`): Spark validates the
  * expression at CREATE (catalog capability); the ENGINE computes the
  * column on every write — omitted/null values compute from the row's
  * base columns, provided non-null values must match or the write
  * refuses in-flight — and recomputes on copy-on-write UPDATE/MERGE so
  * a SET on a base column can never leave the derived value stale. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("ggen")
  spark.conf.set("spark.sql.catalog.ggen",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.ggen.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("omitted and null values compute; full-width matches pass") {
    spark.sql("CREATE TABLE ggen.default.t (k BIGINT, v STRING, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    // by-name INSERT omitting the generated column → engine computes
    spark.sql("INSERT INTO ggen.default.t (k, v) VALUES (1, 'a'), (2, 'b')")
    // full-width INSERT providing the MATCHING value → passes
    spark.sql("INSERT INTO ggen.default.t VALUES (3, 'c', 6)")
    // explicit NULL = omitted → computes
    spark.sql("INSERT INTO ggen.default.t VALUES (4, 'd', NULL)")
    val rows = spark.sql(
      "SELECT k, twice FROM ggen.default.t ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)))
  }

  test("a provided mismatch refuses the write; nothing commits") {
    spark.sql("CREATE TABLE ggen.default.m (k BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    spark.sql("INSERT INTO ggen.default.m VALUES (1, 2)")
    val before = VersionedTable.currentVersion(lib, "m").get
    val e = intercept[Exception](
      spark.sql("INSERT INTO ggen.default.m VALUES (5, 11)"))
    assert(Option(e.getMessage).getOrElse(
      e.getCause.getMessage).contains("GENERATED") ||
      e.toString.contains("GENERATED"),
      s"refusal must name the generated column: $e")
    assert(VersionedTable.currentVersion(lib, "m").get == before,
      "a refused write must not commit")
    assert(spark.sql("SELECT count(*) FROM ggen.default.m")
      .head().getLong(0) == 1L)
  }

  test("CoW UPDATE recomputes; MERGE keeps derived values consistent") {
    spark.sql("CREATE TABLE ggen.default.u (k BIGINT, price DOUBLE, " +
      "cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))")
    spark.sql("INSERT INTO ggen.default.u (k, price) " +
      "VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    // UPDATE of the BASE column must recompute the derived one
    spark.sql("UPDATE ggen.default.u SET price = 10.0 WHERE k = 2")
    assert(spark.sql("SELECT cents FROM ggen.default.u WHERE k = 2")
      .head().getLong(0) == 1000L)
    // MERGE: updated and inserted rows recompute too
    Seq((3L, 7.0), (4L, 9.0)).toDF("k", "price")
      .createOrReplaceTempView("src_gen")
    spark.sql("""MERGE INTO ggen.default.u t USING src_gen s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.price = s.price
      WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price)""")
    val rows = spark.sql(
      "SELECT k, cents FROM ggen.default.u ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 150L), (2L, 1000L), (3L, 700L), (4L, 900L)))
  }

  test("explicit UPDATE/MERGE SET on a generated column refuses at analysis") {
    spark.sql("CREATE TABLE ggen.default.ra (k BIGINT, price DOUBLE, " +
      "cents BIGINT GENERATED ALWAYS AS (CAST(price * 100 AS BIGINT)))")
    spark.sql("INSERT INTO ggen.default.ra (k, price) VALUES (1, 1.5)")
    // the engine recomputes generated columns on every row-level write,
    // so an explicit SET would succeed while silently having no effect —
    // it must refuse instead (analysis-time, nothing commits)
    val e1 = intercept[Exception](spark.sql(
      "UPDATE ggen.default.ra SET cents = 999 WHERE k = 1"))
    assert(e1.getMessage.contains("GENERATED ALWAYS AS column 'cents'"),
      e1.getMessage)
    Seq((1L, 9.0)).toDF("k", "price").createOrReplaceTempView("src_ra")
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO ggen.default.ra t USING src_ra s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET t.price = s.price, t.cents = 42"""))
    assert(e2.getMessage.contains("GENERATED ALWAYS AS column 'cents'"),
      e2.getMessage)
    // nothing committed; base-column row ops still work
    assert(spark.sql("SELECT cents FROM ggen.default.ra").head().getLong(0)
      == 150L)
    spark.sql("UPDATE ggen.default.ra SET price = 2.0 WHERE k = 1")
    assert(spark.sql("SELECT cents FROM ggen.default.ra").head().getLong(0)
      == 200L)
  }

  test("library loads compute too, including narrow frames") {
    spark.sql("CREATE TABLE ggen.default.lib (k BIGINT, v STRING, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    // library-path load omitting the generated column entirely
    VersionedTable.load(lib, "lib", Seq((10L, "x")).toDF("k", "v"))
    // narrow frame omitting a BASE column the expression references:
    // its rows read k null → twice computes null
    VersionedTable.load(lib, "lib", Seq("y").toDF("v"))
    val rows = spark.sql(
      "SELECT v, twice FROM ggen.default.lib ORDER BY v").collect()
    assert(rows.map(r => (r.getString(0),
      if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ==
      Seq(("x", 20L), ("y", -1L)))
  }

  test("DDL guards: bad expressions refuse at CREATE; refusal matrix; DESCRIBE") {
    // a non-deterministic / unresolvable expression refuses at CREATE
    intercept[Exception](spark.sql("CREATE TABLE ggen.default.bad1 " +
      "(k BIGINT, g DOUBLE GENERATED ALWAYS AS (rand()))"))
    intercept[Exception](spark.sql("CREATE TABLE ggen.default.bad2 " +
      "(k BIGINT, g BIGINT GENERATED ALWAYS AS (nope + 1))"))
    spark.sql("CREATE TABLE ggen.default.d (k BIGINT, v STRING, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    spark.sql("INSERT INTO ggen.default.d (k, v) VALUES (1, 'a')")
    // renaming/dropping the referenced BASE column refuses
    val re = intercept[Exception](spark.sql(
      "ALTER TABLE ggen.default.d RENAME COLUMN k TO kk"))
    assert(re.getMessage.contains("generated"))
    val de = intercept[Exception](spark.sql(
      "ALTER TABLE ggen.default.d DROP COLUMN k"))
    assert(de.getMessage.contains("generated"))
    // the generated column itself may rename (expression text unchanged)
    spark.sql("ALTER TABLE ggen.default.d RENAME COLUMN twice TO dbl")
    assert(spark.sql("SELECT dbl FROM ggen.default.d").head().getLong(0) == 2L)
    // DESCRIBE round-trips the declaration from the recorded metadata
    val desc = spark.sql("DESCRIBE TABLE ggen.default.d").collect()
      .map(_.mkString("|")).mkString("\n")
    assert(desc.contains("dbl"), desc)
  }

  test("INSERT OVERWRITE computes and verifies like any write") {
    spark.sql("CREATE TABLE ggen.default.ow (k BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    spark.sql("INSERT INTO ggen.default.ow (k) VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE ggen.default.ow (k) VALUES (7), (8)")
    val rows = spark.sql(
      "SELECT k, twice FROM ggen.default.ow ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((7L, 14L), (8L, 16L)))
    // a mismatching overwrite refuses and leaves the head untouched
    intercept[Exception](spark.sql(
      "INSERT OVERWRITE ggen.default.ow VALUES (9, 19)"))
    assert(spark.sql("SELECT sum(twice) FROM ggen.default.ow")
      .head().getLong(0) == 30L)
  }

  test("composition: CLUSTER BY a generated column; streaming sink computes") {
    // the generated column materializes BEFORE the layout arrangement,
    // so clustering (and pruning) on it just works
    spark.sql("CREATE TABLE ggen.default.cl (k BIGINT, " +
      "ksq BIGINT GENERATED ALWAYS AS (k * k)) CLUSTER BY (ksq)")
    spark.sql("INSERT INTO ggen.default.cl (k) " +
      "SELECT (id * 37) % 10000 FROM range(0, 10000)")
    val v = graft.etl.VersionedTable.currentVersion(lib, "cl").get
    val skipped = graft.etl.VersionedTable.skippedFiles(lib, "cl", v,
      org.apache.spark.sql.functions.col("ksq") >= 50000000L)
    assert(skipped.nonEmpty, "zone maps must prune on the generated column")
    assert(spark.sql("SELECT count(*) FROM ggen.default.cl " +
      "WHERE ksq <> k * k").head().getLong(0) == 0L)

    // the streaming sink funnels through the same load hook
    implicit val sqlCtx = spark.sqlContext
    spark.sql("CREATE TABLE ggen.default.st (k BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2))")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = input.toDF().toDF("k").writeStream.format("graft")
      .option("dir", warehouse).option("table", "st")
      .option("checkpointLocation", tmpDir("ggen-ck"))
      .start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(
      "SELECT k, twice FROM ggen.default.st ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 4L), (3L, 6L)),
      "streamed rows must compute generated columns like batch loads")
  }

  test("merge-on-read UPDATE/MERGE recompute generated columns in-task") {
    spark.sql("CREATE TABLE ggen.default.mor (k BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (k * 2)) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO ggen.default.mor (k) VALUES (1), (2), (3)")
    val preFiles = graft.etl.VersionedTable.files(lib, "mor",
      graft.etl.VersionedTable.currentVersion(lib, "mor").get).toSet
    // UPDATE of the base column: the delta writers' bound projection
    // recomputes the derived value; files carry verbatim + DVs
    spark.sql("UPDATE ggen.default.mor SET k = 9 WHERE k = 1")
    val v = graft.etl.VersionedTable.currentVersion(lib, "mor").get
    assert(preFiles.subsetOf(
      graft.etl.VersionedTable.files(lib, "mor", v).toSet),
      "the MOR update must carry the original files verbatim")
    assert(graft.etl.VersionedTable.deletionVectors(lib, "mor", v).nonEmpty,
      "the MOR update must commit deletion vectors")
    assert(spark.sql("SELECT twice FROM ggen.default.mor WHERE k = 9")
      .head().getLong(0) == 18L, "the derived value must recompute")
    // MERGE: updated and inserted rows recompute too
    import spark.implicits._
    Seq(2L, 7L).toDF("mk").createOrReplaceTempView("src_morgen")
    spark.sql("""MERGE INTO ggen.default.mor t USING src_morgen s
      ON t.k = s.mk
      WHEN MATCHED THEN UPDATE SET t.k = s.mk * 10
      WHEN NOT MATCHED THEN INSERT (k) VALUES (s.mk)""")
    val rows = spark.sql(
      "SELECT k, twice FROM ggen.default.mor ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 6L), (7L, 14L), (9L, 18L), (20L, 40L)), rows.mkString(","))
    // DELETE keeps working (removes rows; no value to go stale)
    spark.sql("DELETE FROM ggen.default.mor WHERE k = 3")
    assert(spark.sql("SELECT count(*) FROM ggen.default.mor")
      .head().getLong(0) == 3L)
  }
}
