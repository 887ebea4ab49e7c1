package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` routed to the WRITE-WITHOUT-READ equality path
  * ([[RouteEqualityMerge]]): on a table that opted in with
  * `write.merge.mode = equality`, a star-shaped keyed MERGE commits the
  * batch plus one key tombstone without ever reading the target —
  * MERGE is the spelling CDC users write first, and routing it keeps a
  * continuous keyed feed O(batch) per statement. Everything
  * non-qualifying must provably stay on the standard row-level
  * rewrite. */
class EqualityMergeRouteSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gmr")
  spark.conf.set("spark.sql.catalog.gmr", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmr.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def state(t: String): Map[Long, Double] =
    VersionedTable.read(lib, t).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def headOp(t: String): String =
    VersionedTable.history(lib, t).orderBy(col("version").desc)
      .select("operation").head().getString(0)

  private def messages(e: Throwable): String = {
    val b = new StringBuilder
    var c: Throwable = e
    while (c != null) { b.append(c.getMessage).append(" | "); c = c.getCause }
    b.toString
  }

  test("a qualifying MERGE routes: exact upsert state, no target probe") {
    VersionedTable.load(lib, "t",
      Seq.tabulate(1000)(i => (i.toLong, i * 1.0)).toDF("k", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    spark.sql("ALTER TABLE gmr.default.t SET TBLPROPERTIES " +
      "('write.merge.mode' = 'equality')")
    Seq.tabulate(200)(i => (900L + i, -1.0 - i)).toDF("k", "v")
      .createOrReplaceTempView("src_batch")
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql("""MERGE INTO gmr.default.t t USING src_batch s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      Thread.sleep(500) // listener-bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    // the routed write re-reads only ITS OWN staged files (tombstone
    // derivation + the cardinality check) — O(batch); reading the
    // 1000-row target would blow the bound
    assert(read.get() <= 800L,
      s"routed MERGE must not probe the target: read ${read.get()} records")
    assert(headOp("t") == "eq-upsert",
      s"the qualifying MERGE must commit through the equality path, " +
        s"got '${headOp("t")}'")
    val s = state("t")
    assert(s.size == 1100, s"100 matched + 100 inserted: ${s.size}")
    assert(s(100L) == 100.0, "unmatched target rows keep their values")
    assert(s(950L) == -51.0, "matched rows take the source's values")
    assert(s(1050L) == -151.0, "unmatched source rows insert")
    // the read resolves a LIVE tombstone (no compaction happened)
    val v = VersionedTable.currentVersion(lib, "t").get
    assert(VersionedTable.eqTombstoneKeyCols(lib, "t", v) == Seq("k"))
  }

  test("MERGE cardinality survives routing: duplicate-key source refuses") {
    val before = state("t")
    val vBefore = VersionedTable.currentVersion(lib, "t").get
    Seq((0L, 111.0), (0L, 222.0), (5L, 1.0)).toDF("k", "v")
      .createOrReplaceTempView("dup_batch")
    val e = intercept[Throwable](spark.sql(
      """MERGE INTO gmr.default.t t USING dup_batch s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *"""))
    assert(messages(e).contains("duplicate key"), messages(e))
    assert(state("t") == before, "a refused merge must change nothing")
    assert(VersionedTable.currentVersion(lib, "t").get == vBefore)
  }

  test("non-qualifying merges provably stay on the standard rewrite") {
    // (a) conditional WHEN MATCHED — not the upsert shape
    Seq((1L, 1000.0), (2L, -3.0)).toDF("k", "v")
      .createOrReplaceTempView("cond_batch")
    spark.sql("""MERGE INTO gmr.default.t t USING cond_batch s
      ON t.k = s.k
      WHEN MATCHED AND s.v > 0 THEN UPDATE SET *""")
    assert(headOp("t") != "eq-upsert",
      "a conditional MERGE must take the row-level path")
    val s1 = state("t")
    assert(s1(1L) == 1000.0 && s1(2L) == 2.0, "and stay correct")
    // (b) explicit non-star assignment
    spark.sql("""MERGE INTO gmr.default.t t USING cond_batch s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v + 0.5""")
    assert(headOp("t") != "eq-upsert")
    assert(state("t")(2L) == -2.5)
    // (c) ON clause beyond the recorded keys (source row matches its
    // target row exactly, so the standard rewrite re-emits it verbatim
    // — no state drift for the later tests)
    Seq((1L, 1000.5)).toDF("k", "v").createOrReplaceTempView("on2_batch")
    spark.sql("""MERGE INTO gmr.default.t t USING on2_batch s
      ON t.k = s.k AND t.v = s.v
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(headOp("t") != "eq-upsert")
    // (d) no opt-in property → standard path even for the exact shape
    VersionedTable.load(lib, "plain",
      Seq.tabulate(100)(i => (i.toLong, i * 1.0)).toDF("k", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    Seq((50L, -1.0), (200L, -2.0)).toDF("k", "v")
      .createOrReplaceTempView("plain_batch")
    spark.sql("""MERGE INTO gmr.default.plain t USING plain_batch s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(headOp("plain") != "eq-upsert",
      "without write.merge.mode=equality the MERGE must not route")
    val sp = state("plain")
    assert(sp.size == 101 && sp(50L) == -1.0 && sp(200L) == -2.0)
  }

  test("routed merges keep stacking and the feed sees them") {
    Seq.tabulate(50)(i => (i.toLong, 7.0)).toDF("k", "v")
      .createOrReplaceTempView("stack_batch")
    val vBefore = VersionedTable.currentVersion(lib, "t").get
    spark.sql("""MERGE INTO gmr.default.t t USING stack_batch s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(headOp("t") == "eq-upsert")
    val vAfter = VersionedTable.currentVersion(lib, "t").get
    assert(vAfter == vBefore + 1)
    val s = state("t")
    assert((0 until 50).forall(i => s(i.toLong) == 7.0))
    // the change feed emits the routed merge as updates
    val feedRows = VersionedTable.changes(lib, "t", vBefore, vAfter, Seq("k"))
      .where(col("op") === "update").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(feedRows.size == 50,
      s"the feed must surface the routed merge: ${feedRows.size}: $feedRows")
  }
}
