package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

import org.apache.spark.sql.functions._

/** STORAGE-PARTITIONED JOINS (SPJ): two graft tables hash-bucketed on
  * the join keys report `KeyGroupedPartitioning(bucket(n, k))`, the
  * planner resolves `bucket` through the catalog's V2 function
  * ([[GraftBucketFunction]]) on both sides, and the join plans with NO
  * exchange — each bucket id zips against its twin
  * (`spark.sql.sources.v2.bucketing.enabled`, default on). The Iceberg
  * capability, re-expressed over graft's portable-hash bucket layout.
  * At 100 TB: a fact-fact join reads both sides co-located instead of
  * shuffling them. */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gspj")
  spark.conf.set("spark.sql.catalog.gj",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gj.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  // AQE hides exchanges from a naive collect (AdaptiveSparkPlanExec's
  // children don't traverse) — count them in the rendered plan instead
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private def noBroadcast[A](f: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("co-bucketed tables join with ZERO exchanges; results exact") {
    spark.sql("CREATE TABLE gj.default.a (k BIGINT, va STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gj.default.b (k BIGINT, vb STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gj.default.a " +
      "SELECT id, concat('a', id) FROM range(0, 1000)")
    spark.sql("INSERT INTO gj.default.b " +
      "SELECT id, concat('b', id) FROM range(500, 1500)")
    noBroadcast {
      val j = spark.sql("SELECT a.k, a.va, b.vb FROM gj.default.a a " +
        "JOIN gj.default.b b ON a.k = b.k")
      assert(shuffles(j) == 0,
        s"co-bucketed join must plan NO exchange:\n${j.queryExecution.executedPlan}")
      val rows = j.collect()
      assert(rows.length == 500)
      assert(rows.forall(r => r.getString(1) == s"a${r.getLong(0)}" &&
        r.getString(2) == s"b${r.getLong(0)}"),
        "every bucket must zip against its true twin — a bucket-id " +
          "mismatch would silently drop or misjoin rows")
    }
  }

  test("mismatched bucket counts fall back to a shuffled join, still exact") {
    spark.sql("CREATE TABLE gj.default.c (k BIGINT, vc STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO gj.default.c " +
      "SELECT id, concat('c', id) FROM range(0, 600)")
    noBroadcast {
      val j = spark.sql("SELECT a.k FROM gj.default.a a " +
        "JOIN gj.default.c c ON a.k = c.k")
      // different n → incompatible partitionings → Spark shuffles; the
      // results must be exact either way
      assert(j.count() == 600L)
    }
  }

  test("updates and compaction keep SPJ valid (rows re-bucket in place)") {
    // a keyed upsert rewrites touched buckets; compaction coalesces
    // within buckets — SPJ must still zip correct twins afterwards
    VersionedTable.load(lib, "a",
      (0L until 50L).map(i => (i, s"A$i")).toDF("k", "va"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.compact(lib, "b", 128L * 1024 * 1024)
    noBroadcast {
      val j = spark.sql("SELECT a.k, a.va, b.vb FROM gj.default.a a " +
        "JOIN gj.default.b b ON a.k = b.k")
      assert(shuffles(j) == 0, "SPJ must survive upsert + compaction")
      val rows = j.collect()
      assert(rows.length == 500)
      assert(rows.forall { r =>
        val k = r.getLong(0)
        // keys < 50 never match (b starts at 500); the upsert only
        // touched a-side values — check the joined values stay true
        r.getString(1) == s"a$k" && r.getString(2) == s"b$k"
      })
    }
  }

  test("skewed buckets: partially-clustered SPJ splits the hot side") {
    // a HOT bucket: many small files land in the same bucket via many
    // micro-appends, while the dim side stays tiny — the classic skew
    // that pins one task per bucket on the naive SPJ plan
    spark.sql("CREATE TABLE gj.default.hot (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gj.default.dim (k BIGINT, d STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    for (i <- 0 until 6)
      spark.sql("INSERT INTO gj.default.hot " +
        s"SELECT CAST(4 * id AS BIGINT), CAST(id + $i * 10000 AS DOUBLE) " +
        "FROM range(0, 5000)") // k % 4 == 0 for a fixed bucket — all hot
    spark.sql("INSERT INTO gj.default.dim " +
      "SELECT CAST(4 * id AS BIGINT), concat('d', 4 * id) FROM range(0, 5000)")
    val expect = 6L * 5000L
    def runWith(partially: Boolean): (Long, Int, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        partially.toString)
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
        partially.toString)
      // pack tight so the hot bucket yields several task-sized groups
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      try noBroadcast {
        val j = spark.sql("SELECT h.k, h.v, d.d FROM gj.default.hot h " +
          "JOIN gj.default.dim d ON h.k = d.k")
        val n = j.count()
        val sh = shuffles(j)
        // the join's output RDD partition count = joined task count
        // (AQE-safe — leaf collection can't see through adaptive plans)
        (n, sh, j.rdd.getNumPartitions)
      } finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        spark.conf.unset("spark.sql.sources.v2.bucketing." +
          "partiallyClusteredDistribution.enabled")
      }
    }
    // classic SPJ: exact, zero exchanges, one task per bucket
    val (n0, sh0, parts0) = runWith(partially = false)
    assert(n0 == expect && sh0 == 0, s"classic SPJ: $n0 rows, $sh0 shuffles")
    assert(parts0 == 4, s"classic SPJ groups to one task per bucket: $parts0")
    // partially-clustered: STILL exact and exchange-free, but the hot
    // bucket's splits stay separate tasks (dim groups replicate)
    val (n1, sh1, parts1) = runWith(partially = true)
    assert(n1 == expect, s"partially-clustered SPJ must stay exact: $n1")
    assert(sh1 == 0,
      "partially-clustered SPJ must not fall back to an exchange")
    assert(parts1 > 4,
      s"the hot bucket must split across tasks (got $parts1 partitions)")
  }

  test("GROUP BY the bucket key aggregates without an exchange") {
    // a hash bucket holds COMPLETE key groups, so the same reported
    // partitioning satisfies the aggregate's clustering too
    val agg = spark.sql(
      "SELECT k, count(*) AS n FROM gj.default.a GROUP BY k")
    assert(shuffles(agg) == 0,
      s"bucket-key aggregation must not shuffle:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == 1000L)
    assert(spark.sql("SELECT max(n) FROM (SELECT k, count(*) AS n " +
      "FROM gj.default.a GROUP BY k)").head().getLong(0) == 1L)
  }

  test("SPJ over live equality tombstones: exact, still zero exchanges") {
    // a write-without-read upsert on one side must not break the keyed
    // partitioning (the batch writes into bucket dirs; the in-task key
    // anti-filters resolve the tombstones inside each keyed partition)
    VersionedTable.load(lib, "ea",
      Seq.tabulate(400)(i => (i.toLong, i * 1.0)).toDF("k", "va"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    VersionedTable.load(lib, "eb",
      Seq.tabulate(400)(i => (i.toLong, i * 2.0)).toDF("k", "vb"),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)))
    VersionedTable.upsertEqualityDelete(lib, "ea",
      Seq.tabulate(50)(i => (i.toLong, -1.0)).toDF("k", "va"),
      keys = Seq("k"))
    noBroadcast {
      val j = spark.sql("SELECT a.k, a.va, b.vb FROM gj.default.ea a " +
        "JOIN gj.default.eb b ON a.k = b.k")
      assert(shuffles(j) == 0,
        "tombstones must not cost the join its co-location")
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(rows.length == 400)
      assert(rows.groupBy(_._1).forall(_._2.length == 1), "no duplicates")
      val m = rows.map(t => t._1 -> ((t._2, t._3))).toMap
      assert(m(5L) == ((-1.0, 10.0)), "tombstoned side resolves in-task")
      assert(m(100L) == ((100.0, 200.0)))
    }
  }

  test("disabling the conf restores the shuffled plan (results identical)") {
    val old = spark.conf.get("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try noBroadcast {
      val j = spark.sql("SELECT a.k FROM gj.default.a a " +
        "JOIN gj.default.b b ON a.k = b.k")
      assert(shuffles(j) > 0, "with the conf off the join must shuffle")
      assert(j.count() == 500L)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", old)
  }
}
