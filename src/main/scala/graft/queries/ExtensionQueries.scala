package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KmvSketch, PortableHash}
import graft.operators.Sampling
import graft.sources.TextSources

/** Oracle-checked queries for the round-3 extension surface: deterministic
  * sampling, the KMV distinct-count sketch (custom UDAF), flat-file
  * (CSV/JSON) source round-trips, and a typed flatMap (the UDTF shape).
  */
object ExtensionQueries {

  type Q = (SparkSession, String) => DataFrame

  /** One flat-file export per (JVM, sfDir, format) — benches measure the
    * read-back, not a rewrite per invocation. */
  private val exportDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private def eventsSubset(spark: SparkSession, sfDir: String): DataFrame =
    new graft.etl.Catalog(spark, sfDir).table("events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("props"), graft.functions.TimeCols.usec(col("ts")).as("us"))

  val queries: Map[String, Q] = Map(

    // deterministic hash sample: scan-side filter, reproducible cross-engine
    "q_sample_hash" -> { (spark, sfDir) =>
      val orders = new graft.etl.Catalog(spark, sfDir).table("orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      Sampling.hashSample(orders, "o_orderkey", 0.1).orderBy("o_orderkey")
    },

    // stratified: per-stratum fractions, same key everywhere
    "q_sample_stratified" -> { (spark, sfDir) =>
      val orders = new graft.etl.Catalog(spark, sfDir).table("orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      Sampling.stratifiedHashSample(orders, "o_orderpriority", "o_orderkey",
          Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.2), defaultFraction = 0.05)
        .orderBy("o_orderkey")
    },

    // per-group contribution cap (the "no domain may dominate the corpus"
    // rule): at most 100 orders per priority class, drawn by hash order
    "q_sample_group_cap" -> { (spark, sfDir) =>
      val orders = new graft.etl.Catalog(spark, sfDir).table("orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      Sampling.groupCap(orders, "o_orderpriority", "o_orderkey", cap = 100)
        .orderBy("o_orderkey")
    },

    // deterministic train/val/test assignment: membership depends only on
    // the key hash, so appends and re-runs never move a row across splits
    "q_sample_split" -> { (spark, sfDir) =>
      val orders = new graft.etl.Catalog(spark, sfDir).table("orders")
        .select(col("o_orderkey"))
      Sampling.splitAssign(orders, "o_orderkey",
          Seq("train" -> 0.8, "val" -> 0.1), defaultSplit = "test")
        .orderBy("o_orderkey")
    },

    // deterministic epoch shuffle: the first 100 serving positions of two
    // training epochs — same corpus, unrelated orders, each reproducible
    // bit-for-bit (the oracle re-derives both permutations independently)
    "q_epoch_shuffle" -> { (spark, sfDir) =>
      val docs = new graft.etl.Catalog(spark, sfDir).table("documents")
        .select(col("doc_id"))
      def epochTop(e: Long): DataFrame = {
        // orderBy+limit = TakeOrdered (per-partition heap, k-row driver
        // merge); the rank window then runs over 100 rows only
        val head = Sampling.epochOrder(docs, "doc_id", e).limit(100)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("epoch_key"), col("doc_id"))
        head.withColumn("rank", row_number().over(w).cast("long"))
          .select(lit(e).as("epoch"), col("rank"), col("doc_id"), col("epoch_key"))
      }
      epochTop(0L).unionAll(epochTop(1L))
    },

    // KMV sketch (custom typed Aggregator/UDAF) vs the exact distinct count
    "q_sketch_kmv" -> { (spark, sfDir) =>
      val li = new graft.etl.Catalog(spark, sfDir).table("lineitem")
        .select(col("l_returnflag"),
          PortableHash.hmod(col("l_partkey").cast("string")).as("h"),
          col("l_partkey"))
      li.groupBy("l_returnflag")
        .agg(KmvSketch.kmv(col("h"), k = 64).as("__buf"),
          countDistinct(col("l_partkey")).as("exact_distinct"))
        .select(col("l_returnflag"),
          KmvSketch.estimate("__buf", k = 64).as("est_distinct"),
          col("exact_distinct"))
        .orderBy("l_returnflag")
    },

    // sketch SET operations: click-vs-view audiences as KMV sketches —
    // union/Jaccard/overlap estimated from the two k=64 buffers ALONE (no
    // re-scan), exact counts alongside for the oracle to pin both paths
    "q_sketch_setops" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .where(col("event_type").isin("click", "view"))
        .select(col("event_type"),
          PortableHash.hmod(col("user_id").cast("string")).as("h"),
          col("user_id"))
      // both buffers from ONE aggregation row (Profile's null-sentinel
      // pattern: rows of the other type hash to P, above every real hmod,
      // and are stripped) — an absent event type yields an empty buffer,
      // never a missing row, so the crossJoin can't zero out the result
      val sentinel = graft.functions.PortableHash.P
      def typedBuf(t: String): org.apache.spark.sql.Column =
        KmvSketch.kmv(when(col("event_type") === t, col("h"))
          .otherwise(lit(sentinel)), 64)
      val sk0 = ev.agg(typedBuf("click").as("__raw_a"), typedBuf("view").as("__raw_b"))
      val ab = sk0.select(
        expr(s"filter(__raw_a, h -> h != $sentinel)").as("__ba"),
        expr(s"filter(__raw_b, h -> h != $sentinel)").as("__bb"))
      val ex = ev.groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
          max(when(col("event_type") === "view", 1).otherwise(0)).as("v"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("c") === 1 && col("v") === 1, 1L).otherwise(0L))
            .as("exact_intersection"))
      val u = KmvSketch.unionBufExpr("__ba", "__bb", 64)
      val ov = KmvSketch.overlapCountExpr("__ba", "__bb", 64)
      ab.crossJoin(ex)
        .select(KmvSketch.estimate(u, 64).as("union_est"),
          expr(ov).cast("long").as("overlap"),
          // guard the empty-union case (neither event type present): DuckDB
          // raises on /0 where non-ANSI Spark would yield NULL — define 0
          expr(s"CAST(CASE WHEN size($u) = 0 THEN 0 ELSE $ov * 1000000 DIV size($u) END AS BIGINT)")
            .as("jaccard_e6"),
          col("exact_union"), col("exact_intersection"))
    },

    // CSV round-trip: export once, read back with explicit schema; props is
    // JSON-in-string (embedded commas/quotes) — exercises quoting for real
    "q_source_csv" -> { (spark, sfDir) =>
      val src = eventsSubset(spark, sfDir)
      val dir = exportDirs.computeIfAbsent((sfDir, "csv"), { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-csv").toString
        TextSources.writeCsv(src, s"$d/events_csv")
        d
      })
      TextSources.readCsv(spark, s"$dir/events_csv", src.schema)
        .orderBy("event_id")
    },

    // one-pass table profile (ANALYZE equivalent): per-column counts,
    // min/max, and the deterministic KMV distinct estimate — k=256 so the
    // high-cardinality key exercises the estimator path and the low-
    // cardinality ones the exact path; ck injects nulls
    "q_profile" -> { (spark, sfDir) =>
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, lit(null))
            .otherwise(col("o_custkey")).as("ck"))
      graft.operators.Profile.profile(o, Seq("o_orderkey", "o_orderstatus", "ck"), k = 256)
    },

    // float columns profile on the e9 fixed-point domain (the r5 verdict's
    // "cannot profile a metric column" gap): min/max/ndv over floor(x·1e9)
    // longs render identically in both engines; disc injects nulls
    "q_profile_floats" -> { (spark, sfDir) =>
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_extendedprice"),
          when(col("l_orderkey") % 7 === 0, lit(null))
            .otherwise(col("l_discount")).as("disc"))
      graft.operators.Profile.profile(li, Seq("disc", "l_extendedprice"), k = 256)
    },

    // exact distributed quantiles of double columns (distributed prefix
    // sum over the value-count table — no single-partition window)
    "q_quantiles" -> { (spark, sfDir) =>
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_extendedprice"), col("l_discount"))
      graft.operators.Profile.quantiles(li, Seq("l_discount", "l_extendedprice"),
        Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0))
    },

    // Tukey-fence outlier audit: exact 1.5×IQR fences on the e9 domain
    // over the same quantile machinery — the post-load check that flags
    // unit-mismatch batches without materializing per-row flags
    "q_profile_outliers" -> { (spark, sfDir) =>
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_extendedprice"), col("l_discount"))
      graft.operators.Profile.outlierSummary(li,
        Seq("l_discount", "l_extendedprice"))
    },

    // JDBC round-trip through embedded Derby: seed the database from the
    // parquet table, extract back through the pushdown JDBC source (the
    // reference's actual source type is a SQL database), load, read. The
    // oracle sees only the original parquet — a faithful JDBC extract is
    // invisible in the result.
    "q_source_jdbc" -> { (spark, sfDir) =>
      val db = "graftq" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val rows = spark.read.parquet(s"$sfDir/nation.parquet")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long")).collect()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.createStatement().execute(
          "CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR(64), n_regionkey BIGINT)")
        val ps = conn.prepareStatement("INSERT INTO nation VALUES (?, ?, ?)")
        rows.foreach { r =>
          ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
          ps.setLong(3, r.getLong(2)); ps.addBatch()
        }
        ps.executeBatch()
      } finally conn.close()
      val src = new graft.etl.Catalog(spark, sfDir)
      val tgt = new graft.etl.Catalog(spark,
        java.nio.file.Files.createTempDirectory("graft-q").toString)
      val p = new graft.etl.EtlProcess(src, tgt, "t")
      p.idOrder = Seq("n_nationkey")
      p.extractJdbc(url,
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3")
      p.load()
      // load() is eager, so the in-memory database can drop now; the result
      // reads the parquet target, not Derby
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // success reports as an exception
      // Derby uppercases unquoted identifiers; re-alias to the parquet
      // spelling so the result schema matches the oracle's
      p.result().select(col("id"), col("n_nationkey").as("n_nationkey"),
          col("n_name").as("n_name"), col("n_regionkey").as("n_regionkey"))
        .orderBy("id")
    },

    // ORC round-trip (native Spark datasource; columnar like parquet but a
    // different encoder/decoder stack) — the oracle reads only the
    // original parquet, so a faithful round-trip is invisible
    "q_source_orc" -> { (spark, sfDir) =>
      val src = eventsSubset(spark, sfDir)
      val dir = exportDirs.computeIfAbsent((sfDir, "orc"), { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-orc").toString
        src.write.mode(SaveMode.Overwrite).orc(s"$d/events_orc")
        d
      })
      spark.read.schema(src.schema).orc(s"$dir/events_orc")
        .orderBy("event_id")
    },

    // JDBC as a WRITE target (reference write_db parity): full ETL into
    // embedded Derby — initial load, then an upsert through the
    // staging-table swap — and read the final table state back. The oracle
    // reproduces the end state from the parquet source alone, so id
    // assignment, the insert path, and the merge must all be faithful.
    "q_sink_jdbc" -> { (spark, sfDir) =>
      val db = "graftsink" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      val src = new graft.etl.Catalog(spark, sfDir)
      val tgt = new graft.etl.JdbcCatalog(spark, url)
      val p = new graft.etl.EtlProcess(src, tgt, "t")
      p.idOrder = Seq("s_suppkey")
      p.extract("SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal FROM supplier")
      p.load()
      p.idOrder = Seq("s_suppkey")
      p.extract("SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, lower(s_name) AS s_name, s_acctbal " +
        "FROM supplier WHERE s_suppkey % 3 = 0")
      p.load(upsertFields = Seq("s_suppkey"))
      // materialize the readback eagerly so the in-memory database can drop
      // before the harness consumes the returned frame
      val back = p.result().select("id", "s_suppkey", "s_name", "s_acctbal").orderBy("id")
      val schema = back.schema
      val rows = back.collect()
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // success reports as an exception
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },

    // JSON-lines round-trip, same contract
    "q_source_json" -> { (spark, sfDir) =>
      val src = eventsSubset(spark, sfDir)
      val dir = exportDirs.computeIfAbsent((sfDir, "json"), { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft-json").toString
        TextSources.writeJson(src, s"$d/events_json")
        d
      })
      TextSources.readJson(spark, s"$dir/events_json", src.schema)
        .orderBy("event_id")
    },

    // data-quality gate: declarative expectations with per-rule violation
    // counts; violations seeded in-query (nulls every 50th key, negative
    // prices every 97th, phantom FK every 77th, key collisions mod 1000)
    "q_quality" -> { (spark, sfDir) =>
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      val t = orders.select(
        when(col("o_orderkey") % 50 === 0, lit(null))
          .when(col("o_orderkey") % 77 === 0, col("o_custkey") + 1000000)
          .otherwise(col("o_custkey")).as("ck"),
        when(col("o_orderkey") % 97 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("price"),
        (col("o_orderkey") % 1000).as("dupkey"),
        col("o_orderstatus").as("status"))
      graft.operators.Quality.check(t, Seq(
        graft.operators.Quality.NotNull("ck"),
        graft.operators.Quality.InRange("price", 0.0, 600000.0),
        graft.operators.Quality.Matches("status", "[OFP]"),
        graft.operators.Quality.Unique(Seq("dupkey")),
        graft.operators.Quality.ForeignKey("ck", customer, "c_custkey")))
    },

    // the UDTF shape: a typed Dataset flatMap generating (doc_id, pos, token)
    "q_flatmap_tokens" -> { (spark, sfDir) =>
      import spark.implicits._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id") <= 50)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      docs.flatMap { case (id, text) =>
        text.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .zipWithIndex.map { case (tok, i) => (id, i.toLong, tok) }
      }.toDF("doc_id", "pos", "token")
        .orderBy("doc_id", "pos")
    },

    // link-graph authority: exact integer PageRank over the deterministic
    // host graph (each doc contributes one src→dst host link) — the crawl
    // frontier's host-quality prior, bit-stable across engines
    "q_graph_pagerank" -> { (spark, sfDir) =>
      graft.operators.Graph.pageRankE9(hostEdges(spark, sfDir),
          "src", "dst", iters = 5)
        .orderBy("node")
    },

    // TrustRank: restart mass pinned to a 5-host trusted seed set — spam
    // demotion by distance-from-trust instead of raw link mass
    "q_graph_trustrank" -> { (spark, sfDir) =>
      val seeds = hostEdges(spark, sfDir)
        .select(col("src").as("node")).where(col("node").isin(
          "h0", "h1", "h2", "h3", "h4")).distinct()
      graft.operators.Graph.trustRankE9(hostEdges(spark, sfDir),
          "src", "dst", seeds, "node", iters = 5)
        .orderBy("node")
    },

    // link census: per-host degree/neighbor profile (hub & spam-farm
    // signatures, skew sizing before the iterative passes)
    "q_graph_degrees" -> { (spark, sfDir) =>
      graft.operators.Graph.degreeProfile(hostEdges(spark, sfDir),
          "src", "dst")
        .orderBy("node")
    }
  )

  /** Deterministic host link graph: doc i links host h(i%40) → host
    * h((7i+3)%40); self-links dropped. The shared fixture for the graph
    * family (same construction interpolated into the oracle CTE). */
  private def hostEdges(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("src"),
        concat(lit("h"), ((col("doc_id") * 7 + 3) % 40).cast("string")).as("dst"))
      .where(col("src") =!= col("dst"))

  private val hostEdgesSql: String =
    """edges AS (
      |  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) AS src,
      |         'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst
      |  FROM documents
      |  WHERE 'h' || CAST(doc_id % 40 AS VARCHAR)
      |     <> 'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR))""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q_sample_hash" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |       CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
         |FROM orders
         |WHERE ${Sampling.hashSamplePredicateSql("o_orderkey", 0.1)}
         |ORDER BY o_orderkey""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT o_orderkey, o_orderpriority FROM orders
         |WHERE ${PortableHash.hmodSql("CAST(o_orderkey AS VARCHAR)")} % ${Sampling.Denom} <
         |      CAST(floor(${Sampling.Denom} * CASE o_orderpriority
         |             WHEN '1-URGENT' THEN 0.5 WHEN '2-HIGH' THEN 0.2
         |             ELSE 0.05 END) AS BIGINT)
         |ORDER BY o_orderkey""".stripMargin,

    "q_sample_group_cap" ->
      s"""SELECT o_orderkey, o_orderpriority FROM (
         |  SELECT o_orderkey, o_orderpriority,
         |         ${Sampling.groupCapRankSql("o_orderpriority", "o_orderkey")} AS rn
         |  FROM orders)
         |WHERE rn <= 100 ORDER BY o_orderkey""".stripMargin,

    "q_sample_split" ->
      s"""SELECT o_orderkey,
         |  ${Sampling.splitAssignSql("o_orderkey", Seq("train" -> 0.8, "val" -> 0.1), "test")} AS split
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_epoch_shuffle" -> {
      def epochTop(e: Long): String =
        s"""(SELECT CAST($e AS BIGINT) AS epoch,
           |        CAST(row_number() OVER (ORDER BY epoch_key, doc_id) AS BIGINT) AS rank,
           |        doc_id, epoch_key
           | FROM (SELECT doc_id, ${Sampling.epochKeySql("doc_id", e)} AS epoch_key
           |       FROM documents)
           | ORDER BY epoch_key, doc_id LIMIT 100)""".stripMargin
      s"""SELECT * FROM ${epochTop(0L)}
         |UNION ALL
         |SELECT * FROM ${epochTop(1L)}""".stripMargin
    },

    "q_sketch_kmv" -> {
      val h = PortableHash.hmodSql("CAST(l_partkey AS VARCHAR)")
      s"""SELECT l_returnflag,
         |       ${KmvSketch.estimateSql("list(h)", 64)} AS est_distinct,
         |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
         |FROM (SELECT l_returnflag, $h AS h, l_partkey FROM lineitem)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    "q_sketch_setops" -> {
      val h = PortableHash.hmodSql("CAST(user_id AS VARCHAR)")
      def buf(t: String): String =
        s"(SELECT list_sort(list_distinct(list(h)))[1:64] FROM ev WHERE event_type = '$t')"
      val u = KmvSketch.unionBufSql("ba", "bb", 64)
      val ov = KmvSketch.overlapCountSql("ba", "bb", 64)
      s"""WITH ev AS (SELECT event_type, $h AS h, user_id FROM events
         |            WHERE event_type IN ('click', 'view')),
         |bufs AS (SELECT ${buf("click")} AS ba, ${buf("view")} AS bb),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
         |              CAST(sum(CASE WHEN c = 1 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_intersection
         |       FROM (SELECT user_id,
         |               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         |               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v
         |             FROM ev GROUP BY user_id))
         |SELECT ${KmvSketch.estimateSql(u, 64)} AS union_est,
         |       CAST($ov AS BIGINT) AS overlap,
         |       CAST(CASE WHEN len($u) = 0 THEN 0 ELSE $ov * 1000000 // len($u) END AS BIGINT) AS jaccard_e6,
         |       exact_union, exact_intersection
         |FROM bufs CROSS JOIN ex""".stripMargin
    },

    // round-trips must surface exactly what the parquet holds
    "q_source_csv" ->
      """SELECT event_id, event_type, user_id, props,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_source_json" ->
      """SELECT event_id, event_type, user_id, props,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_profile" -> {
      def colSql(c: String): String = {
        // genuine values only: the Spark side maps nulls to the P sentinel
        // and strips it before estimating, which is exactly "the sketch of
        // the non-null hashes"
        val hs = s"list(${PortableHash.hmodSql(s"CAST($c AS VARCHAR)")}) FILTER (WHERE $c IS NOT NULL)"
        s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n,
           |  CAST(count(*) - count($c) AS BIGINT) AS nulls,
           |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s,
           |  CAST(${KmvSketch.estimateSql(hs, 256)} AS BIGINT) AS ndv_est
           |FROM src""".stripMargin
      }
      s"""WITH src AS (SELECT o_orderkey, o_orderstatus,
         |  CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END AS ck
         |  FROM orders)
         |${Seq("ck", "o_orderkey", "o_orderstatus").map(colSql).mkString("\nUNION ALL\n")}
         |ORDER BY "column"""".stripMargin
    },

    "q_profile_floats" -> {
      // float columns profile on v = floor(x·1e9) — the oracle projects the
      // same domain, so min/max/ndv hash the identical long strings
      def colSql(c: String): String = {
        val hs = s"list(${PortableHash.hmodSql(s"CAST(v_$c AS VARCHAR)")}) FILTER (WHERE v_$c IS NOT NULL)"
        s"""SELECT '$c' AS "column", CAST(count(v_$c) AS BIGINT) AS n,
           |  CAST(count(*) - count(v_$c) AS BIGINT) AS nulls,
           |  CAST(min(v_$c) AS VARCHAR) AS min_s, CAST(max(v_$c) AS VARCHAR) AS max_s,
           |  CAST(${KmvSketch.estimateSql(hs, 256)} AS BIGINT) AS ndv_est
           |FROM src""".stripMargin
      }
      s"""WITH src AS (SELECT
         |  ${PortableHash.e9Sql("CAST(l_extendedprice AS DOUBLE)")} AS v_l_extendedprice,
         |  CASE WHEN l_orderkey % 7 = 0 THEN NULL
         |       ELSE ${PortableHash.e9Sql("CAST(l_discount AS DOUBLE)")} END AS v_disc
         |  FROM lineitem)
         |${Seq("disc", "l_extendedprice").map(colSql).mkString("\nUNION ALL\n")}
         |ORDER BY "column"""".stripMargin
    },

    "q_quantiles" -> {
      val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
      s"""${graft.operators.Profile.quantilesSql("lineitem", "l_discount", qs)}
         |UNION ALL
         |${graft.operators.Profile.quantilesSql("lineitem", "l_extendedprice", qs)}
         |ORDER BY "column", q_ppm""".stripMargin
    },

    "q_profile_outliers" ->
      s"""${graft.operators.Profile.outlierSummarySql("lineitem", "l_discount")}
         |UNION ALL
         |${graft.operators.Profile.outlierSummarySql("lineitem", "l_extendedprice")}
         |ORDER BY "column"""".stripMargin,

    "q_source_jdbc" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) AS id,
        |       CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey < 3 ORDER BY id""".stripMargin,

    "q_source_orc" ->
      """SELECT event_id, event_type, user_id, props,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_jdbc" ->
      """SELECT row_number() OVER (ORDER BY s_suppkey) AS id,
        |       CAST(s_suppkey AS BIGINT) AS s_suppkey,
        |       CASE WHEN s_suppkey % 3 = 0 THEN lower(s_name) ELSE s_name END AS s_name,
        |       s_acctbal
        |FROM supplier ORDER BY id""".stripMargin,

    "q_quality" ->
      """WITH t AS (SELECT
        |    CASE WHEN o_orderkey % 50 = 0 THEN NULL
        |         WHEN o_orderkey % 77 = 0 THEN o_custkey + 1000000
        |         ELSE o_custkey END AS ck,
        |    CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
        |         ELSE o_totalprice END AS price,
        |    o_orderkey % 1000 AS dupkey,
        |    o_orderstatus AS status
        |  FROM orders)
        |SELECT 'foreign_key(ck)' AS rule,
        |       CAST((SELECT count(*) FROM t WHERE ck IS NOT NULL
        |             AND ck NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) AS violations
        |UNION ALL
        |SELECT 'in_range(price,0.0,600000.0)',
        |       CAST((SELECT count(*) FROM t WHERE price IS NOT NULL
        |             AND (price < 0.0 OR price > 600000.0)) AS BIGINT)
        |UNION ALL
        |SELECT 'matches(status)',
        |       CAST((SELECT count(*) FROM t WHERE status IS NOT NULL
        |             AND NOT regexp_full_match(status, '(?:[OFP])')) AS BIGINT)
        |UNION ALL
        |SELECT 'not_null(ck)',
        |       CAST((SELECT count(*) FROM t WHERE ck IS NULL) AS BIGINT)
        |UNION ALL
        |SELECT 'unique(dupkey)',
        |       CAST((SELECT coalesce(sum(c - 1), 0) FROM
        |             (SELECT count(*) AS c FROM t GROUP BY dupkey HAVING count(*) > 1)) AS BIGINT)
        |ORDER BY rule""".stripMargin,

    "q_flatmap_tokens" ->
      s"""WITH t AS (SELECT doc_id,
        |             list_filter(regexp_split_to_array(lower(text), '${graft.operators.TextAnalysis.JavaWsSplitSql}'), x -> x <> '') AS w
        |           FROM documents WHERE doc_id <= 50)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS token
        |FROM t, unnest(generate_series(1, len(w))) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_graph_pagerank" ->
      s"""WITH $hostEdgesSql,
         |${graft.operators.Graph.pageRankSqlCtes(5)}
         |SELECT node, rank_e9 FROM r5 ORDER BY node""".stripMargin,

    "q_graph_trustrank" ->
      s"""WITH $hostEdgesSql,
         |seeds AS (SELECT DISTINCT src AS node FROM edges
         |          WHERE src IN ('h0', 'h1', 'h2', 'h3', 'h4')),
         |${graft.operators.Graph.trustRankSqlCtes(5)}
         |SELECT node, rank_e9 FROM r5 ORDER BY node""".stripMargin,

    "q_graph_degrees" ->
      s"""WITH $hostEdgesSql,
         |o AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg,
         |        CAST(count(DISTINCT dst) AS BIGINT) AS out_nbrs
         |      FROM edges GROUP BY 1),
         |i AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg,
         |        CAST(count(DISTINCT src) AS BIGINT) AS in_nbrs
         |      FROM edges GROUP BY 1)
         |SELECT coalesce(o.node, i.node) AS node,
         |  coalesce(out_deg, 0) AS out_deg, coalesce(out_nbrs, 0) AS out_nbrs,
         |  coalesce(in_deg, 0) AS in_deg, coalesce(in_nbrs, 0) AS in_nbrs
         |FROM o FULL JOIN i ON o.node = i.node
         |ORDER BY node""".stripMargin
  )
}
