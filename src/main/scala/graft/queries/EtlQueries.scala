package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Catalog, EtlProcess}

/** Oracle-checked queries for the reference's own operator inventory
  * (SURVEY.md §2.1: E1–E5, M1, T1–T3, L1–L3, X1, S1–S5).
  *
  * Conventions (driver contract, SURVEY.md §7.1 item 5):
  *   - every query returns a deterministic, fully-ordered result;
  *   - surrogate ids are deterministic (idOrder over unique business keys)
  *     so the DuckDB oracle reproduces them with row_number();
  *   - no order-dependent floating-point aggregation (doubles only pass
  *     through scalar ops, which are bit-exact in both engines).
  */
object EtlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def srcCat(spark: SparkSession, sfDir: String) = new Catalog(spark, sfDir)
  private def tmpCat(spark: SparkSession) =
    new Catalog(spark, java.nio.file.Files.createTempDirectory("graft-q").toString)
  private def proc(spark: SparkSession, sfDir: String, table: String): EtlProcess =
    new EtlProcess(srcCat(spark, sfDir), tmpCat(spark), table)

  val queries: Map[String, Q] = Map(

    // E1: raw-SQL extract + surrogate ids
    "q_extract_select" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 150000")
      p.load()
      p.result().orderBy("id")
    },

    // E1 dialect parity: reference user SQL is MySQL — backtick quoting
    // (native Spark) and the comma LIMIT form (rewritten by MySqlDialect)
    // must both run unchanged
    "q_extract_mysql" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT `o_orderkey`, `o_orderstatus`, o_totalprice " +
        "FROM orders WHERE o_totalprice > 150000 " +
        "ORDER BY o_orderkey LIMIT 5, 10")
      p.load()
      p.result().orderBy("id")
    },

    // E2: extract from a .sql file
    "q_extract_file" -> { (spark, sfDir) =>
      val f = java.nio.file.Files.createTempFile("graft-extract", ".sql")
      java.nio.file.Files.writeString(f,
        "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1")
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("n_nationkey")
      p.extract(f.toString)
      p.load()
      p.result().orderBy("id")
    },

    // E3: extract-time casts (reference `types={"col": float}`)
    "q_types_cast" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 2000",
        types = Map("o_custkey" -> StringType, "o_orderkey" -> DoubleType))
      p.load()
      p.result().orderBy("id")
    },

    // E4: incremental extract — {} replaced by max(pk) of the target
    "q_incremental" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500")
      p.load()
      p.extract("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey > {}",
        writePkField = Some("o_orderkey"))
      p.load()
      p.result().orderBy("id")
    },

    // S1b: three appends accumulate files; compaction rewrites the layout
    // without changing content — ids assigned per ascending key-range
    // batches collapse to one global row_number, which is all the oracle
    // sees (any content drift in the rewrite would hash-mismatch)
    "q_load_compacted" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      for ((lo, hi) <- Seq((-1, 33), (33, 66), (66, 1000000))) {
        p.idOrder = Seq("s_suppkey")
        p.extract("SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal " +
          s"FROM supplier WHERE s_suppkey > $lo AND s_suppkey <= $hi")
        p.load()
      }
      graft.etl.Loader.compact(p.tgt.asInstanceOf[Catalog], "t", 64L * 1024 * 1024)
      p.result().orderBy("id")
    },

    // S2b: partition-scoped upsert — Hive-partitioned target (event_type),
    // second load's keys include the partition column, so only the touched
    // partition rewrites (PartitionedUpsertSpec proves the untouched files
    // survive byte-for-byte; here the oracle proves the STATE is exactly
    // the full-merge state: matched rows updated in place keeping ids,
    // fresh keys appended with continuing ids)
    "q_upsert_partitioned" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.partitionBy = Seq("event_type")
      p.idOrder = Seq("event_id")
      p.extract("SELECT event_id, event_type, value FROM events WHERE event_id <= 3000")
      p.load()
      p.idOrder = Seq("event_id")
      p.extract("SELECT event_id, event_type, value * 2 AS value FROM events " +
        "WHERE event_type = 'click' AND (event_id <= 300 OR (event_id > 3000 AND event_id <= 3100))")
      p.load(upsertFields = Seq("event_id", "event_type"))
      p.result().orderBy("id")
    },

    // the MULTI-COLUMN partition spec: upsert keys cover both partition
    // columns, so the merge rewrites only the touched LEAF partitions
    // (spec-proven in PartitionedUpsertSpec; end state pinned here)
    "q_upsert_partitioned_multi" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.partitionBy = Seq("event_type", "b")
      p.idOrder = Seq("event_id")
      p.extract("SELECT event_id, event_type, user_id % 4 AS b, value FROM events WHERE event_id <= 3000")
      p.load()
      p.idOrder = Seq("event_id")
      p.extract("SELECT event_id, event_type, user_id % 4 AS b, value * 2 AS value FROM events " +
        "WHERE event_type = 'click' AND user_id % 4 = 1 " +
        "AND (event_id <= 300 OR (event_id > 3000 AND event_id <= 3100))")
      p.load(upsertFields = Seq("event_id", "event_type", "b"))
      p.result().orderBy("id")
    },

    // E4b: incremental extract over a TIMESTAMP watermark — the reference
    // substitutes whatever MAX(pk) returns (any type); the literal must
    // round-trip with micro precision
    "q_incremental_ts" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("event_id")
      p.extract("SELECT event_id, ts, event_type FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'")
      p.load()
      p.extract("SELECT event_id, ts, event_type FROM events WHERE ts > {}",
        writePkField = Some("ts"))
      p.load()
      p.result().orderBy("id")
    },

    // E5: extract override (arbitrary DataFrame producer)
    "q_extract_override" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("k")
      p.extractOverride(() =>
        spark.read.parquet(s"$sfDir/customer.parquet")
          .where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k"), upper(col("c_mktsegment")).as("seg")))
      p.load()
      p.result().orderBy("id")
    },

    // M1: middleware — whole-result-set rewrite between extract and transforms
    "q_middleware" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("c_custkey")
      p.extract("SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer")
      p.middleware(df => df.where(col("c_nationkey") < 10))
      p.middleware(df => df.withColumn("is_neg", col("c_acctbal") < 0))
      p.ignore("c_nationkey")
      p.load()
      p.result().orderBy("id")
    },

    // T1: single-method transform
    "q_transform_upper" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("c_custkey")
      p.extract("SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey <= 500")
      p.transform("c_name").upper()
      p.transform("c_mktsegment").lower()
      p.load()
      p.result().orderBy("id")
    },

    // T1: chained methods compose left-to-right
    "q_transform_chain" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey <= 1000")
      p.transform("o_orderpriority").lower().replace("-", "_").strip()
      p.load()
      p.result().orderBy("id")
    },

    // T1: zfill (lpad)
    "q_transform_zfill" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("s_suppkey")
      p.extract("SELECT s_suppkey, s_name FROM supplier")
      p.transform("s_suppkey").zfill(12)
      p.idOrder = Seq("s_suppkey") // now a string; zero-padded order == numeric order
      p.load()
      p.result().orderBy("id")
    },

    // T1: padding / affix / predicate methods (ljust, removeprefix, endswith)
    "q_transform_strmethods" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("p_partkey")
      p.extract("SELECT p_partkey, p_brand, p_type FROM part WHERE p_partkey <= 300")
      p.transform("p_brand").removeprefix("Brand#").rjust(6, "_")
      p.transform("p_type").swapcase()
      p.load()
      p.result().orderBy("id")
    },

    // T1: broadened Python-str surface — count, find, center (odd width →
    // CPython's extra-fill-left quirk), rfind, casefold + strip(chars),
    // expandtabs, format ({} auto-numbering), partition (flattened via map)
    "q_transform_pystr" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("p_partkey")
      p.extract("SELECT p_partkey, p_name, p_name AS n2, p_brand, p_type, p_type AS t2, " +
        "p_size AS sz1, p_size AS sz2, replace(p_name, ' ', chr(9)) AS tb, " +
        "p_brand || ' #{} {}' AS fmt, p_type AS prt FROM part WHERE p_partkey <= 400")
      p.transform("p_name").count("al")
      p.transform("n2").find("al")
      p.transform("p_brand").center(13, "*")
      p.transform("p_type").rfind("ED")
      p.transform("t2").casefold().strip("aeiou")
      p.transform("sz1").bit_count()
      p.transform("sz2").bit_length()
      p.transform("tb").expandtabs(8)
      p.transform("fmt").format(1, "z")
      p.transform("prt").partition("ED").map(a => concat_ws("|", a))
      p.load()
      p.result().orderBy("id")
    },

    // T2: falsy default — null, '' and 0 all replaced
    "q_default_falsy" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("c_custkey")
      p.extract(
        """SELECT c_custkey,
          |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
          |  CASE WHEN c_nationkey < 5 THEN '' ELSE c_name END AS nm,
          |  CASE WHEN c_nationkey % 3 = 0 THEN 0 ELSE c_nationkey END AS nk
          |FROM customer""".stripMargin)
      p.transform("seg").default("UNKNOWN")
      p.transform("nm").default("anon")
      p.transform("nk").default(-1)
      p.load()
      p.result().orderBy("id")
    },

    // T3: scalar UDF
    "q_func_udf" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("n_nationkey")
      p.extract("SELECT n_nationkey, n_name FROM nation")
      p.transform("n_name").func(udf((s: String) => if (s == null) null else s.reverse))
      p.load()
      p.result().orderBy("id")
    },

    // L1: exact dimension link, incl. misses → null
    "q_link_exact" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir); val tgt = tmpCat(spark)
      val dim = new EtlProcess(src, tgt, "nation_dim")
      dim.idOrder = Seq("n_nationkey")
      dim.extract("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20")
      dim.load()
      val p = new EtlProcess(src, tgt, "t")
      p.idOrder = Seq("c_custkey")
      p.extract("SELECT c_custkey, c_name, c_nationkey FROM customer")
      p.link("nation_id", target = "c_nationkey", tableName = "nation_dim",
        childField = "n_nationkey")
      p.ignore("c_nationkey")
      p.load()
      p.result().orderBy("id")
    },

    // L2: as-of link, ">=" — smallest day-start ≥ ts (misses on the last day)
    "q_link_closest_ge" -> { (spark, sfDir) => linkClosestQuery(spark, sfDir, ">=") },

    // L3: as-of link, "<=" — largest day-start ≤ ts (the date-bucket case)
    "q_link_closest_le" -> { (spark, sfDir) => linkClosestQuery(spark, sfDir, "<=") },

    // X1: ignore drops fields just before load
    "q_ignore" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderkey <= 1500")
      p.ignore("o_custkey")
      p.load()
      p.result().orderBy("id")
    },

    // S1: append load — ids continue across loads
    "q_load_append" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("s_suppkey")
      p.extract("SELECT s_suppkey, s_name FROM supplier"); p.load()
      p.extract("SELECT s_suppkey, s_name FROM supplier"); p.load()
      p.result().orderBy("id")
    },

    // range-clustered layout: the write range-partitions + sorts on the
    // cluster key (disjoint per-file ranges, spec-asserted in RowWidthSpec);
    // the oracle proves the re-layout is content-lossless
    "q_load_clustered" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.clusterBy = Seq("o_custkey")
      p.targetFileBytes = Some(256L * 1024)
      p.extract("SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      p.load()
      p.clusterBy = Seq.empty
      p.targetFileBytes = None
      p.result().orderBy("id")
    },

    // S2: upsert — matched keys update in place (id kept), fresh keys insert
    "q_upsert" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000")
      p.load()
      p.extract(
        """SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 3000""".stripMargin)
      p.load(upsertFields = Seq("o_orderkey"))
      p.result().orderBy("id")
    },

    // S2 on the HASH-BUCKETED layout: same logical upsert as q_upsert, but
    // the table partitions on a derived key-hash bucket id, so the merge
    // rewrites only touched buckets (spec-proven in BucketedUpsertSpec);
    // the oracle pins that the physical re-layout changes NO result bit
    "q_upsert_bucketed" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.bucketBy = Some((Seq("o_orderkey"), 16))
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000")
      p.load()
      p.extract(
        """SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 3000""".stripMargin)
      p.load(upsertFields = Seq("o_orderkey"))
      p.result().orderBy("id")
    },

    // OPTIMIZE ZORDER BY: load flat, re-layout in Morton order over
    // (o_orderkey, o_custkey) — the multi-dim locality is spec-proven in
    // ZOrderSpec; the oracle pins that the re-layout changes NO result bit
    "q_load_zorder" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir); val tgt = tmpCat(spark)
      val p = new EtlProcess(src, tgt, "t")
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 4000")
      p.load()
      graft.etl.Loader.compactZOrder(tgt, "t", targetFileBytes = 256L << 10,
        cols = Seq("o_orderkey", "o_custkey"))
      tgt.table("t").orderBy("id")
    },

    // bucket-pruned point lookups: three key fetches against the bucketed
    // table, each scanning exactly ONE bucket dir (spec-asserted in
    // BucketedUpsertSpec); oracle pins the fetched rows
    "q_lookup_bucketed" -> { (spark, sfDir) =>
      val src = srcCat(spark, sfDir); val tgt = tmpCat(spark)
      val p = new EtlProcess(src, tgt, "t")
      p.bucketBy = Some((Seq("o_orderkey"), 16))
      p.idOrder = Seq("o_orderkey")
      p.extract("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000")
      p.load()
      Seq(7L, 500L, 1999L)
        .map(k => graft.etl.Loader.bucketLookup(tgt, "t", Map("o_orderkey" -> k)))
        .reduce(_.unionByName(_))
        .select("id", "o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // per-domain BPE token budget: the "how many training tokens does each
    // source contribute" audit every mixture decision starts from
    "q_token_budget" -> { (spark, sfDir) =>
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      graft.functions.Bpe.nTokensByDict(d, "doc_id", "text", BpeMerges.Merges)
        .join(d.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_bpe_tokens").as("n_tokens"))
        .orderBy("source")
    },

    // S3+S4: schema evolution — ensure widens, default narrowing drops stale
    "q_schema_evolve" -> { (spark, sfDir) =>
      val p = proc(spark, sfDir, "t")
      p.idOrder = Seq("p_partkey")
      p.extract("SELECT p_partkey, p_name, p_brand FROM part"); p.load()
      p.extract("SELECT p_partkey, p_name, p_type FROM part"); p.load()
      p.result().orderBy("id")
    }
  )

  private def linkClosestQuery(spark: SparkSession, sfDir: String, method: String): DataFrame = {
    val src = srcCat(spark, sfDir); val tgt = tmpCat(spark)
    val dim = new EtlProcess(src, tgt, "day_dim")
    dim.idOrder = Seq("d")
    dim.extract("SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events")
    dim.load()
    val p = new EtlProcess(src, tgt, "t")
    p.idOrder = Seq("event_id")
    p.extract("SELECT event_id, ts FROM events")
    p.linkClosest("day_id", target = "ts", tableName = "day_dim",
      childField = "d", method = method)
    p.load()
    p.result().orderBy("id")
  }

  /** DuckDB twins. Table names resolve against the same parquet files. */
  val oracleSql: Map[String, String] = Map(

    "q_extract_select" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_totalprice > 150000 ORDER BY id""".stripMargin,

    "q_extract_mysql" ->
      """WITH x AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |           FROM orders WHERE o_totalprice > 150000
        |           ORDER BY o_orderkey LIMIT 10 OFFSET 5)
        |SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       o_orderkey, o_orderstatus, o_totalprice
        |FROM x ORDER BY id""".stripMargin,

    "q_extract_file" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) AS id, n_nationkey, n_name
        |FROM nation WHERE n_regionkey = 1 ORDER BY id""".stripMargin,

    "q_types_cast" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       CAST(o_orderkey AS DOUBLE) AS o_orderkey,
        |       CAST(o_custkey AS VARCHAR) AS o_custkey,
        |       o_totalprice
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY id""".stripMargin,

    "q_incremental" ->
      """WITH b1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 500),
        |     b2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey > (SELECT max(o_orderkey) FROM b1)),
        |     i1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, b1.* FROM b1),
        |     i2 AS (SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY o_orderkey) AS id, b2.* FROM b2)
        |SELECT * FROM i1 UNION ALL SELECT * FROM i2 ORDER BY id""".stripMargin,

    "q_load_compacted" ->
      """SELECT row_number() OVER (ORDER BY s_suppkey) AS id,
        |       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal
        |FROM supplier ORDER BY id""".stripMargin,

    "q_upsert_partitioned" ->
      """WITH b1 AS (SELECT event_id, event_type, value FROM events WHERE event_id <= 3000),
        |     i1 AS (SELECT row_number() OVER (ORDER BY event_id) AS id, b1.* FROM b1),
        |     u AS (SELECT event_id, event_type, value * 2 AS value FROM events
        |           WHERE event_type = 'click'
        |             AND (event_id <= 300 OR (event_id > 3000 AND event_id <= 3100))),
        |     upd AS (SELECT i1.id, i1.event_id,
        |                    CASE WHEN u.event_id IS NOT NULL THEN u.value ELSE i1.value END AS value,
        |                    i1.event_type
        |             FROM i1 LEFT JOIN u
        |               ON i1.event_id = u.event_id AND i1.event_type = u.event_type),
        |     fresh AS (SELECT event_id, event_type, value FROM u WHERE event_id > 3000),
        |     i2 AS (SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY event_id) AS id,
        |                   fresh.event_id, fresh.value, fresh.event_type
        |            FROM fresh)
        |SELECT id, event_id, value, event_type FROM upd
        |UNION ALL SELECT id, event_id, value, event_type FROM i2
        |ORDER BY id""".stripMargin,

    "q_upsert_partitioned_multi" ->
      """WITH b1 AS (SELECT event_id, event_type, user_id % 4 AS b, value FROM events
        |            WHERE event_id <= 3000),
        |     i1 AS (SELECT row_number() OVER (ORDER BY event_id) AS id, b1.* FROM b1),
        |     u AS (SELECT event_id, event_type, user_id % 4 AS b, value * 2 AS value FROM events
        |           WHERE event_type = 'click' AND user_id % 4 = 1
        |             AND (event_id <= 300 OR (event_id > 3000 AND event_id <= 3100))),
        |     upd AS (SELECT i1.id, i1.event_id,
        |                    CASE WHEN u.event_id IS NOT NULL THEN u.value ELSE i1.value END AS value,
        |                    i1.event_type, i1.b
        |             FROM i1 LEFT JOIN u
        |               ON i1.event_id = u.event_id AND i1.event_type = u.event_type AND i1.b = u.b),
        |     fresh AS (SELECT event_id, event_type, b, value FROM u WHERE event_id > 3000),
        |     i2 AS (SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY event_id) AS id,
        |                   fresh.event_id, fresh.value, fresh.event_type, fresh.b
        |            FROM fresh)
        |SELECT id, event_id, value, event_type, b FROM upd
        |UNION ALL SELECT id, event_id, value, event_type, b FROM i2
        |ORDER BY id""".stripMargin,

    "q_incremental_ts" ->
      """WITH b1 AS (SELECT event_id, ts, event_type FROM events
        |            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
        |     b2 AS (SELECT event_id, ts, event_type FROM events
        |            WHERE ts > (SELECT max(ts) FROM b1)),
        |     i1 AS (SELECT row_number() OVER (ORDER BY event_id) AS id, b1.* FROM b1),
        |     i2 AS (SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY event_id) AS id, b2.* FROM b2)
        |SELECT * FROM i1 UNION ALL SELECT * FROM i2 ORDER BY id""".stripMargin,

    "q_extract_override" ->
      """SELECT row_number() OVER (ORDER BY k) AS id, k, seg FROM (
        |  SELECT c_custkey AS k, upper(c_mktsegment) AS seg FROM customer
        |  WHERE c_custkey % 7 = 0) ORDER BY id""".stripMargin,

    "q_middleware" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS id,
        |       c_custkey, c_name, c_acctbal, (c_acctbal < 0) AS is_neg
        |FROM customer WHERE c_nationkey < 10 ORDER BY id""".stripMargin,

    "q_transform_upper" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS id,
        |       c_custkey, upper(c_name) AS c_name, lower(c_mktsegment) AS c_mktsegment
        |FROM customer WHERE c_custkey <= 500 ORDER BY id""".stripMargin,

    "q_transform_chain" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       o_orderkey, trim(replace(lower(o_orderpriority), '-', '_')) AS o_orderpriority
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY id""".stripMargin,

    "q_transform_zfill" ->
      """SELECT row_number() OVER (ORDER BY lpad(CAST(s_suppkey AS VARCHAR), 12, '0')) AS id,
        |       lpad(CAST(s_suppkey AS VARCHAR), 12, '0') AS s_suppkey, s_name
        |FROM supplier ORDER BY id""".stripMargin,

    "q_transform_strmethods" ->
      """SELECT row_number() OVER (ORDER BY p_partkey) AS id, p_partkey,
        |       lpad(CASE WHEN p_brand LIKE 'Brand#%' THEN substr(p_brand, 7) ELSE p_brand END, 6, '_') AS p_brand,
        |       translate(p_type,
        |                 'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
        |                 'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz') AS p_type
        |FROM part WHERE p_partkey <= 300 ORDER BY id""".stripMargin,

    // tb: replace(p_name,' ',TAB).expandtabs(8) — splitting the tabbed text
    // on tabs equals splitting p_name on spaces, then each boundary pads to
    // the next multiple of 8 from the accumulated length (no newlines in
    // part names, so the column counter never resets)
    "q_transform_pystr" ->
      """SELECT row_number() OVER (ORDER BY p_partkey) AS id, p_partkey,
        |       CAST((length(p_name) - length(replace(p_name, 'al', ''))) / 2 AS BIGINT) AS p_name,
        |       CAST(strpos(p_name, 'al') - 1 AS BIGINT) AS n2,
        |       CASE WHEN length(p_brand) >= 13 THEN p_brand
        |            ELSE repeat('*', ((13 - length(p_brand)) // 2) + ((13 - length(p_brand)) & 13 & 1))
        |                 || p_brand ||
        |                 repeat('*', (13 - length(p_brand)) - (((13 - length(p_brand)) // 2) + ((13 - length(p_brand)) & 13 & 1)))
        |       END AS p_brand,
        |       CAST(CASE WHEN strpos(reverse(p_type), 'DE') = 0 THEN -1
        |                 ELSE length(p_type) - strpos(reverse(p_type), 'DE') - 1 END AS BIGINT) AS p_type,
        |       trim(lower(p_type), 'aeiou') AS t2,
        |       CAST(bit_count(CAST(p_size AS BIGINT)) AS BIGINT) AS sz1,
        |       CAST(CASE WHEN p_size = 0 THEN 0 ELSE length(bin(CAST(p_size AS BIGINT))) END AS BIGINT) AS sz2,
        |       list_reduce(list_prepend('', __parts[1:len(__parts)-1]),
        |                   (acc, p) -> acc || p || repeat(' ', 8 - length(acc || p) % 8))
        |         || __parts[len(__parts)] AS tb,
        |       p_brand || ' #1 z' AS fmt,
        |       CASE WHEN strpos(p_type, 'ED') = 0 THEN p_type || '||'
        |            ELSE substr(p_type, 1, strpos(p_type, 'ED') - 1) || '|ED|'
        |                 || substr(p_type, strpos(p_type, 'ED') + 2) END AS prt
        |FROM (SELECT *, string_split(p_name, ' ') AS __parts FROM part)
        |WHERE p_partkey <= 400 ORDER BY id""".stripMargin,

    "q_default_falsy" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS id, c_custkey,
        |       CASE WHEN seg IS NULL OR seg = '' THEN 'UNKNOWN' ELSE seg END AS seg,
        |       CASE WHEN nm IS NULL OR nm = '' THEN 'anon' ELSE nm END AS nm,
        |       CASE WHEN nk IS NULL OR nk = 0 THEN -1 ELSE nk END AS nk
        |FROM (SELECT c_custkey,
        |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
        |        CASE WHEN c_nationkey < 5 THEN '' ELSE c_name END AS nm,
        |        CASE WHEN c_nationkey % 3 = 0 THEN 0 ELSE c_nationkey END AS nk
        |      FROM customer) ORDER BY id""".stripMargin,

    "q_func_udf" ->
      """SELECT row_number() OVER (ORDER BY n_nationkey) AS id,
        |       n_nationkey, reverse(n_name) AS n_name
        |FROM nation ORDER BY id""".stripMargin,

    "q_link_exact" ->
      """WITH dim AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS id, n_nationkey
        |             FROM nation WHERE n_nationkey < 20)
        |SELECT row_number() OVER (ORDER BY c.c_custkey) AS id,
        |       c.c_custkey, c.c_name, dim.id AS nation_id
        |FROM customer c LEFT JOIN dim ON c.c_nationkey = dim.n_nationkey
        |ORDER BY id""".stripMargin,

    "q_link_closest_ge" -> linkClosestOracle(">=", "ASC"),
    "q_link_closest_le" -> linkClosestOracle("<=", "DESC"),

    "q_ignore" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id, o_orderkey, o_orderpriority
        |FROM orders WHERE o_orderkey <= 1500 ORDER BY id""".stripMargin,

    "q_load_append" ->
      """WITH b AS (SELECT s_suppkey, s_name FROM supplier),
        |     i1 AS (SELECT row_number() OVER (ORDER BY s_suppkey) AS id, b.* FROM b),
        |     i2 AS (SELECT (SELECT count(*) FROM b) + row_number() OVER (ORDER BY s_suppkey) AS id, b.* FROM b)
        |SELECT * FROM i1 UNION ALL SELECT * FROM i2 ORDER BY id""".stripMargin,

    "q_load_clustered" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS id,
        |       o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY id""".stripMargin,

    "q_upsert" ->
      """WITH g1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000),
        |     g2 AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |            FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 3000),
        |     i1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, g1.* FROM g1),
        |     upd AS (SELECT i1.id, i1.o_orderkey,
        |                    coalesce(g2.o_orderstatus, i1.o_orderstatus) AS o_orderstatus,
        |                    coalesce(g2.o_totalprice, i1.o_totalprice) AS o_totalprice
        |             FROM i1 LEFT JOIN g2 USING (o_orderkey)),
        |     fresh AS (SELECT (SELECT count(*) FROM g1) + row_number() OVER (ORDER BY g2.o_orderkey) AS id,
        |                      g2.* FROM g2 LEFT JOIN g1 USING (o_orderkey)
        |               WHERE g1.o_orderkey IS NULL)
        |SELECT * FROM upd UNION ALL SELECT * FROM fresh ORDER BY id""".stripMargin,

    "q_load_zorder" ->
      """WITH g AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 4000)
        |SELECT row_number() OVER (ORDER BY o_orderkey) AS id, g.*
        |FROM g ORDER BY id""".stripMargin,

    "q_lookup_bucketed" ->
      """WITH g AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000),
        |     i AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, g.* FROM g)
        |SELECT id, o_orderkey, o_orderstatus, o_totalprice FROM i
        |WHERE o_orderkey IN (7, 500, 1999) ORDER BY o_orderkey""".stripMargin,

    "q_token_budget" -> {
      val tok = s"""list_filter(regexp_split_to_array(lower(text), '${graft.operators.TextAnalysis.JavaWsSplitSql}'), x -> x <> '')"""
      s"""WITH t AS (SELECT doc_id, source, $tok AS w FROM documents),
         |b AS (SELECT source,
         |        CAST(len(${graft.functions.Bpe.tokensSql("w", BpeMerges.Merges)}) AS BIGINT) AS n
         |      FROM t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM b GROUP BY source ORDER BY source""".stripMargin
    },

    // identical end state to q_upsert: bucketing is physical layout only
    "q_upsert_bucketed" ->
      """WITH g1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey <= 2000),
        |     g2 AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |            FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 3000),
        |     i1 AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS id, g1.* FROM g1),
        |     upd AS (SELECT i1.id, i1.o_orderkey,
        |                    coalesce(g2.o_orderstatus, i1.o_orderstatus) AS o_orderstatus,
        |                    coalesce(g2.o_totalprice, i1.o_totalprice) AS o_totalprice
        |             FROM i1 LEFT JOIN g2 USING (o_orderkey)),
        |     fresh AS (SELECT (SELECT count(*) FROM g1) + row_number() OVER (ORDER BY g2.o_orderkey) AS id,
        |                      g2.* FROM g2 LEFT JOIN g1 USING (o_orderkey)
        |               WHERE g1.o_orderkey IS NULL)
        |SELECT * FROM upd UNION ALL SELECT * FROM fresh ORDER BY id""".stripMargin,

    "q_schema_evolve" ->
      """WITH i1 AS (SELECT row_number() OVER (ORDER BY p_partkey) AS id,
        |                   p_partkey, p_name, CAST(NULL AS VARCHAR) AS p_type FROM part),
        |     i2 AS (SELECT (SELECT count(*) FROM part) + row_number() OVER (ORDER BY p_partkey) AS id,
        |                   p_partkey, p_name, p_type FROM part)
        |SELECT * FROM i1 UNION ALL SELECT * FROM i2 ORDER BY id""".stripMargin
  )

  private def linkClosestOracle(op: String, ord: String): String =
    s"""WITH dim AS (SELECT row_number() OVER (ORDER BY d) AS id, d FROM (
       |       SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events)),
       |     f AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
       |SELECT row_number() OVER (ORDER BY event_id) AS id, event_id, ts,
       |       (SELECT dim.id FROM dim WHERE dim.d $op f.ts ORDER BY dim.d $ord LIMIT 1) AS day_id
       |FROM f ORDER BY id""".stripMargin
}
