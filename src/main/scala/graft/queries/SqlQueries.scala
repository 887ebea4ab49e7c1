package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Catalog

/** Representative delegated-SQL queries (SURVEY.md §2.2/§7.3): the
  * relational surface the reference outsources to the source RDBMS via
  * user-written SQL (joins, aggregation, windows, grouping sets, set ops,
  * top-k, scalar/date/JSON functions, sessionization). Our engine supplies
  * it natively through Spark SQL over [[Catalog.registerViews]] temp views
  * — parquet scans behind the views get pushdown + pruning from Catalyst.
  *
  * Cross-engine determinism: no floating-point aggregation anywhere —
  * money flows through exact integer cents (`floor(x*100)` of bit-exact
  * doubles), quantities through integral casts, timestamps through
  * microsecond longs. Sums of longs are order-insensitive, so shuffle
  * nondeterminism can't flip the oracle. DuckDB's BIGINT sums widen to
  * HUGEINT — every aggregate is wrapped back to BIGINT on the oracle side.
  */
object SqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def run(spark: SparkSession, sfDir: String, q: String): DataFrame = {
    new Catalog(spark, sfDir).registerViews()
    spark.sql(q)
  }

  /** Exact cents from a dollar double (bit-exact input ⇒ exact output). */
  private def cents(x: String) = s"CAST(floor(($x) * 100) AS BIGINT)"

  // ---- shared SQL text (identical in both dialects) ----------------------

  private def joinAggSql = // TPC-H Q3-flavored join + aggregate
    s"""SELECT o.o_orderpriority, count(*) AS n_items,
       |       SC_OPEN sum(${cents("l.l_extendedprice * (1 - l.l_discount)")}) SC_CLOSE AS rev_cents
       |FROM orders o
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON c.c_custkey = o.o_custkey
       |WHERE c.c_mktsegment = 'BUILDING' AND o.o_totalprice > 50000
       |GROUP BY o.o_orderpriority
       |ORDER BY o.o_orderpriority""".stripMargin

  private def windowSql =
    s"""SELECT o_orderkey, o_custkey,
       |       CAST(row_number() OVER w AS BIGINT) AS rn,
       |       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS status_rnk,
       |       SC_OPEN sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) SC_CLOSE AS run_cents
       |FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
       |             ${cents("o_totalprice")} AS cents FROM orders)
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  private def groupingSetsSql =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
       |       SC_OPEN sum(CAST(l_quantity AS BIGINT)) SC_CLOSE AS qty,
       |       SC_OPEN sum(${cents("l_extendedprice")}) SC_CLOSE AS price_cents
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  private def setOpsSql =
    s"""SELECT k FROM (
       |  ((SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
       |   INTERSECT
       |   (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000))
       |  UNION
       |  (SELECT s_suppkey + 1000000 AS k FROM supplier WHERE s_acctbal < 1000)
       |  EXCEPT
       |  (SELECT c_custkey AS k FROM customer WHERE c_nationkey = 3)
       |) ORDER BY k""".stripMargin

  private def topkSql =
    s"""SELECT o_orderkey, o_custkey, ${cents("o_totalprice")} AS cents
       |FROM orders
       |ORDER BY cents DESC, o_orderkey ASC LIMIT 25""".stripMargin

  private def semiAntiSql =
    s"""SELECT c_custkey, c_name FROM customer c
       |WHERE EXISTS (SELECT 1 FROM orders o
       |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
       |  AND NOT EXISTS (SELECT 1 FROM orders o2
       |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
       |ORDER BY c_custkey""".stripMargin

  /** JSON / string / date / math scalar functions over the event stream.
    * JSONFN(x) resolves per dialect. ts goes through CAST(ts AS TIMESTAMP)
    * because the parquet is ns-precision and both engines must agree on
    * the µs truncation.
    */
  private def scalarFuncsSql =
    s"""SELECT event_id,
       |       upper(event_type) AS et,
       |       substr(event_type, 1, 3) AS et3,
       |       CAST(length(event_type) AS BIGINT) AS lt,
       |       CAST(JSONFN(props) AS BIGINT) AS k,
       |       CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
       |       CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS mo,
       |       CAST(floor(sqrt(abs(value)) * 1e9) AS BIGINT) AS sqrtv_e9
       |FROM events ORDER BY event_id""".stripMargin

  /** Gap-based sessionization (30-min inactivity): the batch shape of the
    * streaming session-window operator. EPOCHUS(x) resolves per dialect.
    */
  private def sessionizeSql =
    s"""WITH e AS (SELECT user_id, event_id, EPOCHUS(CAST(ts AS TIMESTAMP)) AS us FROM events),
       |s AS (SELECT user_id, event_id, us,
       |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
       |                  > 1800000000 THEN 1 ELSE 0 END AS brk
       |      FROM e),
       |g AS (SELECT user_id, us,
       |        SC_OPEN sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) SC_CLOSE AS sess
       |      FROM s)
       |SELECT user_id, sess, count(*) AS n_events,
       |       CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us
       |FROM g GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin

  private def rollupSql = // hierarchical totals: region → nation → grand total
    s"""SELECT r.r_name, n.n_name, count(*) AS n_cust,
       |       SC_OPEN sum(${cents("c.c_acctbal")}) SC_CLOSE AS bal_cents
       |FROM customer c
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |JOIN region r ON r.r_regionkey = n.n_regionkey
       |GROUP BY ROLLUP (r.r_name, n.n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  private def windowRangeSql = // RANGE frame: value-bounded moving aggregate
    s"""SELECT o_orderkey, cents,
       |       SC_OPEN sum(cents) OVER (ORDER BY o_orderkey
       |                                RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) SC_CLOSE AS near_cents,
       |       SC_OPEN count(*) OVER (ORDER BY o_orderkey
       |                              RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) SC_CLOSE AS n_near
       |FROM (SELECT o_orderkey, ${cents("o_totalprice")} AS cents FROM orders
       |      WHERE o_orderkey <= 5000)
       |ORDER BY o_orderkey""".stripMargin

  private def pivotSql = // conditional aggregation — the portable spelling of PIVOT
    s"""SELECT o_orderpriority,
       |       SC_OPEN sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) SC_CLOSE AS n_f,
       |       SC_OPEN sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) SC_CLOSE AS n_o,
       |       SC_OPEN sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) SC_CLOSE AS n_p,
       |       SC_OPEN sum(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} ELSE 0 END) SC_CLOSE AS cents_f
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Exact interpolated percentiles (both engines: sort, pos = p·(n−1),
    * lower + (upper−lower)·frac in doubles — order-insensitive, so shuffle
    * nondeterminism can't flip it). MEDFN resolves per dialect. */
  private def percentileSql =
    s"""SELECT o_orderpriority,
       |       CAST(floor(MEDFN(cents, 0.25) * 1e9) AS BIGINT) AS p25_e9,
       |       CAST(floor(MEDFN(cents, 0.5)  * 1e9) AS BIGINT) AS p50_e9,
       |       CAST(floor(MEDFN(cents, 0.75) * 1e9) AS BIGINT) AS p75_e9,
       |       count(*) AS n
       |FROM (SELECT o_orderpriority, ${cents("o_totalprice")} AS cents FROM orders)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // correlated subqueries: scalar (per-row count) + EXISTS / NOT EXISTS —
  // the remaining delegated-SQL family user programs lean on
  private def correlatedSql =
    s"""SELECT c.c_custkey, c.c_name,
       |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
       |  (SELECT SC_OPEN coalesce(sum(${cents("o2.o_totalprice")}), 0) SC_CLOSE
       |   FROM orders o2 WHERE o2.o_custkey = c.c_custkey) AS tot_cents
       |FROM customer c
       |WHERE EXISTS (SELECT 1 FROM orders o3
       |              WHERE o3.o_custkey = c.c_custkey AND o3.o_totalprice > 150000)
       |  AND NOT EXISTS (SELECT 1 FROM orders o4
       |                  WHERE o4.o_custkey = c.c_custkey AND o4.o_orderstatus = 'F'
       |                    AND o4.o_totalprice > 300000)
       |ORDER BY c.c_custkey""".stripMargin

  // LATERAL correlated subquery with per-row ORDER/LIMIT — the "top-k per
  // group via join" idiom (both engines plan it as a correlated lateral
  // join; identical text in both dialects)
  private def lateralSql =
    s"""SELECT r.r_name, t.n_name, t.n_nationkey
       |FROM region r,
       |LATERAL (SELECT n_name, CAST(n_nationkey AS BIGINT) AS n_nationkey
       |         FROM nation n WHERE n.n_regionkey = r.r_regionkey
       |         ORDER BY n_name LIMIT 3) t
       |ORDER BY r.r_name, t.n_name""".stripMargin

  private val shared: Map[String, String] = Map(
    "q_sql_lateral" -> lateralSql,
    "q_sql_correlated" -> correlatedSql,
    "q_sql_percentile" -> percentileSql,
    "q_sql_join_agg" -> joinAggSql,
    "q_sql_window" -> windowSql,
    "q_sql_grouping_sets" -> groupingSetsSql,
    "q_sql_rollup" -> rollupSql,
    "q_sql_window_range" -> windowRangeSql,
    "q_sql_pivot" -> pivotSql,
    "q_sql_setops" -> setOpsSql,
    "q_sql_topk" -> topkSql,
    "q_sql_semi_anti" -> semiAntiSql,
    "q_sql_scalar_funcs" -> scalarFuncsSql,
    "q_sql_sessionize" -> sessionizeSql
  )

  /** Spark dialect: sums of BIGINT stay BIGINT; JSON via get_json_object;
    * µs via unix_micros. */
  private def sparkDialect(q: String): String = q
    .replace("SC_OPEN ", "")
    .replace(" SC_CLOSE", "")
    .replace("JSONFN(props)", "get_json_object(props, '$.k')")
    // templates that take EPOCHUS of a timestamp cast explicitly (the
    // textual twin of TimeCols.usec), so the substitution stays a plain
    // prefix swap — operands may themselves contain parentheses
    .replace("EPOCHUS(", "unix_micros(")
    .replace("MEDFN(", "percentile(")

  /** DuckDB dialect: BIGINT sums widen to HUGEINT — wrap back; JSON via
    * json_extract_string; µs via epoch_us. */
  private def duckDialect(q: String): String = q
    .replace("SC_OPEN ", "CAST(")
    .replace(" SC_CLOSE", " AS BIGINT)")
    .replace("JSONFN(props)", "json_extract_string(props, '$.k')")
    .replace("EPOCHUS(", "epoch_us(")
    .replace("MEDFN(", "quantile_cont(")

  val queries: Map[String, Q] =
    shared.map { case (name, q) =>
      name -> ((spark: SparkSession, sfDir: String) => run(spark, sfDir, sparkDialect(q)))
    }

  val oracleSql: Map[String, String] =
    shared.map { case (name, q) => name -> duckDialect(q) }
}
