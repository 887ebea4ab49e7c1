package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the crawl-pipeline host-quality prior
  * (Page et al. 1999; CommonCrawl publishes exactly this as its host-level
  * ranking, and crawl frontiers prioritize by it). Joins the dedup
  * machinery's connected components ([[Dedup.connectedComponentsStar]]) as
  * the second member of the distributed-graph family.
  *
  * Design for 100 TB / billion-node host graphs:
  *   - Each power iteration is ONE equi-join (edges ⋈ ranks on src) plus
  *     ONE partial-aggregating shuffle (sum of contributions by dst) —
  *     the canonical distributed PageRank; nothing driver-side, no
  *     adjacency collection.
  *   - The rank frame stays O(nodes) with out-degree ATTACHED, so
  *     iterations never re-join the degree table.
  *   - Lineage is truncated with `localCheckpoint` each round (the
  *     [[Dedup.connectedComponentsStar]] pattern) — k iterations do not
  *     stack k joins into one plan.
  *   - EXACT integer fixed-point (e9) arithmetic: every division is an
  *     integer DIV, so ranks are bit-identical across engines and runs —
  *     the DuckDB oracle replays the same iterations with `//`. (Float
  *     PageRank is not reproducible across aggregation orders; an audit
  *     gate needs bit-stable ranks.)
  *
  * Semantics (documented simplifications, identical in both engines):
  *   - Dangling nodes (no out-links) leak their mass — the standard
  *     simplified formulation; ranks still order by authority.
  *   - Integer DIV floors each contribution; with e9 fixed point the
  *     rounding is ≤ 1e-9 per term.
  */
object Graph {

  /** `iters` rounds of the damped power iteration over `edges`
    * (srcCol, dstCol — parallel edges allowed, they weight the link).
    * Returns (node, rank_e9) for every node appearing as src or dst.
    * rank_e9 starts uniform at 1e9 DIV n; each round:
    *   rank'(v) = ((100−dampingPct)·(1e9 DIV n)) DIV 100
    *            + (dampingPct · Σ_{u→v} (rank(u) DIV outdeg(u))) DIV 100
    */
  def pageRankE9(edges0: DataFrame, srcCol: String, dstCol: String,
                 iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val edges = edges0.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("__src").as("node"))
      .union(edges.select(col("__dst").as("node"))).distinct()
    val deg = edges.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__deg"))
    // n via a broadcast single-row frame (no driver action)
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.join(deg, Seq("node"), "left")
      .crossJoin(broadcast(nRow))
      .select(col("node"), coalesce(col("__deg"), lit(0L)).as("__deg"),
        col("__n"), expr("CAST(1000000000 DIV __n AS BIGINT)").as("rank_e9"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = edges
        .join(ranks.where(col("__deg") > 0), edges("__src") === ranks("node"))
        .select(col("__dst").as("node"),
          expr("CAST(rank_e9 DIV __deg AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      ranks = ranks.select(col("node"), col("__deg"), col("__n"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("__deg"), col("__n"),
          expr(s"CAST((${100 - dampingPct} * (1000000000 DIV __n)) DIV 100 " +
            s"+ ($dampingPct * coalesce(__sum, 0)) DIV 100 AS BIGINT)")
            .as("rank_e9"))
        .localCheckpoint()
      i += 1
    }
    edges.unpersist()
    ranks.select(col("node"), col("rank_e9"))
  }

  /** DuckDB twin of [[pageRankE9]]: the same iterations unrolled as
    * chained CTEs over an edge CTE named `edges(src, dst)`. Returns the
    * WITH-clause body (caller appends the final SELECT over `r{iters}`).
    */
  def pageRankSqlCtes(iters: Int, dampingPct: Int = 85): String = {
    val base = s"""nodes AS (SELECT src AS node FROM edges
                  |         UNION SELECT dst FROM edges),
                  |nn AS (SELECT count(*) AS n FROM nodes),
                  |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
                  |r0 AS (SELECT node, CAST(1000000000 // nn.n AS BIGINT) AS rank_e9
                  |       FROM nodes CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT nodes.node,
         |  CAST((${100 - dampingPct} * (1000000000 // nn.n)) // 100
         |    + ($dampingPct * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank_e9
         |  FROM nodes CROSS JOIN nn LEFT JOIN
         |    (SELECT e.dst AS node, sum(r.rank_e9 // deg.d) AS c
         |     FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |     JOIN deg ON deg.node = e.src
         |     GROUP BY e.dst) s ON s.node = nodes.node)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** DuckDB twin of [[trustRankE9]]: iterations unrolled as chained CTEs
    * over `edges(src, dst)` and `seeds(node)` CTEs (caller appends the
    * final SELECT over `r{iters}`). */
  def trustRankSqlCtes(iters: Int, dampingPct: Int = 85): String = {
    val base = s"""nodes AS (SELECT src AS node FROM edges
                  |         UNION SELECT dst FROM edges),
                  |sn AS (SELECT count(*) AS s FROM seeds),
                  |sd AS (SELECT node, 1 AS seed FROM seeds),
                  |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
                  |r0 AS (SELECT nodes.node,
                  |         CAST(coalesce(sd.seed, 0) * (1000000000 // greatest(sn.s, 1)) AS BIGINT) AS rank_e9
                  |       FROM nodes CROSS JOIN sn LEFT JOIN sd ON sd.node = nodes.node)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT nodes.node,
         |  CAST((${100 - dampingPct} * coalesce(sd.seed, 0) * (1000000000 // greatest(sn.s, 1))) // 100
         |    + ($dampingPct * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank_e9
         |  FROM nodes CROSS JOIN sn LEFT JOIN sd ON sd.node = nodes.node LEFT JOIN
         |    (SELECT e.dst AS node, sum(r.rank_e9 // deg.d) AS c
         |     FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |     JOIN deg ON deg.node = e.src
         |     GROUP BY e.dst) s ON s.node = nodes.node)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** In-degree / out-degree / distinct-neighbor profile per node — the
    * link-graph census that sizes skew before running [[pageRankE9]] or
    * components (hub detection, spam-farm signatures). One aggregation
    * per direction, partial map-side. */
  def degreeProfile(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_deg"),
        countDistinct(col(dstCol)).as("out_nbrs"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_deg"),
        countDistinct(col(srcCol)).as("in_nbrs"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("out_nbrs"), lit(0L)).as("out_nbrs"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("in_nbrs"), lit(0L)).as("in_nbrs"))
  }

  /** Personalized-teleport variant: restart mass concentrates on `seeds`
    * (a node DataFrame) instead of spreading uniformly — TrustRank
    * (Gyöngyi et al. 2004): authority FLOWS FROM a trusted seed set, the
    * spam-demotion companion of the uniform prior. Same iteration shape
    * and integer arithmetic as [[pageRankE9]]; non-seed nodes get zero
    * restart mass, so rank can only reach them through links from the
    * trusted neighborhood. */
  def trustRankE9(edges0: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, seedCol: String,
                  iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val edges = edges0.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("__src").as("node"))
      .union(edges.select(col("__dst").as("node"))).distinct()
    val deg = edges.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__deg"))
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
    val sRow = seedSet.agg(count(lit(1)).as("__s"))
    var ranks = nodes.join(deg, Seq("node"), "left")
      .join(seedSet.withColumn("__seed", lit(1L)), Seq("node"), "left")
      .crossJoin(broadcast(sRow))
      // greatest(__s, 1): an EMPTY seed set must yield all-zero ranks
      // (every __seed is 0), not an ANSI division-by-zero
      .select(col("node"), coalesce(col("__deg"), lit(0L)).as("__deg"),
        coalesce(col("__seed"), lit(0L)).as("__seed"), col("__s"),
        expr("CAST(coalesce(__seed, 0) * (1000000000 DIV greatest(__s, 1)) AS BIGINT)")
          .as("rank_e9"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contribs = edges
        .join(ranks.where(col("__deg") > 0), edges("__src") === ranks("node"))
        .select(col("__dst").as("node"),
          expr("CAST(rank_e9 DIV __deg AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      ranks = ranks.select(col("node"), col("__deg"), col("__seed"), col("__s"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("__deg"), col("__seed"), col("__s"),
          expr(s"CAST((${100 - dampingPct} * __seed * (1000000000 DIV greatest(__s, 1))) DIV 100 " +
            s"+ ($dampingPct * coalesce(__sum, 0)) DIV 100 AS BIGINT)")
            .as("rank_e9"))
        .localCheckpoint()
      i += 1
    }
    edges.unpersist()
    ranks.select(col("node"), col("rank_e9"))
  }
}
