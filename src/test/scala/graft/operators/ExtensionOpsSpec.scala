package graft.operators

import graft.SparkSpec
import graft.functions.{KmvSketch, PortableHash}
import graft.sources.TextSources
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Specs for the round-3 extension surface: deterministic sampling, the
  * KMV sketch aggregator, and flat-file round-trips.
  */
class ExtensionOpsSpec extends SparkSpec {

  test("weightedHashSample: weight 0 selects nothing, 1 selects all, monotone in between") {
    val df = spark.range(1, 2001).toDF("k")
    assert(Sampling.weightedHashSample(df, "k", lit(0.0)).count() === 0L)
    assert(Sampling.weightedHashSample(df, "k", lit(1.0)).count() === 2000L)
    assert(Sampling.weightedHashSample(df, "k", lit(5.0)).count() === 2000L, "clamped above 1")
    val w03 = Sampling.weightedHashSample(df, "k", lit(0.3)).collect().map(_.getLong(0)).toSet
    val w06 = Sampling.weightedHashSample(df, "k", lit(0.6)).collect().map(_.getLong(0)).toSet
    assert(w03.subsetOf(w06), "higher weight must only add rows")
    assert(w03.size > 450 && w03.size < 750, s"unexpected mass ${w03.size}")
    // constant weight f must select exactly the hashSample(f) rows
    val h03 = Sampling.hashSample(df, "k", 0.3).collect().map(_.getLong(0)).toSet
    assert(w03 === h03, "constant weight reduces to hashSample")
  }

  test("weightedHashSample: per-row weights select per-row") {
    val df = spark.range(1, 1001).toDF("k")
      .withColumn("w", when(col("k") <= 500, lit(1.0)).otherwise(lit(0.0)))
    val got = Sampling.weightedHashSample(df, "k", col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(got === (1L to 500L).toSet)
  }

  test("hashSample: deterministic, monotone in fraction, and consistent across tables") {
    val df = spark.range(1, 2001).toDF("k")
    val s10 = Sampling.hashSample(df, "k", 0.1).collect().map(_.getLong(0)).toSet
    val s10b = Sampling.hashSample(df, "k", 0.1).collect().map(_.getLong(0)).toSet
    val s30 = Sampling.hashSample(df, "k", 0.3).collect().map(_.getLong(0)).toSet
    assert(s10 == s10b, "same fraction must select identical rows")
    assert(s10.subsetOf(s30), "smaller sample must be a subset of the larger")
    // rough mass check: 10% ± 3pp of 2000
    assert(s10.size > 140 && s10.size < 260, s"unexpected sample size ${s10.size}")
    // consistency: another table sampled by the same key keeps the same keys
    val other = spark.range(1, 2001).toDF("k").withColumn("payload", col("k") * 2)
    val o10 = Sampling.hashSample(other, "k", 0.1).collect().map(_.getLong(0)).toSet
    assert(o10 == s10, "same key+fraction must select the same keys in any table")
  }

  test("stratifiedHashSample: fraction 0 drops the stratum, 1.0 keeps it whole") {
    val df = spark.range(1, 501).toDF("k")
      .withColumn("s", when(col("k") % 2 === 0, "even").otherwise("odd"))
    val out = Sampling.stratifiedHashSample(df, "s", "k",
        Map("even" -> 1.0, "odd" -> 0.0))
      .collect().map(_.getLong(0))
    assert(out.length == 250 && out.forall(_ % 2 == 0))
  }

  test("mixtureSample: binding domain kept whole, ratios ~match, unlisted dropped") {
    // a: 3000, b: 1000, c: 500 rows; target a:b = 50:50 → b binds (kept
    // whole), a downsamples to ~1000; c unlisted → dropped
    val df = spark.range(1, 4501).toDF("k")
      .withColumn("d", when(col("k") <= 3000, "a")
        .otherwise(when(col("k") <= 4000, "b").otherwise("c")))
    val out = Sampling.mixtureSample(df, "d", "k",
      Map("a" -> 500000L, "b" -> 500000L))
    val byDomain = out.groupBy("d").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byDomain.contains("c"), "unlisted domain must drop")
    assert(byDomain("b") == 1000L, "binding domain must be kept whole")
    assert(byDomain("a") > 900 && byDomain("a") < 1100,
      s"domain a should downsample to ~1000: $byDomain")
    // deterministic
    val again = Sampling.mixtureSample(df, "d", "k",
        Map("a" -> 500000L, "b" -> 500000L))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again == out.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureSample: equal counts with skewed weights keeps the heavy domain") {
    val df = spark.range(1, 2001).toDF("k")
      .withColumn("d", when(col("k") % 2 === 0, "x").otherwise("y"))
    // x:y = 90:10 with equal counts → x binds; y downsamples to ~1/9
    val out = Sampling.mixtureSample(df, "d", "k",
      Map("x" -> 900000L, "y" -> 100000L))
    val byDomain = out.groupBy("d").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("x") == 1000L)
    assert(byDomain("y") > 60 && byDomain("y") < 160, s"y should be ~111: $byDomain")
  }

  test("exactHashSample: exact size, nested budgets, TakeOrdered plan") {
    val df = spark.range(1, 5001).toDF("k")
    val s100 = Sampling.exactHashSample(df, "k", 100)
    assert(s100.count() == 100)
    val a = s100.collect().map(_.getLong(0)).toSet
    val b = Sampling.exactHashSample(df, "k", 300).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(b), "smaller budget must nest inside the larger")
    assert(Sampling.exactHashSample(df, "k", 100).collect().map(_.getLong(0)).toSet == a)
    // no global sort: the plan is a TakeOrdered, not Sort+Exchange+Limit
    val plan = s100.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("mixtureSample errors when a weighted domain is absent from the corpus") {
    val df = spark.range(1, 101).toDF("k").withColumn("d", lit("only"))
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, "d", "k",
        Map("only" -> 500000L, "ghost" -> 500000L)).count()
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("mixtureSample plan: the corpus filter joins the threshold table broadcast") {
    val df = spark.range(1, 2001).toDF("k")
      .withColumn("d", when(col("k") % 2 === 0, "x").otherwise("y"))
    val plan = Sampling.mixtureSample(df, "d", "k",
      Map("x" -> 500000L, "y" -> 500000L)).queryExecution.executedPlan.toString
    // the per-domain thresholds broadcast into the corpus scan — the big
    // side is filtered in place, never shuffled for the join
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast filter:\n$plan")
  }

  test("clusterProfile: counts and e9 bounds per cluster") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "v")
    val cents = VectorSimilarity.centroidFrame(spark,
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val rows = VectorSimilarity.clusterProfile(df, "vec_id", "v", cents, "cid", "cv")
      .orderBy("cluster_id").collect()
    assert(rows.length == 2)
    val c0 = rows(0); val c1 = rows(1)
    assert(c0.getLong(0) == 0L && c0.getLong(1) == 2L)
    assert(c1.getLong(0) == 1L && c1.getLong(1) == 1L)
    // cluster 1 holds the exact centroid direction: cosine 1 → e9 exactly 1e9
    assert(c1.getLong(3) == 1000000000L && c1.getLong(4) == 1000000000L)
    // cluster 0: both members within [0.9, 1.0] cosine of (1,0)
    assert(c0.getLong(2) > 1900000000L && c0.getLong(2) <= 2000000000L)
  }

  test("groupCap: at most cap rows per group, deterministic, subset of the group") {
    val df = spark.range(1, 2001).toDF("k")
      .withColumn("g", (col("k") % 3).cast("string"))
    val capped = Sampling.groupCap(df, "g", "k", cap = 50)
    val byGroup = capped.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup.values.forall(_ == 50L), s"every group must hit the cap: $byGroup")
    // deterministic: same selection on re-run
    val a = capped.collect().map(_.getLong(0)).toSet
    val b = Sampling.groupCap(df, "g", "k", cap = 50).collect().map(_.getLong(0)).toSet
    assert(a == b, "cap selection must be deterministic")
    // monotone: the cap-25 selection is a subset of cap-50 (hash order is total)
    val small = Sampling.groupCap(df, "g", "k", cap = 25).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a), "smaller cap must select a subset")
    // a group under the cap is kept whole
    val tiny = spark.range(1, 11).toDF("k").withColumn("g", lit("only"))
    assert(Sampling.groupCap(tiny, "g", "k", cap = 50).count() == 10)
  }

  test("splitAssign: total, disjoint, deterministic, append-stable") {
    val df = spark.range(1, 5001).toDF("k")
    val out = Sampling.splitAssign(df, "k", Seq("train" -> 0.8, "val" -> 0.1), "test")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"), s"unexpected splits: $counts")
    assert(counts.values.sum == 5000L, "assignment must be total")
    // rough mass: 80/10/10 ± 3pp
    assert(math.abs(counts("train") - 4000L) < 150, s"train mass off: $counts")
    assert(math.abs(counts("val") - 500L) < 150, s"val mass off: $counts")
    // append stability: the first half's assignment is unchanged when the
    // second half arrives (membership depends only on the key)
    val firstHalf = Sampling.splitAssign(spark.range(1, 2501).toDF("k"), "k",
        Seq("train" -> 0.8, "val" -> 0.1), "test")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(firstHalf.forall { case (k, s) => full(k) == s },
      "appending rows must not move existing keys across splits")
  }

  test("epochOrder: order is invariant to input partitioning; epochs differ") {
    val df = spark.range(1, 2001).toDF("k")
    def order(d: org.apache.spark.sql.DataFrame, e: Long): Seq[Long] =
      Sampling.epochOrder(d, "k", e).select("k").collect().map(_.getLong(0)).toSeq
    val e0 = order(df, 0L)
    // same epoch, radically different partitionings → identical order
    assert(order(df.repartition(17), 0L) === e0)
    assert(order(df.coalesce(1), 0L) === e0)
    // a permutation of the full key set, not a filter
    assert(e0.toSet === (1L until 2001L).toSet)
    // different epochs derive unrelated orders (prefix overlap ~ chance)
    val e1 = order(df, 1L)
    assert(e1 !== e0)
    val prefixAgree = e0.take(200).zip(e1.take(200)).count { case (a, b) => a == b }
    assert(prefixAgree < 10, s"epochs should be unrelated, $prefixAgree/200 positions agree")
    // reshardable: position is a value — re-deriving the key reproduces it
    val rederived = df.select(col("k"),
        Sampling.epochKey(col("k"), 0L).as("ek"))
      .orderBy(col("ek"), col("k").cast("string"))
      .collect().map(_.getLong(0)).toSeq
    assert(rederived === e0)
  }

  test("quantiles: exact discrete quantiles, multiplicity-aware, null-free") {
    import graft.operators.Profile
    import spark.implicits._
    // 100 rows of value i/10.0 (i = 1..100) plus nulls: quantile q = the
    // smallest v with count(<= v) >= ceil(q*100)
    val df = (1 to 100).map(i => (i.toLong, Some(i / 10.0))).toDF("k", "x")
      .union(Seq((101L, None: Option[Double]), (102L, None)).toDF("k", "x"))
    val got = Profile.quantiles(df, Seq("x"), Seq(0.01, 0.5, 0.99, 1.0))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    def e9(d: Double): Long = math.floor(d * 1e9).toLong
    assert(got === Map(
      10000L -> e9(0.1),    // ceil(0.01*100)=1st value
      500000L -> e9(5.0),   // 50th
      990000L -> e9(9.9),   // 99th
      1000000L -> e9(10.0)))// max
    // multiplicity: 99 copies of 1.0 and one 100.0 → median is 1.0
    val skew = (Seq.fill(99)(1.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("k", "x")
    val m = Profile.quantiles(skew, Seq("x"), Seq(0.5)).collect()
    assert(m.head.getLong(2) === e9(1.0))
  }

  test("quantiles: result is invariant to input partitioning") {
    import graft.operators.Profile
    import spark.implicits._
    val base = (1 to 5000).map(i => (i.toLong, (i % 37).toDouble / 7.0)).toDF("k", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.quantiles(d, Seq("x"), Seq(0.25, 0.5, 0.75)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(base)
    assert(run(base.repartition(23)) === a)
    assert(run(base.coalesce(1)) === a)
  }

  test("profile accepts float columns on the e9 domain") {
    import graft.operators.Profile
    import spark.implicits._
    val df = Seq((1L, 1.25), (2L, 2.5), (3L, 2.5)).toDF("k", "x")
    val row = Profile.profile(df, Seq("x")).collect().head
    assert(row.getString(0) === "x" && row.getLong(1) === 3L)
    assert(row.getString(3) === "1250000000" && row.getString(4) === "2500000000")
    assert(row.getLong(5) === 2L)
  }

  test("qualityBandSample cuts each group at its OWN quantiles") {
    import spark.implicits._
    // group A scores 1..100, group B scores 1001..1100: a global cut would
    // keep all of B and none of A; per-group [0.5, 1.0] keeps each top half
    val df = ((1 to 100).map(i => (i.toLong, "A", i.toDouble)) ++
      (1 to 100).map(i => (100L + i, "B", 1000.0 + i)))
      .toDF("id", "grp", "score")
    val got = Sampling.qualityBandSample(df, "id", "grp", "score",
        lowerQ = 0.5, upperQ = 1.0)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val (a, b) = got.partition(_._1 == "A")
    assert(a.length === 51 && b.length === 51) // score >= 50th value, ties in
    assert(a.forall(_._2 >= 50.0) && b.forall(_._2 >= 1050.0))
    // a middle band excludes both tails
    val mid = Sampling.qualityBandSample(df, "id", "grp", "score",
        lowerQ = 0.25, upperQ = 0.75)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(mid.forall { case ("A", s) => s >= 25.0 && s <= 75.0
                        case (_, s) => s >= 1025.0 && s <= 1075.0 })
    // fraction composes with the band via hash membership (subset property)
    val half = Sampling.qualityBandSample(df, "id", "grp", "score",
        lowerQ = 0.5, upperQ = 1.0, fraction = 0.5)
      .collect().map(_.getLong(0)).toSet
    val full = Sampling.qualityBandSample(df, "id", "grp", "score",
        lowerQ = 0.5, upperQ = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(full) && half.size < full.size && half.nonEmpty)
  }

  test("groupQuantiles: per-group exact cuts match per-group computation") {
    import graft.operators.Profile
    import spark.implicits._
    val df = ((1 to 40).map(i => ("x", i.toDouble)) ++
      (1 to 10).map(i => ("y", i * 100.0))).toDF("g", "v")
    val got = Profile.groupQuantiles(df, "g", "v", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def e9(d: Double): Long = math.floor(d * 1e9).toLong
    assert(got === Map(
      ("x", 500000L) -> e9(20.0), ("x", 1000000L) -> e9(40.0),
      ("y", 500000L) -> e9(500.0), ("y", 1000000L) -> e9(1000.0)))
  }

  test("KMV sketch: exact below k, close above k, merge-order-insensitive") {
    val k = 64
    // 40 distinct values (< k): estimate must be EXACT
    val small = spark.range(0, 40).toDF("v")
      .select(PortableHash.hmod(col("v").cast("string")).as("h"))
      .agg(KmvSketch.kmv(col("h"), k).as("__buf"))
      .select(KmvSketch.estimate("__buf", k)).head().getLong(0)
    assert(small == 40L, s"below-k estimate must be exact: $small")
    // 5000 distinct values (>> k): estimate within 30% (k=64 → σ ≈ 1/8)
    val big = spark.range(0, 5000).repartition(7).toDF("v")
      .select(PortableHash.hmod(col("v").cast("string")).as("h"))
      .agg(KmvSketch.kmv(col("h"), k).as("__buf"))
      .select(KmvSketch.estimate("__buf", k)).head().getLong(0)
    assert(math.abs(big - 5000L) < 1500, s"k=64 estimate too far off: $big")
    // repartitioning (different merge order) must not change the result
    val big2 = spark.range(0, 5000).repartition(31).toDF("v")
      .select(PortableHash.hmod(col("v").cast("string")).as("h"))
      .agg(KmvSketch.kmv(col("h"), k).as("__buf"))
      .select(KmvSketch.estimate("__buf", k)).head().getLong(0)
    assert(big == big2, "sketch must be merge-order-insensitive")
  }

  test("KMV set ops: exact below k; estimates track true union/Jaccard above k") {
    val k = 64
    def buf(ids: Range, parts: Int) = spark.range(ids.start, ids.end)
      .repartition(parts).toDF("v")
      .select(PortableHash.hmod(col("v").cast("string")).as("h"))
      .agg(KmvSketch.kmv(col("h"), k).as("b"))
    // small disjoint+overlapping sets (< k distinct): everything exact
    val joined = buf(0 until 30, 3).select(col("b").as("__ba"))
      .crossJoin(buf(20 until 50, 5).select(col("b").as("__bb")))
    val u = KmvSketch.unionBufExpr("__ba", "__bb", k)
    val ov = KmvSketch.overlapCountExpr("__ba", "__bb", k)
    val r = joined.select(
      KmvSketch.estimate(u, k).as("ue"),
      expr(ov).cast("long").as("ov")).head()
    assert(r.getLong(0) === 50L, "union of 0..30 and 20..50 is exactly 50")
    assert(r.getLong(1) === 10L, "overlap 20..30 is exactly 10")
    // large sets (>> k): |A|=|B|=4000, |A∩B|=2000, J = 1/3
    val big = buf(0 until 4000, 7).select(col("b").as("__ba"))
      .crossJoin(buf(2000 until 6000, 11).select(col("b").as("__bb")))
    val rb = big.select(
      KmvSketch.estimate(u, k).as("ue"),
      expr(s"CAST($ov * 1000000 DIV size($u) AS BIGINT)").as("je6")).head()
    assert(math.abs(rb.getLong(0) - 6000L) < 2000, s"union est off: ${rb.getLong(0)}")
    assert(math.abs(rb.getLong(1) - 333333L) < 150000, s"jaccard est off: ${rb.getLong(1)}")
  }

  test("CSV round-trip preserves nulls, empty strings, quotes and commas") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain", "x"),
      (2L, null.asInstanceOf[String], "y"),
      (3L, "", "z"),
      (4L, """has,"quoted",comma""", "w")
    ).toDF("id", "s", "t")
    val dir = java.nio.file.Files.createTempDirectory("csv-rt").toString
    TextSources.writeCsv(df, s"$dir/t")
    val back = TextSources.readCsv(spark, s"$dir/t", df.schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back(0)._2 == "plain")
    assert(back(1)._2 == null, "null must stay null")
    assert(back(2)._2 == "", "empty string must stay empty (not null)")
    assert(back(3)._2 == """has,"quoted",comma""")
  }

  test("JSON round-trip preserves values and nulls under an explicit schema") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], -0.25))
      .toDF("id", "s", "v")
    val dir = java.nio.file.Files.createTempDirectory("json-rt").toString
    TextSources.writeJson(df, s"$dir/t")
    val back = TextSources.readJson(spark, s"$dir/t", df.schema)
      .orderBy("id").collect()
    assert(back(0).getString(1) == "a" && back(0).getDouble(2) == 1.5)
    assert(back(1).isNullAt(1) && back(1).getDouble(2) == -0.25)
  }

  test("outlierSummary: Tukey fences flag exactly the points beyond 1.5×IQR") {
    import spark.implicits._
    // 1..100 plus two fat-finger rows and one null: n=102, so the exact
    // discrete quantiles land at the 26th/77th sorted values → q1=25,
    // q3=76, IQR=51 → fences [25−76.5, 76+76.5] = [−51.5, 152.5] (e9)
    val vals = (1 to 100).map(_.toDouble) ++ Seq(-1000.0, 5000.0)
    val df = (vals.map(Option(_)) :+ Option.empty[Double]).toDF("x")
    val r = Profile.outlierSummary(df, Seq("x")).collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 102L)      // null excluded
    assert(r.getLong(r.fieldIndex("lo_e9")) == -51500000000L)
    assert(r.getLong(r.fieldIndex("hi_e9")) == 152500000000L)
    assert(r.getLong(r.fieldIndex("n_below")) == 1L)
    assert(r.getLong(r.fieldIndex("n_above")) == 1L)
  }

  test("outlierSummary: all-null column yields no row, not a null fence") {
    import spark.implicits._
    val df = Seq(Option.empty[Double], Option.empty[Double]).toDF("x")
    assert(Profile.outlierSummary(df, Seq("x")).count() == 0L)
  }

  test("groupExactSample: exact quota per group, small groups whole, quotas nest") {
    import spark.implicits._
    val df = ((1 to 40).map(i => (i.toLong, "big")) ++
      (41 to 43).map(i => (i.toLong, "small"))).toSeq.toDF("id", "g")
    val s5 = Sampling.groupExactSample(df, "g", "id", 5)
    val counts = s5.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 5L, "small" -> 3L))
    val s3 = Sampling.groupExactSample(df, "g", "id", 3)
    val ids3 = s3.select("id").as[Long].collect().toSet
    val ids5 = s5.select("id").as[Long].collect().toSet
    assert(ids3.subsetOf(ids5), "smaller quotas must nest inside larger ones")
  }
}
