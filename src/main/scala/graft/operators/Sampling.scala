package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling for training-data pipelines. Extension scope
  * beyond the reference (no sampling anywhere in easy-etl).
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, task retries, and engine version — useless for
  * reproducible corpus construction or cross-engine validation. These
  * samplers decide membership from a PORTABLE HASH of a key column
  * instead:
  *
  *   keep row ⇔ hash(key) mod D < fraction·D
  *
  * Properties that matter at 100 TB:
  *   - pure scan-side filter: no shuffle, no RNG state, pushes past
  *     column pruning, embarrassingly parallel;
  *   - reproducible across runs, partitionings, engines (the DuckDB
  *     oracle computes the identical predicate);
  *   - CONSISTENT across tables: sampling `orders` and `lineitem` by the
  *     same order-key keeps referential integrity (a row's fate depends
  *     only on its key);
  *   - monotone in the fraction: the 1% sample is a subset of the 10%
  *     sample (hash < 100 ⊂ hash < 1000) — growable without resampling.
  */
object Sampling {

  /** Membership-hash denominator: fractions resolve to 1/10000ths. */
  val Denom: Long = 10000L

  /** The sampling predicate for `key` at `fraction` (rounded down to the
    * nearest 1/10000th). */
  def hashSamplePredicate(key: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    PortableHash.hmod(key.cast("string")) % Denom < (fraction * Denom).toLong
  }

  /** Deterministic Bernoulli-style sample: keeps rows whose key-hash lands
    * under `fraction`. Sampling the SAME key column in other tables yields
    * a referentially consistent joint sample. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(hashSamplePredicate(col(keyCol), fraction))

  /** Stratified deterministic sample: per-stratum fractions, keyed
    * independently of the stratum so within-stratum selection is unbiased.
    * Strata not in `fractions` fall back to `defaultFraction`. */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === lit(stratum), lit(f)).otherwise(acc)
    }
    df.where(PortableHash.hmod(col(keyCol).cast("string")) % Denom <
      floor(frac * Denom).cast("long"))
  }

  /** The DuckDB spelling of [[hashSamplePredicate]] over SQL fragment
    * `key` (pre-stringified by the caller if not already VARCHAR). */
  def hashSamplePredicateSql(key: String, fraction: Double): String =
    s"${PortableHash.hmodSql(s"CAST($key AS VARCHAR)")} % ${Denom} < ${(fraction * Denom).toLong}"

  /** Weighted deterministic sample: keeps each row with probability equal
    * to its per-row `weight` (clamped to [0, 1]) — the quality-proportional
    * corpus draw ("sample documents in proportion to their quality score").
    * Same hash-membership construction as [[hashSample]], so it inherits
    * every scale property (scan-side filter, no RNG, reproducible,
    * referentially consistent by key) and is monotone in the weight: raising
    * a row's weight can only add it to the sample, never remove it.
    * Resolution is 1/[[Denom]]; weights at or below 0 never select. */
  def weightedHashSample(df: DataFrame, keyCol: String, weight: Column): DataFrame =
    df.where(PortableHash.hmod(col(keyCol).cast("string")) % Denom <
      floor(least(greatest(weight, lit(0.0)), lit(1.0)) * Denom).cast("long"))

  /** The DuckDB spelling of [[weightedHashSample]]'s predicate; `weightSql`
    * must compute the weight bit-identically to the Spark column. */
  def weightedHashSampleSql(key: String, weightSql: String): String =
    s"${PortableHash.hmodSql(s"CAST($key AS VARCHAR)")} % ${Denom} < " +
      s"CAST(floor(least(greatest($weightSql, 0.0), 1.0) * ${Denom}) AS BIGINT)"

  /** EXACT-size deterministic sample: the n rows with the smallest
    * key-hashes (ties → key order). Where [[hashSample]] delivers a
    * FRACTION with binomial jitter, this delivers a precise row budget
    * ("exactly 1M eval docs") — still reproducible, engine-portable, and
    * nested: the exact-n sample is a prefix of the exact-m sample for
    * n < m, so budgets can grow without resampling.
    *
    * Scale: Catalyst compiles orderBy+limit to TakeOrdered — each
    * partition keeps its local top-n and the driver merges k·n rows; the
    * corpus is never globally sorted. Driver memory bounds n (use
    * [[hashSample]] for billion-row draws).
    */
  def exactHashSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 0, s"sample size must be >= 0: $n")
    df.orderBy(PortableHash.hmod(col(keyCol).cast("string")).asc, col(keyCol).asc)
      .limit(n)
  }

  /** Exactly `n` rows PER GROUP by smallest key hash — the balanced-quota
    * twin of [[exactHashSample]] (exact-n eval sets per language, per
    * source, per quality band). Groups smaller than `n` keep every row.
    *
    * Scale: per-group smallest-n runs through the bounded-heap
    * [[graft.functions.TopK]] aggregate — each task keeps ≤ n (hash, id)
    * pairs per group and partials merge map-side, so the shuffle carries
    * O(groups · n) rows; no per-group sort window, no global sort. The
    * winners then semi-join back (broadcast-sized for any practical
    * quota). Draw order matches [[exactHashSample]] (hash asc, id asc), so
    * quotas NEST: the n-per-group sample is a subset of the m-per-group
    * sample for n ≤ m. `idCol` must be unique and integral-typed.
    */
  def groupExactSample(df: DataFrame, groupCol: String, idCol: String,
                       n: Int): DataFrame = {
    require(n >= 1, s"per-group sample size must be >= 1: $n")
    val idT = df.schema(idCol).dataType
    require(idT == org.apache.spark.sql.types.LongType ||
      idT == org.apache.spark.sql.types.IntegerType,
      s"groupExactSample needs an integral id column; got $idT")
    // hmod < 2^31 ⇒ exact as a Double score for the heap
    val picked = df
      .select(col(groupCol),
        PortableHash.hmod(col(idCol).cast("string")).cast("double").as("__h"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(col("__h"), col("__id"), n, asc = true)
        .as("__top"))
      .select(explode(col("__top._2")).as("__keep"))
    df.join(broadcast(picked),
      col(idCol).cast("long") === col("__keep"), "left_semi")
  }

  /** Deterministic domain-mixture resampling: downsample each domain so
    * the retained corpus matches target RELATIVE weights (the DoReMi /
    * Pile-style "data mixture" step — e.g. web 60 : books 30 : code 10).
    * `weightsPpm` gives each domain an integer relative weight (parts per
    * million of the target mixture — integers so the constants embed
    * identically in both engines); domains absent from the map are dropped.
    *
    * The mixture is scaled to the LARGEST total the corpus can serve
    * without upsampling: the binding domain (smallest n_d/w_d) is kept
    * whole and every other domain downsamples to match, via the same
    * hash-membership predicate as [[hashSample]] (scan-side filter, no
    * RNG, reproducible, monotone).
    *
    * Scale: one count aggregation over the domain column (tiny result,
    * broadcast back), then a pure filter — the corpus never shuffles.
    * Per-domain acceptance uses full hash resolution (denominator = P,
    * not [[Denom]]), so even ppm-scale fractions at 100 TB stay exact.
    */
  def mixtureSample(df: DataFrame, domainCol: String, keyCol: String,
                    weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.values.forall(_ > 0),
      "weightsPpm must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toSeq.sortBy(_._1).toDF(domainCol, "__wppm")
    // capacity of domain d = n_d / w_d (in ppm units): the largest mixture
    // total T each domain could serve. T = min over domains.
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__nd"))
      .join(w, Seq(domainCol))
      .withColumn("__cap",
        (col("__nd") * lit(1000000L)).cast("double") / col("__wppm").cast("double"))
    val minT = counts.agg(min(col("__cap")).as("__t"))
    // accept fraction f_d = w_d * T / (n_d * 1e6); the BINDING domain
    // (cap == T, an exact double comparison of the identical value) gets
    // the full threshold P outright — the floating round-trip
    // w·(n·1e6/w)/(n·1e6) can land 1 ulp under 1.0, and flooring that to
    // P-1 would drop the binding domain's hash==P-1 keys
    val thr = counts.crossJoin(broadcast(minT))
      .withColumn("__thr",
        when(col("__cap") === col("__t"), lit(PortableHash.P))
          .otherwise(floor(col("__wppm").cast("double") * col("__t")
            / (col("__nd") * lit(1000000L)).cast("double")
            * lit(PortableHash.P.toDouble)).cast("long")))
      .select(col(domainCol), col("__thr"))
    // a weighted domain with ZERO corpus rows has capacity 0: no mixture
    // total is servable without upsampling — error rather than silently
    // rescaling the mixture around the hole. The collected rows also feed
    // the broadcast side directly, so the corpus count-pass runs ONCE.
    val thrRows = thr.collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toSeq
    val missing = weightsPpm.keySet -- thrRows.map(_._1).toSet
    require(missing.isEmpty,
      s"mixture domain(s) absent from the corpus: ${missing.toSeq.sorted.mkString(", ")}")
    df.join(broadcast(thrRows.toDF(domainCol, "__thr")), Seq(domainCol))
      .where(PortableHash.hmod(col(keyCol).cast("string")) < col("__thr"))
      .drop("__thr")
  }

  /** The DuckDB spelling of [[mixtureSample]] as a CTE chain + final
    * SELECT over `src`; column shapes mirror the Spark plan exactly so the
    * doubles agree bitwise. */
  def mixtureSampleSql(src: String, domain: String, key: String,
                       weightsPpm: Map[String, Long]): String = {
    val values = weightsPpm.toSeq.sortBy(_._1)
      .map { case (d, w) => s"('$d', CAST($w AS BIGINT))" }.mkString(", ")
    s"""WITH w($domain, wppm) AS (VALUES $values),
       |cnt AS (SELECT s.$domain, count(*) AS nd, any_value(wppm) AS wppm
       |        FROM $src s JOIN w USING ($domain) GROUP BY s.$domain),
       |cap AS (SELECT $domain, nd, wppm,
       |          CAST(nd * 1000000 AS DOUBLE) / CAST(wppm AS DOUBLE) AS cap
       |        FROM cnt),
       |t AS (SELECT min(cap) AS t FROM cap),
       |thr AS (SELECT $domain,
       |          CASE WHEN cap = t.t THEN ${PortableHash.P}
       |               ELSE CAST(floor(CAST(wppm AS DOUBLE) * t.t
       |                          / CAST(nd * 1000000 AS DOUBLE)
       |                          * ${PortableHash.P}.0) AS BIGINT) END AS thr
       |        FROM cap CROSS JOIN t)
       |SELECT s.* FROM $src s JOIN thr USING ($domain)
       |WHERE ${PortableHash.hmodSql(s"CAST($key AS VARCHAR)")} < thr""".stripMargin
  }

  /** Deterministic per-group cap: keeps at most `cap` rows per group,
    * chosen by portable-hash order of the key (hash ties broken by the key
    * itself, so the draw is total and reproducible). The training-data
    * "per-domain document cap": no single source may contribute more than
    * `cap` examples, and the retained subset is an unbiased draw that is
    * stable across runs, partitionings, and engines.
    *
    * Scale: one shuffle on `groupCol`; a hot group sorts on one partition.
    * When cap ≪ group size, pre-filter with [[hashSample]] at a fraction
    * safely above cap/|group| first — membership is decided by the same
    * hash, so the pre-filter never changes the retained set, only the sort
    * volume. */
  def groupCap(df: DataFrame, groupCol: String, keyCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(PortableHash.hmod(col(keyCol).cast("string")), col(keyCol).cast("string"))
    df.withColumn("__gc_rn", row_number().over(w))
      .where(col("__gc_rn") <= cap)
      .drop("__gc_rn")
  }

  /** The DuckDB spelling of [[groupCap]]'s retained-row predicate as a
    * window filter: callers wrap `SELECT … QUALIFY`-style via a subquery. */
  def groupCapRankSql(group: String, key: String): String =
    s"row_number() OVER (PARTITION BY $group ORDER BY " +
      s"${PortableHash.hmodSql(s"CAST($key AS VARCHAR)")}, CAST($key AS VARCHAR))"

  /** Deterministic train/validation/test split: appends a `split` column
    * assigning each row to the first bucket whose cumulative fraction
    * covers hash(key) mod [[Denom]]. Assignment depends only on the key —
    * re-runs, engine changes, and appends never move a row between splits,
    * and splitting `orders` and `lineitem` by the same key keeps the join
    * graph intact within each split. Fractions must sum to ≤ 1; any
    * remainder falls into `defaultSplit`. */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  defaultSplit: String = "rest"): DataFrame = {
    val total = splits.map(_._2).sum
    require(splits.nonEmpty && splits.forall(_._2 >= 0) && total <= 1.0 + 1e-9,
      s"split fractions must be non-negative and sum to <= 1: $splits")
    val h = PortableHash.hmod(col(keyCol).cast("string")) % Denom
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) => acc + (f * Denom).toLong }.tail
    val assign = splits.zip(bounds).foldRight(lit(defaultSplit): Column) {
      case (((name, _), bound), acc) => when(h < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Quality-band draw — the CCNet bucket-and-sample step in one call:
    * score every row (the caller supplies the score column, e.g.
    * [[TextAnalysis.corpusTypicality]]'s typicality_ppm), cut each GROUP
    * (domain, language, source) at its own [lowerQ, upperQ] quantiles,
    * keep the rows inside the band, then draw `fraction` of them by
    * deterministic hash membership. Per-group cuts are the point: a
    * global threshold would keep entire high-scoring domains and drop
    * entire low-scoring ones, while per-group bands keep each domain's
    * own best slice.
    *
    * Quantiles are the EXACT per-group discrete quantiles of
    * [[Profile.groupQuantiles]] (e9 domain, integer thresholds): the band
    * is score_e9 ∈ [q(lowerQ), q(upperQ)], boundary ties included;
    * lowerQ = 0.0 means no lower cut. The final draw inherits every
    * [[hashSample]] property (deterministic, engine-portable, monotone in
    * the fraction).
    *
    * Scale: one groupQuantiles pass (value-count shuffle + prefix sum)
    * produces a bounds table of 2 rows per group — broadcast back against
    * the scan. No window over the corpus, no RNG, no driver state beyond
    * the bounds.
    */
  def qualityBandSample(df: DataFrame, keyCol: String, groupCol: String,
                        scoreCol: String, lowerQ: Double, upperQ: Double,
                        fraction: Double = 1.0): DataFrame = {
    require(lowerQ >= 0.0 && lowerQ <= upperQ && upperQ <= 1.0,
      s"need 0 <= lowerQ <= upperQ <= 1: $lowerQ, $upperQ")
    val qs = Seq(lowerQ, upperQ).filter(_ > 0.0).distinct
    require(qs.nonEmpty, "upperQ must be > 0")
    // the input frame is read TWICE — once by the quantile census, once as
    // the band-filter probe side. A caller often hands in a derived score
    // frame (e.g. corpus typicality: a corpus-wide token aggregation), so
    // an unpersisted input re-runs that whole pipeline for the probe
    // (guide §1.2: never recompute what a prior pass already computed).
    // groupQuantiles materializes eagerly, which populates this cache;
    // the probe join then reads blocks. Caller-owned caches are left alone.
    val callerOwned =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val d = if (callerOwned) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gq = graft.operators.Profile.groupQuantiles(d, groupCol, scoreCol, qs)
    val loPpm = math.round(lowerQ * 1e6)
    val hiPpm = math.round(upperQ * 1e6)
    val bounds = gq.groupBy(col(groupCol).as("__g"))
      .agg(min(when(col("q_ppm") === loPpm, col("value_e9"))).as("__lo"),
        min(when(col("q_ppm") === hiPpm, col("value_e9"))).as("__hi"))
    val v = PortableHash.e9(col(scoreCol).cast("double"))
    val lo = if (lowerQ > 0.0) v >= col("__lo") else lit(true)
    val out = d.join(broadcast(bounds), col(groupCol).cast("string") === col("__g"))
      .where(lo && v <= col("__hi"))
      .where(hashSamplePredicate(col(keyCol), fraction))
      .drop("__g", "__lo", "__hi")
    if (callerOwned) out else Dedup.materializeAndRelease(out, d)
  }

  /** The per-epoch shuffle key for `key` at `epoch`:
    * hash(key ‖ '#' ‖ epoch). Distinct epochs derive independent
    * pseudo-random orders from the same corpus; the same epoch always
    * derives the same order. Collisions tie-break on the key itself
    * (see [[epochOrder]]), keeping the permutation total. */
  def epochKey(key: Column, epoch: Long): Column =
    PortableHash.hmod(concat(key.cast("string"), lit("#"), lit(epoch.toString)))

  /** Deterministic epoch shuffle: the training-data serving order for
    * `epoch` as a global sort by [[epochKey]] (ties by key). Properties a
    * training loop needs and `df.orderBy(rand())` cannot give:
    *   - reproducible: re-runs, task retries, engine versions, and INPUT
    *     PARTITIONING all yield the identical order (the key depends only
    *     on the row's key and the epoch number);
    *   - epoch-independent: orders for different epochs are unrelated
    *     (the epoch number is hashed INTO the key, not added to it);
    *   - reshardable: the order is a value, so any consumer can re-derive
    *     a row's position — resuming mid-epoch is a WHERE on epoch_key.
    *
    * Scale: one distributed range sort (Spark samples split points and
    * writes sorted runs per partition) — the same cost as any global
    * orderBy; no window, no single-partition stage, no driver state.
    * Emits the input columns plus `epoch_key`.
    */
  def epochOrder(df: DataFrame, keyCol: String, epoch: Long): DataFrame =
    df.withColumn("epoch_key", epochKey(col(keyCol), epoch))
      .orderBy(col("epoch_key"), col(keyCol).cast("string"))

  /** The DuckDB spelling of [[epochKey]] over SQL fragment `key`. */
  def epochKeySql(key: String, epoch: Long): String =
    PortableHash.hmodSql(s"CAST($key AS VARCHAR) || '#' || '$epoch'")

  /** The DuckDB spelling of [[splitAssign]]'s `split` expression. */
  def splitAssignSql(key: String, splits: Seq[(String, Double)],
                     defaultSplit: String = "rest"): String = {
    val h = s"${PortableHash.hmodSql(s"CAST($key AS VARCHAR)")} % ${Denom}"
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) => acc + (f * Denom).toLong }.tail
    val whens = splits.zip(bounds)
      .map { case ((name, _), b) => s"WHEN $h < $b THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '$defaultSplit' END"
  }
}
