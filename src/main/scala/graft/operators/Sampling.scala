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
}
