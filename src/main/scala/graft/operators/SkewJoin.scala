package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-joins by key salting — the manual fallback for when
  * AQE's skew-join splitting can't help (e.g. a single hot key driving one
  * reducer to spill while the cluster idles).
  *
  * Shape: the (large, possibly skewed) left side gets a deterministic salt
  * in [0, buckets) derived from its OTHER columns, splitting each hot key's
  * rows across `buckets` reducers; the right side replicates `buckets`
  * times with every salt value, so (key, salt) still co-locates matching
  * rows. Join results are IDENTICAL to the unsalted join — salting only
  * changes the partitioning — at the cost of a `buckets`× replication of
  * the right side (keep it the smaller relation).
  *
  * The salt is `pmod(xxhash64(left row), buckets)` — deterministic for a
  * given row (no rand(): retried tasks must salt identically or shuffle
  * retries double-count), uniform across identical-key rows as long as
  * some non-key column varies.
  */
object SkewJoin {

  /** Left-preserving join types only: with the RIGHT side replicated per
    * salt, right/full-outer would emit spurious null-padded rows for every
    * salt value the left never produced. */
  private val SupportedJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Equi-join `left.leftKey == right.rightKey` with salting (inner / left /
    * semi / anti).
    *
    * `saltFrom`: columns to hash for the salt; default = every left column.
    * The content salt is retry-stable but colocates EXACT duplicate rows of
    * a hot key in one bucket — a corpus with the same hot row duplicated
    * verbatim regains the single-reducer bottleneck. Callers in that
    * situation should pass a pre-materialized stable distinguishing column
    * (a durable row id from storage, a file+offset ordinal) as `saltFrom`,
    * or dedup the exact copies first ([[Dedup.exact]]).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 buckets: Int, joinType: String = "inner",
                 saltFrom: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports ${SupportedJoinTypes.mkString("/")} only, got '$joinType' " +
        "(right/full-outer would duplicate unmatched right rows per salt)")
    require(saltFrom.forall(left.columns.contains),
      s"saltFrom column(s) absent from left: ${saltFrom.filterNot(left.columns.contains).mkString(", ")}")
    // Salt from row CONTENT (xxhash64): a task retry re-hashing the same
    // row always lands in the same bucket, even when the input sits behind
    // a shuffle/AQE boundary that replays rows in a different order —
    // positional salts (monotonically_increasing_id, rand with seed) are
    // only retry-stable for deterministic scans and would lose or duplicate
    // join rows otherwise.
    val saltSrc: Seq[Column] =
      (if (saltFrom.nonEmpty) saltFrom else left.columns.toSeq).map(col)
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(buckets.toLong)).cast("int"))
    val r = right
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }
}
