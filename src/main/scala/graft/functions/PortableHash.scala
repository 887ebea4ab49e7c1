package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything downstream of dedup/fingerprinting (MinHash, SimHash, LSH)
  * needs a hash BOTH Spark and the DuckDB oracle compute identically.
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are engine-private, so we
  * standardize on md5 (bit-identical everywhere) parsed from its leading
  * 15 hex chars (60 bits — fits a signed 64-bit int in both engines):
  *
  *   Spark :  CAST(conv(substr(md5(s),1,15), 16, 10) AS BIGINT)
  *   DuckDB:  CAST('0x' || substr(md5(s),1,15) AS BIGINT)
  *
  * (Cross-engine bit-equality verified empirically on the driver's DuckDB
  * 1.0.0 before this module was written.)
  *
  * Derived-constant generators (MinHash permutations, LSH hyperplanes) are
  * plain LCG arithmetic evaluated in SCALA at plan-build time; the same
  * Scala values are interpolated as literals into both the Spark plan and
  * the oracle SQL text, so there is a single source of truth and zero
  * cross-engine drift.
  *
  * All modular arithmetic stays under P = 2^31-1 so products fit in 63 bits
  * — Spark 4 runs ANSI mode (overflow throws) and DuckDB errors on BIGINT
  * overflow rather than wrapping.
  */
object PortableHash {

  /** Modulus for all portable hashing: the Mersenne prime 2^31 - 1. */
  val P: Long = 2147483647L

  /** 60-bit portable hash of a string column. Same value as
    * `CAST(conv(substr(md5(c),1,15),16,10) AS BIGINT)` — computed by a
    * native expression that assembles the long straight from the digest
    * bytes instead of allocating hex/decimal strings per hash (the chain
    * was the dominant per-task cost of the dedup family; equality is
    * pinned by PortableHashSpec). */
  def h60(c: Column): Column =
    org.apache.spark.sql.graft.PortableMd5.h60Col(c)

  /** The public-API spelling of [[h60]] (kept for documentation and as the
    * reference implementation the native expression is tested against). */
  def h60Chain(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Portable hash reduced below [[P]] (safe for modular products). */
  def hmod(c: Column): Column = h60(c) % P

  /** Driver-side (plain JVM) twin of [[h60]] — bit-identical to the column
    * form: md5 of the UTF-8 bytes, leading 15 hex chars as a long. Used
    * where a single key's hash is needed at PLAN time (bucket-pruned point
    * lookups), not per row. */
  def h60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side twin of [[hmod]]. */
  def hmodJvm(s: String): Long = h60Jvm(s) % P

  /** The DuckDB spelling of [[h60]] applied to SQL fragment `s` — the full
    * 60-bit positive value (bit source for SimHash; NOT safe for modular
    * products, use [[hmodSql]] for those). */
  def h60Sql(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** The DuckDB spelling of [[hmod]] applied to SQL fragment `s`. */
  def hmodSql(s: String): String =
    s"(CAST('0x' || substr(md5($s), 1, 15) AS BIGINT) % $P)"

  /** MinHash permutation k: h_k(x) = (a*x + b) mod P, a in [1, P-1]. */
  def perm(k: Int): (Long, Long) = {
    val a = (1103515245L * (k + 1) + 12345L) % (P - 1) + 1
    val b = (1103515245L * (k + 101) + 54321L) % P
    (a, b)
  }

  /** Deterministic pseudo-random hyperplane j over `dim` dims, components
    * in [-1, 1] with 3 decimal digits (exactly representable cross-engine
    * as the literal "±0.xyz").
    */
  def hyperplane(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      ((1103515245L * (j.toLong * dim + i + 1) + 12345L) % 2001L - 1000L).toDouble / 1000.0
    }

  /** Portable fixed-point projection of a double for oracle-stable output:
    * floor(x · 1e9) as a BIGINT. Both engines compute x bit-identically
    * (verified), and floor/multiply are IEEE-exact, so this is deterministic
    * where decimal `round(x, 9)` is implementation-defined at midpoints.
    * SQL twin: `CAST(floor((x) * 1e9) AS BIGINT)`.
    */
  def e9(c: Column): Column = floor(c * lit(1e9)).cast(LongType)

  /** The DuckDB spelling of [[e9]] applied to SQL fragment `s`. */
  def e9Sql(s: String): String = s"CAST(floor(($s) * 1e9) AS BIGINT)"
}
