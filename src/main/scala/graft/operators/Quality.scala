package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality validation — declarative expectations over a table, the
  * ingest gate a training-data pipeline runs before accepting a batch
  * (the category Deequ/dbt-tests cover; absent from the reference, which
  * trusts its source SQL). Returns one row per rule: (rule, violations),
  * so a pipeline asserts `violations == 0` or routes the counts to
  * monitoring.
  *
  * Scale shape: all SCALAR rules (not-null, range, pattern) evaluate in
  * ONE aggregation pass over the table (conditional sums — map-side
  * partials, no shuffle of data rows); uniqueness is one hash-shuffle on
  * the key; referential checks are left-anti joins (broadcast when the
  * dimension is small). Nothing collects to the driver but the per-rule
  * counts.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** `col` must carry no nulls. */
  case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
  }
  /** `col` must lie in [lo, hi] (nulls don't violate — pair with NotNull). */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** `col` must fully match `regex` (nulls don't violate). */
  case class Matches(col: String, regex: String) extends Rule {
    val name = s"matches($col)"
  }
  /** `cols` must be unique; violations = rows beyond the first per
    * duplicate group. */
  case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` must exist in `dim(dimCol)`. */
  case class ForeignKey(col: String, dim: DataFrame, dimCol: String) extends Rule {
    val name = s"foreign_key($col)"
  }

  /** One row per rule: (rule, violations), ordered by rule name. Rule
    * names must be distinct (two Matches on one column would alias-collide
    * in the single aggregation pass) — duplicates fail at staging with the
    * offending names, not mid-job. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val dups = rules.map(_.name).groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    require(dups.isEmpty,
      s"duplicate rule name(s): ${dups.mkString(", ")} — rules must be " +
        "distinguishable (e.g. two regex rules on one column: combine the patterns)")
    val scalar = rules.collect {
      case r: NotNull => r.name -> count_if(col(r.col).isNull)
      case r: InRange =>
        r.name -> count_if(col(r.col).isNotNull &&
          (col(r.col) < r.lo || col(r.col) > r.hi))
      case r: Matches =>
        r.name -> count_if(col(r.col).isNotNull && !col(r.col).rlike("^(?:" + r.regex + ")$"))
    }
    val scalarDf: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val aggs = scalar.map { case (n, c) => c.cast(LongType).as(n) }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.selectExpr(s"stack(${scalar.size}, " +
          scalar.map { case (n, _) => s"'$n', `$n`" }.mkString(", ") +
          ") as (rule, violations)"))
      }
    val others: Seq[DataFrame] = rules.collect {
      case r: Unique =>
        df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .where(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations").cast(LongType))
      case r: ForeignKey =>
        df.where(col(r.col).isNotNull)
          .join(r.dim.select(col(r.dimCol).as("__fk")).distinct(),
            col(r.col) === col("__fk"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations").cast(LongType))
    }
    (scalarDf.toSeq ++ others).reduce(_.unionByName(_)).orderBy("rule")
  }
}
