package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views: a persistent
  * GROUP BY table kept in sync with an append-only base table at O(batch)
  * cost per refresh instead of O(base) recomputation.
  *
  * The reference has no aggregation at all (it delegates it to source SQL,
  * /root/reference/README.md:18); this is the extension-scope answer to the
  * standing 100 TB question "what does the daily dashboard query cost":
  * recomputing `GROUP BY day, domain` over a 100 TB base per refresh scans
  * 100 TB; merging the day's 100 GB batch into the view scans the batch.
  *
  * Supported aggregates are the self-mergeable ones — `sum`, `count`,
  * `min`, `max` — for which merge(agg(A), agg(B)) = agg(A ∪ B) holds
  * per group, so a refresh is: aggregate the BATCH, full-outer-merge onto
  * the view by group key, combine column-wise (sum+sum, min of mins, …).
  * `avg` is derivable as sum/count at read time; distinct counts need a
  * mergeable sketch state ([[graft.functions.KmvSketch]]) and are out of
  * scope here.
  *
  * The view is stored through [[Loader]] (atomic swap, surrogate-id-free),
  * so readers never see a half-refreshed view. The merge itself shuffles
  * O(groups-in-batch + groups-in-view) rows — at 100 TB the view is
  * typically orders of magnitude smaller than the base; when even the view
  * is huge, partition the view table by a group column and scope the merge
  * (the [[Loader]] partition machinery composes).
  */
object MaterializedAgg {

  /** One aggregate column of the view: `func` ∈ sum|count|min|max applied
    * to base-table column `src` (ignored for count), materialized as view
    * column `as`. */
  final case class AggCol(func: String, src: String, as: String) {
    require(Set("sum", "count", "min", "max")(func),
      s"unsupported mergeable aggregate: $func")
  }

  /** The per-batch (and first-full) aggregation. */
  private def aggregate(df: DataFrame, groupBy: Seq[String],
                        aggs: Seq[AggCol]): DataFrame = {
    val exprs = aggs.map {
      case AggCol("sum", s, a)   => sum(col(s)).as(a)
      case AggCol("count", _, a) => count(lit(1)).as(a)
      case AggCol("min", s, a)   => min(col(s)).as(a)
      case AggCol("max", s, a)   => max(col(s)).as(a)
      case other => throw new IllegalArgumentException(other.toString)
    }
    df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Column-wise combine of two partial aggregates of the same group
    * (either side may be absent → null-safe). */
  private def combine(a: Column, b: Column, func: String): Column = func match {
    case "sum" | "count" => coalesce(a, lit(0L)) + coalesce(b, lit(0L))
    case "min"           => when(a.isNull, b).when(b.isNull, a).otherwise(least(a, b))
    case "max"           => when(a.isNull, b).when(b.isNull, a).otherwise(greatest(a, b))
  }

  /** Merge `batch` (new base-table rows ONLY — the caller's append) into
    * the view table `view` in `tgt`. First call (view absent) aggregates
    * the batch alone. Cost: aggregate the batch + one group-key merge join
    * against the current view. The result replaces the view atomically.
    */
  def refresh(tgt: Catalog, view: String, batch: DataFrame,
              groupBy: Seq[String], aggs: Seq[AggCol]): Unit = {
    val batchAgg = aggregate(batch, groupBy, aggs)
    val merged = tgt.tableIfExists(view) match {
      case None => batchAgg
      case Some(cur0) =>
        val cur = if (cur0.columns.contains(Loader.IdCol)) cur0.drop(Loader.IdCol) else cur0
        val bR = aggs.foldLeft(batchAgg)((d, a) =>
          d.withColumnRenamed(a.as, s"__b_${a.as}"))
        cur.join(bR, groupBy, "full_outer")
          .select(groupBy.map(col) ++ aggs.map(a =>
            combine(col(a.as), col(s"__b_${a.as}"), a.func).as(a.as)): _*)
    }
    // a view is a keyed aggregate, not an append log: replace wholesale via
    // the loader's atomic-swap path, keyed upsert semantics guaranteed by
    // construction (one row per group in `merged`)
    Loader.load(tgt, view, merged, upsertFields = groupBy, idOrder = groupBy)
  }

  /** Read the view (id column dropped — group key + aggregates only). */
  def read(tgt: Catalog, view: String): DataFrame =
    tgt.table(view).drop(Loader.IdCol)
}
