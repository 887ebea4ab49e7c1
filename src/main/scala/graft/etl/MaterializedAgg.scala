package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{KmvSketch, PortableHash}

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
  * Aggregates are the self-mergeable ones — `sum`, `count`, `min`, `max` —
  * plus two PARTIAL-STATE aggregates materialized as hidden columns and
  * finalized at read time:
  *
  *   - `avg` stores (sum, count) partials and reads back sum/count — the
  *     classic decomposition; exact whenever the partial sum is (use an
  *     integral source column for bit-identical cross-engine results);
  *   - `ndv` stores a KMV distinct-count buffer ([[KmvSketch]], mergeable
  *     by construction: the k smallest hashes of A ∪ B are computable from
  *     the two buffers alone) and reads back the estimator. Deterministic
  *     integer arithmetic — merge order can never change the answer.
  *
  * The view is stored through [[Loader]] HASH-BUCKETED on the group key, so
  * a refresh is bucket-scoped end to end:
  *
  *   1. aggregate the batch (O(batch));
  *   2. read ONLY the buckets the batch's groups hash into (directory-level
  *      pruning on the physical bucket column) and combine column-wise
  *      (sum+sum, min of mins, KMV union) over the batch's groups alone;
  *   3. upsert the combined rows — [[Loader]]'s bucket-scoped merge
  *      rewrites just the touched bucket directories, each swap
  *      rename-atomic.
  *
  * Refresh I/O is therefore O(batch + touched buckets), not O(view): a
  * streaming sink refreshing one hot group rewrites 1/N of the view per
  * trigger. At 100 TB size `numBuckets` so one bucket ≈ one comfortable
  * task (the same sizing rule as any bucketed table); the view itself is
  * usually orders of magnitude smaller than the base.
  */
object MaterializedAgg {

  /** One aggregate column of the view: `func` ∈
    * sum|count|min|max|avg|ndv applied to base-table column `src` (ignored
    * for count), materialized as view column `as`. */
  final case class AggCol(func: String, src: String, as: String) {
    require(Set("sum", "count", "min", "max", "avg", "ndv")(func),
      s"unsupported mergeable aggregate: $func")
  }

  /** Hidden partial-state columns backing one view column (the column
    * itself for the directly-mergeable funcs). */
  private def stateCols(a: AggCol): Seq[String] = a.func match {
    case "avg" => Seq(s"${a.as}__psum", s"${a.as}__pcnt")
    case "ndv" => Seq(s"${a.as}__pkmv")
    case _     => Seq(a.as)
  }

  /** Hidden per-GROUP stamp of the last source version whose deltas were
    * folded into the row — the EXACTLY-ONCE guard for CDC maintenance: a
    * replayed version (crash between apply and watermark-advance, or a
    * partial multi-bucket apply) finds its version already stamped on the
    * groups it reached and SKIPS their deltas instead of double-counting
    * them into sums. Written only by the stamped maintenance paths
    * ([[CdcSource.maintainView]]); plain refreshes leave it untouched. */
  private[graft] val StampCol = "__applied_v"

  /** The per-batch (and first-full) aggregation, producing state columns. */
  private def aggregate(df: DataFrame, groupBy: Seq[String],
                        aggs: Seq[AggCol], kmvK: Int): DataFrame = {
    val exprs = aggs.flatMap {
      case AggCol("sum", s, a)   => Seq(sum(col(s)).as(a))
      case AggCol("count", _, a) => Seq(count(lit(1)).as(a))
      case AggCol("min", s, a)   => Seq(min(col(s)).as(a))
      case AggCol("max", s, a)   => Seq(max(col(s)).as(a))
      case AggCol("avg", s, a)   =>
        Seq(sum(col(s)).as(s"${a}__psum"), count(col(s)).as(s"${a}__pcnt"))
      case AggCol("ndv", s, a)   =>
        // null sentinel = P (the global hash maximum): rides the buffer so
        // merges stay pure hash-set unions; the estimator strips it (same
        // convention as [[graft.operators.Profile]])
        val h = when(col(s).isNull, lit(PortableHash.P))
          .otherwise(PortableHash.hmod(col(s).cast("string")))
        Seq(KmvSketch.kmv(h, kmvK).as(s"${a}__pkmv"))
      case other => throw new IllegalArgumentException(other.toString)
    }
    df.groupBy(groupBy.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Column-wise combine of two partial states of the same group (either
    * side may be absent → null-safe). Returns the combined STATE columns. */
  private def combine(a: AggCol, viewSide: String => Column,
                      batchSide: String => Column, kmvK: Int): Seq[Column] = {
    def add(x: Column, y: Column): Column =
      when(x.isNull, y).when(y.isNull, x).otherwise(x + y)
    a.func match {
      case "sum" | "count" =>
        Seq(add(viewSide(a.as), batchSide(a.as)).as(a.as))
      case "min" =>
        val (x, y) = (viewSide(a.as), batchSide(a.as))
        Seq(when(x.isNull, y).when(y.isNull, x).otherwise(least(x, y)).as(a.as))
      case "max" =>
        val (x, y) = (viewSide(a.as), batchSide(a.as))
        Seq(when(x.isNull, y).when(y.isNull, x).otherwise(greatest(x, y)).as(a.as))
      case "avg" =>
        Seq(add(viewSide(s"${a.as}__psum"), batchSide(s"${a.as}__psum")).as(s"${a.as}__psum"),
          add(viewSide(s"${a.as}__pcnt"), batchSide(s"${a.as}__pcnt")).as(s"${a.as}__pcnt"))
      case "ndv" =>
        val (x, y) = (viewSide(s"${a.as}__pkmv"), batchSide(s"${a.as}__pkmv"))
        // two-sided KMV union; an absent side is the empty sketch
        val merged = slice(array_sort(array_union(
          coalesce(x, expr("CAST(array() AS ARRAY<BIGINT>)")),
          coalesce(y, expr("CAST(array() AS ARRAY<BIGINT>)")))), 1, kmvK)
        Seq(merged.as(s"${a.as}__pkmv"))
    }
  }

  /** Merge `batch` (new base-table rows ONLY — the caller's append) into
    * the view table `view` in `tgt`. First call (view absent) aggregates
    * the batch alone and lays the view out hash-bucketed on the group key.
    * Subsequent refreshes touch only the buckets the batch's groups hash
    * into: the view-side read partition-prunes on the physical bucket
    * column, and the write rewrites just those bucket directories.
    */
  def refresh(tgt: Catalog, view: String, batch: DataFrame,
              groupBy: Seq[String], aggs: Seq[AggCol],
              numBuckets: Int = 16, kmvK: Int = 256,
              sourceVersion: Option[Long] = None): Unit =
    mergeStates(tgt, view, aggregate(batch, groupBy, aggs, kmvK),
      groupBy, aggs, numBuckets, kmvK, stamp = sourceVersion)

  /** Merge a pre-aggregated STATE frame (one row per touched group, state
    * columns as [[stateCols]] lays them out) into the view — the shared
    * tail of [[refresh]] (batch aggregates) and [[applyChanges]] (signed
    * CDC deltas). Aggregates named in `replace` skip the column-wise
    * combine: the state frame's value OVERWRITES the view's for every
    * touched group (the splice path for re-aggregated non-retractable
    * aggs — the frame's value is already the group's full truth). */
  private def mergeStates(tgt: Catalog, view: String, stateAgg0: DataFrame,
                          groupBy: Seq[String], aggs: Seq[AggCol],
                          numBuckets: Int, kmvK: Int,
                          replace: Set[String] = Set.empty,
                          stamp: Option[Long] = None): Unit = {
    require(groupBy.nonEmpty, "materialized view needs at least one group column")
    val spark = stateAgg0.sparkSession
    // stamped merges carry the source version as one more state column
    val stateAgg = stamp.fold(stateAgg0)(v =>
      stateAgg0.withColumn(StampCol, lit(v)))
    val batchAgg = stateAgg
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // existence is a path check, not a table-open: ParquetSource.read is
      // a full metadata pass (file listing, footer probe, sidecars), and
      // BOTH merge branches below do their own open — per-micro-batch
      // sinks must pay exactly one
      val existing = tgt.resolve(view)
      val recorded = existing.flatMap(_ =>
        graft.sources.ParquetSource.readBucketSpec(spark, tgt.dirPath(view)))
      // the touched-bucket probe's result doubles as the loader's
      // emptiness + touched-partition answer (two fewer jobs per refresh)
      var touchedBuckets: Option[Seq[Int]] = None
      val merged = existing match {
        case None => batchAgg
        case Some(_) =>
          // view side, pruned to the buckets the batch touches when the
          // recorded layout allows it (bucket keys == group keys): the
          // touched-id probe is one small job over the batch aggregate,
          // bounded by numBuckets values
          val viewSlice: DataFrame = recorded match {
            case Some((keys, n)) if keys == groupBy =>
              val touched = batchAgg
                .select(Loader.bucketIdExpr(keys, n).as("__b"))
                .distinct().collect().map(_.getInt(0)).toSeq
              touchedBuckets = Some(touched)
              graft.sources.ParquetSource
                .read(spark, tgt.dirPath(view), keepBucket = true)
                .where(col(Loader.BucketCol).isin(touched: _*))
                .drop(Loader.BucketCol)
            case _ => tgt.table(view) // flat legacy view: full read
          }
          // an empty batch touches nothing: the loader would no-op after
          // re-probing; answer from the already-collected probe instead
          if (touchedBuckets.exists(_.isEmpty)) return
          val cur0 = if (viewSlice.columns.contains(Loader.IdCol))
            viewSlice.drop(Loader.IdCol) else viewSlice
          // a stamped merge into a pre-stamp (legacy) view reads a null
          // stamp everywhere — every group then applies, exactly the
          // at-least-once behavior the legacy view already had
          val cur = if (stamp.isDefined && !cur0.columns.contains(StampCol))
            cur0.withColumn(StampCol, lit(null).cast("long"))
          else cur0
          val stateNames = aggs.flatMap(stateCols) ++
            (if (stamp.isDefined) Seq(StampCol) else Nil)
          val vR = stateNames.foldLeft(cur)((d, c) =>
            d.withColumnRenamed(c, s"__v_$c"))
          // batch groups only: groups outside the batch — even inside a
          // touched bucket — are untouched rows the Loader merge keeps
          val combined = aggs.flatMap(a =>
            if (replace.contains(a.as))
              stateCols(a).map(c => col(c).as(c))
            else
              combine(a, c => col(s"__v_$c"), c => col(c), kmvK))
          val joined = batchAgg.join(vR, groupBy, "left")
          stamp match {
            case None => joined.select(groupBy.map(col) ++ combined: _*)
            case Some(v) =>
              // EXACTLY-ONCE guard: a group whose stamp already covers
              // version v saw these deltas land before the crash — keep
              // its view state verbatim instead of folding them twice.
              // Two projections: first materializes the combined values
              // next to the view-side state, then the guard chooses.
              val aggStateNames = aggs.flatMap(stateCols)
              val both = joined.select(groupBy.map(col) ++ combined ++
                stateNames.map(c => col(s"__v_$c")): _*)
              val applied = col(s"__v_$StampCol").isNotNull &&
                col(s"__v_$StampCol") >= lit(v)
              both.select(groupBy.map(col) ++ aggStateNames.map(c =>
                when(applied, col(s"__v_$c")).otherwise(col(c)).as(c)) :+
                greatest(coalesce(col(s"__v_$StampCol"), lit(Long.MinValue)),
                  lit(v)).as(StampCol): _*)
          }
      }
      // keyed upsert through the loader's bucket-scoped merge: only the
      // touched bucket directories are rewritten, each swap rename-atomic
      // (a flat legacy view migrates to the bucketed layout in one full
      // atomic rewrite on its next refresh). The loader triggers `merged`
      // several times (empty probe, touched-partition probe, write) —
      // persist the combined rows (O(batch groups)) across those actions.
      val m = merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // keyUnique: m is one row per group by construction (batch aggregate
      // left-joined to the view slice on the full group key) — the loader
      // can skip its per-statement duplicate-collapse window. The touched-
      // bucket probe above already materialized the batch and derived the
      // touched leaf values, so the loader's emptiness probe and
      // distinct-collect are answered from it (two fewer jobs per refresh).
      val touched = touchedBuckets
      try Loader.load(tgt, view, m, upsertFields = groupBy, idOrder = groupBy,
        bucketBy = Some((groupBy, recorded.map(_._2).getOrElse(numBuckets))),
        keyUnique = true,
        knownNonEmpty = touched.isDefined,
        knownPartValues = touched.map(_.map(b =>
          org.apache.spark.sql.Row(b): org.apache.spark.sql.Row)))
      finally m.unpersist()
    } finally batchAgg.unpersist()
  }

  /** Maintain the view from a CHANGE-DATA-FEED instead of an append batch
    * — the retraction-stream semantics (Flink's retract model) that keep a
    * view consistent under UPDATES and DELETES, where [[refresh]] assumes
    * append-only batches. `feed` is [[VersionedTable.changes]] output with
    * `includeOld = true` (op ∈ insert|update|delete, value columns NEW,
    * `<col>__old` columns OLD) — or any frame of that shape; project
    * derived columns (and their `__old` twins) onto it first if the view
    * aggregates a computed value.
    *
    * Each feed row contributes +new for insert, −old for delete, and
    * −old +new for update; contributions are group-keyed by the side's OWN
    * group values, so an update that MOVES a row between groups retracts
    * from the old group and adds to the new one. One aggregation over the
    * feed yields signed per-group deltas; the merge is the same
    * bucket-scoped additive combine as a refresh — O(feed + touched
    * buckets) regardless of base-table size.
    *
    * Only the RETRACTABLE aggregates compose: `sum`, `count`, `avg`
    * (all additive in their state). `min`/`max` need the dropped value's
    * rank context and `ndv`'s KMV buffer cannot un-see a hash — views
    * carrying those must rebuild via [[refresh]] over a recomputation.
    * A group whose count is retracted to zero keeps a zero-valued row
    * (the keyed upsert has no row-delete path); readers filter on the
    * count column when "active groups only" is the contract.
    */
  def applyChanges(tgt: Catalog, view: String, feed: DataFrame,
                   groupBy: Seq[String], aggs: Seq[AggCol],
                   numBuckets: Int = 16,
                   sourceVersion: Option[Long] = None): Unit = {
    require(aggs.nonEmpty, "applyChanges needs at least one aggregate")
    require(aggs.forall(a => Set("sum", "count", "avg")(a.func)),
      "applyChanges supports the retractable aggregates (sum, count, avg) " +
        "only; route min/max/ndv views through the snapshot overload; got: " +
        aggs.map(_.func).distinct.mkString(", "))
    val deltas = retractDeltas(feed, groupBy, aggs)
    mergeStates(tgt, view, deltas, groupBy, aggs, numBuckets, kmvK = 256,
      stamp = sourceVersion)
  }

  /** Signed per-group delta STATE for the retractable aggregates: each
    * feed row contributes +new for insert, −old for delete, −old +new for
    * update (group-keyed by each side's OWN group values, so a
    * group-moving update retracts from the old group and adds to the new
    * one). Shared by both [[applyChanges]] overloads. */
  private def retractDeltas(feed: DataFrame, groupBy: Seq[String],
                            aggs: Seq[AggCol]): DataFrame = {
    require(feed.columns.contains("op"), "feed must carry the op column")
    // `__old` twins are needed exactly when an aggregate reads a VALUE
    // column (func != count): its old-side value is the retraction. A
    // count-only view over a feed whose every column is a CDC key has no
    // value columns to retract — a twin-less feed is then legitimate
    // (group columns without a twin are treated as immutable keys).
    require(aggs.forall(_.func == "count") ||
      feed.columns.exists(_.endsWith("__old")),
      "applyChanges needs a feed built with includeOld = true — updates " +
        "cannot be retracted without their old-side values")
    // a column with an __old twin is a VALUE column (use the old side on
    // the minus contributions); one without is a feed key — immutable
    // across an update by definition, same on both sides
    def oldSide(c: String) =
      if (feed.columns.contains(s"${c}__old")) col(s"${c}__old") else col(c)
    val srcCols = (groupBy ++ aggs.filter(_.func != "count").map(_.src)).distinct
    srcCols.foreach(c => require(feed.columns.contains(c),
      s"feed lacks column '$c' needed by the view definition"))
    // ONE pass over the feed instead of two (guide §1.2): the old
    // plus-∪-minus union put the whole upstream feed plan — a CDC diff —
    // under BOTH union branches, re-executing everything above the reused
    // exchanges once per branch. Each row now explodes to its signed
    // contributions in place: +new for insert/update, −old for
    // update/delete; any other/null op falls through every `when` to a
    // null array, which explode() drops — exactly the rows the two
    // branch filters used to exclude. Multiset-identical contributions
    // by construction.
    val plusStruct = struct(lit(1).as("__sign") +: srcCols.map(col): _*)
    val minusStruct =
      struct(lit(-1).as("__sign") +: srcCols.map(c => oldSide(c).as(c)): _*)
    val contribArr = when(col("op") === "insert", array(plusStruct))
      .when(col("op") === "delete", array(minusStruct))
      .when(col("op") === "update", array(plusStruct, minusStruct))
    val contrib = feed.select(explode(contribArr).as("__c"))
      .select(("__sign" +: srcCols).map(n => col("__c").getField(n).as(n)): _*)
    val deltaExprs = aggs.flatMap {
      case AggCol("count", _, a) => Seq(sum(col("__sign")).as(a))
      case AggCol("sum", s, a)   => Seq(sum(col("__sign") * col(s)).as(a))
      case AggCol("avg", s, a)   => Seq(
        sum(col("__sign") * col(s)).as(s"${a}__psum"),
        sum(when(col(s).isNotNull, col("__sign")).otherwise(0)).as(s"${a}__pcnt"))
      case other => throw new IllegalArgumentException(other.toString)
    }
    contrib.groupBy(groupBy.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)
  }

  /** CDC maintenance for views that ALSO carry non-retractable aggregates
    * (`min`/`max`/`ndv` — a dropped value's rank context and a KMV
    * buffer's seen-hashes cannot be un-seen from deltas alone). The
    * retractable aggregates fold as signed deltas exactly as above; the
    * non-retractable ones are RE-AGGREGATED from `snapshot` (the base
    * table's post-change state) for the TOUCHED GROUPS ONLY and spliced
    * over the view's values — a group the feed never mentions is never
    * read, so the cost is O(feed + snapshot-scan-filtered-to-touched
    * groups + touched buckets), not O(view). The touched-group semi-join
    * predicate pushes into the snapshot scan; at 100 TB, keep the base
    * bucketed/partitioned on (a prefix of) the group key so the filter
    * prunes at the directory level too. A group retracted to emptiness
    * reads back null min/max/ndv with a zero count (readers filter on the
    * count column for "active groups only", as with the delta-only path).
    */
  def applyChanges(tgt: Catalog, view: String, feed: DataFrame,
                   snapshot: DataFrame, groupBy: Seq[String],
                   aggs: Seq[AggCol], numBuckets: Int,
                   kmvK: Int,
                   sourceVersion: Option[Long]): Unit = {
    require(aggs.nonEmpty, "applyChanges needs at least one aggregate")
    val (retract, reagg) = aggs.partition(a => Set("sum", "count", "avg")(a.func))
    if (reagg.isEmpty) {
      applyChanges(tgt, view, feed, groupBy, aggs, numBuckets, sourceVersion)
      return
    }
    (groupBy ++ reagg.map(_.src).filter(_.nonEmpty)).distinct.foreach(c =>
      require(snapshot.columns.contains(c),
        s"snapshot lacks column '$c' needed by the view definition"))
    // touched groups — and the retractable deltas over exactly them. A
    // count over lit(1) rides along even when the caller declared no
    // retractables, purely to key the touched-group frame.
    val deltaAggs = if (retract.nonEmpty) retract
      else Seq(AggCol("count", "", "__touch"))
    val deltas = retractDeltas(feed, groupBy, deltaAggs)
    val touched = deltas.select(groupBy.map(col): _*)
    val snapTouched = snapshot.join(touched, groupBy, "left_semi")
    val re0 = aggregate(snapTouched, groupBy, reagg, kmvK)
    // align the spliced KMV buffers to the view's element-NULLABLE array
    // type (parquet reads everything nullable; the reverse cast is
    // disallowed, so a non-nullable fresh aggregate would fail the merge)
    val re = reagg.filter(_.func == "ndv").foldLeft(re0)((d, a) =>
      d.withColumn(s"${a.as}__pkmv", col(s"${a.as}__pkmv").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))))
    val state0 = deltas.join(re, groupBy, "left")
    val state = if (retract.isEmpty) state0.drop("__touch") else state0
    mergeStates(tgt, view, state, groupBy, aggs,
      numBuckets, kmvK, replace = reagg.map(_.as).toSet,
      stamp = sourceVersion)
  }

  /** As above with the default layout sizing. */
  def applyChanges(tgt: Catalog, view: String, feed: DataFrame,
                   snapshot: DataFrame, groupBy: Seq[String],
                   aggs: Seq[AggCol]): Unit =
    applyChanges(tgt, view, feed, snapshot, groupBy, aggs,
      numBuckets = 16, kmvK = 256, sourceVersion = None)

  /** As above, unstamped (at-least-once) with explicit sizing. */
  def applyChanges(tgt: Catalog, view: String, feed: DataFrame,
                   snapshot: DataFrame, groupBy: Seq[String],
                   aggs: Seq[AggCol], numBuckets: Int, kmvK: Int): Unit =
    applyChanges(tgt, view, feed, snapshot, groupBy, aggs,
      numBuckets, kmvK, sourceVersion = None)

  /** As above, stamped for exactly-once CDC maintenance. */
  def applyChanges(tgt: Catalog, view: String, feed: DataFrame,
                   snapshot: DataFrame, groupBy: Seq[String],
                   aggs: Seq[AggCol], sourceVersion: Option[Long]): Unit =
    applyChanges(tgt, view, feed, snapshot, groupBy, aggs,
      numBuckets = 16, kmvK = 256, sourceVersion = sourceVersion)

  /** Read the view raw (id and maintenance-stamp columns dropped — group
    * key + state columns). */
  def read(tgt: Catalog, view: String): DataFrame =
    tgt.table(view).drop(Loader.IdCol).drop(StampCol)

  /** Read the view FINALIZED: partial-state columns are folded into their
    * declared aggregate columns (avg = sum/count, null on empty; ndv = the
    * KMV estimate) and hidden, in declaration order after the group key. */
  def read(tgt: Catalog, view: String, groupBy: Seq[String],
           aggs: Seq[AggCol], kmvK: Int = 256): DataFrame = {
    val raw = read(tgt, view)
    val outCols = aggs.map { a =>
      a.func match {
        case "avg" =>
          val (s, c) = (col(s"${a.as}__psum"), col(s"${a.as}__pcnt"))
          when(c > 0, s.cast("double") / c).as(a.as)
        case "ndv" =>
          KmvSketch.estimate(
            s"filter(`${a.as}__pkmv`, x -> x < ${PortableHash.P}L)", kmvK)
            .as(a.as)
        case _ => col(a.as)
      }
    }
    raw.select(groupBy.map(col) ++ outCols: _*)
  }
}
