package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Target-table writer: surrogate ids, append, join-based upsert, and schema
  * evolution over plain parquet directories (no Delta/Iceberg jar available —
  * SURVEY.md §4). Replaces the reference's per-row `insert`/`upsert` through
  * the `dataset` package (/root/reference/easy_etl/__init__.py:89-99) with
  * one distributed write per load.
  *
  * Scale notes (100 TB design):
  *   - Surrogate ids use a distributed range sort + `zipWithIndex` per-partition
  *     offsets — NOT a single-partition `row_number()` window and NOT
  *     `monotonically_increasing_id` (gaps / order-nondeterminism). The sort
  *     parallelizes across executors; the id stamp is embarrassingly parallel.
  *   - Upsert is a key-shuffled (or AQE-broadcast) join, not N per-row lookups.
  *   - Writes go to a temp directory then swap, so a failed job never
  *     corrupts the target and the existing table can be an input to its own
  *     rewrite.
  */
object Loader {

  val IdCol = "id"

  /** Graft-written parquet carries INT64 micro timestamps, not Spark's
    * INT96 default: INT96 column statistics are Binary (footer-useless and
    * officially unreliable), which would force every timestamp watermark
    * and id probe back to a column scan; micros make those metadata reads.
    * Session-level (applies to the write that follows); readers of either
    * form are unaffected. */
  private[etl] def ensureParquetWriteConf(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** Append/upsert `incoming` into `tgt.dirPath(table)` with reference load
    * semantics (S1–S5, easy_etl/__init__.py:31-44, 89-117):
    *   - every row gets an auto-increment surrogate `id` continuing from the
    *     table's current max;
    *   - `upsertFields` nonEmpty: rows matching on those keys replace the
    *     existing row's non-key fields but KEEP its id; others insert;
    *   - `ensure=true`: new incoming columns widen the target schema
    *     (old rows read null);
    *   - `safe=false`: target columns absent from incoming are dropped
    *     (the reference's automatic narrowing, :113-117); `safe=true` keeps
    *     them (incoming rows read null).
    *   - empty incoming ⇒ no-op (reference `if rows:` guard, :37).
    *
    * `idOrder`: columns giving the deterministic insertion order for new
    * rows (the reference's "order" is source-DB result order; a distributed
    * engine must pick an explicit total order). Defaults to all incoming
    * columns.
    *
    * `targetFileBytes`: opt-in output sizing — the written frame
    * repartitions so each parquet file carries ≈ that many bytes of row
    * data ([[graft.sources.RowWidth.shardForTargetFileSize]]'s exact
    * one-pass stats; costs one extra aggregation over the output). The
    * knob against both 100 TB file-layout failure modes: thousands of
    * KB-files (metadata pressure) and multi-GB files (no read
    * parallelism).
    *
    * `partitionBy`: opt-in Hive-style partitioned layout (one or more
    * data columns; recorded in a sidecar and enforced on later loads).
    * Appends stay O(batch); an upsert whose keys INCLUDE every partition
    * column rewrites ONLY the leaf partitions present in the incoming
    * batch (the partition-scoped merge — at 100 TB the difference between
    * rewriting one (region, day) and rewriting the table). Schema
    * evolution falls back to the full atomic rewrite.
    *
    * `clusterBy`: opt-in range-clustered file layout. Flat tables
    * range-repartition + sort on these columns, so each written file
    * covers a DISJOINT key range; Hive-partitioned tables sort files
    * within each partition. Parquet then records tight per-file/row-group
    * min/max stats on the cluster columns — at 100 TB a range predicate
    * skips whole files instead of scanning the table (the zone-map /
    * SORTED BY layout). Like `targetFileBytes` it shapes the files this
    * load writes; appends cluster the new files only.
    *
    * `bucketBy`: opt-in hash-bucketed layout (key columns, bucket count) —
    * the scale answer for upserting tables with NO natural partition
    * column. The table physically partitions on a derived bucket id (a
    * portable hash of the key tuple mod N, invisible to readers), so an
    * upsert whose keys cover the bucket keys rewrites ONLY the buckets the
    * batch touches: O(batch/N × table) instead of O(table). With N=1024, a
    * 1000-row batch into a 100 TB table rewrites ≤ 1000 buckets ≈ at most
    * that fraction of the table; point-lookup reads can likewise prune to
    * one bucket. Recorded in a sidecar and enforced on later loads;
    * mutually exclusive with `partitionBy`.
    */
  def load(tgt: Catalog, table: String, incoming0: DataFrame,
           upsertFields: Seq[String] = Nil, ensure: Boolean = true,
           safe: Boolean = false, idOrder: Seq[String] = Nil,
           targetFileBytes: Option[Long] = None,
           partitionBy: Seq[String] = Nil,
           clusterBy: Seq[String] = Nil,
           bucketBy: Option[(Seq[String], Int)] = None,
           keyUnique: Boolean = false,
           knownNonEmpty: Boolean = false,
           knownPartValues: Option[Seq[org.apache.spark.sql.Row]] = None): Unit = {
    ensureParquetWriteConf(tgt.spark)
    val incoming1 = if (incoming0.columns.contains(IdCol)) incoming0.drop(IdCol) else incoming0
    // knownNonEmpty: the caller already materialized the batch (e.g. a
    // matview merge whose touched-bucket probe returned rows) — the
    // limit(1) emptiness probe would be a redundant job per statement
    if (!knownNonEmpty && incoming1.isEmpty) return

    recoverStranded(tgt, table)
    val existing0 = tgt.tableIfExists(table)
    // an existing table's recorded bucketing wins; a conflicting request is
    // an error, not a silent re-layout. A flat table CAN migrate to
    // bucketed (full atomic rewrite, sidecar written with it).
    val recordedBuckets =
      if (existing0.isDefined)
        graft.sources.ParquetSource.readBucketSpec(tgt.spark, tgt.dirPath(table))
      else None
    val bucketSpec: Option[(Seq[String], Int)] = recordedBuckets match {
      case Some(spec) =>
        require(bucketBy.isEmpty || bucketBy.contains(spec),
          s"table '$table' is bucketed by ${spec._1.mkString(",")} x ${spec._2}; " +
            s"cannot load with bucketBy=$bucketBy")
        Some(spec)
      case None => bucketBy
    }
    require(bucketSpec.isEmpty || partitionBy.isEmpty,
      "bucketBy and partitionBy are mutually exclusive layouts")
    bucketSpec.foreach { case (keys, n) =>
      require(n >= 1, s"bucket count must be >= 1: $n")
      require(keys.forall(incoming1.columns.contains),
        s"bucketBy key(s) absent from incoming: ${keys.filterNot(incoming1.columns.contains).mkString(", ")}")
    }
    // the derived bucket id rides through the pipeline as an ordinary
    // partition column; readers never see it (ParquetSource.read drops it).
    // The INCOMING side computes it; the EXISTING side of an already-
    // bucketed table re-reads with the PHYSICAL partition column kept —
    // bucket predicates on the physical column partition-prune at the
    // directory level, which a recomputed hash expression never can (the
    // whole point of the bucket-scoped upsert). Only a flat→bucketed
    // migration (no bucket dirs on disk yet) recomputes on the existing
    // side.
    val incoming = bucketSpec.fold(incoming1) { case (keys, n) =>
      incoming1.withColumn(BucketCol, bucketIdExpr(keys, n))
    }
    val existing = existing0.map { ex =>
      bucketSpec match {
        case Some(_) if recordedBuckets.isDefined =>
          graft.sources.ParquetSource.read(tgt.spark, tgt.dirPath(table),
            keepBucket = true)
        case Some((keys, n)) => ex.withColumn(BucketCol, bucketIdExpr(keys, n))
        case None => ex
      }
    }
    val order = if (idOrder.nonEmpty) idOrder
      else incoming1.columns.toSeq.filterNot(_ == BucketCol)
    // an existing table's recorded partitioning wins; a conflicting request
    // is an error, not a silent re-layout
    val recordedSpec =
      if (existing.isDefined)
        graft.sources.ParquetSource.readPartSpec(tgt.spark, tgt.dirPath(table)).map(_._1)
      else Nil
    require(bucketSpec.isEmpty || recordedSpec.isEmpty || recordedSpec == Seq(BucketCol),
      s"table '$table' is partitioned by ${recordedSpec.mkString(",")}; cannot bucket it")
    val partCols: Seq[String] =
      if (bucketSpec.isDefined) Seq(BucketCol)
      else if (recordedSpec.nonEmpty) {
        require(partitionBy.isEmpty || partitionBy == recordedSpec,
          s"table '$table' is partitioned by ${recordedSpec.mkString(",")}; " +
            s"cannot load with partitionBy=${partitionBy.mkString(",")}")
        recordedSpec
      } else partitionBy
    require(partCols.forall(incoming.columns.contains),
      s"partitionBy column(s) absent from incoming: ${partCols.filterNot(incoming.columns.contains).mkString(", ")}")
    require(clusterBy.forall(incoming.columns.contains),
      s"clusterBy column(s) absent from incoming: ${clusterBy.filterNot(incoming.columns.contains).mkString(", ")}")
    val maxId: Long = existing match {
      case Some(ex) if ex.columns.contains(IdCol) =>
        // footer statistics first: the id floor is metadata, not a column
        // scan (at 100 TB, the per-load max(id) probe would otherwise read
        // the entire id column). Falls back to the aggregate when stats
        // are absent or the file count makes a driver sweep the worse deal.
        graft.sources.ParquetSource
          .footerMaxLong(tgt.spark, tgt.resolve(table).get, IdCol)
          .getOrElse {
            val r = ex.agg(max(col(IdCol))).head()
            if (r.isNullAt(0)) 0L else r.getLong(0)
          }
      case _ => 0L
    }

    val merged: DataFrame = existing match {
      case None =>
        withSurrogateIds(incoming, maxId, order)

      case Some(ex) if upsertFields.nonEmpty =>
        // partition-scoped path: the table must ALREADY be partitioned
        // (recordedSpec — a flat→partitioned re-layout goes through the
        // full rewrite, which writes the sidecar atomically), with EVERY
        // partition column part of the upsert key (so a matched row can
        // never change partitions — one missing column breaks the slice's
        // merge-completeness) and an unchanged schema (a partial rewrite
        // must not evolve the table out from under the untouched
        // partitions)
        // a bucketed table qualifies when the upsert keys cover the BUCKET
        // KEYS (the bucket id is a function of them, so a matched row can
        // never change buckets) — the hash-layout twin of the partition
        // rule, giving O(touched buckets) upserts on tables with no
        // natural partition column
        val keysCover = bucketSpec match {
          case Some((keys, _)) => keys.forall(upsertFields.contains)
          case None => partCols.forall(upsertFields.contains)
        }
        val scoped = recordedSpec.nonEmpty && keysCover &&
          sameColumnSet(ex, incoming) &&
          partitionScopedUpsert(tgt, table, ex, incoming, upsertFields,
            maxId, order, ensure, safe, partCols, targetFileBytes, clusterBy,
            keyUnique, knownPartValues)
        if (scoped) return
        upsertMerged(ex, incoming, upsertFields, maxId, order, ensure, safe,
          keyUnique)

      case Some(ex) =>
        val withIds = withSurrogateIds(incoming, maxId, order)
        val target = finalSchema(ex, withIds, ensure, safe)
        // Append fast path: when the schema is unchanged, ONLY the new rows
        // are written (parquet append of new files into the table dir) —
        // the existing data is untouched. At 100 TB this is the difference
        // between an O(batch) append and an O(table) rewrite; the full
        // aligned rewrite only happens on actual schema evolution.
        // Durability note: this path has Spark's standard job-commit
        // guarantee (task files stage under _temporary, invisible to
        // readers; the driver moves them in at job commit). A driver crash
        // mid-commit can expose a partial batch — weaker than the swap
        // path's all-or-nothing; acceptable for append-only tables where a
        // re-run replaces the table anyway, and the price of not rewriting
        // the world per batch.
        // Guard: only valid when the table actually LIVES at dirPath —
        // if it resolved in single-file layout (name.parquet), new part
        // files dropped into dirPath(name) would be invisible because
        // Catalog.resolve keeps preferring the file. Fall through to the
        // full swap rewrite in that case (the rewrite lands at dirPath and
        // wins future resolution only after the file layout is gone, so
        // writeAtomic below handles it as a fresh dir write).
        val dirLayout = tgt.resolve(table).contains(tgt.dirPath(table))
        // a flat→partitioned re-layout must NOT take the append fast path:
        // partition subdirs dropped next to flat part-files corrupt the
        // directory structure — fall through to the full rewrite, which
        // migrates the layout (and writes the sidecar) atomically
        val layoutUnchanged = partCols.isEmpty || recordedSpec.nonEmpty
        if (dirLayout && layoutUnchanged && sameShape(target, ex.schema)) {
          val w = applyBlockSize(
            shard(unionAligned(Seq(withIds), target), targetFileBytes, partCols, clusterBy)
              .write.mode(SaveMode.Append), targetFileBytes)
          (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
            .parquet(tgt.dirPath(table))
          Catalog.invalidateTable(tgt, table)
          if (partCols.isEmpty)
            graft.sources.ParquetSource.primeSchemaCache(
              tgt.dirPath(table), target, bucketed = false)
          else if (bucketSpec.isDefined && partCols == Seq(BucketCol))
            graft.sources.ParquetSource.primeSchemaCache(
              tgt.dirPath(table), target, bucketed = true)
          return
        }
        unionAligned(Seq(ex, withIds), target)
    }

    writeAtomic(tgt, table, shard(merged, targetFileBytes, partCols, clusterBy),
      partCols, bucketSpec, targetFileBytes)
  }

  val BucketCol: String = graft.sources.ParquetSource.BucketCol

  /** Bucket id of the key tuple: portable hash mod bucket count. A pure
    * deterministic projection of the key columns — writers recompute it,
    * readers never see it. NULL key components fold into the separator
    * (collisions only coarsen bucketing, never break it: the id is still a
    * function of the key tuple). */
  private[etl] def bucketIdExpr(keys: Seq[String], n: Int): org.apache.spark.sql.Column =
    (graft.functions.PortableHash.hmod(
      concat_ws("\u0001", keys.map(c => col(c).cast("string")): _*)) % n).cast("int")

  /** Bucket-pruned point lookup on a hash-bucketed table: hash the key
    * tuple at PLAN time (the driver-side twin of [[bucketIdExpr]]) and
    * read ONLY that bucket's directory — at 100 TB with N=1024 buckets,
    * a key fetch scans 1/1024th of the table instead of all of it, with
    * zero index structures. Key values must be given for every bucket key
    * (stringified the way Spark casts them — longs/strings round-trip
    * exactly). Returns the matching rows (exact filter applied on top of
    * the bucket scan).
    */
  def bucketLookup(tgt: Catalog, table: String,
                   key: Map[String, Any]): DataFrame = {
    val spec = graft.sources.ParquetSource.readBucketSpec(tgt.spark, tgt.dirPath(table))
      .getOrElse(throw new IllegalArgumentException(
        s"table '$table' is not hash-bucketed"))
    val (keys, n) = spec
    require(keys.toSet == key.keySet,
      s"lookup must bind exactly the bucket keys ${keys.mkString(",")}; got ${key.keys.mkString(",")}")
    // NULL keys cannot round-trip the write side's concat_ws (which SKIPS
    // nulls), and only types whose Java toString matches Spark's string
    // cast hash identically — restrict to the safe set
    key.foreach { case (k, v) =>
      require(v != null, s"bucket lookup key '$k' must not be null")
      require(v.isInstanceOf[String] || v.isInstanceOf[Long] ||
        v.isInstanceOf[Int] || v.isInstanceOf[Short] || v.isInstanceOf[Boolean],
        s"bucket lookup key '$k' has unsupported type ${v.getClass.getSimpleName}: " +
          "use string/integral keys (their driver-side toString matches Spark's cast)")
    }
    val joined = keys.map(k => String.valueOf(key(k))).mkString("\u0001")
    val bucket = graft.functions.PortableHash.hmodJvm(joined) % n
    val bucketDir = new org.apache.hadoop.fs.Path(
      tgt.dirPath(table), s"$BucketCol=$bucket")
    val fs = bucketDir.getFileSystem(tgt.spark.sparkContext.hadoopConfiguration)
    val scan =
      if (fs.exists(bucketDir))
        graft.sources.ParquetSource.read(tgt.spark, bucketDir.toString)
      else tgt.table(table).limit(0) // key hashes to a bucket with no rows
    keys.foldLeft(scan)((d, k) => d.where(col(k) === lit(key(k))))
  }

  /** Same column name→type map (order-insensitive — a partitioned read
    * surfaces partition columns last). */
  private[etl] def sameColumnSet(ex: DataFrame, incoming: DataFrame): Boolean = {
    val exM = ex.schema.fields.map(f => f.name -> f.dataType).toMap
    val inM = incoming.schema.fields.map(f => f.name -> f.dataType).toMap + (IdCol -> LongType)
    exM == inM
  }

  /** The partition-scoped merge: slice the existing table to the partitions
    * the incoming batch touches (static predicate — partition-pruned
    * scan), run the join-based merge on that slice only, stage the result
    * partitioned, and swap JUST those LEAF partition subdirectories
    * (multi-column specs swap at the deepest level: a batch touching
    * region=eu/day=3 never rewrites region=eu/day=4). Untouched
    * partitions' files are never read or rewritten. Returns false (caller
    * falls back to the full rewrite) when the batch spans more than
    * `MaxScopedPartitions` leaf partitions or carries null partition
    * values.
    *
    * Durability: each leaf swap is rename-atomic; a crash mid-loop leaves
    * some leaves updated and the rest old alongside a `.__part-` aside dir
    * — per-partition atomicity, not cross-partition, the standard contract
    * for partition-scoped merges without a table format. A crash INSIDE
    * one leaf's two renames (live moved aside, new not yet in) is healed
    * by the next load: [[recoverStranded]] restores any live-missing leaf
    * from the newest aside before the strays are cleaned, so no window
    * deletes the only remaining copy.
    */
  private def partitionScopedUpsert(tgt: Catalog, table: String,
                                    ex: DataFrame, incoming: DataFrame,
                                    keys: Seq[String], maxId: Long, order: Seq[String],
                                    ensure: Boolean, safe: Boolean,
                                    partCols: Seq[String],
                                    targetFileBytes: Option[Long],
                                    clusterBy: Seq[String] = Nil,
                                    keyUnique: Boolean = false,
                                    knownPartValues: Option[Seq[org.apache.spark.sql.Row]] = None): Boolean = {
    val MaxScopedPartitions = 1000
    // knownPartValues: the caller already knows the exact touched leaf
    // values (e.g. a matview merge's touched-bucket probe) — skip the
    // distinct-collect job that would re-derive them
    val vals = knownPartValues.map(_.toArray).getOrElse(
      incoming.select(partCols.map(col): _*).distinct()
        .limit(MaxScopedPartitions + 1).collect())
    if (vals.length > MaxScopedPartitions ||
      vals.exists(r => partCols.indices.exists(r.isNullAt))) return false

    // keys ⊇ partCols means any existing row matching an incoming key lives
    // in one of these partitions, so the slice is merge-complete. The
    // OR-of-ANDs literal predicate partition-prunes the scan statically.
    val touched = vals.toIndexedSeq.map { r =>
      partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val exSlice = ex.where(touched)
    val merged = upsertMerged(exSlice, incoming, keys, maxId, order, ensure,
      safe, keyUnique)

    val conf = tgt.spark.sparkContext.hadoopConfiguration
    val liveDir = new org.apache.hadoop.fs.Path(tgt.dirPath(table))
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new org.apache.hadoop.fs.Path(tgt.dirPath(table) + ".__tmp-" + uuid)
    val aside = new org.apache.hadoop.fs.Path(tgt.dirPath(table) + ".__part-" + uuid)
    val fs = liveDir.getFileSystem(conf)
    applyBlockSize(shard(merged, targetFileBytes, partCols, clusterBy)
        .write.mode(SaveMode.Overwrite), targetFileBytes)
      .partitionBy(partCols: _*).parquet(tmp.toString)
    fs.mkdirs(aside)
    leafPartDirs(fs, tmp, partCols.size).foreach { leaf =>
      val rel = relPath(tmp, leaf)
      val live = new org.apache.hadoop.fs.Path(liveDir, rel)
      val asideLeaf = new org.apache.hadoop.fs.Path(aside, rel)
      fs.mkdirs(asideLeaf.getParent)
      if (fs.exists(live) && !fs.rename(live, asideLeaf))
        throw new java.io.IOException(s"could not move partition aside: $live")
      fs.mkdirs(live.getParent)
      if (!fs.rename(leaf, live))
        throw new java.io.IOException(s"could not swap partition in: $live")
    }
    fs.delete(aside, true)
    fs.delete(tmp, true)
    cleanupStrays(tgt, table)
    Catalog.invalidateTable(tgt, table)
    if (partCols == Seq(BucketCol))
      graft.sources.ParquetSource.primeSchemaCache(
        tgt.dirPath(table), merged.schema, bucketed = true)
    true
  }

  /** The `depth`-level `name=value` subdirectories of `root` — the leaf
    * partition dirs of a (possibly multi-column) Hive layout. */
  private def leafPartDirs(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           depth: Int): Seq[org.apache.hadoop.fs.Path] = {
    def walk(p: org.apache.hadoop.fs.Path, d: Int): Seq[org.apache.hadoop.fs.Path] =
      if (d == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => walk(st.getPath, d - 1))
    walk(root, depth)
  }

  /** `child`'s path relative to `base` (both absolute, child under base). */
  private def relPath(base: org.apache.hadoop.fs.Path,
                      child: org.apache.hadoop.fs.Path): String = {
    val b = base.toUri.getPath.stripSuffix("/")
    val c = child.toUri.getPath
    require(c.startsWith(b + "/"), s"$child not under $base")
    c.substring(b.length + 1)
  }

  /** Parquet row-group bound for a sized write: `parquet.block.size`
    * capped at a quarter of `targetFileBytes` (floor 1 MB, never above the
    * 128 MB parquet default). Why: Spark schedules one scan task per
    * FilePartition byte range, but a task can only read ROW GROUPS whose
    * start falls in its range — a file written as one giant row group is
    * one task on every future scan no matter how it is split (guide §6:
    * single-row-group files serialize re-reads). Bounding the row group at
    * target/4 makes every at-target output file carry ≥4 independently
    * readable row groups, so downstream scans parallelize. Unsized writes
    * keep the parquet default. */
  private def blockSizeFor(targetFileBytes: Option[Long]): Option[Long] =
    targetFileBytes.map(t =>
      math.max(1L << 20, math.min(128L << 20, t / 4)))

  private def applyBlockSize(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
                             targetFileBytes: Option[Long]): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    blockSizeFor(targetFileBytes).fold(w)(b => w.option("parquet.block.size", b))

  /** Distribute `df` toward ~targetFileBytes output files. Flat layouts
    * round-robin; Hive-partitioned writes distribute on the partition
    * columns plus a bounded spread key — a round-robin repartition feeding
    * `partitionBy` would scatter EVERY partition's rows across every
    * writer (one small file per partition per task, shards × partitions
    * files total: the opposite of the sizing goal).
    *
    * `clusterBy` switches a flat layout to a RANGE repartition + sort on
    * the cluster columns (each file covers a disjoint key range — zone-map
    * layout); a Hive-partitioned layout keeps its distribution and sorts
    * rows within each writer task instead (files internally sorted, tight
    * parquet min/max stats per file). */
  private def shard(df: DataFrame, targetFileBytes: Option[Long],
                    partCols: Seq[String] = Nil,
                    clusterBy: Seq[String] = Nil,
                    knownTotalBytes: Option[Long] = None,
                    knownPartValues: Option[Long] = None): DataFrame = {
    // sized paths: the partition count comes from a caller-supplied byte
    // total when one is already known (compaction reads an existing
    // parquet table — its footers carry the size), else from the one-pass
    // aggregation probe over the data
    def nFor(b: Long): Int = knownTotalBytes match {
      case Some(t) => graft.sources.RowWidth.partitionsFromTotal(t, b)
      case None => graft.sources.RowWidth.partitionsForTargetFileSize(df, b)
    }
    (targetFileBytes, clusterBy) match {
      case (None, Nil) if partCols.isEmpty => df
      case (None, Nil) =>
        // a Hive/bucket-partitioned write from an N-task frame would emit
        // up to N files PER leaf (every task holds rows of every value) —
        // co-locate each leaf's rows in one task: one file per leaf.
        // Oversized leaves are what targetFileBytes is for.
        df.repartition(partCols.map(col): _*)
      case (None, cls) if partCols.isEmpty =>
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        df.repartitionByRange(n, cls.map(col): _*)
          .sortWithinPartitions(cls.map(col): _*)
      case (None, cls) =>
        // range on (partition cols, cluster cols): one leaf's rows stay
        // contiguous (small leaves → one file), and a LARGE leaf's several
        // files carry DISJOINT cluster ranges — a plain hash repartition
        // on the partition cols would in-file-sort each file but leave
        // every file's min/max spanning the leaf's full cluster range
        // (file-level pruning gains nothing)
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        df.repartitionByRange(n, (partCols ++ cls).map(col): _*)
          .sortWithinPartitions((partCols ++ cls).map(col): _*)
      case (Some(b), Nil) if partCols.isEmpty =>
        df.repartition(nFor(b))
      case (Some(b), cls) if partCols.isEmpty =>
        val n = nFor(b)
        df.repartitionByRange(n, cls.map(col): _*)
          .sortWithinPartitions(cls.map(col): _*)
      case (Some(b), Nil) =>
        // sized + partitioned, no clustering: spread each leaf across
        // enough writers to hit the file-size target. Compaction callers
        // pass the leaf count from the DIRECTORY listing (metadata) —
        // the distinct scan is only for frames with no layout on disk yet.
        val nVals = knownPartValues.getOrElse(
          math.max(1L, df.select(partCols.map(col): _*).distinct().count()))
        val n = nFor(b)
        val perPart = math.max(1L, math.ceil(n.toDouble / nVals).toLong)
        df.repartition(n,
          partCols.map(col) :+ pmod(xxhash64(df.columns.toSeq.map(col): _*), lit(perPart)): _*)
      case (Some(b), cls) =>
        // sized + partitioned + clustered: disjoint cluster ranges per
        // file WITHIN each leaf (see the unsized branch above)
        val n = nFor(b)
        df.repartitionByRange(n, (partCols ++ cls).map(col): _*)
          .sortWithinPartitions((partCols ++ cls).map(col): _*)
    }
  }

  /** Compact a table's files toward `targetFileBytes` per file — the
    * operational companion to the load-time sizing knob: long-lived tables
    * accumulate small files from incremental appends and partition-scoped
    * upserts (every batch adds at least one file per touched partition),
    * and at 100 TB the resulting metadata/seek pressure degrades every
    * subsequent scan. One pass: read, re-shard, atomic-swap rewrite —
    * contents (including ids) are untouched, and a partitioned table keeps
    * its recorded layout (files compact within each partition).
    */
  def compact(tgt: Catalog, table: String, targetFileBytes: Long,
              clusterBy: Seq[String] = Nil): Unit = {
    require(tgt.resolve(table).contains(tgt.dirPath(table)),
      s"table '$table' is not a directory-layout table; nothing to compact")
    val partCols =
      graft.sources.ParquetSource.readPartSpec(tgt.spark, tgt.dirPath(table)).map(_._1)
    // a bucketed table's bucket id is read as the PHYSICAL partition
    // column (cheaper than re-hashing every row) so the rewrite keeps the
    // bucket layout (and its sidecar)
    val bucketSpec =
      graft.sources.ParquetSource.readBucketSpec(tgt.spark, tgt.dirPath(table))
    val ex =
      if (bucketSpec.isDefined)
        graft.sources.ParquetSource.read(tgt.spark, tgt.dirPath(table), keepBucket = true)
      else tgt.table(table)
    // compact + clusterBy = the re-clustering pass: incremental appends land
    // unsorted, a periodic clustered compaction restores the zone-map layout.
    // Output sizing comes from the existing files' FOOTER byte totals and
    // the leaf-partition count from the DIRECTORY listing — both metadata
    // — so compaction reads the table exactly once (either probe would
    // otherwise be a second full scan of the same data).
    // None above the footer-sweep file cap → shard falls back to its
    // aggregation probe (one distributed pass beats 100k serial footers)
    val known = graft.sources.ParquetSource
      .footerTotalByteSize(tgt.spark, tgt.dirPath(table))
    // a bucketed/partitioned table's leaf count comes from the directory
    // names — partCols already includes the physical bucket column for
    // bucketed tables (the recorded partition sidecar)
    val knownVals =
      if (partCols.isEmpty) None
      else {
        val root = new org.apache.hadoop.fs.Path(tgt.dirPath(table))
        val fsys = root.getFileSystem(tgt.spark.sparkContext.hadoopConfiguration)
        Some(math.max(1L, leafPartDirs(fsys, root, partCols.size).size.toLong))
      }
    writeAtomic(tgt, table,
      shard(ex, Some(targetFileBytes), partCols, clusterBy,
        knownTotalBytes = known, knownPartValues = knownVals),
      partCols, bucketSpec, Some(targetFileBytes))
  }

  /** OPTIMIZE ZORDER BY: rewrite a table's files in Morton (z-value) order
    * over `cols`, so every file is simultaneously local in EVERY listed
    * dimension and parquet min/max stats prune files for predicates on ANY
    * of them — where [[compact]]+`clusterBy` gives only the leading column
    * pruning power. Like the real systems' ZORDER, this is a COMPACTION
    * (done periodically), not a per-load knob: loads append fast, the
    * re-layout pass restores multi-dimensional locality. Contents
    * (including ids) are untouched; partitioned/bucketed tables z-order
    * within their recorded layout.
    */
  def compactZOrder(tgt: Catalog, table: String, targetFileBytes: Long,
                    cols: Seq[String], bitsPerCol: Int = 10): Unit = {
    require(tgt.resolve(table).contains(tgt.dirPath(table)),
      s"table '$table' is not a directory-layout table; nothing to compact")
    val partCols =
      graft.sources.ParquetSource.readPartSpec(tgt.spark, tgt.dirPath(table)).map(_._1)
    val bucketSpec =
      graft.sources.ParquetSource.readBucketSpec(tgt.spark, tgt.dirPath(table))
    val ex =
      if (bucketSpec.isDefined)
        graft.sources.ParquetSource.read(tgt.spark, tgt.dirPath(table), keepBucket = true)
      else tgt.table(table)
    val z = graft.operators.ZOrder.zValue(ex, cols, bitsPerCol)
    // footer-based sizing: one table read total (see compact); None above
    // the file cap → shard's aggregation probe
    val known = graft.sources.ParquetSource
      .footerTotalByteSize(tgt.spark, tgt.dirPath(table))
    val laid = shard(ex.withColumn("__zc", z), Some(targetFileBytes), partCols,
      clusterBy = Seq("__zc"), knownTotalBytes = known).drop("__zc")
    writeAtomic(tgt, table, laid, partCols, bucketSpec, Some(targetFileBytes))
  }

  /** The join-based MERGE shared by the parquet and JDBC sinks: replace
    * existing rows matching on `keys` (ids kept), insert fresh keys with new
    * ids, keep untouched rows, resolve schema under ensure/safe.
    */
  private[etl] def upsertMerged(ex: DataFrame, incoming: DataFrame, keys: Seq[String],
                                maxId: Long, order: Seq[String],
                                ensure: Boolean, safe: Boolean,
                                keyUnique: Boolean = false): DataFrame = {
    // keyUnique: the caller GUARANTEES at most one incoming row per key
    // (e.g. a pre-aggregated state frame keyed by its group columns) — the
    // collapse window (an exchange + sort per statement) is then a no-op
    // and is skipped. Semantics are unchanged for a caller that honors the
    // contract; the flag is opt-in and internal callers only.
    val one = if (keyUnique) incoming
      else collapseLastPerKey(incoming, keys, order)
    // Matched rows: join incoming onto the FULL existing row and pick
    // per column — incoming's value where the column exists in incoming
    // (the supplied fields), the existing value otherwise. This mirrors
    // the reference's UPDATE-of-supplied-fields: columns the incoming
    // extract doesn't carry keep their previously-loaded values (the
    // safe=true retention case). Existing duplicates of a key all get
    // updated in place (SQL UPDATE semantics), each keeping its id.
    val inCols = one.columns.toSet
    val renamedIn = one.columns.filterNot(keys.contains).foldLeft(one) {
      (d, c) => d.withColumnRenamed(c, s"__in_$c")
    }
    val joined = ex.join(renamedIn, keys, "inner")
    val matchedCols = ex.columns.toIndexedSeq.map { c =>
      if (keys.contains(c) || c == IdCol) col(c)
      else if (inCols.contains(c)) col(s"__in_$c").as(c)
      else col(c)
    } ++ one.columns.filterNot(c => keys.contains(c) || ex.columns.contains(c))
      .toIndexedSeq.map(c => col(s"__in_$c").as(c))
    val matched = joined.select(matchedCols: _*)
    // fresh keys get new ids (deterministic order among themselves)
    val fresh = withSurrogateIds(
      one.join(ex.select(keys.map(col): _*), keys, "left_anti"),
      maxId, order)
    // untouched existing rows survive as-is
    val kept = ex.join(one.select(keys.map(col): _*), keys, "left_anti")
    // schema evolution resolves against INCOMING's column set (fresh =
    // id + incoming columns), not matched's widened set — otherwise
    // safe=false could never narrow on the upsert path.
    val target = finalSchema(ex, fresh, ensure, safe)
    unionAligned(Seq(kept, matched, fresh), target)
  }

  /** The reference's sequential per-row upsert converges to one row per
    * key: later incoming rows overwrite earlier ones. Collapse incoming
    * to the LAST row per key under the deterministic insertion order
    * (ties broken by the remaining columns) before any matched/fresh
    * split, so duplicate keys can't multiply a join — shared by the
    * copy-on-write merge and the merge-on-read upsert. */
  private[etl] def collapseLastPerKey(incoming: DataFrame, keys: Seq[String],
                                      order: Seq[String]): DataFrame = {
    val tieBreak = (order ++ incoming.columns.filterNot(order.contains)).distinct
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tieBreak.map(c => col(c).desc_nulls_last): _*)
    incoming.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Stamp a surrogate `id` = startId + 1-based rank under `orderCols`.
    * Distributed range sort, then per-partition index offsets — no global
    * single-partition bottleneck (SURVEY.md §7.5 item 2). The stamp stays
    * in the UNSAFE row representation end-to-end
    * ([[org.apache.spark.sql.graft.RowIdStamp]]): the old `.rdd` path
    * deserialized every row to a boxed `Row` and re-encoded it — the
    * boxing, not the RDD node, was the cost on every load. */
  def withSurrogateIds(df: DataFrame, startId: Long, orderCols: Seq[String]): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    org.apache.spark.sql.graft.RowIdStamp.zipWithIds(sorted, startId, IdCol)
  }

  /** Same column names and types in the same order (nullability ignored —
    * parquet reads surface everything nullable). */
  private[etl] def sameShape(a: StructType, b: StructType): Boolean =
    a.length == b.length && a.fields.zip(b.fields).forall { case (x, y) =>
      x.name == y.name && x.dataType == y.dataType
    }

  /** Resolve the post-load schema from existing + incoming under
    * ensure/safe (S3/S4). Incoming's type wins for shared column names.
    */
  private[etl] def finalSchema(existing: DataFrame, incomingWithId: DataFrame,
                          ensure: Boolean, safe: Boolean): StructType = {
    val exFields = existing.schema.fields
    val inFields = incomingWithId.schema.fields
    val inByName = inFields.map(f => f.name -> f).toMap
    val exNames = exFields.map(_.name).toSet
    // start from existing order, types overridden by incoming where shared
    var out = exFields.map(f => inByName.getOrElse(f.name, f)).toVector
    if (ensure) out = out ++ inFields.filterNot(f => exNames.contains(f.name))
    if (!safe) {
      val keep = inByName.keySet + IdCol
      out = out.filter(f => keep.contains(f.name))
    }
    // id always first (reference/dataset column convention)
    val (idF, rest) = out.partition(_.name == IdCol)
    StructType(idF ++ rest)
  }

  /** Project each frame onto `target` (missing cols → typed nulls) and union. */
  private[etl] def unionAligned(dfs: Seq[DataFrame], target: StructType): DataFrame = {
    val aligned = dfs.map { df =>
      val have = df.columns.toSet
      df.select(target.fields.toIndexedSeq.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    aligned.reduce(_.unionByName(_))
  }

  /** Write to a temp dir, then swap into place. The plan may lazily read the
    * current table contents; the swap happens only after the full result is
    * durably written.
    *
    * Crash safety: the old table is renamed ASIDE (`.__old-UUID`) before the
    * new dir renames in, and only then deleted — a crash at any point leaves
    * either the old table in place, or the new one, or a recoverable
    * `.__old` sibling (picked up by [[Catalog.resolve]]'s stranded-table
    * recovery). Never a window with no data at all.
    */
  private def writeAtomic(tgt: Catalog, table: String, df: DataFrame,
                          partCols: Seq[String] = Nil,
                          bucketSpec: Option[(Seq[String], Int)] = None,
                          targetFileBytes: Option[Long] = None): Unit = {
    val conf = tgt.spark.sparkContext.hadoopConfiguration
    val finalPath = new org.apache.hadoop.fs.Path(tgt.dirPath(table))
    val uuid = java.util.UUID.randomUUID().toString
    val tmpPath = new org.apache.hadoop.fs.Path(tgt.dirPath(table) + ".__tmp-" + uuid)
    val oldPath = new org.apache.hadoop.fs.Path(tgt.dirPath(table) + ".__old-" + uuid)
    val fs = finalPath.getFileSystem(conf)
    val w = applyBlockSize(df.write.mode(SaveMode.Overwrite), targetFileBytes)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(tmpPath.toString)
    // sidecar lands in the tmp dir BEFORE the swap: a table is never
    // visible without its partitioning record
    if (partCols.nonEmpty)
      graft.sources.ParquetSource.writePartSpec(tgt.spark, tmpPath.toString,
        partCols.map(c => c -> df.schema(c).dataType.catalogString))
    bucketSpec.foreach { case (keys, n) =>
      graft.sources.ParquetSource.writeBucketSpec(tgt.spark, tmpPath.toString, keys, n)
    }
    val hadOld = fs.exists(finalPath)
    if (hadOld && !fs.rename(finalPath, oldPath))
      throw new java.io.IOException(s"could not move old table aside: $finalPath")
    if (!fs.rename(tmpPath, finalPath)) {
      // put the old table back so readers still see a table, then fail
      if (hadOld) fs.rename(oldPath, finalPath)
      throw new java.io.IOException(s"atomic swap failed for $finalPath")
    }
    // If the table previously resolved in single-file layout (name.parquet),
    // that file's rows are already folded into the merged result just
    // written; retire it or Catalog.resolve would keep preferring the stale
    // file over the new dir. (Crash between swap and this delete leaves the
    // consistent OLD data visible; a re-run heals.)
    val fileCopy = new org.apache.hadoop.fs.Path(tgt.filePath(table))
    if (fs.exists(fileCopy)) fs.delete(fileCopy, true) // may be a dir named name.parquet
    cleanupStrays(tgt, table) // this load's .__old plus any from crashed loads
    Catalog.invalidateTable(tgt, table)
    // the read-side schema of a flat/bucketed table is fully determined by
    // what was just written — prime the schema cache so the next open skips
    // the footer-inference job (hive-partitioned layouts keep re-inferring)
    if (partCols.isEmpty)
      graft.sources.ParquetSource.primeSchemaCache(
        tgt.dirPath(table), df.schema, bucketed = false)
    else if (bucketSpec.isDefined && partCols == Seq(BucketCol))
      graft.sources.ParquetSource.primeSchemaCache(
        tgt.dirPath(table), df.schema, bucketed = true)
  }

  /** Write-path recovery: if the table dir is absent but stranded `.__old`
    * snapshots exist (crash inside a previous swap window), rename the
    * NEWEST back into place and drop older strays. Runs only from [[load]]
    * — readers ([[Catalog.resolve]]) serve stranded snapshots without
    * mutating, so a reader can't race a live writer's swap.
    */
  def recoverStranded(tgt: Catalog, table: String): Unit = {
    val conf = tgt.spark.sparkContext.hadoopConfiguration
    val finalPath = new org.apache.hadoop.fs.Path(tgt.dirPath(table))
    val fs = finalPath.getFileSystem(conf)
    if (!fs.exists(finalPath)) {
      tgt.strandedNewest(table).foreach { st =>
        if (!fs.rename(st.getPath, finalPath))
          throw new java.io.IOException(s"could not recover ${st.getPath} -> $finalPath")
      }
    }
    // partition-scoped crash window: a `.__part-` aside may hold the ONLY
    // copy of a partition (live moved aside, new copy not renamed in).
    // Restore any live-missing partition from the NEWEST aside before the
    // strays are deleted below — otherwise cleanup would erase it.
    if (fs.exists(finalPath)) {
      val parent = new org.apache.hadoop.fs.Path(tgt.dir)
      if (fs.exists(parent)) {
        // walk to the LEAF `name=value` dirs (multi-column specs nest) and
        // restore any whose live counterpart is missing
        def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
          val subs = fs.listStatus(p).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          if (subs.isEmpty) Seq(p) else subs.flatMap(st => leaves(st.getPath))
        }
        fs.listStatus(parent)
          .filter(_.getPath.getName.startsWith(table + ".__part-"))
          .sortBy(-_.getModificationTime)
          .foreach { aside =>
            fs.listStatus(aside.getPath)
              .filter(st => st.isDirectory && st.getPath.getName.contains("="))
              .flatMap(st => leaves(st.getPath))
              .foreach { p =>
                val live = new org.apache.hadoop.fs.Path(finalPath,
                  relPath(aside.getPath, p))
                if (!fs.exists(live)) {
                  fs.mkdirs(live.getParent)
                  if (!fs.rename(p, live))
                    throw new java.io.IOException(
                      s"could not restore stranded partition $p -> $live")
                }
              }
          }
      }
    }
    cleanupStrays(tgt, table)
  }

  /** Delete leftover `.__old-`/`.__tmp-` artifacts for `table` (the live
    * table dir, if any, stays). */
  private def cleanupStrays(tgt: Catalog, table: String): Unit = {
    val conf = tgt.spark.sparkContext.hadoopConfiguration
    val parent = new org.apache.hadoop.fs.Path(tgt.dir)
    val fs = parent.getFileSystem(conf)
    if (fs.exists(parent)) {
      fs.listStatus(parent)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith(table + ".__old-") || n.startsWith(table + ".__tmp-") ||
            n.startsWith(table + ".__part-")
        }
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
