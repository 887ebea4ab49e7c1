package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Manifest-based versioned tables: time travel, O(1) snapshots, and a
  * change-data-feed — the mini table-format layer the big systems (Delta,
  * Iceberg) put under mutable data lakes, rebuilt here on plain parquet +
  * JSON manifests because no table-format jar ships with this Spark.
  *
  * The reference has no versioning at all (every load mutates the target in
  * place, /root/reference/easy_etl/__init__.py:89-99); this is extension
  * scope for the 100 TB story: a pipeline that rewrites a 100 TB table per
  * load cannot keep yesterday's state for audit/rollback by copying it.
  * Manifests make versions METADATA:
  *
  *   - data files are append-only under `<table>.__vdata/batch-<uuid>/`;
  *     nothing ever rewrites a committed file;
  *   - each version is one small JSON manifest under `<table>.__vmeta/`
  *     listing the files visible at that version — an append's new manifest
  *     reuses every prior file (snapshot cost = O(new files), not O(table));
  *   - readers materialize a version by scanning exactly the manifest's
  *     files (Spark reads an explicit file list natively);
  *   - `vacuum` deletes files unreferenced by any retained manifest —
  *     storage reclamation is decoupled from logical deletion.
  *
  * Scale notes: the manifest holds file paths only (a 100 TB table at 1 GB
  * files is a 100k-line JSON — driver-trivial); appends never touch old
  * files; an upsert is a copy-on-write rewrite producing a fully new file
  * set (the partition/bucket-scoped merge variants live in [[Loader]] — this
  * layer's job is version history, and composing the two is future work).
  * Commits are rename-atomic on the manifest file: a crash mid-write leaves
  * a `.tmp` manifest the next load ignores; the data files it references are
  * unreachable garbage removed by the next `vacuum`.
  */
object VersionedTable {

  private def dataDir(tgt: Catalog, table: String) = s"${tgt.dirPath(table)}.__vdata"
  private def metaDir(tgt: Catalog, table: String) = s"${tgt.dirPath(table)}.__vmeta"

  private def fs(tgt: Catalog, p: String) =
    new Path(p).getFileSystem(tgt.spark.sparkContext.hadoopConfiguration)

  /** Versions present, ascending (empty if the table doesn't exist). */
  def versions(tgt: Catalog, table: String): Seq[Long] = {
    val md = new Path(metaDir(tgt, table))
    val f = fs(tgt, metaDir(tgt, table))
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest.json"))
      .map(_.stripPrefix("v").stripSuffix(".manifest.json").toLong)
      .sorted
  }

  def currentVersion(tgt: Catalog, table: String): Option[Long] =
    versions(tgt, table).lastOption

  /** File list of a version's manifest (absolute paths). */
  private def manifestFiles(tgt: Catalog, table: String, v: Long): Seq[String] = {
    val p = new Path(metaDir(tgt, table), s"v$v.manifest.json")
    val f = fs(tgt, metaDir(tgt, table))
    require(f.exists(p), s"table '$table' has no version $v")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // minimal parse of the writer's own format: one "files" array of strings
    val arr = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']'))
    arr.split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty)
      .map(rel => new Path(dataDir(tgt, table), rel).toString)
  }

  /** Attempt to commit version `v`'s manifest — the optimistic-concurrency
    * CAS. Returns false when ANOTHER writer committed `v` first (the caller
    * re-reads the head and retries its merge). Two layers:
    *
    *   - local filesystems: hard-link the fully-written tmp manifest to the
    *     final name — link(2) fails EEXIST ATOMICALLY, so two racing
    *     writers can never both win (a rename would silently overwrite);
    *   - HDFS-like stores: rename, which there fails on an existing
    *     destination; a pre-check narrows the window on stores with
    *     overwriting rename semantics.
    *
    * The tmp name carries a uuid so concurrent writers never clobber each
    * other's staging; strays from crashed commits die in [[vacuum]].
    */
  private def tryCommitManifest(tgt: Catalog, table: String, v: Long,
                                relFiles: Seq[String],
                                maxId: Option[Long]): Boolean = {
    val f = fs(tgt, metaDir(tgt, table))
    val md = new Path(metaDir(tgt, table))
    f.mkdirs(md)
    // max_id is COMMIT METADATA (the Delta-stats idea): the next load reads
    // its id floor from one small JSON instead of scanning the id column of
    // a 100 TB table. It must precede "files" — the minimal parser below
    // locates the files array as the manifest's first '['.
    val head = s"""{"version": $v""" +
      maxId.map(m => s""", "max_id": $m""").getOrElse("")
    val body = relFiles.sorted.map(r => "\"" + r + "\"").mkString(
      head + """, "files": [""", ", ", "]}")
    val fin = new Path(md, s"v$v.manifest.json")
    if (f.exists(fin)) return false
    val tmp = new Path(md,
      s"v$v.manifest.json.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val won =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fin.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else if (f.exists(fin)) false
      else if (f.rename(tmp, fin)) true
      else if (f.exists(fin)) false // raced: the winner landed mid-rename
      else {
        // a rename failure with NO winning manifest is not contention —
        // quota, permissions, a vacuumed tmp. Retrying would re-stage the
        // full batch up to MaxCommitRetries times and then blame a
        // phantom race; surface the real failure immediately.
        f.delete(tmp, false)
        throw new java.io.IOException(
          s"manifest commit rename failed (not a version conflict): $fin")
      }
    if (f.getScheme == "file" || !won) f.delete(tmp, false)
    won
  }

  /** Test seam: invoked once per commit attempt, after the attempt's merge
    * is staged and before its manifest CAS — lets a spec interleave a
    * competing writer deterministically. No-op in production. */
  private[etl] var preCommitHook: () => Unit = () => ()

  private val MaxCommitRetries = 20

  /** The shared optimistic-retry shell: run `attempt` (stage + CAS; None =
    * lost the race) until it commits or the retry budget is spent — ONE
    * copy of the loop for load, delete, and rollback. */
  private def commitWithRetry(table: String, what: String)
                             (attempt: () => Option[Long]): Long = {
    var i = 0
    while (i < MaxCommitRetries) {
      attempt().foreach(v => return v)
      i += 1
    }
    throw new java.io.IOException(
      s"versioned $what on '$table' lost the commit race $MaxCommitRetries times")
  }

  private val MaxIdRe = """"max_id"\s*:\s*(\d+)""".r

  /** The committed max surrogate id of version `v`, if the manifest
    * recorded one (manifests written before this field fall back to an
    * id-column scan at the next load). */
  private def manifestMaxId(tgt: Catalog, table: String, v: Long): Option[Long] = {
    val p = new Path(metaDir(tgt, table), s"v$v.manifest.json")
    val f = fs(tgt, metaDir(tgt, table))
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      MaxIdRe.findFirstMatchIn(txt).map(_.group(1).toLong)
    }
  }

  /** Max of the id column across `absFiles`, from parquet FOOTER column
    * statistics — metadata-only (no row I/O), driver cost O(new files per
    * commit). None (manifest omits max_id; the next load scans) when any
    * populated file lacks usable id stats OR the set holds no rows at all
    * — a fabricated floor of 0 on a bail would reissue ids. Delegates to
    * the shared strict core in
    * [[graft.sources.ParquetSource.footerMaxLongInFiles]]. */
  private def footerMaxId(tgt: Catalog, absFiles: Seq[String]): Option[Long] =
    graft.sources.ParquetSource
      .footerMaxLongInFiles(tgt.spark, absFiles, Loader.IdCol)

  /** Parquet part-files under `dir`, as paths relative to the data dir. */
  private def partFiles(tgt: Catalog, table: String, batchDir: Path): Seq[String] = {
    val f = fs(tgt, dataDir(tgt, table))
    val base = new Path(dataDir(tgt, table)).toUri.getPath.stripSuffix("/")
    f.listStatus(batchDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val p = st.getPath.toUri.getPath
        require(p.startsWith(base + "/"), s"$p not under $base")
        p.substring(base.length + 1)
      }
  }

  /** Load `incoming` as the next version. Append (no `upsertFields`) writes
    * only the new rows and the new manifest references every prior file —
    * O(batch) I/O, O(1) snapshot. With `upsertFields` the merge is
    * copy-on-write: the merged table is written as a fresh file set and the
    * new manifest references only it (prior versions keep reading their own
    * files untouched). Surrogate ids continue across versions. Returns the
    * committed version number.
    */
  def load(tgt: Catalog, table: String, incoming0: DataFrame,
           upsertFields: Seq[String] = Nil, idOrder: Seq[String] = Nil,
           ensure: Boolean = true, safe: Boolean = false): Long = {
    val incoming = if (incoming0.columns.contains(Loader.IdCol))
      incoming0.drop(Loader.IdCol) else incoming0
    // optimistic concurrency: merge against the observed head, stage the
    // batch, CAS the manifest. A lost CAS means another writer committed
    // first — discard the staged files (their ids and merge inputs are
    // stale) and re-merge against the NEW head, so both writers' rows
    // survive as consecutive versions.
    commitWithRetry(table, "load")(() =>
      loadAttempt(tgt, table, incoming, upsertFields, idOrder, ensure, safe))
  }

  /** One optimistic attempt; None = lost the manifest CAS. */
  private def loadAttempt(tgt: Catalog, table: String, incoming: DataFrame,
                          upsertFields: Seq[String], idOrder: Seq[String],
                          ensure: Boolean, safe: Boolean): Option[Long] = {
    Loader.ensureParquetWriteConf(tgt.spark)
    val cur = currentVersion(tgt, table)
    val existing = cur.map(v => readVersion(tgt, table, v))
    val order = if (idOrder.nonEmpty) idOrder else incoming.columns.toSeq
    val maxId: Long = existing match {
      case Some(ex) if ex.columns.contains(Loader.IdCol) =>
        // manifest-recorded id floor first (O(1) metadata); the id-column
        // scan only for pre-max_id manifests
        cur.flatMap(v => manifestMaxId(tgt, table, v)).getOrElse {
          val r = ex.agg(max(col(Loader.IdCol))).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
      case _ => 0L
    }
    val withIds = Loader.withSurrogateIds(incoming, maxId, order)
    val (out, carryPrior): (DataFrame, Boolean) = existing match {
      case None => (withIds, false)
      case Some(ex) if upsertFields.nonEmpty =>
        (Loader.upsertMerged(ex, incoming, upsertFields, maxId, order, ensure, safe),
          false)
      case Some(ex) =>
        if (Loader.sameShape(Loader.finalSchema(ex, withIds, ensure, safe), ex.schema)
          && Loader.sameShape(withIds.schema, ex.schema))
          (withIds, true) // pure append: prior files stay valid as-is
        else
          // schema evolution: rewrite so every file carries the new schema
          (Loader.unionAligned(Seq(ex, withIds),
            Loader.finalSchema(ex, withIds, ensure, safe)), false)
    }
    val uuid = java.util.UUID.randomUUID().toString
    val batch = new Path(dataDir(tgt, table), s"batch-$uuid")
    out.write.mode(SaveMode.Overwrite).parquet(batch.toString)
    val newRel = partFiles(tgt, table, batch)
    val newV = cur.getOrElse(0L) + 1L
    val base = new Path(dataDir(tgt, table)).toUri.getPath.stripSuffix("/")
    val priorRel: Seq[String] =
      if (carryPrior) manifestFiles(tgt, table, cur.get).map { abs =>
        val p = new Path(abs).toUri.getPath
        p.substring(base.length + 1)
      } else Nil
    // the committed version's max id, from the new files' footer stats
    // (metadata-only): an append combines with the carried-over floor, a
    // rewrite's file set holds every live id already
    val newAbs = newRel.map(r => new Path(dataDir(tgt, table), r).toString)
    val committedMax = footerMaxId(tgt, newAbs)
      .map(m => if (carryPrior) math.max(m, maxId) else m)
    preCommitHook()
    if (tryCommitManifest(tgt, table, newV, priorRel ++ newRel, committedMax))
      Some(newV)
    else {
      // lost the race: the staged batch references a superseded head —
      // remove it (a crash before this delete leaves unreachable files for
      // vacuum, same as any crashed commit)
      fs(tgt, dataDir(tgt, table)).delete(batch, true)
      None
    }
  }

  /** Logical DELETE: commit a new version containing only the rows NOT
    * matching `cond`. Copy-on-write — the surviving rows are written as a
    * fresh file set; every prior version still reads its own files (the
    * rows are logically gone, physically reclaimed by [[vacuum]] once no
    * retained manifest references them — the retention/erasure split real
    * compliance deletes need). Returns the committed version.
    */
  def delete(tgt: Catalog, table: String, cond: org.apache.spark.sql.Column): Long = {
    Loader.ensureParquetWriteConf(tgt.spark)
    commitWithRetry(table, "delete") { () =>
      val cur = currentVersion(tgt, table).getOrElse(
        throw new IllegalArgumentException(s"versioned table '$table' not found"))
      val out = readVersion(tgt, table, cur).where(!coalesce(cond, lit(false)))
      val uuid = java.util.UUID.randomUUID().toString
      val batch = new Path(dataDir(tgt, table), s"batch-$uuid")
      out.write.mode(SaveMode.Overwrite).parquet(batch.toString)
      val newV = cur + 1L
      val rel = partFiles(tgt, table, batch)
      val newAbs = rel.map(r => new Path(dataDir(tgt, table), r).toString)
      preCommitHook()
      if (tryCommitManifest(tgt, table, newV, rel, footerMaxId(tgt, newAbs)))
        Some(newV)
      else {
        fs(tgt, dataDir(tgt, table)).delete(batch, true)
        None
      }
    }
  }

  /** O(1) metadata ROLLBACK: commit a NEW head version whose file list is
    * exactly version `v`'s — no data is read, copied, or rewritten, so
    * undoing a bad load on a 100 TB table costs one small JSON commit.
    * History is preserved: the rolled-back-over versions stay readable
    * (and vacuumable) like any others, and the audit trail shows the
    * rollback as its own version rather than pretending it never
    * happened. The id floor carries over from `v`'s manifest (or its
    * files' footer stats), so a later load continues ids from the
    * restored state. Same optimistic CAS as [[load]]. Returns the new
    * head version.
    */
  def rollback(tgt: Catalog, table: String, v: Long): Long =
    commitWithRetry(table, "rollback") { () =>
      val cur = currentVersion(tgt, table).getOrElse(
        throw new IllegalArgumentException(s"versioned table '$table' not found"))
      require(versions(tgt, table).contains(v),
        s"table '$table' has no version $v to roll back to")
      if (v == cur) Some(cur) // already there: nothing to commit
      else {
        val abs = manifestFiles(tgt, table, v)
        val base = new Path(dataDir(tgt, table)).toUri.getPath.stripSuffix("/")
        val rel = abs.map { a =>
          val p = new Path(a).toUri.getPath
          p.substring(base.length + 1)
        }
        val maxId = manifestMaxId(tgt, table, v).orElse(footerMaxId(tgt, abs))
        preCommitHook()
        if (tryCommitManifest(tgt, table, cur + 1, rel, maxId)) Some(cur + 1)
        else None
      }
    }

  /** Absolute data-file paths version `v` references (audit/spec surface:
    * an append's manifest is a superset of its parent's — files shared, not
    * rewritten). */
  def files(tgt: Catalog, table: String, v: Long): Seq[String] =
    manifestFiles(tgt, table, v)

  /** Read the latest version. */
  def read(tgt: Catalog, table: String): DataFrame =
    readVersion(tgt, table, currentVersion(tgt, table).getOrElse(
      throw new IllegalArgumentException(s"versioned table '$table' not found")))

  /** Time travel: materialize exactly the files version `v` committed. */
  def readVersion(tgt: Catalog, table: String, v: Long): DataFrame = {
    val files = manifestFiles(tgt, table, v)
    require(files.nonEmpty, s"version $v of '$table' lists no files")
    tgt.spark.read.parquet(files: _*)
  }

  /** Change-data-feed between two versions: one row per inserted, deleted,
    * or updated key, classified by a full-outer self-join on `keys`.
    * `op` ∈ insert|update|delete; value columns carry the NEW side for
    * insert/update and the OLD side for delete (the row that disappeared).
    * Unchanged keys are omitted. Comparison is null-safe per column.
    *
    * FILE-LEVEL PRUNING — the property that makes this a CDC primitive at
    * 100 TB rather than an audit query: data files are immutable once
    * committed, so a file present in BOTH manifests contributes identical
    * rows to both snapshots and can never produce a feed row. The diff
    * therefore scans only the files the two manifests DON'T share — for an
    * append version pair that is exactly the appended batch, O(delta) I/O
    * against a table of any size (copy-on-write rewrites still diff their
    * full file sets, as they must — every file changed).
    *
    * Soundness requires each snapshot to carry at most one row per key
    * tuple (the loader upsert invariant): a duplicate key split across a
    * shared and a non-shared file would make the pruned join see only half
    * its rows. Cost: one join of two file-pruned scans — the audit never
    * replays load history.
    */
  def changes(tgt: Catalog, table: String, fromV: Long, toV: Long,
              keys: Seq[String]): DataFrame =
    changes(tgt, table, fromV, toV, keys, includeOld = false)

  /** As above; `includeOld = true` additionally emits every non-key value
    * column's OLD-side value as `<col>__old` (null for inserts) — the
    * retraction information downstream incremental consumers need (e.g.
    * [[MaterializedAgg.applyChanges]] subtracts the old contribution of an
    * update before adding the new one). */
  def changes(tgt: Catalog, table: String, fromV: Long, toV: Long,
              keys: Seq[String], includeOld: Boolean): DataFrame = {
    val filesA = manifestFiles(tgt, table, fromV)
    val filesB = manifestFiles(tgt, table, toV)
    val (setA, setB) = (filesA.toSet, filesB.toSet)
    val onlyA = filesA.filterNot(setB)
    val onlyB = filesB.filterNot(setA)
    // a side with no unshared files contributes no candidate rows; an
    // empty LOCAL relation with the side's schema (one footer read, zero
    // data I/O — a limit(0) parquet scan would still mount the file)
    def side(only: Seq[String], all: Seq[String]): DataFrame =
      if (only.nonEmpty) tgt.spark.read.parquet(only: _*)
      else tgt.spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        tgt.spark.read.parquet(all.head).schema)
    val a = side(onlyA, filesA)
    val b = side(onlyB, filesB)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      "change feed requires the two versions to share a schema")
    val valCols = b.columns.toSeq.filterNot(keys.contains)
    val aR = a.columns.foldLeft(a)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"__a_$c"))
    val joined = aR.join(b, keys, "full_outer")
    // presence flags: a full-outer join nulls every non-key column of the
    // absent side; use the id column (never null in a loaded table) as the
    // unambiguous presence marker
    require(a.columns.contains(Loader.IdCol),
      "change feed expects loader-stamped tables (id column present)")
    val presentA = col(s"__a_${Loader.IdCol}").isNotNull
    val presentB = col(Loader.IdCol).isNotNull
    val changed = valCols.map(c => !(col(s"__a_$c") <=> col(c))).reduce(_ || _)
    val op = when(!presentA, lit("insert"))
      .when(!presentB, lit("delete"))
      .when(changed, lit("update"))
    val outCols = keys.map(col) ++
      b.columns.toSeq.filterNot(keys.contains).map { c =>
        when(presentB, col(c)).otherwise(col(s"__a_$c")).as(c)
      }
    val oldCols =
      if (!includeOld) Nil
      else b.columns.toSeq.filterNot(keys.contains).map { c =>
        when(presentA, col(s"__a_$c")).as(s"${c}__old")
      }
    joined.withColumn("op", op).where(col("op").isNotNull)
      .select(col("op") +: (outCols ++ oldCols): _*)
  }

  /** Drop manifests older than the newest `keepLast` versions and delete
    * every data file no retained manifest references. Returns the number of
    * files deleted. Storage reclamation for the append-only file store —
    * after this, time travel reaches only the retained versions.
    */
  def vacuum(tgt: Catalog, table: String, keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least the current version")
    val vs = versions(tgt, table)
    val keep = vs.takeRight(keepLast)
    val drop = vs.dropRight(keepLast)
    val f = fs(tgt, metaDir(tgt, table))
    val referenced: Set[String] =
      keep.flatMap(v => manifestFiles(tgt, table, v))
        .map(r => new Path(r).toUri.getPath).toSet
    drop.foreach { v =>
      f.delete(new Path(metaDir(tgt, table), s"v$v.manifest.json"), false)
    }
    // stray tmp manifests from crashed commits die here too (uuid-suffixed
    // staging names from the CAS path included)
    f.listStatus(new Path(metaDir(tgt, table))).toSeq
      .filter(_.getPath.getName.contains(".manifest.json.tmp"))
      .foreach(st => f.delete(st.getPath, false))
    val dd = new Path(dataDir(tgt, table))
    var removed = 0
    if (f.exists(dd)) {
      f.listStatus(dd).toSeq.filter(_.isDirectory).foreach { batch =>
        f.listStatus(batch.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .foreach { st =>
            if (!referenced.contains(st.getPath.toUri.getPath)) {
              f.delete(st.getPath, false); removed += 1
            }
          }
        if (f.listStatus(batch.getPath).isEmpty) f.delete(batch.getPath, true)
      }
    }
    removed
  }
}
