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

  private def writeManifest(tgt: Catalog, table: String, v: Long,
                            relFiles: Seq[String]): Unit = {
    val f = fs(tgt, metaDir(tgt, table))
    val md = new Path(metaDir(tgt, table))
    f.mkdirs(md)
    val body = relFiles.sorted.map(r => "\"" + r + "\"").mkString(
      s"""{"version": $v, "files": [""", ", ", "]}")
    val tmp = new Path(md, s"v$v.manifest.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fin = new Path(md, s"v$v.manifest.json")
    if (!f.rename(tmp, fin))
      throw new java.io.IOException(s"manifest commit failed: $fin")
  }

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
    val cur = currentVersion(tgt, table)
    val existing = cur.map(v => readVersion(tgt, table, v))
    val order = if (idOrder.nonEmpty) idOrder else incoming.columns.toSeq
    val maxId: Long = existing match {
      case Some(ex) if ex.columns.contains(Loader.IdCol) =>
        val r = ex.agg(max(col(Loader.IdCol))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
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
    writeManifest(tgt, table, newV, priorRel ++ newRel)
    newV
  }

  /** Logical DELETE: commit a new version containing only the rows NOT
    * matching `cond`. Copy-on-write — the surviving rows are written as a
    * fresh file set; every prior version still reads its own files (the
    * rows are logically gone, physically reclaimed by [[vacuum]] once no
    * retained manifest references them — the retention/erasure split real
    * compliance deletes need). Returns the committed version.
    */
  def delete(tgt: Catalog, table: String, cond: org.apache.spark.sql.Column): Long = {
    val cur = currentVersion(tgt, table).getOrElse(
      throw new IllegalArgumentException(s"versioned table '$table' not found"))
    val out = readVersion(tgt, table, cur).where(!coalesce(cond, lit(false)))
    val uuid = java.util.UUID.randomUUID().toString
    val batch = new Path(dataDir(tgt, table), s"batch-$uuid")
    out.write.mode(SaveMode.Overwrite).parquet(batch.toString)
    val newV = cur + 1L
    writeManifest(tgt, table, newV, partFiles(tgt, table, batch))
    newV
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
    * or updated key, classified by a full-outer self-join of the two
    * snapshots on `keys`. `op` ∈ insert|update|delete; value columns carry
    * the NEW side for insert/update and the OLD side for delete (the row
    * that disappeared). Unchanged keys are omitted. Comparison is
    * null-safe per column. Cost: one join of two manifest scans — the audit
    * never replays load history.
    */
  def changes(tgt: Catalog, table: String, fromV: Long, toV: Long,
              keys: Seq[String]): DataFrame = {
    val a = readVersion(tgt, table, fromV)
    val b = readVersion(tgt, table, toV)
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
    joined.withColumn("op", op).where(col("op").isNotNull)
      .select(col("op") +: outCols: _*)
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
    // stray tmp manifests from crashed commits die here too
    f.listStatus(new Path(metaDir(tgt, table))).toSeq
      .filter(_.getPath.getName.endsWith(".tmp"))
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
