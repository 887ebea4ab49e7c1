package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named-table namespace an [[EtlProcess]] can read dimension/target
  * tables from — the surface the reference uses its `write_db` connection
  * for (load target, link lookups, incremental MAX — easy_etl/__init__.py:
  * 42, 80-82, 130). Implementations: [[Catalog]] (parquet directory) and
  * [[JdbcCatalog]] (a SQL database via JDBC, the reference's actual target
  * type). */
trait TableStore {
  def spark: SparkSession
  def table(name: String): DataFrame
  def tableIfExists(name: String): Option[DataFrame]
}

/** A "database" backed by a directory of parquet tables.
  *
  * Mirrors the reference's two-connection model (source DB for extract,
  * target DB for load + link lookups — /root/reference/easy_etl/__init__.py:8-10)
  * as two directory-backed namespaces sharing one SparkSession.
  *
  * Layout conventions:
  *   - `dir/<name>.parquet` — a single parquet file (the driver testdata layout,
  *     /root/repo/TESTDATA.md:13-16), read-only source tables.
  *   - `dir/<name>` — a parquet directory written by [[Loader]] (target tables).
  *
  * At cluster scale each catalog is just a path prefix on a distributed FS;
  * nothing here assumes a local filesystem except the existence checks, which
  * go through the Hadoop FileSystem API.
  */
class Catalog(val spark: SparkSession, val dir: String) extends TableStore {

  private def fs = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  /** Path for a source-style single-file table, if present. */
  def filePath(name: String): String = s"$dir/$name.parquet"

  /** Path for a target-style directory table (what [[Loader]] writes). */
  def dirPath(name: String): String = s"$dir/$name"

  def exists(name: String): Boolean = {
    val f = fs
    f.exists(new org.apache.hadoop.fs.Path(filePath(name))) ||
      f.exists(new org.apache.hadoop.fs.Path(dirPath(name)))
  }

  /** Resolve a table to the path that exists (file layout wins). If the
    * table is absent but a stranded `.__old-UUID` sibling exists (a crash
    * between [[Loader]]'s rename-aside and rename-in), return the NEWEST
    * stranded snapshot's path for reading. Reads never mutate the
    * filesystem — a reader renaming during another writer's swap window
    * could destroy a completed load; actual recovery (rename back into
    * place) happens on the write path only ([[Loader.recoverStranded]]).
    */
  def resolve(name: String): Option[String] = {
    val f = fs
    if (f.exists(new org.apache.hadoop.fs.Path(filePath(name)))) Some(filePath(name))
    else if (f.exists(new org.apache.hadoop.fs.Path(dirPath(name)))) Some(dirPath(name))
    else strandedNewest(name).map(_.getPath.toString)
  }

  /** Newest stranded `.__old-UUID` snapshot for `name`, if any. */
  private[etl] def strandedNewest(name: String): Option[org.apache.hadoop.fs.FileStatus] = {
    val f = fs
    val parent = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(parent)) None
    else f.listStatus(parent)
      .filter(_.getPath.getName.startsWith(name + ".__old-"))
      .sortBy(-_.getModificationTime)
      .headOption
  }

  def table(name: String): DataFrame =
    graft.sources.ParquetSource.read(spark, resolve(name).getOrElse(
      throw new IllegalArgumentException(s"table '$name' not found in $dir")))

  def tableIfExists(name: String): Option[DataFrame] =
    resolve(name).map(graft.sources.ParquetSource.read(spark, _))

  /** List table names present in the directory. */
  def tableNames(): Seq[String] = {
    val f = fs
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map { st =>
      val n = st.getPath.getName
      if (n.endsWith(".parquet")) n.stripSuffix(".parquet") else n
    }.filterNot(_.startsWith("_")).filterNot(_.startsWith("."))
      .filterNot(_.contains(".__tmp-"))
      // a stranded snapshot still names a readable table (resolve() serves
      // it), so surface the base name instead of hiding it
      .map(n => if (n.contains(".__old-")) n.substring(0, n.indexOf(".__old-")) else n)
      .distinct.sorted
  }

  /** Register every table as a temp view so raw-SQL extracts
    * (reference E1/E2, easy_etl/__init__.py:17-25) resolve by name.
    * Views are session-scoped; re-registering replaces. Parquet scans behind
    * these views get Catalyst filter pushdown + column pruning for free.
    *
    * Registration is cached per (session, dir, prefix): repeated calls —
    * every query in a suite registers the same source dir — would otherwise
    * re-read every table's footer each time. Pass `refresh = true` after
    * adding tables to the directory (source dirs are normally immutable).
    */
  /** Register `names` as EXTERNAL parquet tables in the session catalog and
    * ANALYZE them (table-level row counts + per-column min/max/NDV from
    * `statsColumns`), feeding Catalyst's cost-based optimizer. A temp view
    * ([[registerViews]]) carries only a file-size estimate — a FILTERED
    * huge dimension keeps its full-table size, so the planner can never
    * see that the filtered side fits under
    * `spark.sql.autoBroadcastJoinThreshold`, and at 100× scale every such
    * join degrades to a shuffle. With column stats, filter cardinality
    * estimation shrinks the build side and the join flips to broadcast
    * (asserted in StatsPlanningSpec). Pair with [[Catalog.enableCbo]].
    *
    * Cost: ANALYZE scans each table once at registration — amortized over
    * every query planned against it.
    */
  def registerWithStats(names: Seq[String],
                        statsColumns: Map[String, Seq[String]] = Map.empty,
                        prefix: String = ""): Unit = {
    names.foreach { n =>
      val tbl = prefix + n
      val path = resolve(n).getOrElse(
        throw new IllegalArgumentException(s"table '$n' not found in $dir"))
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      spark.catalog.createTable(tbl, path, "parquet")
      spark.sql(s"ANALYZE TABLE `$tbl` COMPUTE STATISTICS")
      statsColumns.get(n).filter(_.nonEmpty).foreach { cols =>
        spark.sql(s"ANALYZE TABLE `$tbl` COMPUTE STATISTICS FOR COLUMNS " +
          cols.map(c => s"`$c`").mkString(", "))
      }
    }
  }

  /** Materialize `name` as a BUCKETED managed table (hash-bucketed on
    * `bucketCols` into `numBuckets` files per partition, optionally sorted
    * within buckets) and return its catalog name. Two tables bucketed on
    * their join key with the SAME bucket count join WITHOUT a shuffle —
    * each task zips bucket i with bucket i (plan-asserted in
    * BucketedJoinSpec). The 100 TB co-location story: pay one shuffle at
    * layout time, then every fact⋈dim or fact⋈fact repeat join on that
    * key is exchange-free. Bucket pruning additionally skips files on
    * equality predicates over the bucket column.
    */
  def registerBucketed(name: String, bucketCols: Seq[String], numBuckets: Int,
                       sortCols: Seq[String] = Nil,
                       tableName: String = ""): String = {
    require(bucketCols.nonEmpty && numBuckets > 0)
    val tbl = if (tableName.nonEmpty) tableName else s"${name}_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    val w = table(name).write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tbl)
    tbl
  }

  def registerViews(prefix: String = "", refresh: Boolean = false): Unit = {
    val sessionKey = (spark.sparkContext.applicationId, spark.hashCode())
    val names = tableNames()
    // temp views are a session-global namespace: the cache tracks which DIR
    // currently owns each view name, so a second catalog re-pointing an
    // overlapping name invalidates (and re-registers) rather than letting
    // the first catalog's cached no-op serve the wrong directory's data
    val stale = refresh || names.exists { n =>
      Catalog.viewOwner.get((sessionKey, prefix + n)) != dir
    }
    if (stale) {
      names.foreach { n =>
        tableIfExists(n).foreach(_.createOrReplaceTempView(prefix + n))
        Catalog.viewOwner.put((sessionKey, prefix + n), dir)
      }
    }
  }
}

object Catalog {

  /** Turn on cost-based optimization for the session: plan costs, join
    * reordering, and star-schema detection all read the statistics that
    * [[Catalog.registerWithStats]] populates. Off by default in Spark —
    * without stats CBO is a no-op, and with it graft's analyzed catalogs
    * get selectivity-aware broadcast/ordering decisions. */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
  }

  private val viewOwner =
    new java.util.concurrent.ConcurrentHashMap[((String, Int), String), String]()

  /** Drop the registration cache for every view owned by `dir`. Called from
    * the write path ([[Loader]]) after a table under `dir` is rewritten or
    * appended to: a temp view pins the parquet file listing captured at
    * creation, so after an atomic swap (old files deleted) a cached view
    * serves stale data or FileNotFoundException. Invalidation forces the
    * next registerViews over that dir to re-create its views.
    */
  private[etl] def invalidateDir(dir: String): Unit = {
    val it = viewOwner.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue == dir) it.remove()
    // schema evolution must re-infer on the next open
    graft.sources.ParquetSource.invalidateSchemaCache(dir)
  }

  /** Table-scoped variant for the write paths: view registrations are still
    * evicted catalog-wide (a view's plan may join several tables of the
    * dir), but the schema/sidecar caches drop ONLY the written table's two
    * layouts (dir + single-file twin) — a multi-table statement keeps every
    * OTHER table's cached metadata instead of re-inferring the whole
    * catalog after each write. */
  private[etl] def invalidateTable(tgt: Catalog, table: String): Unit = {
    val it = viewOwner.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue == tgt.dir) it.remove()
    graft.sources.ParquetSource.invalidateSchemaCache(tgt.dirPath(table))
    graft.sources.ParquetSource.invalidateSchemaCache(tgt.filePath(table))
  }
}
