package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.operators.AsOfJoin

/** The reference's pipeline API (exit99/easy-etl `ETLProcess`,
  * /root/reference/easy_etl/__init__.py:7-106), re-expressed Spark-first.
  *
  * Staging calls only RECORD work; everything executes at [[load]] — which is
  * exactly Spark's lazy model, so "staging" builds a logical plan and `load`
  * triggers one distributed write (reference README.md:15-16).
  *
  * Stage order within a load (authoritative, easy_etl/__init__.py:101-106):
  * extract → middleware → types → transforms → links → ignore → write.
  *
  * Deliberate fixes of reference bugs, per documented intent
  * (SURVEY.md §2.1/§7.5 item 7):
  *   - `link(..., name=None)` defaults the output column to `field`
  *     (the reference stores it under the literal key `None`).
  *   - upsert honors `ensure` (the reference drops it on the upsert path).
  */
class EtlProcess(val src: Catalog, val tgt: TableStore, val writeTableName: String) {

  private var extractThunk: Option[() => DataFrame] = None
  private var types: Map[String, DataType] = Map.empty
  private var writePkField: Option[String] = None
  private val pipeline = new TransformPipeline
  private var middlewares: Vector[DataFrame => DataFrame] = Vector.empty
  private var links: Vector[LinkSpec] = Vector.empty
  private var ignored: Vector[String] = Vector.empty

  /** Deterministic insertion order for surrogate ids (see [[Loader.load]]);
    * a distributed engine must pick an explicit total order where the
    * reference relied on source-DB result order. */
  var idOrder: Seq[String] = Seq.empty

  /** Opt-in parquet output sizing (see [[Loader.load]]): each written file
    * targets ≈ this many bytes of row data. Ignored by JDBC targets. */
  var targetFileBytes: Option[Long] = None

  /** Opt-in Hive-partitioned target layout (see [[Loader.load]]): upserts
    * whose keys include the partition column rewrite only the partitions
    * the batch touches. Ignored by JDBC targets. */
  var partitionBy: Seq[String] = Seq.empty

  /** Opt-in range-clustered file layout (see [[Loader.load]]): written
    * files cover disjoint ranges of these columns (zone-map layout), so
    * range scans skip whole files. Ignored by JDBC targets. */
  var clusterBy: Seq[String] = Seq.empty

  /** Opt-in hash-bucketed target layout (see [[Loader.load]]): (key
    * columns, bucket count). Upserts whose keys cover the bucket keys
    * rewrite only the touched buckets — the partition-scoped merge for
    * tables with no natural partition column. Ignored by JDBC targets. */
  var bucketBy: Option[(Seq[String], Int)] = None

  /** S6: progress reporting — the reference's VERBOSE/tqdm loop
    * (easy_etl/__init__.py:33-40). A Spark load is one distributed job, so
    * progress is per-phase row counts rather than a per-row bar. Off by
    * default (the counts cost one extra action per load); enable with env
    * `GRAFT_VERBOSE=1` or by setting [[verbose]]. [[progress]] is the sink
    * (stderr by default — swap in a collector for tests).
    */
  var verbose: Boolean =
    sys.env.get("GRAFT_VERBOSE").exists(v => v == "1" || v.equalsIgnoreCase("true"))
  var progress: String => Unit = m => Console.err.println(s"[graft] $m")
  private def report(msg: => String): Unit = if (verbose) progress(msg)

  private def spark: SparkSession = src.spark

  private case class LinkSpec(field: String, target: String, tableName: String,
                              childField: String, name: Option[String],
                              method: Option[String]) // None = exact

  // ---- extract (E1–E5) ---------------------------------------------------

  /** Stage a SQL extract against the source catalog. `sqlOrPath` ending in
    * `.sql` is read as a file (E2). With `writePkField`, the SQL must contain
    * a single `{}` placeholder, substituted with `max(pk)` of the target
    * table (0 if absent/empty) — the reference's incremental watermark (E4,
    * easy_etl/__init__.py:77-87). Only the most recent extract wins
    * (README.md:43).
    */
  def extract(sqlOrPath: String, writePkField: Option[String] = None,
              types: Map[String, DataType] = Map.empty): this.type = {
    val sql =
      if (sqlOrPath.endsWith(".sql"))
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sqlOrPath)),
          java.nio.charset.StandardCharsets.UTF_8)
      else sqlOrPath
    this.types = types
    this.writePkField = writePkField
    this.extractThunk = Some(() => {
      src.registerViews()
      // MySQL-dialect shim (the reference's source dialect): rewrites the
      // comma LIMIT form; a query that already parses is never changed
      spark.sql(MySqlDialect.rewrite(resolveIncremental(sql, sparkDialect = true)))
    })
    this
  }

  /** The incremental-watermark substitution shared by SQL and JDBC
    * extracts: with [[writePkField]] staged, the single `{}` placeholder is
    * replaced by max(pk) of the target table. Single-placeholder
    * substitution, NOT full format: literal braces elsewhere in the SQL
    * (JSON etc.) stay intact (SURVEY §7.5 item 4). */
  private def resolveIncremental(sql: String, sparkDialect: Boolean): String =
    writePkField match {
      case Some(pk) =>
        val last: String = tgt.tableIfExists(writeTableName) match {
          // case-insensitive: JDBC sources (Derby, Oracle, ...) uppercase
          // unquoted identifiers, and Spark's analyzer resolves max(col(pk))
          // case-insensitively anyway — the existence check must agree with it
          case Some(t) if t.columns.exists(_.equalsIgnoreCase(pk)) =>
            val resolved = t.columns.find(_.equalsIgnoreCase(pk)).get
            footerWatermarkLiteral(t, resolved)
              .getOrElse(watermarkLiteral(t, resolved, sparkDialect))
          case _ => "0"
        }
        val i = sql.indexOf("{}")
        require(i >= 0, "incremental extract SQL needs a {} placeholder")
        sql.substring(0, i) + last + sql.substring(i + 2)
      case None => sql
    }

  /** Typed SQL-literal rendering of `max(pk)` — the reference substitutes
    * whatever value the driver returned, of ANY type, via `str.format`
    * (easy_etl/__init__.py:80-87), so date/string/timestamp watermarks must
    * work too (a long-only cast silently nulled them). Timestamps render
    * through Spark's own `date_format` (micro precision, session timezone)
    * so the literal round-trips exactly. String literals are quote-escaped;
    * `sparkDialect` additionally doubles backslashes (Spark SQL string
    * literals process escape sequences; Derby/Postgres take backslashes
    * literally — for MySQL pushdown set sql_mode NO_BACKSLASH_ESCAPES or
    * avoid backslash-bearing string pks). A NULL max (present-but-empty
    * table) renders as a typed floor — epoch/empty-string — so the extract
    * sees everything, mirroring the reference's `or last_pk` fallback
    * without a type-mismatched predicate.
    */
  /** Footer-statistics fast path for the watermark: parquet targets answer
    * `max(pk)` from metadata instead of a column scan — for a 100 TB
    * target the per-extract probe drops from O(table) to O(files). Only
    * for FIXED-WIDTH pk types (integral, timestamp, date): parquet may
    * truncate-and-increment BINARY statistics, so a string max stat can be
    * a value that is not in the data — rendering it as the watermark would
    * silently skip rows. Falls back (None) for non-parquet stores,
    * missing stats, too many files, or empty tables.
    */
  private[etl] def footerWatermarkLiteral(t: DataFrame, pk: String): Option[String] = {
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType,
      ShortType, TimestampNTZType, TimestampType}
    // versioned targets have no single directory — their footer probe
    // walks the HEAD MANIFEST's file list (same strict stats core);
    // timestamp pks fall to the scan there (the annotation reader is
    // path-based), integral/date pks stay metadata-only
    val (path, verFiles): (Option[String], Option[Seq[String]]) = tgt match {
      case v: VersionedCatalog =>
        (None, VersionedTable.currentVersion(v, writeTableName)
          .map(ver => VersionedTable.files(v, writeTableName, ver)))
      case c: Catalog => (c.resolve(writeTableName), None)
      case _ => return None // JDBC targets: the database's own MAX is indexed
    }
    def statMax: Option[Long] = verFiles match {
      case Some(fs) =>
        graft.sources.ParquetSource.footerMaxLongInFiles(spark, fs, pk)
      case None => path.flatMap(p =>
        graft.sources.ParquetSource.footerMaxLong(spark, p, pk))
    }
    t.schema(pk).dataType match {
      case LongType | IntegerType | ShortType =>
        statMax.map(String.valueOf)
      case TimestampType | TimestampNTZType =>
        // The stat is a raw long in whatever unit AND frame the FILE's
        // annotation declares — which the surfaced Spark type no longer
        // reveals (ParquetSource.read normalizes NTZ to TimestampType), so
        // read the annotation itself. Adjusted-to-UTC micros are an
        // instant: render in the session zone, the exact string
        // date_format produces. NTZ micros are wall-clock: render as-is
        // (the boundary cast reinterprets the wall-clock in the session
        // zone, and date_format maps it straight back — zone-free). Any
        // other unit (millis/nanos writers) or a missing annotation
        // (INT96): no metadata answer, scan.
        path.flatMap(p => graft.sources.ParquetSource
          .timestampAnnotation(spark, p, pk)) match {
          case Some((adjustedUtc, "MICROS")) =>
            statMax.map { us =>
              val ldt =
                if (adjustedUtc) {
                  val zone = java.time.ZoneId.of(spark.conf.get(
                    "spark.sql.session.timeZone",
                    java.util.TimeZone.getDefault.getID))
                  java.time.Instant.EPOCH
                    .plus(us, java.time.temporal.ChronoUnit.MICROS)
                    .atZone(zone).toLocalDateTime
                } else java.time.LocalDateTime.ofEpochSecond(
                  Math.floorDiv(us, 1000000L),
                  (Math.floorMod(us, 1000000L) * 1000L).toInt,
                  java.time.ZoneOffset.UTC)
              "TIMESTAMP '" + ldt.format(java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")) + "'"
            }
          case _ => None
        }
      case DateType =>
        statMax.map(days => "DATE '" + java.time.LocalDate.ofEpochDay(days) + "'")
      case _ => None // strings (truncatable stats), decimals, etc.: scan
    }
  }

  private[etl] def watermarkLiteral(t: DataFrame, pk: String, sparkDialect: Boolean): String = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
    t.schema(pk).dataType match {
      // NTZ reaches here only from stores that bypass ParquetSource's
      // boundary normalization (e.g. a JDBC catalog surfacing
      // timestamp-without-tz). Same micro-precision rendering — an
      // unquoted fallthrough would splice `2024-01-14 23:59:59` bare into
      // the SQL template (PARSE_SYNTAX_ERROR at the space).
      case TimestampType | TimestampNTZType =>
        val r = t.agg(date_format(max(col(pk)), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head()
        if (r.isNullAt(0)) "TIMESTAMP '1970-01-01 00:00:00'"
        else s"TIMESTAMP '${r.getString(0)}'"
      case DateType =>
        val r = t.agg(max(col(pk)).cast("string")).head()
        if (r.isNullAt(0)) "DATE '1970-01-01'" else s"DATE '${r.getString(0)}'"
      case StringType =>
        val r = t.agg(max(col(pk))).head()
        if (r.isNullAt(0)) "''"
        else {
          val base = if (sparkDialect) r.getString(0).replace("\\", "\\\\")
                     else r.getString(0)
          "'" + base.replace("'", "''") + "'"
        }
      case _ =>
        // numerics/boolean: the collected value's own rendering is a valid
        // SQL literal in Spark and every JDBC dialect we target
        val r = t.agg(max(col(pk))).head()
        if (r.isNullAt(0)) "0" else String.valueOf(r.get(0))
    }
  }

  /** Stage a JDBC extract — the reference's actual source type (a SQL
    * database). `sql` executes IN the database ([[graft.sources.JdbcSource]]
    * pushdown); `writePkField` gives the same incremental `{}` watermark as
    * the SQL extract.
    */
  def extractJdbc(url: String, sql: String,
                  writePkField: Option[String] = None,
                  types: Map[String, DataType] = Map.empty,
                  props: java.util.Properties = new java.util.Properties): this.type = {
    this.types = types
    this.writePkField = writePkField
    this.extractThunk = Some(() =>
      graft.sources.JdbcSource.query(spark, url,
        resolveIncremental(sql, sparkDialect = false), props))
    this
  }

  /** Replace extraction with an arbitrary DataFrame producer (E5). */
  def extractOverride(f: () => DataFrame): this.type = {
    extractThunk = Some(f); this
  }

  // ---- middleware (M1) ----------------------------------------------------

  /** Whole-result-set rewrite, applied between extract and transforms in
    * registration order (easy_etl/__init__.py:58-59, 72-75). */
  def middleware(f: DataFrame => DataFrame): this.type = {
    middlewares :+= f; this
  }

  // ---- transforms (T1–T3) -------------------------------------------------

  /** Start/extend per-column transform chains (see [[TransformPipeline]]). */
  def transform(fields: String*): TransformPipeline = pipeline.on(fields)

  // ---- links (L1–L3) ------------------------------------------------------

  /** Exact FK lookup into a target-catalog dimension table: left-join the
    * dim's `id` onto rows where `row(target) == dim(childField)`; no match ⇒
    * null (L1). The reference issues one SELECT per row (N+1); here it is a
    * single broadcast-eligible left equi-join.
    */
  def link(field: String, target: String, tableName: String,
           childField: String, name: Option[String] = None): this.type = {
    links :+= LinkSpec(field, target, tableName, childField, name, None); this
  }

  /** As-of FK lookup (L2/L3): `method` ">=" (default) attaches the dim row
    * with the smallest `childField` ≥ `row(target)`; "<="/"<"/">" per
    * [[AsOfJoin]]. */
  def linkClosest(field: String, target: String, tableName: String,
                  childField: String, name: Option[String] = None,
                  method: String = ">="): this.type = {
    links :+= LinkSpec(field, target, tableName, childField, name, Some(method)); this
  }

  // ---- ignore (X1) --------------------------------------------------------

  /** Drop fields just before load (easy_etl/__init__.py:61-62, 108-111).
    * Missing fields error at load, mirroring the reference's KeyError. */
  def ignore(fields: String*): this.type = { ignored ++= fields; this }

  // ---- load (S1–S5) ------------------------------------------------------

  /** Execute the staged pipeline and write the target table. See
    * [[Loader.load]] for id/upsert/schema-evolution semantics. All staged
    * state resets afterwards (easy_etl/__init__.py:44, 64-70). */
  def load(upsertFields: Seq[String] = Nil, ensure: Boolean = true,
           safe: Boolean = false): Unit = {
    val extracted0 = extractThunk
      .getOrElse(throw new IllegalStateException("no extract staged"))
      .apply()
    // verbose counts re-run the lineage; cache the extract across the two
    // actions (count + downstream) so the source is read once either way.
    // try/finally below: a failing load must not leak the cached blocks.
    val extracted = if (!verbose) extracted0
      else extracted0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    report(s"extract: ${extracted.count()} rows")

    val afterMw = middlewares.foldLeft(extracted)((df, f) => f(df))

    val afterTypes = types.foldLeft(afterMw) { case (df, (c, dt)) =>
      if (df.columns.contains(c)) df.withColumn(c, col(c).cast(dt)) else df
    }

    val afterTransforms = pipeline(afterTypes)

    val afterLinks = links.foldLeft(afterTransforms) { (df, l) =>
      val outName = l.name.getOrElse(l.field)
      val dim = tgt.table(l.tableName)
      l.method match {
        case None =>
          // dedupe dim on the child key deterministically (min id), then a
          // left equi-join. No forced broadcast: Catalyst/AQE broadcasts
          // automatically when the aggregated dim is under the threshold,
          // and a genuinely large dimension (plausible at 100 TB) must be
          // free to shuffle-hash-join instead of OOMing executors.
          val keyed = dim.groupBy(col(l.childField).as("__lk"))
            .agg(min(col(Loader.IdCol)).as(outName))
          df.join(keyed, df(l.target) === keyed("__lk"), "left")
            .drop("__lk")
        case Some(m) =>
          // auto strategy: broadcast binary-search for normal dims, the
          // shuffled range-merge for dims too large to broadcast
          AsOfJoin.asOfAuto(df, l.target, dim, l.childField,
            payloadCols = Seq(Loader.IdCol), direction = m,
            rename = Map(Loader.IdCol -> outName))
      }
    }

    val missing = ignored.filterNot(afterLinks.columns.contains)
    require(missing.isEmpty, s"ignore() of absent field(s): ${missing.mkString(", ")}")
    val afterIgnore =
      if (ignored.isEmpty) afterLinks else afterLinks.drop(ignored: _*)

    // cache the final frame across the verbose count and the write — the
    // count would otherwise re-run the whole transform/link pipeline (the
    // as-of joins being the expensive part) a second time
    val toLoad = if (!verbose) afterIgnore
      else afterIgnore.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      report(s"load: ${toLoad.count()} rows -> $writeTableName" +
        (if (upsertFields.nonEmpty) s" (upsert on ${upsertFields.mkString(",")})" else ""))
      tgt match {
        case v: VersionedCatalog =>
          // versioned targets route layout through buckets only (see
          // VersionedCatalog doc) — reject silently-ignored knobs loudly
          require(partitionBy.isEmpty && clusterBy.isEmpty &&
            targetFileBytes.isEmpty,
            "versioned targets support bucketBy; partitionBy/clusterBy/" +
              "targetFileBytes are flat-Loader layouts (use VersionedTable" +
              ".compact for file sizing)")
          VersionedTable.load(v, writeTableName, toLoad,
            upsertFields = upsertFields, ensure = ensure, safe = safe,
            idOrder = idOrder, bucketBy = bucketBy)
        case c: Catalog =>
          Loader.load(c, writeTableName, toLoad,
            upsertFields = upsertFields, ensure = ensure, safe = safe,
            idOrder = idOrder, targetFileBytes = targetFileBytes,
            partitionBy = partitionBy, clusterBy = clusterBy,
            bucketBy = bucketBy)
        case j: JdbcCatalog =>
          JdbcLoader.load(j, writeTableName, toLoad,
            upsertFields = upsertFields, ensure = ensure, safe = safe, idOrder = idOrder)
        case other =>
          throw new UnsupportedOperationException(
            s"no loader for target store ${other.getClass.getName}")
      }
    } finally if (verbose) toLoad.unpersist()
    } finally if (verbose) extracted.unpersist()

    reset()
  }

  /** Read back the current target table. */
  def result(): DataFrame = tgt.table(writeTableName)

  private def reset(): Unit = {
    extractThunk = None
    types = Map.empty
    writePkField = None
    pipeline.reset()
    middlewares = Vector.empty
    links = Vector.empty
    ignored = Vector.empty
  }
}
