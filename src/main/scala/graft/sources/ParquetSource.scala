package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet reading with TIMESTAMP(NANOS) support.
  *
  * Spark has no nanosecond timestamp type and refuses parquet INT64
  * TIMESTAMP(NANOS) columns outright ([PARQUET_TYPE_ILLEGAL]). The driver
  * testdata's `events.ts` is nano-precision, so we:
  *   1. enable `spark.sql.legacy.parquet.nanosAsLong` (runtime SQL conf) so
  *      the scan surfaces those columns as LongType nanos, and
  *   2. detect which columns are nano-timestamps from the parquet FOOTER
  *      (one footer read per table — metadata only, no data IO) and rewrite
  *      them to microsecond TimestampType via `timestamp_micros(v div 1000)`.
  *
  * The conversion truncates toward negative infinity for the post-1970
  * values in scope (matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast). Scans
  * stay fully vectorized; the division folds into the projection.
  */
object ParquetSource {

  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Sidecar recording a Hive-partitioned graft table's partition columns
    * and their ORIGINAL Spark types (tab-separated `col\tcatalogString`
    * lines). Partition values live in directory names, so a plain read
    * re-infers their types (a long key comes back as int); the sidecar
    * casts them back. Written by the Loader write path. */
  val PartSpecFile = "_graft_partitioning"

  /** Sidecar recording a hash-bucketed graft table's bucket KEY columns and
    * bucket count (`key1,key2\tN`). The bucket id itself is a derived
    * Hive-partition column ([[BucketCol]]) — a pure function of the key
    * columns, so readers drop it and writers recompute it. Written by the
    * Loader write path. */
  val BucketSpecFile = "_graft_bucketing"

  /** The derived bucket-id partition column of a bucketed table. Internal:
    * never surfaces on reads. */
  val BucketCol = "__gbucket"

  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, path, keepBucket = false)

  /** Schema cache for [[read]]: `spark.read.parquet(path)` with no schema
    * runs a one-task footer-inference JOB per call, and every graft write
    * statement re-opens its table several times (existence probe, merge
    * read, staged-swap verification) — at ~50-90 ms of fixed job overhead
    * each, inference was a measurable slice of every load/upsert/matview
    * statement (optimization guide §1.2: remove passes that recompute what
    * is already known). The cache hands the previously-inferred schema to
    * `.schema(...)` so re-opens plan with zero jobs. Invalidated on every
    * graft write via [[graft.etl.Catalog.invalidateDir]] (all Loader write
    * paths end there), so schema evolution re-infers; raw source corpora
    * are immutable and stay cached for the session. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  // same lifecycle: the per-open driver footer probe for nano-timestamp
  // columns re-reads one footer per read() call otherwise
  private val nanoColsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  // sidecar caches, same lifecycle: every read() (and several Loader probes
  // per write statement) re-opened the partitioning/bucketing sidecars —
  // each an exists + open + read round-trip against the filesystem. Local
  // FS makes that microseconds; an object store makes it 2 metadata RTTs
  // per open (guide §6: metadata passes count as I/O at scale).
  private val partSpecCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private val bucketSpecCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(Seq[String], Int)]]()
  // Generation counter closing the infer-then-put race: a read that starts
  // inference before a writer's invalidation and finishes after it would
  // re-install the PRE-swap schema (silently missing new columns). Every
  // invalidation bumps the generation; a reader only caches what it
  // computed if no invalidation happened in between. INVARIANT the caches
  // rest on: every writer of a catalog path routes through
  // Catalog.invalidateDir (all Loader write paths end there) — an
  // out-of-band write into a catalog dir pins stale metadata.
  private val cacheGen = new java.util.concurrent.atomic.AtomicLong()

  /** Prime the schema cache right after a write whose read-side schema is
    * fully determined: flat tables (read schema = written data schema) and
    * hash-bucketed tables (one derived partition column, always written as
    * small ints, so directory type inference is IntegerType by
    * construction). Hive-partitioned tables are NOT primed — their
    * partition value types go through Spark's directory inference, which
    * this cache must not second-guess. All fields are relaxed to nullable,
    * matching what a parquet read reports for data written by graft (and
    * over-nullable is always safe to read with). */
  private[graft] def primeSchemaCache(path: String,
                                      dataSchema: org.apache.spark.sql.types.StructType,
                                      bucketed: Boolean): Unit = {
    def nullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType(
          s.fields.map(f => f.copy(dataType = nullable(f.dataType), nullable = true)))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = nullable(a.elementType), containsNull = true)
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = nullable(m.keyType),
          valueType = nullable(m.valueType), valueContainsNull = true)
      case other => other
    }
    val dataFields = dataSchema.fields.filterNot(_.name == BucketCol)
      .map(f => f.copy(dataType = nullable(f.dataType), nullable = true))
    val full =
      if (bucketed)
        dataFields :+ org.apache.spark.sql.types.StructField(
          BucketCol, org.apache.spark.sql.types.IntegerType, nullable = true)
      else dataFields
    schemaCache.put(path, org.apache.spark.sql.types.StructType(full))
  }

  /** Drop cached schemas and sidecar specs for `prefix` (a catalog dir or a
    * table dir) and everything under it — called from the write paths' cache
    * invalidation. Matches on PATH-SEGMENT boundaries (`prefix` itself or
    * `prefix/…`), so `/cat` never evicts a sibling `/cat-other`; the
    * single-file twin `<table>.parquet` is its own key and must be passed
    * explicitly when both layouts are in play. */
  private[graft] def invalidateSchemaCache(prefix: String): Unit = {
    cacheGen.incrementAndGet()
    val slash = prefix + "/"
    def sweep(m: java.util.concurrent.ConcurrentHashMap[String, _]): Unit = {
      val it = m.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k == prefix || k.startsWith(slash)) it.remove()
      }
    }
    sweep(schemaCache); sweep(nanoColsCache)
    sweep(partSpecCache); sweep(bucketSpecCache)
  }

  /** `keepBucket = true` preserves the physical [[BucketCol]] partition
    * column of a bucketed table — the writer-side read: predicates on the
    * PHYSICAL partition column partition-prune at the directory level,
    * which a recomputed hash expression never can. */
  def read(spark: SparkSession, path: String, keepBucket: Boolean): DataFrame = {
    spark.conf.set(NanosAsLongKey, "true")
    // Parquet TIMESTAMP(isAdjustedToUTC=false) — the default of pandas/
    // pyarrow writers without an explicit tz — surfaces as TIMESTAMP_NTZ in
    // Spark 4, which every downstream event-time projection (unix_micros,
    // watermarks, window()) rejects with DATATYPE_MISMATCH. Graft sessions
    // run UTC (Verify/Bench/specs all pin spark.sql.session.timeZone=UTC),
    // so NTZ wall-clock ≡ UTC instant and the normalization is lossless and
    // DuckDB-equivalent. Two layers:
    //   1. disable NTZ INFERENCE so plain parquet (no Spark schema
    //      metadata) scans produce TimestampType directly — stays fully
    //      vectorized, no extra projection;
    //   2. a defensive cast for files that carry explicit Spark
    //      TimestampNTZ metadata (inference doesn't apply to those).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val gen = cacheGen.get()
    val cachedSchema = schemaCache.get(path)
    val df =
      if (cachedSchema != null) spark.read.schema(cachedSchema).parquet(path)
      else {
        val d = spark.read.parquet(path)
        // only cache what we inferred if no writer invalidated mid-infer —
        // a stale put would silently misread the post-swap table
        if (cacheGen.get() == gen) schemaCache.put(path, d.schema)
        d
      }
    val nanoCols = {
      val c = nanoColsCache.get(path)
      if (c != null) c
      else {
        val v = nanoTimestampCols(spark, path)
        if (cacheGen.get() == gen) nanoColsCache.put(path, v)
        v
      }
    }
    val withNanos = nanoCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
    }
    val ntzCols = withNanos.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.toSeq
    val withUtc = ntzCols.foldLeft(withNanos) { (d, c) =>
      d.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
    }
    val cast = readPartSpec(spark, path).foldLeft(withUtc) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }
    // the bucket id is physical layout, not data — readers drop it, and
    // ONLY when the sidecar says the table is bucketed (a genuine data
    // column that happens to be named __gbucket must survive)
    if (!keepBucket && cast.columns.contains(BucketCol) &&
        readBucketSpec(spark, path).isDefined)
      cast.drop(BucketCol)
    else cast
  }

  /** (col, catalogString) pairs from the partition sidecar, empty if none.
    * Cached per path (invalidated with the schema cache): the sidecar is
    * consulted on every table open and several times per write statement. */
  def readPartSpec(spark: SparkSession, path: String): Seq[(String, String)] = {
    val c = partSpecCache.get(path)
    if (c != null) c
    else {
      val gen = cacheGen.get()
      val v = readPartSpecUncached(spark, path)
      if (cacheGen.get() == gen) partSpecCache.put(path, v)
      v
    }
  }

  private def readPartSpecUncached(spark: SparkSession,
                                   path: String): Seq[(String, String)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path, PartSpecFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try {
        val text = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
          val Array(c, t) = line.split("\t", 2)
          (c, t)
        }
      } finally in.close()
    }
  }

  /** Write the partition sidecar into `dir` (overwrites). */
  def writePartSpec(spark: SparkSession, dir: String,
                    spec: Seq[(String, String)]): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir, PartSpecFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(spec.map { case (c, t) => s"$c\t$t" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** (bucket key columns, bucket count) from the bucketing sidecar, None
    * if the table isn't bucketed. Cached per path (invalidated with the
    * schema cache) — the write path probes it up to five times per
    * statement and every read() consults it once. */
  def readBucketSpec(spark: SparkSession, path: String): Option[(Seq[String], Int)] = {
    val c = bucketSpecCache.get(path)
    if (c != null) c
    else {
      val gen = cacheGen.get()
      val v = readBucketSpecUncached(spark, path)
      if (cacheGen.get() == gen) bucketSpecCache.put(path, v)
      v
    }
  }

  private def readBucketSpecUncached(spark: SparkSession,
                                     path: String): Option[(Seq[String], Int)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path, BucketSpecFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val text = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        val Array(keys, n) = text.split("\t", 2)
        Some((keys.split(",").toSeq, n.toInt))
      } finally in.close()
    }
  }

  /** Write the bucketing sidecar into `dir` (overwrites). */
  def writeBucketSpec(spark: SparkSession, dir: String,
                      keys: Seq[String], n: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir, BucketSpecFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"${keys.mkString(",")}\t$n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** True when any path segment of `file` below `root` is hidden by
    * Spark's convention (starts with `_` or `.`) — uncommitted
    * `_temporary` staging data, metadata files, hidden dirs. Footer-based
    * probes MUST honor the same filter the scan path applies: a crashed
    * job's staged part-files contain uncommitted rows, and a watermark or
    * size derived from them would be silently wrong in ways the
    * scan-based fallback can never be. */
  private def hiddenUnder(root: org.apache.hadoop.fs.Path,
                          file: org.apache.hadoop.fs.Path): Boolean = {
    var p = file
    while (p != null && p != root && p.toUri.getPath != root.toUri.getPath) {
      val n = p.getName
      // Spark's own rule (shouldFilterOutPathName): '_' hides EXCEPT when
      // the name carries a partition '=' — Hive partition dirs like
      // `__gbucket=3` are data; `_temporary`, `_SUCCESS`, dotfiles are not
      if ((n.startsWith("_") && !n.contains("=")) || n.startsWith(".")) return true
      p = p.getParent
    }
    false
  }

  /** Non-hidden `*.parquet` files under `path` (file or directory),
    * recursive, with the scan path's hidden-segment filter applied. */
  private def visibleParquetFiles(spark: SparkSession, path: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !hiddenUnder(root, st.getPath))
        out += st.getPath
    }
    out.toSeq
  }

  /** Sum of every row group's total (uncompressed, encoded) byte size
    * across all parquet files under `path`, recursively — a metadata-only
    * size estimate. Lets compaction size its output from the table it is
    * ABOUT to read instead of paying a full extra aggregation scan for the
    * same number (at 100 TB, footer reads are O(files); the avoided scan
    * is O(table)). None above `maxFiles`: a serial driver-side footer
    * sweep over a severely small-file-bloated table — compaction's own
    * motivating case — would cost more than the one distributed
    * aggregation pass the caller falls back to.
    */
  def footerTotalByteSize(spark: SparkSession, path: String,
                          maxFiles: Int = 4096): Option[Long] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val files = visibleParquetFiles(spark, path)
    if (files.length > maxFiles) return None
    var total = 0L
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.foreach(b => total += b.getTotalByteSize)
      finally r.close()
    }
    Some(total)
  }

  /** Max of a LongType column across all parquet files under `path`
    * (recursive), answered from FOOTER column statistics — metadata-only.
    * Returns None (caller falls back to a distributed aggregate scan)
    * when: more than `maxFiles` files (a serial driver-side footer sweep
    * stops being cheaper than one parallel column scan), any populated
    * row group lacks statistics for the column (an underestimate would be
    * silently wrong), or no file carries the column at all.
    *
    * The surrogate-id probe every load used to pay as an O(table) column
    * scan — at 100 TB, the difference between reading a few KB of footers
    * and scanning a 10^11-row id column per load.
    */
  def footerMaxLong(spark: SparkSession, path: String, column: String,
                    maxFiles: Int = 4096): Option[Long] = {
    val files = visibleParquetFiles(spark, path)
    if (files.isEmpty || files.length > maxFiles) None
    else footerMaxLongInFiles(spark, files.map(_.toString), column)
  }

  /** [[footerMaxLong]] over an EXPLICIT file list (e.g. a versioned
    * table's manifest) — the shared strict core: bails to None when any
    * populated row group lacks usable numeric statistics for `column`
    * (an underestimated max would silently reissue ids / skip rows). */
  def footerMaxLongInFiles(spark: SparkSession, files: Seq[String],
                           column: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    var best: Option[Long] = None
    var sawColumn = false
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        r.getFooter.getBlocks.asScala.foreach { b =>
          if (b.getRowCount > 0) {
            b.getColumns.asScala.find(_.getPath.toDotString == column) match {
              case Some(c) =>
                sawColumn = true
                val s = c.getStatistics
                if (s == null || !s.hasNonNullValue) {
                  return None // populated rows without stats: no safe answer
                } else s.genericGetMax match {
                  case n: java.lang.Number =>
                    val m = n.longValue
                    best = Some(best.fold(m)(math.max(_, m)))
                  case _ =>
                    // non-numeric statistics (e.g. INT96 timestamps carry
                    // Binary stats, which are also unordered-unreliable):
                    // no metadata answer — caller scans
                    return None
                }
              case None => // file predates the column (schema evolution)
            }
          }
        }
      } finally r.close()
    }
    if (!sawColumn) None else best
  }

  /** Per-FILE `[min, max]` ranges for `cols`, from parquet footer column
    * statistics — the raw material for manifest-level ZONE MAPS (a
    * versioned table records these at commit time so a filtered read can
    * skip whole files on the DRIVER, before any scan task launches; at
    * 100 TB that is the difference between planning against a few MB of
    * manifest and opening 100k footers per query).
    *
    * Returns `absFilePath -> colName -> (tag, lo, hi)` where `tag`
    * declares the comparison domain and lo/hi are decimal strings (or the
    * raw string for `"string"`):
    *   - `"long"`   — signed integer family (INT32/INT64, plain or signed
    *                  int annotation)
    *   - `"date"`   — DATE annotation, value = epoch days
    *   - `"ts"`     — TIMESTAMP annotation (any unit/frame), value =
    *                  MICROS via floor-division — the same truncation
    *                  Spark applies reading NANOS, so bounds stay valid
    *                  for the values Spark actually materializes; graft
    *                  sessions run UTC, so NTZ wall-clock ≡ instant
    *   - `"double"` — FLOAT/DOUBLE
    *   - `"string"` — BINARY with String annotation (consumers must
    *                  compare byte-wise; pruning restricts itself to
    *                  ASCII, where Java and UTF-8 byte order agree)
    *
    * STRICT per (file, column): a column is OMITTED for a file when any
    * populated row group lacks usable stats for it, a float/double bound
    * is NaN (parquet NaN ordering is undefined), the annotation is
    * unsigned/decimal/INT96 (different comparison domain), or every row
    * is null (no non-null bounds exist). Omission is always safe — a file
    * without a recorded range is simply never skipped on that column. */
  def footerColumnRanges(spark: SparkSession, files: Seq[String],
                         cols: Seq[String])
      : Map[String, Map[String, (String, String, String)]] =
    footerFileMeta(spark, files, cols)
      .map { case (f, (_, ranges, _)) => f -> ranges }

  /** Everything the manifest records per file, from ONE footer pass:
    * `absFilePath -> (rowCount, ranges, nullCounts)`.
    *
    *   - rowCount: total rows (always available — block metadata);
    *   - ranges: as [[footerColumnRanges]] documents;
    *   - nullCounts: per requested column, the EXACT number of null rows
    *     — recorded only when every populated row group sets num_nulls
    *     for the column (strictness mirrors the range rule: omission
    *     only disables null-check skipping, never correctness). A
    *     requested column entirely ABSENT from the file's schema (an
    *     older file before a widening) counts as all-null — Spark reads
    *     missing columns as null.
    *
    * Null counts are tracked independently of range validity: a
    * NaN-bounded double column has no usable range but often a perfectly
    * exact null count (and vice versa for stats with counts but
    * unordered bounds). */
  def footerFileMeta(spark: SparkSession, files: Seq[String],
                     cols: Seq[String])
      : Map[String, (Long, Map[String, (String, String, String)], Map[String, Long])] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val conf = spark.sessionState.newHadoopConf()
    val want = cols.toSet

    // comparison-domain tag for a primitive leaf, None = not range-safe
    def tagOf(f: PrimitiveType): Option[String] = {
      val ann = f.getLogicalTypeAnnotation
      (f.getPrimitiveTypeName, ann) match {
        case (INT96, _) => None
        case (INT32 | INT64, null) => Some("long")
        case (INT32 | INT64, a: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
          if a.isSigned => Some("long")
        case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
          Some("date")
        case (INT64, _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
          Some("ts")
        // int-backed DECIMALS (precision ≤ 18 — Spark's writer uses
        // INT32/INT64 there): bounds are UNSCALED ints; the tag carries
        // the file's own scale so the read side rescales predicate
        // literals per file — sound even across scale-widening ALTERs
        // (each era's files keep their own recorded domain)
        case (INT32 | INT64, a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          Some(s"dec:${a.getScale}")
        // WIDE decimals (precision > 18): FIXED_LEN_BYTE_ARRAY (or
        // BINARY) big-endian two's-complement unscaled values — parquet
        // orders their stats as SIGNED decimal values, so the bounds
        // decode to BigIntegers in the same `dec:` domain (the decimal
        // strings just exceed 64 bits; the read side parses BigInt)
        case (FIXED_LEN_BYTE_ARRAY | BINARY,
              a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          Some(s"dec:${a.getScale}")
        case (FLOAT | DOUBLE, _) => Some("double")
        case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
          Some("string")
        case _ => None // unsigned ints, maps/lists
      }
    }
    // unit factor to micros for TIMESTAMP columns (floor like Spark's
    // read); None on a pathological millis value that overflows micros
    def toMicros(f: PrimitiveType, v: Long): Option[Long] =
      f.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit.toString match {
            case "MILLIS" =>
              try Some(Math.multiplyExact(v, 1000L))
              catch { case _: ArithmeticException => None }
            case "NANOS" => Some(Math.floorDiv(v, 1000L))
            case _ => Some(v) // MICROS
          }
        case _ => Some(v)
      }

    files.map { fPath =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(fPath), conf))
      val meta = try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val leaves: Map[String, PrimitiveType] = schema.getFields.asScala
          .collect { case f if f.isPrimitive && want.contains(f.getName) =>
            f.getName -> f.asPrimitiveType() }.toMap
        val presentNames: Set[String] = schema.getFields.asScala
          .map(_.getName).toSet
        val acc = scala.collection.mutable.Map[String, (String, String, String)]()
        val dead = scala.collection.mutable.Set[String]()
        // null counts ride the SAME pass but live or die independently of
        // the range domain (a NaN range can still have an exact count)
        val nullAcc = scala.collection.mutable.Map[String, Long]()
        val nullDead = scala.collection.mutable.Set[String]()
        var totalRows = 0L
        r.getFooter.getBlocks.asScala.foreach { b =>
          totalRows += b.getRowCount
          if (b.getRowCount > 0) b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            if (want.contains(name)) {
              val s0 = c.getStatistics
              if (s0 == null || !s0.isNumNullsSet) nullDead += name
              else nullAcc(name) = nullAcc.getOrElse(name, 0L) + s0.getNumNulls
            }
            if (want.contains(name) && !dead.contains(name)) {
              val prim = leaves.get(name)
              val tag = prim.flatMap(tagOf)
              val s = c.getStatistics
              if (tag.isEmpty || s == null) dead += name
              else if (!s.hasNonNullValue) {
                // stats present but no values: fine ONLY when provably
                // all-null (contributes nothing); otherwise unknown → dead
                if (!s.isNumNullsSet || s.getNumNulls != b.getRowCount)
                  dead += name
              } else {
                val lohi: Option[(String, String)] = (tag.get,
                  s.genericGetMin, s.genericGetMax) match {
                  case ("long" | "date", lo: java.lang.Number, hi: java.lang.Number) =>
                    Some((lo.longValue.toString, hi.longValue.toString))
                  case (t, lo: java.lang.Number, hi: java.lang.Number)
                    if t.startsWith("dec:") => // unscaled int bounds
                    Some((lo.longValue.toString, hi.longValue.toString))
                  case (t, lo: org.apache.parquet.io.api.Binary,
                        hi: org.apache.parquet.io.api.Binary)
                    if t.startsWith("dec:") =>
                    // FLBA/BINARY decimal: big-endian two's-complement
                    // unscaled value (parquet's DECIMAL sort order)
                    Some((new java.math.BigInteger(lo.getBytes).toString,
                      new java.math.BigInteger(hi.getBytes).toString))
                  case ("ts", lo: java.lang.Number, hi: java.lang.Number) =>
                    for (l <- toMicros(prim.get, lo.longValue);
                         h <- toMicros(prim.get, hi.longValue))
                      yield (l.toString, h.toString)
                  case ("double", lo: java.lang.Number, hi: java.lang.Number) =>
                    val (l, h) = (lo.doubleValue, hi.doubleValue)
                    if (l.isNaN || h.isNaN) None
                    else Some((l.toString, h.toString))
                  case ("string", lo: org.apache.parquet.io.api.Binary,
                        hi: org.apache.parquet.io.api.Binary) =>
                    Some((lo.toStringUsingUTF8, hi.toStringUsingUTF8))
                  case _ => None
                }
                lohi match {
                  case None => dead += name
                  case Some((lo, hi)) => acc.get(name) match {
                    case None => acc(name) = (tag.get, lo, hi)
                    case Some((t, plo, phi)) =>
                      def lt(a: String, b: String): Boolean = t match {
                        case "string" => a.compareTo(b) < 0
                        case "double" => a.toDouble < b.toDouble
                        // dec: bounds can exceed 64 bits (wide decimals)
                        case d if d.startsWith("dec:") => BigInt(a) < BigInt(b)
                        case _ => a.toLong < b.toLong
                      }
                      acc(name) = (t, if (lt(lo, plo)) lo else plo,
                        if (lt(phi, hi)) hi else phi)
                  }
                }
              }
            }
          }
        }
        dead.foreach(acc.remove)
        nullDead.foreach(nullAcc.remove)
        // a requested column the file's schema never had reads as null on
        // every row (only when NO field of that name exists — a non-leaf
        // twin, e.g. a struct, is just untrackable)
        cols.foreach { c =>
          if (!presentNames.contains(c)) nullAcc(c) = totalRows
        }
        (totalRows, acc.toMap, nullAcc.toMap)
      } finally r.close()
      fPath -> meta
    }.toMap
  }

  /** The parquet timestamp logical annotation of `column`, verified
    * UNIFORM across EVERY visible file under `path`:
    * Some((isAdjustedToUTC, unit)) with unit ∈ MILLIS|MICROS|NANOS, or
    * None when the column is absent anywhere, any file is not
    * timestamp-annotated (e.g. INT96), the files DISAGREE, or there are
    * more than `maxFiles`. Footer statistics are raw longs in the
    * annotation's unit AND frame (instant vs wall-clock), so a
    * first-file-only probe over a mixed-writer table (NANOS bootstrap +
    * MICROS appends, or NTZ + adjusted) would mis-scale or zone-shift a
    * max computed across all of them — uniformity is part of the answer,
    * not an assumption. */
  def timestampAnnotation(spark: SparkSession, path: String, column: String,
                          maxFiles: Int = 4096): Option[(Boolean, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val files = visibleParquetFiles(spark, path)
    if (files.isEmpty || files.length > maxFiles) return None
    var agreed: Option[(Boolean, String)] = None
    files.foreach { file =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      val ann = try {
        val schema = r.getFooter.getFileMetaData.getSchema
        schema.getFields.asScala.find(f => f.isPrimitive && f.getName == column)
          .flatMap(_.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              Some((t.isAdjustedToUTC, t.getUnit.toString))
            case _ => None
          })
      } finally r.close()
      ann match {
        case None => return None
        case some => agreed match {
          case None => agreed = some
          case Some(a) if some.contains(a) => // consistent
          case _ => return None // mixed units/frames: no safe rendering
        }
      }
    }
    agreed
  }

  /** Names of top-level INT64 TIMESTAMP(NANOS) columns, from the footer of
    * the first parquet file at `path` (file or directory).
    */
  def nanoTimestampCols(spark: SparkSession, path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .map(_.getPath)
          .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .getOrElse(return Seq.empty)
      else p

    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.getFields.asScala.toSeq.collect {
        case f if f.isPrimitive &&
          (f.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == TimeUnit.NANOS
            case _ => false
          }) => f.getName
      }
    } finally reader.close()
  }
}
