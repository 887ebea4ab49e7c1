package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.graft.{CdcMicroBatch, PlainBatchRead, ZonePred}

import graft.etl.{Catalog, VersionedTable}

/** `graft` — versioned tables as a DataSource-V2 BATCH format, the read
  * twin of the `graft-cdc` stream source:
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("dir", catalogDir)
  *     .option("table", "orders")
  *     .option("versionAsOf", "3")   // optional — head when absent
  *     .load()
  * }}}
  *
  * Time travel is an OPTION, not an API call (`versionAsOf` by number,
  * or `timestampAsOf` as epoch millis / ISO-8601 UTC — resolved by
  * manifest commit time, the Delta rule); column pruning and filter
  * pushdown are first-class: pushed filters prune WHOLE FILES on the
  * driver through the manifest zone maps / null counts (the same
  * `fileAdmits` one-sided logic as every other read path — this is the
  * THIRD predicate walker, over the public `sources.Filter` algebra) and
  * then continue into the parquet reader for row-group/page skipping
  * inside the surviving files. Planning is manifest-only: no directory
  * listing, no status RPCs on sized manifests. Spark re-applies every
  * filter on top (all filters are reported unhandled), so pruning can
  * only skip, never change results.
  *
  * WRITES work through the same format (the V1Write fallback — the
  * driver-side insert path JDBC-V2 uses, correct here because a
  * versioned commit IS a driver-coordinated manifest CAS):
  *
  * {{{
  *   df.write.format("graft").mode("append")
  *     .option("dir", catalogDir).option("table", "orders")
  *     .option("idOrder", "o_orderkey")        // optional
  *     .option("upsertKeys", "o_orderkey")     // optional → keyed upsert
  *     .option("bucketBy", "o_orderkey").option("numBuckets", "8") // opt.
  *     .save()
  * }}}
  *
  * Each save() is ONE versioned commit with all the layer's semantics —
  * surrogate ids continue, upserts are bucket-scoped on a bucketed
  * layout, concurrent writers serialize through the manifest CAS.
  * `mode("overwrite")` is intentionally unsupported (no capability):
  * replacement is a modeled operation in this layer — use delete +
  * append, or rollback — not a silent table drop.
  *
  * The library-API equivalents remain [[VersionedTable.readVersion]] /
  * `readWhere` (whose Catalyst `ZoneMapFileIndex` already prunes native
  * scans); this format exists so SQL-first tooling reaches versioned
  * tables without importing graft code.
  */
final class GraftTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // writes to a NOT-YET-EXISTING table must work (the first save creates
  // version 1), so the provider accepts the incoming frame's schema from
  // Spark instead of requiring an inferable table
  override def supportsExternalMetadata(): Boolean = true

  private def required(options: CaseInsensitiveStringMap, key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty, s"graft format requires option '$key'")
    v
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val opts = GraftTableProvider.rewriteBranchRef(
      options.asCaseSensitiveMap().asScala.toMap)
    val cat = new Catalog(spark, GraftTableProvider.requiredOpt(opts, "dir"))
    val table = GraftTableProvider.requiredOpt(opts, "table")
    val v = GraftTableProvider.resolveVersion(cat, table,
      GraftTableProvider.opt(opts, "versionAsOf"),
      GraftTableProvider.opt(opts, "timestampAsOf"))
    if (v.isEmpty && VersionedTable.currentVersion(cat, table).isEmpty)
      // a first WRITE creates the table — there is nothing to infer yet;
      // the write takes the incoming frame's schema (ACCEPT_ANY_SCHEMA)
      // and a READ of a missing table fails with a clear error at plan
      // time instead
      StructType(Nil)
    else v.fold(VersionedTable.read(cat, table))(
      VersionedTable.readVersion(cat, table, _)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    // the PATH-based format keeps ACCEPT_ANY_SCHEMA: a first save() has
    // no table to validate against (the catalog surface, which always
    // knows its schema, turns validation ON — GraftCatalog)
    new GraftBatchTable(schema,
      GraftTableProvider.rewriteBranchRef(properties.asScala.toMap),
      acceptAnySchema = true)
}

private[sources] final class GraftBatchTable(
    dataSchema: StructType, options: Map[String, String],
    acceptAnySchema: Boolean = true)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** METADATA columns: `_file`, the absolute data-file path a row lives
    * in, and `_pos`, its row position within that file — queryable
    * (`SELECT _file, _pos, * FROM g.default.t`), the group-based ops'
    * routing attribute, and together the ROW ID the merge-on-read
    * delta operations key their deletion vectors on
    * ([[GraftDeltaRowLevelOperation]]). A table whose DATA schema
    * already has either name (foreign parquet) declares that one out —
    * the data column wins, unshadowed. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    def metaCol(n: String, dt: org.apache.spark.sql.types.DataType,
                doc: String) =
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = n
        override def dataType(): org.apache.spark.sql.types.DataType = dt
        override def isNullable: Boolean = false
        override def comment(): String = doc
      }
    val have = dataSchema.fieldNames.toSet
    (if (have.contains(org.apache.spark.sql.graft.PlainBatchRead.FileCol)) Nil
     else Seq(metaCol(org.apache.spark.sql.graft.PlainBatchRead.FileCol,
       org.apache.spark.sql.types.StringType,
       "absolute path of the data file the row lives in"))) ++
    (if (have.contains(org.apache.spark.sql.graft.PlainBatchRead.PosCol)) Nil
     else Seq(metaCol(org.apache.spark.sql.graft.PlainBatchRead.PosCol,
       org.apache.spark.sql.types.LongType,
       "row position within the data file")))
  }.toArray

  /** GENERATED ALWAYS AS column names (lowercase) of this table — from
    * the data schema's field metadata when present (path surface), else
    * from the head manifest's recorded schema (the catalog surface's
    * scan-derived schema drops declaration metadata). One LRU-cached
    * manifest read, no data I/O; the analysis-time assignment refusal
    * ([[RefuseGeneratedAssignments]]) keys on this. */
  private[sources] lazy val generatedColumnNames: Set[String] = {
    val own = graft.etl.GeneratedCols.generationExprs(dataSchema)
      .map(_._1.name.toLowerCase).toSet
    if (own.nonEmpty) own
    else {
      import GraftTableProvider.opt
      (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield
        VersionedTable.recordedHeadSchema(
          new Catalog(SparkSession.active, d), t)
          .map(s => graft.etl.GeneratedCols.generationExprs(s)
            .map(_._1.name.toLowerCase).toSet)
          .getOrElse(Set.empty[String])).getOrElse(Set.empty[String])
    }
  }

  /** Is this table in merge-on-read mode (recorded `write.mode` table
    * property, or the `mergeOnRead` read/write option)? Routes
    * UPDATE/MERGE/DELETE to the deletion-vector operation. */
  private def mergeOnRead: Boolean =
    GraftTableProvider.opt(options, "mergeOnRead").exists(_.toBoolean) || {
      import GraftTableProvider.opt
      (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield
        VersionedTable.isMergeOnRead(
          new Catalog(SparkSession.active, d), t)).getOrElse(false)
    }

  /** SQL UPDATE / MERGE / DELETE routing: group-based copy-on-write
    * ([[GraftRowLevelOperation]]) by default; delta-based deletion
    * vectors ([[GraftDeltaRowLevelOperation]]) on merge-on-read tables.
    * Time-travel handles refuse: a row-level write always derives from
    * and commits against the head. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(!options.keys.exists(k => k.equalsIgnoreCase("versionAsOf") ||
      k.equalsIgnoreCase("timestampAsOf")),
      "cannot UPDATE/MERGE at a time-travel version — row-level " +
        "operations always commit a new head")
    // live equality tombstones apply INSIDE both row-op scans (their
    // keys held through pruning, stamps on every slice), so a rewrite
    // can never resurrect a tombstoned row — no refusal needed here
    require(!dataSchema.fieldNames.contains(
      org.apache.spark.sql.graft.PlainBatchRead.FileCol),
      "row-level operations need the _file metadata column, which this " +
        "table's own _file data column shadows — rename the column")
    if (mergeOnRead) {
      require(!dataSchema.fieldNames.contains(
        org.apache.spark.sql.graft.PlainBatchRead.PosCol),
        "merge-on-read operations need the _pos metadata column, which " +
          "this table's own _pos data column shadows — rename the column")
      // GENERATED columns recompute inside the delta writers (the bound
      // projection GraftDeltaRowLevelOps ships to tasks); IDENTITY
      // columns assign there too — a per-statement high-water
      // reservation strided disjointly across the write's tasks, so a
      // keyed MERGE into an identity SCD table works on the MOR layout
      // with no global zip and no extra pass
      GraftDeltaRowLevelOps.builder(dataSchema, options)(info)
    } else GraftRowLevelOps.builder(dataSchema, options)(info)
  }

  /** SQL `DELETE FROM g.default.t WHERE ...` — routed to the versioned
    * logical delete: files whose zone maps PROVE full coverage drop with
    * zero I/O, boundary files rewrite without their matches, every prior
    * version still time-travels (physical reclaim stays vacuum's job).
    * `canDeleteWhere` admits exactly the conditions expressible in the
    * pushed filter algebra; anything else is refused at analysis rather
    * than half-applied. An empty condition (or TRUNCATE) deletes all
    * rows — the head keeps one empty schema-bearing file. */
  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    // merge-on-read: decline the metadata delete so Spark routes the
    // statement through the delta operation — positions recorded as a
    // deletion vector instead of a boundary-file rewrite. An
    // equality-routable condition on an opted-in table accepts on BOTH
    // layouts: the tombstone commit reads nothing either way.
    (!mergeOnRead &&
      filters.forall(f => GraftTableProvider.filterColumn(f).isDefined)) ||
      eqDeleteRoute(filters).isDefined

  /** SQL `DELETE` routed to the WRITE-WITHOUT-READ equality path: when
    * the table opted in (`write.delete.mode = equality`) and the
    * condition is a pure equality-tuple predicate
    * ([[GraftTableProvider.eqDeleteTuples]]), the statement commits ONE
    * key-tombstone file and touches no data file — the standard
    * boundary-rewrite delete reads and rewrites every file whose zone
    * maps cannot prove full coverage, which for a point delete on an
    * unclustered 100 TB table is most of them. The route pre-checks
    * literal→recorded-type losslessness so qualification is
    * deterministic between `canDeleteWhere` and `deleteWhere`; anything
    * unprovable falls back silently. Returns the commit thunk so the
    * two callers share one qualification. */
  private def eqDeleteRoute(filters: Array[sources.Filter])
      : Option[() => Unit] = try {
    import GraftTableProvider.opt
    import org.apache.spark.sql.functions.lit
    if (opt(options, "versionAsOf").nonEmpty ||
      opt(options, "timestampAsOf").nonEmpty) return None
    val spark = SparkSession.active
    val dir = opt(options, "dir").getOrElse(return None)
    val table = opt(options, "table").getOrElse(return None)
    val cat = new Catalog(spark, dir)
    if (!VersionedTable.tableProps(cat, table)
      .get("write.delete.mode").map(_.trim.toLowerCase)
      .contains("equality")) return None
    val recorded = VersionedTable.recordedHeadSchema(cat, table)
      .getOrElse(return None)
    val (cols0, tuples) = GraftTableProvider.eqDeleteTuples(filters)
      .getOrElse(return None)
    val fields = cols0.map(c => recorded.fields
      .find(_.name.equalsIgnoreCase(c)).getOrElse(return None))
    val coercible = tuples.forall(m => cols0.forall { c =>
      val rec = fields(cols0.indexOf(c)).dataType
      m(c) == null || {  // a null key casts to any type's typed null
        val t = org.apache.spark.sql.catalyst.expressions
          .Literal(m(c)).dataType
        t == rec || VersionedTable.losslessEqCast(t, rec)
      }
    })
    if (!coercible) return None
    Some(() => {
      val rows = tuples.map(m =>
        spark.range(1).select(cols0.zip(fields).map { case (c, f) =>
          lit(m(c)).cast(f.dataType).as(f.name) }: _*))
        .reduce(_ unionByName _)
      VersionedTable.deleteKeysEquality(cat, table, rows,
        fields.map(_.name))
      ()
    })
  } catch { case scala.util.control.NonFatal(_) => None }

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    import GraftTableProvider.{opt, requiredOpt}
    val spark = SparkSession.active
    val cat = new Catalog(spark, requiredOpt(options, "dir"))
    val table = requiredOpt(options, "table")
    require(opt(options, "versionAsOf").isEmpty &&
      opt(options, "timestampAsOf").isEmpty,
      "cannot DELETE at a time-travel version — deletes always commit a new head")
    eqDeleteRoute(filters) match {
      case Some(commit) => commit()
      case None =>
        val cond = filters.toSeq
          .map(f => GraftTableProvider.filterColumn(f).getOrElse(
            throw new UnsupportedOperationException(
              s"DELETE condition not expressible as a pushed filter: $f")))
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        VersionedTable.delete(cat, table, cond)
    }
    ()
  }

  override def name(): String =
    s"graft:${options.getOrElse("dir", "?")}/${options.getOrElse("table", "?")}" +
      options.get("versionAsOf").fold("")(v => s"@v$v")

  /** This handle's resolved options (dir/table/versionAsOf/...) — read
    * by [[RouteEqualityMerge]] to re-wrap the table with routed write
    * options; never exposed to SQL. */
  private[sources] def tableOpts: Map[String, String] = options

  /** Table metadata for `DESCRIBE TABLE EXTENDED`: the manifest's
    * recorded props (upsert keys, bloom columns, commit time) plus the
    * layout and head version — the operator-visible summary of what the
    * storage layer knows, read from ONE manifest (no data I/O). Missing
    * tables (a first write's handle) describe empty. */
  override def properties(): java.util.Map[String, String] = {
    import GraftTableProvider.opt
    val m = new java.util.HashMap[String, String]()
    (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield {
      val cat = new Catalog(SparkSession.active, d)
      VersionedTable.headSummary(cat, t).foreach { case (v, props, bucket) =>
        m.put("current_version", v.toString)
        // the raw tombstone props are MACHINE state (the stamp map grows
        // with the file count) — DESCRIBE shows the operator SUMMARY
        // below instead
        props.filterNot(kv =>
          kv._1 == "eq_tombstones" || kv._1 == "eq_seqs")
          .foreach { case (k, x) => m.put(k, x) }
        bucket.foreach { case (keys, n) =>
          m.put("bucket_keys", keys.mkString(","))
          m.put("num_buckets", n.toString)
        }
        // live write-without-read tombstones: the accretion the
        // compaction triggers bound, visible per DESCRIBE EXTENDED
        val (n, keyCols, nKeys, nBytes) =
          VersionedTable.eqTombstoneSummary(cat, t, v)
        if (n > 0) {
          m.put("eq.tombstones.live", n.toString)
          m.put("eq.tombstones.key_columns", keyCols.mkString(","))
          nKeys.foreach(r => m.put("eq.tombstones.keys", r.toString))
          nBytes.foreach(b => m.put("eq.tombstones.bytes", b.toString))
        }
      }
    }).getOrElse(())
    m
  }

  override def schema(): StructType = dataSchema

  /** The recorded HIDDEN-PARTITIONING declaration, reported back to
    * Spark (DESCRIBE / SHOW CREATE TABLE): the partition-transform
    * derivations plus the bucket layout, as the same `Transform`s the
    * CREATE accepted. */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import GraftTableProvider.opt
    import org.apache.spark.sql.connector.expressions.Expressions
    (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield {
      val cat = new Catalog(SparkSession.active, d)
      VersionedTable.headSummary(cat, t).map { case (_, props, bucket) =>
        // a CLUSTER BY declaration reports back in its ORIGINAL shape
        // (one ClusterByTransform), not as the identity transforms it
        // expanded to — same declaration, Spark's own rendering
        val clusterCols = VersionedTable.clusterByOf(props)
        val clusterSet = clusterCols.map(_.toLowerCase).toSet
        val derived = VersionedTable.partSpecOf(props).filterNot(t =>
          t.fn == "identity" && clusterSet(t.col.toLowerCase)).map {
          case VersionedTable.PartTransform("identity", c, _) =>
            Expressions.identity(c)
          case VersionedTable.PartTransform("truncate", c, w) =>
            Expressions.apply("truncate",
              Expressions.literal(Int.box(w)), Expressions.column(c))
          case VersionedTable.PartTransform(fn, c, _) =>
            Expressions.apply(fn, Expressions.column(c))
        }
        val cb =
          if (clusterCols.isEmpty) Nil
          else Seq(org.apache.spark.sql.connector.expressions.ClusterByTransform(
            clusterCols.map(c => Expressions.column(c)
              .asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference])))
        val b = bucket.toSeq.map { case (keys, n) =>
          Expressions.bucket(n, keys: _*)
        }
        (derived ++ cb ++ b).toArray
      }.getOrElse(Array.empty)
    }).getOrElse(Array.empty)
  }

  /** The recorded CHECK constraints, reported to Spark: the named ones
    * (`ALTER TABLE ADD CONSTRAINT`) plus the legacy TBLPROPERTIES check
    * under the name `check`. Spark's DSv2 write path adds its own
    * row-level validation for enforced constraints — belt — and the
    * versioned commit gate re-validates the staged bytes — suspenders. */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import GraftTableProvider.opt
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield {
      val cat = new Catalog(SparkSession.active, d)
      VersionedTable.headSummary(cat, t).map { case (_, props, _) =>
        val named = VersionedTable.namedChecks(props).toSeq.sortBy(_._1)
        val legacy = props.get(VersionedTable.CheckConstraintProp)
          .map("check" -> _).toSeq
        (legacy ++ named).map { case (n, sql) =>
          Constraint.check(n).predicateSql(sql).build()
            : org.apache.spark.sql.connector.catalog.constraints.Constraint
        }.toArray
      }.getOrElse(Array.empty)
    }).getOrElse(Array.empty)
  }

  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ,
      // INSERT OVERWRITE: a same-schema versioned content replace
      // (replaceContents) — truncate-capable through the V1 fallback
      TableCapability.TRUNCATE,
      // MERGE WITH SCHEMA EVOLUTION: the analyzer diffs the source
      // schema, sends the new columns as AddColumn TableChanges through
      // the catalog (metadata-only widenSchema — the same ensure-widen
      // the library load path has always had), then plans the rewrite
      // against the evolved schema
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dataSchema, options)

  /** Batch writes via the V1 fallback (a versioned commit IS a
    * driver-coordinated CAS); STREAMING writes via the native epoch-keyed
    * sink ([[org.apache.spark.sql.graft.GraftStreamWrite]]). The builder
    * opts into update-as-append ONLY when `upsertKeys` is declared:
    * update mode means "re-emitted rows replace their key's row", which
    * is exactly the keyed upsert — without keys each trigger's re-emits
    * would land as silent duplicate appends, so keyless Update is
    * refused by the engine's own mode check instead. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val hasUpsertKeys = options.exists { case (k, v) =>
      k.equalsIgnoreCase("upsertKeys") && v.trim.nonEmpty
    }
    if (hasUpsertKeys)
      new GraftWriteBuilder(info, options)
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
    else new GraftWriteBuilder(info, options)
  }
}

private[sources] class GraftWriteBuilder(
    info: LogicalWriteInfo, options: Map[String, String]) extends WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsTruncate {

      // INSERT OVERWRITE arrives as truncate() on the builder (the V1
      // fallback then calls insert(overwrite = false) — the intent
      // travels HERE, not in the boolean)
      @volatile private var truncateFirst = false
      override def truncate(): WriteBuilder = { truncateFirst = true; this }

      override def build(): V1Write = new V1Write {
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          org.apache.spark.sql.graft.GraftStreamWrite(
            SparkSession.active, info.queryId(), info.schema(), options)
        override def toInsertableRelation: sources.InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
            import GraftTableProvider.{csvOpt, opt, requiredOpt}
            val cat = new Catalog(data.sparkSession, requiredOpt(options, "dir"))
            val table = requiredOpt(options, "table")
            require(opt(options, "versionAsOf").isEmpty,
              "cannot write AT a version — writes always commit a new head")
            if (opt(options, "eqUpsert").exists(_.toBoolean)) {
              // the routed equality upsert ([[RouteEqualityMerge]] /
              // df.write option): write-without-read keyed merge —
              // commits the batch plus one key-tombstone file, never
              // probing the target
              require(!(overwrite || truncateFirst),
                "equality upsert cannot overwrite — drop the eqUpsert " +
                  "option for INSERT OVERWRITE")
              val keys = csvOpt(options, "upsertKeys")
              require(keys.nonEmpty, "eqUpsert requires option 'upsertKeys'")
              VersionedTable.upsertEqualityDelete(cat, table, data, keys,
                idOrder = csvOpt(options, "idOrder") match {
                  case Nil => keys
                  case o => o
                },
                requireDistinctKeys =
                  opt(options, "requireDistinctKeys").exists(_.toBoolean))
            } else if (overwrite || truncateFirst)
              // INSERT OVERWRITE = one SAME-SCHEMA versioned commit
              // swapping the rows: props/CHECKs/layout/mapping carry,
              // history survives (time travel + rollback cross it)
              VersionedTable.replaceContents(cat, table, data)
            else VersionedTable.load(cat, table, data,
              upsertFields = csvOpt(options, "upsertKeys"),
              idOrder = csvOpt(options, "idOrder"),
              bucketBy = csvOpt(options, "bucketBy") match {
                case Nil => None
                case cols => Some((cols,
                  opt(options, "numBuckets").map(_.toInt).getOrElse(
                    throw new IllegalArgumentException(
                      "bucketBy requires option 'numBuckets'"))))
              },
              bloomBy = csvOpt(options, "bloomBy"))
            ()
          }
      }
}

private[sources] final class GraftScanBuilder(
    dataSchema: StructType, options: Map[String, String])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = dataSchema

  /** Live equality-tombstone state at plan time: the key columns (the
    * read applies key anti-filters inside the tasks, so these must
    * survive pruning; pushed aggregates stand down — row counts no
    * longer tell the live truth), the KEY-COUNT PAD, and the RESOLVED
    * VERSION the state was read from. The pad — total recorded
    * tombstone keys, the sound upper bound on recorded-over-live
    * over-count — is only offered when every live tombstone is flagged
    * `uniq` (kills ≤ 1 row per key — [[VersionedTable.eqTruncationState]]):
    * a duplicate-keyed table's tombstone can kill many rows per key, so
    * there (and for uncounted legacy tombstones) limit/top-N truncation
    * stands down entirely. When a truncation IS pushed, the resolved
    * version PINS the batch's plan ([[GraftBatch]]) so a concurrent
    * eq-upsert cannot pair this pad with newer tombstone state. */
  private lazy val liveEqState: (Seq[String], Option[Long], Option[Long]) = {
    import GraftTableProvider.opt
    (for { d <- opt(options, "dir"); t <- opt(options, "table") } yield {
      val cat = new Catalog(SparkSession.active, d)
      GraftTableProvider.resolveVersion(cat, t,
        opt(options, "versionAsOf"), opt(options, "timestampAsOf"))
        .orElse(VersionedTable.currentVersion(cat, t))
        .map { v =>
          val (keyCols, pad) = VersionedTable.eqTruncationState(cat, t, v)
          (keyCols, pad, Some(v))
        }
        .getOrElse((Nil, Some(0L), None))
    }).getOrElse((Nil, Some(0L), None))
  }

  private def liveEqKeys: Seq[String] = liveEqState._1
  private def liveEqPad: Option[Long] = liveEqState._2
  private def liveEqVersion: Option[Long] = liveEqState._3

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters
    filters // all reported UNHANDLED: Spark re-applies, pruning only skips
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // live equality tombstones: their key columns ride along (Spark's
    // project above the scan still prunes the OUTPUT — only the read
    // widens, and only until compaction clears the tombstones)
    val missing = liveEqKeys.filter(k =>
      !requiredSchema.fieldNames.exists(_.equalsIgnoreCase(k)) &&
        dataSchema.fieldNames.exists(_.equalsIgnoreCase(k)))
    required =
      if (missing.isEmpty) requiredSchema
      else StructType(requiredSchema.fields ++ missing.map(k =>
        dataSchema.fields.find(_.name.equalsIgnoreCase(k)).get))
  }

  // ---------------------------------------------------- limit pushdown
  //
  // `SELECT * FROM t LIMIT 10` needs ONE file of a 100k-file table, not
  // all of them: with a limit pushed (Spark only pushes one adjacent to
  // the scan — our unhandled filters block it automatically, so the
  // truncation is never applied to pre-filter row counts) the batch
  // keeps files only until their RECORDED row counts cover the limit.
  // isPartiallyPushed stays true: Spark applies the exact limit on top;
  // the push only shrinks what gets read. A file without a recorded
  // row count voids the truncation (never a wrong short read).
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = liveEqPad match {
    // recorded row counts over-count through live equality tombstones
    // by AT MOST the recorded key total — truncate to (l + pad) so the
    // kept files still hold ≥ l LIVE rows; Spark applies the exact l on
    // top (partial push). An uncounted tombstone stands truncation down.
    case Some(pad) if l.toLong + pad <= Int.MaxValue.toLong =>
      limit = Some((l.toLong + pad).toInt)
      true // partially pushed (default isPartiallyPushed = true)
    case _ => false
  }

  // `ORDER BY c LIMIT n` (top-N): keep only files whose recorded range
  // can reach the top — on a range/z-clustered table "latest 100" reads
  // the tail files. Partial push: Spark re-sorts and re-limits on top,
  // so an un-truncatable shape (multi-column sort, expression sort,
  // nulls present, missing stats) just reads more, never answers wrong.
  private var topN: Option[(String, Boolean, Long)] = None

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = orders match {
    case Array(o) => o.expression() match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference
        if n.fieldNames().length == 1 && liveEqPad.isDefined =>
        // the same tombstone pad as pushLimit: the range walk's count
        // target inflates by the recorded key total, so the threshold
        // provably still covers the live top-l (without this, a dead
        // top file's recorded rows could truncate the true top away)
        val asc = o.direction() ==
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
        topN = Some((n.fieldNames()(0), asc, l.toLong + liveEqPad.get))
        true
      case _ => false
    }
    case _ => false
  }

  override def isPartiallyPushed(): Boolean = true

  // ------------------------------------------------- aggregate pushdown
  //
  // Global count(*)/count(col)/min/max answered from the MANIFEST — zero
  // data I/O, zero tasks (a driver-LocalScan): at 100 TB, `SELECT
  // count(*) FROM t` is one JSON read instead of a full-table scan (the
  // instant-count property the big table formats advertise). Soundness:
  // Spark only attempts aggregate pushdown when ZERO filters remain in
  // the plan, and we additionally refuse when any filter was pushed (ours
  // prune only — they could not make a filtered count exact); min/max
  // restrict to integral/date/timestamp columns whose parquet footer
  // statistics ARE the true extrema (float/double excluded: NaN elides
  // from parquet stats and Spark orders NaN largest; strings excluded:
  // recorded bounds truncate); every surviving file must record what the
  // ask needs, or we fall back to the scan — never a guess.
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}

  private var pushedAgg: Option[(StructType, Array[Any])] = None
  @volatile private var aggMemo: Option[(Aggregation, Option[(StructType, Array[Any])])] = None

  private def computeAgg(agg: Aggregation): Option[(StructType, Array[Any])] = {
    aggMemo match {
      case Some((a, r)) if a == agg => return r
      case _ => ()
    }
    val r = computeAggUncached(agg)
    aggMemo = Some((agg, r))
    r
  }

  private def computeAggUncached(agg: Aggregation): Option[(StructType, Array[Any])] = {
    import graft.etl.VersionedTable._
    import org.apache.spark.sql.types._
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case n: org.apache.spark.sql.connector.expressions.NamedReference
          if n.fieldNames().length == 1 =>
          dataSchema.fields.find(_.name == n.fieldNames()(0))
        case _ => None
      }
    def tagOf(dt: DataType): Option[String] = dt match {
      case ByteType | ShortType | IntegerType | LongType => Some("long")
      case DateType => Some("date")
      case TimestampType | TimestampNTZType => Some("ts")
      case _ => None // float/double (NaN), strings (truncation): scan
    }
    val asks: Seq[Option[(StructField, AggWant)]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false), WantCountStar))
      case c: Count if !c.isDistinct =>
        colOf(c.column).map(f =>
          (StructField(s"count_${f.name}", LongType, nullable = false),
            WantCountCol(f.name)))
      case m: Min => for { f <- colOf(m.column); t <- tagOf(f.dataType) }
        yield (StructField(s"min_${f.name}", f.dataType), WantMin(f.name, t))
      case m: Max => for { f <- colOf(m.column); t <- tagOf(f.dataType) }
        yield (StructField(s"max_${f.name}", f.dataType), WantMax(f.name, t))
      case _ => None
    }
    if (asks.exists(_.isEmpty)) return None
    val (fields, wants) = asks.flatten.unzip
    val cat = new Catalog(SparkSession.active,
      GraftTableProvider.requiredOpt(options, "dir"))
    val table = GraftTableProvider.requiredOpt(options, "table")
    val v = GraftTableProvider.resolveVersion(cat, table,
      GraftTableProvider.opt(options, "versionAsOf"),
      GraftTableProvider.opt(options, "timestampAsOf"))
    aggFromManifest(cat, table, v, wants).map { vals =>
      val internal = fields.zip(vals).map {
        case (_, null) => null
        case (f, x: Long) => f.dataType match {
          case ByteType => x.toByte
          case ShortType => x.toShort
          case IntegerType | DateType => x.toInt
          case _ => x // Long counts, LongType, Timestamp/NTZ micros
        }
        case (_, other) => other
      }
      (StructType(fields), internal.toArray[Any])
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    computeAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    // manifest row counts cannot answer through live equality
    // tombstones (rows are logically deleted without touching files)
    liveEqKeys.isEmpty && (computeAgg(agg) match {
      case Some(r) => pushedAgg = Some(r); true
      case None => false
    })

  override def build(): Scan = pushedAgg match {
    case Some((schema, row)) =>
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
          Array(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(row))
        override def readSchema(): StructType = schema
        override def description(): String =
          "graft manifest-answered aggregate (zero data I/O)"
      }
    case None =>
      // belt-and-braces: Spark never pushes a limit or top-N past a
      // remaining filter (ours all remain), but make it locally
      // provable — a pushed filter voids any file truncation
      val effLimit = limit.filter(_ => pushed.isEmpty)
      val effTopN = topN.filter(_ => pushed.isEmpty)
      new GraftScan(dataSchema, required, options, pushed,
        effLimit, effTopN,
        // a surviving truncation pins the version its pad was derived
        // from — pad and planned tombstone state must come from ONE
        // manifest (an eq-upsert between builder and planInputPartitions
        // would otherwise apply a stale, smaller pad to newer tombstones)
        pinnedVersion =
          if (effLimit.isDefined || effTopN.isDefined) liveEqVersion
          else None)
  }
}

/** The format's batch scan — besides the partition planning it reports
  * STATISTICS and accepts RUNTIME filters, the two planner contracts
  * that matter most in a 100 TB join:
  *
  *  - [[SupportsReportStatistics]]: post-pruning size/row counts straight
  *    from the manifest (zero I/O). Without this a DSv2 relation planner
  *    falls back to `spark.sql.defaultSizeInBytes` (= Long.Max), so a
  *    10 MB versioned dim table would NEVER auto-broadcast and every
  *    catalog-SQL join would sort-merge-shuffle the fact side. Rows are
  *    exact (manifest row counts over surviving files); size estimates
  *    in-memory width (rows × pruned-schema default size — the Iceberg
  *    rule) so column pruning shrinks the estimate and compressed parquet
  *    bytes don't understate a broadcast candidate.
  *  - [[SupportsRuntimeV2Filtering]]: dynamic FILE pruning. When this
  *    scan joins a filtered dim, Spark computes the dim's join-key
  *    values at runtime and hands them here as an IN predicate BEFORE
  *    partitions launch; the values re-prune the file list through the
  *    same zone maps as static pushdown. On a time/key-clustered fact
  *    table that turns "scan everything, filter in the join" into "read
  *    only the files whose ranges cover the dim's keys" — Iceberg's
  *    dynamic-filtering pattern, zone maps instead of partition dirs.
  *    One-sided as always: unrecognized shapes or oversized IN lists
  *    prune nothing (never wrongly skip).
  */
private[sources] final class GraftScan(
    dataSchema: StructType, required: StructType,
    options: Map[String, String], pushed: Array[sources.Filter],
    limit: Option[Int] = None,
    topN: Option[(String, Boolean, Long)] = None,
    pinnedVersion: Option[Long] = None)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  /** Runtime predicates arrive after toBatch is materialized
    * (BatchScanExec builds the Batch at planning, filters at execution),
    * so the state lives on the scan and the Batch re-reads it when it
    * (re-)plans partitions. */
  @volatile private var runtimePred: ZonePred.P = ZonePred.And(Nil)

  override def readSchema(): StructType = required
  override def description(): String = "graft versioned-table batch scan"

  /** STORAGE-PARTITIONED JOINS: on a hash-bucketed table (with
    * `spark.sql.sources.v2.bucketing.enabled`) the scan reports
    * `KeyGroupedPartitioning(bucket(n, keys), n)` and plans one keyed
    * partition PER BUCKET — two graft tables co-bucketed on the join
    * keys then join with NO exchange on either side (the planner
    * resolves `bucket` through the catalog's [[GraftBucketFunction]]
    * and zips equal bucket ids). At 100 TB this is the difference
    * between shuffling both fact tables and reading them co-located.
    * All N keys are always present (empty buckets plan no-op tasks),
    * so the report and the plan can never drift — including under
    * runtime filters. */
  private[sources] def spjSpec: Option[(Seq[String], Int)] =
    GraftTableProvider.spjBucketSpec(options, required)

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjSpec match {
      case Some((keys, n)) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(Array(
            org.apache.spark.sql.connector.expressions.Expressions
              .bucket(n, keys: _*)), n)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** Runtime-filterable columns: the stat-eligible set RESTRICTED to the
    * pruned output schema — Spark resolves these against the scan's
    * OUTPUT, so reporting a pruned-away column is an analysis crash on
    * every join over a projected scan. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val out = required.fieldNames.toSet
    VersionedTable.statEligibleColumns(dataSchema).filter(out).map(
      org.apache.spark.sql.connector.expressions.Expressions.column).toArray
  }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val ps = predicates.toSeq.map(GraftTableProvider.runtimeFilterPred)
    runtimePred = ZonePred.And(ps :+ runtimePred)
  }

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    import GraftTableProvider.{opt, requiredOpt}
    val cat = new Catalog(SparkSession.active, requiredOpt(options, "dir"))
    val table = requiredOpt(options, "table")
    val v = GraftTableProvider.resolveVersion(cat, table,
      opt(options, "versionAsOf"), opt(options, "timestampAsOf"))
    val pred = ZonePred.And(
      pushed.toSeq.map(GraftTableProvider.filterPred) :+ runtimePred)
    val (bytes, rows, colStats0) =
      VersionedTable.batchPlanStats(cat, table, v, pred)
    // two lower bounds, take the max: rows × pruned-schema default width
    // (catches narrow tables whose parquet compresses to nothing), and
    // on-disk bytes scaled by the pruned/full width ratio (catches wide
    // VARIABLE data — a documents table's multi-KB text rows would look
    // like 20 bytes each under defaultSize and a gigabyte table would
    // wrongly broadcast). Legacy row-less manifests use bytes alone.
    val widthRatio =
      if (dataSchema.defaultSize <= 0) 1.0
      else required.defaultSize.toDouble / dataSchema.defaultSize
    val scaledBytes = math.max(1L, (bytes * math.min(1.0, widthRatio)).toLong)
    val size = rows.fold(bytes)(r =>
      math.max(r * math.max(1L, required.defaultSize.toLong), scaledBytes))
    // column-level stats (manifest-exact min/max domains + null counts)
    // for CBO's filter/join estimation — same survivor set as the
    // row/byte sums above (one manifest pass for all three)
    val colStats = colStats0
      .filter { case (c, _) => dataSchema.fieldNames.contains(c) }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong =
        rows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
      override def columnStats()
          : java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
            org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        colStats.foreach { case (c, (range, nulls)) =>
          m.put(org.apache.spark.sql.connector.expressions.Expressions.column(c),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def min(): java.util.Optional[Object] =
                range.fold(java.util.Optional.empty[Object]())(r =>
                  java.util.Optional.of(r._1.asInstanceOf[Object]))
              override def max(): java.util.Optional[Object] =
                range.fold(java.util.Optional.empty[Object]())(r =>
                  java.util.Optional.of(r._2.asInstanceOf[Object]))
              override def nullCount(): java.util.OptionalLong =
                nulls.fold(java.util.OptionalLong.empty())(
                  java.util.OptionalLong.of)
            })
        }
        m
      }
    }
  }

  override def toBatch: Batch = new GraftBatch(
    dataSchema, required, options, pushed, () => runtimePred, limit, topN,
    pinnedVersion)

  /** APPEND-TAIL stream (`spark.readStream.format("graft")`) — see
    * [[graft.streaming.GraftAppendStream]]. (Spark applies no
    * pushdown to streaming scans, so `required`/`pushed` here are the
    * full schema / empty in practice — passed through for the day the
    * engine grows streaming pushdown.) */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    def o(k: String) = options.find(_._1.equalsIgnoreCase(k)).map(_._2)
    require(o("versionAsOf").isEmpty && o("timestampAsOf").isEmpty,
      "time travel options do not compose with a stream — use " +
        "startingVersion/startingTimestamp to begin the tail at a " +
        "version's appends")
    val spark = SparkSession.active
    val dir = o("dir").getOrElse(throw new IllegalArgumentException(
      "graft format requires option 'dir'"))
    val table = o("table").getOrElse(throw new IllegalArgumentException(
      "graft format requires option 'table'"))
    new graft.streaming.GraftAppendStream(spark,
      dir = dir, table = table,
      dataSchema = dataSchema, requiredSchema = required,
      filters = pushed.toSeq,
      maxVersionsPerTrigger = o("maxVersionsPerTrigger").map(_.toLong),
      maxBytesPerTrigger = o("maxBytesPerTrigger").map(_.toLong),
      skipChangeCommits = o("skipChangeCommits").exists(_.toBoolean),
      startingVersion = graft.streaming.CdcStreamProvider
        .resolveStartingVersion(new Catalog(spark, dir), table,
          o("startingVersion").map(_.toLong), o("startingTimestamp"),
          failOnDataLoss = o("failOnDataLoss").exists(_.toBoolean),
          startingTag = o("startingTag")),
      admissionFilter = o("admissionFilter").map(_.trim).filter(_.nonEmpty))
  }
}

private[sources] final class GraftBatch(
    dataSchema: StructType, requiredSchema: StructType,
    options: Map[String, String], pushed: Array[sources.Filter],
    runtime: () => ZonePred.P = () => ZonePred.And(Nil),
    limit: Option[Int] = None,
    topN: Option[(String, Boolean, Long)] = None,
    // set iff limit/topN carry a tombstone pad: the builder's resolved
    // version, so pad and planned tombstone state come from ONE manifest
    pinnedVersion: Option[Long] = None) extends Batch {

  /** Whether the PLANNED partitions carry any deletion vector — set by
    * planInputPartitions and read by createReaderFactory, so the two
    * always describe ONE version: re-resolving the head in the factory
    * would race a concurrent commit (e.g. a compaction materializing
    * DVs) into a factory that can't serve the planned slices.
    * BatchScanExec materializes partitions before it builds the
    * factory, so the flag is always set when consulted. */
  @volatile private var plannedHasDv = true // safe default: DV-capable
  // the planned version's COLUMN MAPPING — captured with the file plan
  // so a rename committing between planning and factory construction
  // can't mistranslate (same one-version rule as plannedHasDv)
  @volatile private var plannedPhysOf: Map[String, String] = Map.empty
  // the planned version's live equality tombstones (keys, seq, files)
  @volatile private var plannedEq: Seq[(Seq[String], Long, Seq[String])] = Nil

  override def planInputPartitions(): Array[InputPartition] = {
    import GraftTableProvider.{opt, requiredOpt}
    val spark = SparkSession.active
    val cat = new Catalog(spark, requiredOpt(options, "dir"))
    val table = requiredOpt(options, "table")
    // the version is resolved ONCE and pinned for every sub-plan below
    // (slices, column mapping, tombstone state, SPJ row counts): an
    // eq-upsert or rename committing between two independent head reads
    // would otherwise apply version-(N+1) metadata to version-N slices —
    // matched rows would vanish from the snapshot (neither old nor new
    // value visible)
    val v = pinnedVersion
      .orElse(GraftTableProvider.resolveVersion(cat, table,
        opt(options, "versionAsOf"), opt(options, "timestampAsOf")))
      .orElse(VersionedTable.currentVersion(cat, table))
    // runtime() re-reads the scan's dynamic-filter state: BatchScanExec
    // re-plans partitions AFTER scan.filter(...) lands, so join-time IN
    // sets prune files here exactly like static pushdown
    val pred = ZonePred.And(
      pushed.toSeq.map(GraftTableProvider.filterPred) :+ runtime())
    val slices = VersionedTable.batchSlices(cat, table, v, pred,
      limitRows = limit.map(_.toLong), topN = topN)
    plannedHasDv = slices.exists(_._3.nonEmpty)
    plannedPhysOf = VersionedTable.columnMapping(cat, table, v)
    // live equality tombstones ride the plan: each slice carries its
    // stamp, the factory ships the key-file specs — key-set loading AND
    // probing both happen in the tasks (the write-without-read upsert's
    // read half; zero driver state)
    val (eqEntries, eqStamps) =
      v match {
        case Some(vv) => VersionedTable.eqDeleteState(cat, table, vv)
        case None => (Nil, Map.empty[String, Long])
      }
    plannedEq = eqEntries
    val stampsNorm = eqStamps.map { case (k, x) =>
      new org.apache.hadoop.fs.Path(k).toUri.getPath -> x }
    val fileSlices =
      slices.map { case (p, l, dv) => CdcMicroBatch.FileSlice(p, l, dv,
        eqSeq = stampsNorm.getOrElse(
          new org.apache.hadoop.fs.Path(p).toUri.getPath, Long.MaxValue)) }
    // storage-partitioned join: one KEYED partition per bucket (all N
    // present — empty buckets are no-op tasks), matching the scan's
    // reported KeyGroupedPartitioning exactly; LIMIT/top-N plans keep
    // the flat shape (their truncation walks are order-dependent)
    GraftTableProvider.spjBucketSpec(options, requiredSchema)
      .filter(_ => limit.isEmpty && topN.isEmpty) match {
      case Some((_, n)) =>
        val pat = "__gbucket=(\\d+)/".r
        def bucketOf(path: String): Option[Int] =
          pat.findFirstMatchIn(path).map(_.group(1).toInt)
        // files outside a bucket dir: the CREATE's empty schema-bearing
        // file (recorded rows = 0) contributes nothing — drop it; a
        // ROW-BEARING one would be a layout violation, plan flat
        val rowsByAbs = VersionedTable.fileRowCounts(cat, table, v)
        val (inBucket, stray) =
          fileSlices.partition(s => bucketOf(s.path).exists(_ < n))
        if (stray.forall(s => rowsByAbs.get(s.path).contains(0L)))
          // SEVERAL task-sized keyed partitions per bucket (split +
          // packed like any scan): Spark re-groups them to one task per
          // key on the classic SPJ path, and with
          // partiallyClusteredDistribution enabled keeps a HOT bucket's
          // splits as separate tasks, replicating the other side's
          // group — skew stops pinning one task per bucket with no
          // fallback exchange. Empty buckets still plan one no-op keyed
          // partition so both sides always present all N keys.
          (0 until n).flatMap { b =>
            val mine = inBucket.filter(s => bucketOf(s.path).contains(b))
            val packs = PlainBatchRead.splitAndPack(spark, mine)
            if (packs.isEmpty)
              Seq(PlainBatchRead.BucketFilesInputPartition(Nil, b)
                : InputPartition)
            else packs.map(g =>
              PlainBatchRead.BucketFilesInputPartition(g, b): InputPartition)
          }.toArray
        else PlainBatchRead.planPartitions(spark, fileSlices)
      case None =>
        // Spark-style split + pack: big files fan out across tasks, tiny
        // files share one — see [[PlainBatchRead.planPartitions]]
        PlainBatchRead.planPartitions(spark, fileSlices)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // VECTORIZED even under deletion vectors: when any planned partition
    // carries a DV the factory gets the batch-returning row-index twin
    // and applies the vector by selection ([[DvColumnar]]) — one MOR
    // delete no longer drops the whole scan to row mode.
    // Tombstone key sets ship as FILE SPECS and load executor-side
    // ([[PlainBatchRead.eqDeleteSet]]) — no driver collect, however
    // large the CDC batch behind the tombstone was
    PlainBatchRead.readerFactory(spark, dataSchema,
      requiredSchema, pushed.toSeq, allowColumnar = true,
      mayHaveDv = plannedHasDv, physOf = plannedPhysOf,
      eqDeletes = plannedEq)
  }
}

object GraftTableProvider {

  /** THE option accessors — one copy of the case-insensitive lookup,
    * the required-option error, and the csv splitting, shared by every
    * read/write/stream/DML surface of the format. */
  private[graft] def opt(options: Map[String, String], k: String): Option[String] =
    options.find(_._1.equalsIgnoreCase(k)).map(_._2)

  /** BRANCH redirect for the reader-option surface: a non-numeric
    * `versionAsOf` that is not a tag but IS a branch rewrites the
    * options onto the branch table's live head — the same indirection
    * the SQL catalog's `VERSION AS OF 'dev'` applies. */
  private[sources] def rewriteBranchRef(options: Map[String, String])
      : Map[String, String] =
    (for {
      d <- opt(options, "dir")
      t <- opt(options, "table")
      r <- opt(options, "versionAsOf").map(_.trim)
      if !r.matches("[+-]?\\d+")
      cat = new Catalog(SparkSession.active, d)
      if VersionedTable.tagVersion(cat, t, r).isEmpty
      bt <- VersionedTable.branchTableOf(cat, t, r)
    } yield options.filterNot(kv => kv._1.equalsIgnoreCase("versionAsOf") ||
      kv._1.equalsIgnoreCase("table")) + ("table" -> bt))
      .getOrElse(options)

  private[graft] def requiredOpt(options: Map[String, String], k: String): String =
    opt(options, k).getOrElse(throw new IllegalArgumentException(
      s"graft format requires option '$k'"))

  private[graft] def csvOpt(options: Map[String, String], k: String): Seq[String] =
    opt(options, k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** The bucket spec to report for STORAGE-PARTITIONED JOINS, when the
    * shape qualifies: `spark.sql.sources.v2.bucketing.enabled` on, the
    * table hash-bucketed, every bucket key in the scan's pruned output
    * (Spark resolves the transform's references against the scan
    * output), and no time travel (an old version's file set must not be
    * grouped by the head's spec). One helper so the scan's REPORT and
    * the batch's PLAN can never disagree. */
  private[sources] def spjBucketSpec(options: Map[String, String],
                                     required: StructType)
      : Option[(Seq[String], Int)] = {
    val spark = SparkSession.active
    val on = spark.conf
      .getOption("spark.sql.sources.v2.bucketing.enabled")
      .exists(_.toBoolean)
    if (!on || opt(options, "versionAsOf").nonEmpty ||
        opt(options, "timestampAsOf").nonEmpty) None
    else for {
      d <- opt(options, "dir")
      t <- opt(options, "table")
      spec <- VersionedTable.bucketSpec(new Catalog(spark, d), t)
      if spec._1.forall(k =>
        required.fieldNames.exists(_.equalsIgnoreCase(k)))
    } yield spec
  }

  /** Resolve the time-travel options to a concrete version: `versionAsOf`
    * wins alone (a number is a version, anything else a TAG — the same
    * [[VersionedTable.resolveVersionRef]] the SQL path uses),
    * `timestampAsOf` (epoch millis, or ISO-8601 parsed as UTC — the
    * project-wide session contract) resolves by manifest commit time;
    * both together are rejected. */
  private[sources] def resolveVersion(cat: Catalog, table: String,
                                      versionAsOf: Option[String],
                                      timestampAsOf: Option[String]): Option[Long] = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    versionAsOf.map(VersionedTable.resolveVersionRef(cat, table, _))
      .orElse(timestampAsOf.map { t =>
        VersionedTable.versionAt(cat, table,
          graft.streaming.CdcStreamProvider.parseUtcMillis(t))
      })
  }

  /** EXACT translation of a pushed `sources.Filter` back into a Column —
    * for `DELETE FROM`'s condition, where (unlike pruning) the semantics
    * must be total: None = not expressible, the delete refuses. Distinct
    * from [[filterPred]], whose one-sided Unknown is fine for skipping
    * but would make a delete destroy the wrong rows. */
  private[sources] def filterColumn(f: sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case sources.EqualTo(a, v) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case sources.IsNull(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for { cl <- filterColumn(l); cr <- filterColumn(r) } yield cl && cr
      case sources.Or(l, r) =>
        for { cl <- filterColumn(l); cr <- filterColumn(r) } yield cl || cr
      case sources.Not(inner) => filterColumn(inner).map(!_)
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  /** A routed equality DELETE above this many literal tuples falls back
    * to the standard path: the tuple frame builds as a driver-side
    * union, and a condition carrying thousands of literals is better
    * served by the boundary-rewrite delete's set-oriented plan. */
  private val MaxEqDeleteTuples = 1024

  /** Parse `filters` (implicitly ANDed — the shape `deleteWhere`
    * receives) into equality key TUPLES: `Some((cols, tuples))` when
    * the whole condition is exactly "the row's `cols` tuple ∈ `tuples`"
    * — the only predicate an equality tombstone can express. Admitted
    * leaves: `EqualTo` with a non-null literal (SQL `=` never matches
    * null rows, and a non-null tombstone key matches only equal
    * non-null values — same rows), `EqualNullSafe` (tombstone keys
    * match null-safely — exactly `<=>`), and null-free `In`. `And`
    * cross-merges the two sides' tuple sets (a tuple binding the same
    * column to two different values is a contradiction and drops);
    * `Or` unions them. Every surviving tuple must bind the SAME column
    * set — a partial binding (`k1 = 5` on a two-column tombstone frame)
    * would need a wildcard no key file can record. Anything else —
    * ranges, IS NULL, NOT, functions — returns None and the statement
    * takes the standard delete. */
  private[sources] def eqDeleteTuples(filters: Array[sources.Filter])
      : Option[(Seq[String], Seq[Map[String, Any]])] = {
    def sameVal(a: Any, b: Any): Boolean = (a, b) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x, y) => x == y
    }
    def merge(a: Seq[Map[String, Any]], b: Seq[Map[String, Any]])
        : Seq[Map[String, Any]] =
      for {
        x <- a; y <- b
        if x.keySet.intersect(y.keySet).forall(k => sameVal(x(k), y(k)))
      } yield x ++ y
    def go(f: sources.Filter): Option[Seq[Map[String, Any]]] = f match {
      case sources.EqualTo(c, v) if v != null =>
        Some(Seq(Map(c.toLowerCase -> v)))
      case sources.EqualNullSafe(c, v) =>
        Some(Seq(Map(c.toLowerCase -> v)))
      case sources.In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        Some(vs.toSeq.map(v => Map(c.toLowerCase -> (v: Any))))
      case sources.And(l, r) =>
        for { a <- go(l); b <- go(r) } yield merge(a, b)
      case sources.Or(l, r) =>
        for { a <- go(l); b <- go(r) } yield a ++ b
      case _ => None
    }
    val per = filters.toSeq.map(go)
    if (per.isEmpty || per.exists(_.isEmpty)) return None
    val tuples = per.map(_.get).reduceLeft(merge)
    // all-contradiction (`k = 1 AND k = 2`) matches zero rows — let the
    // standard path prove the no-op rather than special-casing it here
    if (tuples.isEmpty || tuples.size > MaxEqDeleteTuples) return None
    val colSets = tuples.map(_.keySet).distinct
    if (colSets.size != 1) return None
    Some((colSets.head.toSeq.sorted, tuples))
  }

  /** Dynamic-filter IN lists above this stay unpruned: zone-map
    * evaluation is O(files × values) on the driver, and a join key with
    * thousands of distinct survivors prunes few files anyway. */
  private val MaxRuntimeInValues = 4096

  /** Runtime V2 predicate (what Spark's dynamic file pruning hands
    * [[GraftScan.filter]] — an IN/= over a join key, values from the
    * executed dim side) into the neutral [[ZonePred]] tree. V2 literals
    * carry Catalyst-INTERNAL values (UTF8String, days, micros), so each
    * converts through its declared type back to the external JVM value
    * the zone-map domain logic canonicalizes. An EMPTY IN is exact
    * ("no key survived the dim filter" — every file skips); only
    * unrecognized shapes, nulls, and oversized lists become Unknown. */
  private[sources] def runtimeFilterPred(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate): ZonePred.P = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def colName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case n: NamedReference if n.fieldNames().length == 1 =>
        Some(n.fieldNames()(0))
      case _ => None
    }
    p.name() match {
      case "IN" | "=" =>
        val kids = p.children().toSeq
        (kids.headOption.flatMap(colName), kids.drop(1)) match {
          case (Some(c), lits) if lits.size <= MaxRuntimeInValues &&
              lits.forall(_.isInstanceOf[V2Literal[_]]) =>
            val vs = lits.map { l =>
              val lit = l.asInstanceOf[V2Literal[_]]
              org.apache.spark.sql.catalyst.CatalystTypeConverters
                .createToScalaConverter(lit.dataType())(lit.value())
            }
            if (vs.contains(null) || (p.name() == "=" && vs.size != 1))
              ZonePred.Unknown
            else ZonePred.Leaf(c, if (p.name() == "=") "eq" else "in", vs)
          case _ => ZonePred.Unknown
        }
      case "AND" => ZonePred.And(p.children().toSeq.collect {
        case q: org.apache.spark.sql.connector.expressions.filter.Predicate =>
          runtimeFilterPred(q)
      })
      case _ => ZonePred.Unknown
    }
  }

  /** The third predicate walker: Spark's public `sources.Filter` algebra
    * (what DSv2 pushes to scans) into the neutral [[ZonePred]] tree —
    * unsupported shapes become Unknown (= cannot skip), same one-sided
    * contract as the Column-tree and Catalyst walkers. */
  private[sources] def filterPred(f: sources.Filter): ZonePred.P = f match {
    case sources.And(l, r) => ZonePred.And(Seq(filterPred(l), filterPred(r)))
    case sources.Or(l, r) => ZonePred.Or(Seq(filterPred(l), filterPred(r)))
    case sources.Not(inner) => filterPred(inner) match {
      case ZonePred.NullCheck(c, b) => ZonePred.NullCheck(c, !b)
      case _ => ZonePred.Unknown
    }
    case sources.IsNull(a) => ZonePred.NullCheck(a, isNot = false)
    case sources.IsNotNull(a) => ZonePred.NullCheck(a, isNot = true)
    case sources.EqualTo(a, v) if v != null => ZonePred.Leaf(a, "eq", Seq(v))
    case sources.EqualNullSafe(a, v) if v != null => ZonePred.Leaf(a, "eq", Seq(v))
    case sources.LessThan(a, v) if v != null => ZonePred.Leaf(a, "lt", Seq(v))
    case sources.LessThanOrEqual(a, v) if v != null => ZonePred.Leaf(a, "le", Seq(v))
    case sources.GreaterThan(a, v) if v != null => ZonePred.Leaf(a, "gt", Seq(v))
    case sources.GreaterThanOrEqual(a, v) if v != null => ZonePred.Leaf(a, "ge", Seq(v))
    case sources.In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
      ZonePred.Leaf(a, "in", vs.toSeq)
    case _ => ZonePred.Unknown
  }
}
