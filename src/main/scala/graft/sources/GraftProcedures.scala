package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}

import graft.etl.{Catalog, VersionedTable}

/** The OPS surface of versioned tables in PURE SQL — stored procedures on
  * the [[GraftCatalog]] (the `ProcedureCatalog` contract, the same shape
  * the big table formats expose their maintenance through):
  *
  * {{{
  *   CALL g.system.history('events')        -- one row per retained version
  *   CALL g.system.rollback('events', 3)    -- undo to v3 (a NEW commit)
  *   CALL g.system.vacuum('events', 10)     -- keep last 10, reclaim files
  * }}}
  *
  * Each returns its result as rows (a driver-local scan — these are
  * metadata operations over manifests, vacuum-bounded, never data-sized),
  * so `CALL` composes with SQL tooling: the history result is the same
  * frame [[VersionedTable.history]] returns, and rollback/vacuum report
  * what they did instead of succeeding silently. Completes the SQL-first
  * story F35/F36 opened: tables a SQL user can create, load, query,
  * time-travel, audit, roll back, and garbage-collect without one graft
  * import.
  */
private[sources] object GraftProcedures {

  /** Wrap a one-off metadata result as the procedure-call scan. */
  private final class ResultScan(schema: StructType,
                                 result: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = result
    override def readSchema(): StructType = schema
    override def description(): String = "graft procedure result"
  }

  private def one(schema: StructType, values: Any*): JIterator[Scan] =
    Collections.singletonList[Scan](new ResultScan(schema,
      Array(new GenericInternalRow(values.toArray)))).iterator()

  private def param(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()

  private abstract class GraftProc(procName: String, procDesc: String,
                                   params: Array[ProcedureParameter])
    extends UnboundProcedure {
    override def name(): String = procName
    override def description(): String = procDesc
    def run(input: InternalRow): JIterator[Scan]
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = procName
      override def description(): String = procDesc
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): JIterator[Scan] = run(input)
    }
  }

  /** `CALL g.system.history('t')` — the [[VersionedTable.history]] frame
    * (version, committed_at, n_files, total_bytes, total_rows, max_id,
    * bucketed) as a procedure result set. */
  def history(cat: () => Catalog): UnboundProcedure =
    new GraftProc("history",
      "one row per retained version of a versioned table (pure metadata)",
      Array(param("table", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val df = VersionedTable.history(cat(), input.getUTF8String(0).toString)
        // executeCollect hands back InternalRows directly — a tiny
        // driver-side frame (vacuum-bounded versions), same as the API
        Collections.singletonList[Scan](new ResultScan(df.schema,
          df.queryExecution.executedPlan.executeCollect())).iterator()
      }
    }

  /** `CALL g.system.rollback('t', v)` — commit a new head equal to
    * version v; returns the committed version number. */
  def rollback(cat: () => Catalog): UnboundProcedure =
    new GraftProc("rollback",
      "roll a versioned table back to an older version (a new O(1) commit)",
      Array(param("table", StringType), param("version", LongType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val committed = VersionedTable.rollback(cat(),
          input.getUTF8String(0).toString, input.getLong(1))
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.compact('t', targetBytes[, where])` — bin-pack the
    * head version's small files toward the target size (one new commit);
    * an optional `where` SQL predicate SCOPES the rewrite to files whose
    * zone maps admit it (`OPTIMIZE ... WHERE` — maintain one hot
    * partition without touching the table). Returns the committed
    * version. */
  def compact(cat: () => Catalog): UnboundProcedure =
    new GraftProc("compact",
      "bin-pack a versioned table's small files toward a target size",
      Array(param("table", StringType), param("target_bytes", LongType),
        ProcedureParameter.in("where", StringType)
          .defaultValue("''").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val where = Option(input)
          .filterNot(_.isNullAt(2)).map(_.getUTF8String(2).toString.trim)
          .filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
        val committed = VersionedTable.compact(cat(),
          input.getUTF8String(0).toString, input.getLong(1), where)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.clone('src', 'dst', v)` — zero-copy clone of version
    * v into a new table in the same catalog (one metadata commit, no
    * data I/O; the source's vacuum protects the shared files until the
    * clone is dropped); returns the clone's committed version (1). */
  def clone(cat: () => Catalog): UnboundProcedure =
    new GraftProc("clone",
      "zero-copy clone of a version into a new table (metadata-only)",
      Array(param("source", StringType), param("target", StringType),
        param("version", LongType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val c = cat()
        val committed = VersionedTable.cloneTable(c,
          input.getUTF8String(0).toString, c,
          input.getUTF8String(1).toString, input.getLong(2))
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.recluster('t', 'col1,col2', target_bytes)` — rewrite
    * the head version sorted/z-ordered on the given columns so zone maps
    * turn selective on them (the OPTIMIZE ZORDER shape); returns the
    * committed version. Flat tables only — a bucketed table's locality
    * IS its bucket hash ([[VersionedTable.recluster]]). */
  def recluster(cat: () => Catalog): UnboundProcedure =
    new GraftProc("recluster",
      "re-sort a versioned table on cluster columns for zone-map locality",
      Array(param("table", StringType), param("cluster_by", StringType),
        param("target_bytes", LongType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val cols = input.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val committed = VersionedTable.recluster(cat(),
          input.getUTF8String(0).toString, cols, input.getLong(2))
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.expire_snapshots('t', older_than[, dry_run])` —
    * TIME-based retention (the Iceberg procedure shape, Delta's
    * `VACUUM ... RETAIN` semantics): reclaim versions recorded older
    * than the given instant (epoch millis or ISO-8601 UTC), head always
    * kept; returns the reclaimed file count. Resolution is by
    * manifest-RECORDED commit times, so a restored backup ages
    * correctly. */
  def expireSnapshots(cat: () => Catalog): UnboundProcedure =
    new GraftProc("expire_snapshots",
      "reclaim versions committed before an instant (head always kept)",
      Array(param("table", StringType), param("older_than", StringType),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val millis = graft.streaming.CdcStreamProvider.parseUtcMillis(
          input.getUTF8String(1).toString)
        val dry = !input.isNullAt(2) && input.getBoolean(2)
        val removed = VersionedTable.vacuumOlderThan(cat(),
          input.getUTF8String(0).toString, millis, dryRun = dry)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("files_deleted", IntegerType,
            nullable = false))), removed)
      }
    }

  /** `CALL g.system.vacuum('t', keepLast[, dryRun])` — drop manifests
    * older than the newest keepLast versions and reclaim unreferenced
    * files (live clones' shared files stay protected); returns the
    * delete count. `dry_run => true` only REPORTS what would go —
    * the operator's pre-flight before an irreversible reclaim. */
  def vacuum(cat: () => Catalog): UnboundProcedure =
    new GraftProc("vacuum",
      "reclaim files unreferenced by the newest keep_last versions",
      Array(param("table", StringType), param("keep_last", IntegerType),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val dry = !input.isNullAt(2) && input.getBoolean(2)
        val removed = VersionedTable.vacuum(cat(),
          input.getUTF8String(0).toString, input.getInt(1), dryRun = dry)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("files_deleted", IntegerType,
            nullable = false))), removed)
      }
    }

  /** `CALL g.system.fast_forward('t', 't_dev')` — PUBLISH a branch
    * (a zero-copy clone of 't') back onto 't' as ONE metadata commit:
    * the write-audit-publish pattern. Refuses if 't' advanced since the
    * branch was cloned (git's fast-forward rule). Returns the committed
    * version. */
  def fastForward(cat: () => Catalog): UnboundProcedure =
    new GraftProc("fast_forward",
      "publish a branch (clone) back onto its source — one metadata commit",
      Array(param("table", StringType), param("branch", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val c = cat()
        val table = input.getUTF8String(0).toString
        // the second argument is a BRANCH NAME when one exists (the
        // create_branch sugar), else a clone table's name (the raw WAP
        // shape) — one procedure publishes both
        val ref = input.getUTF8String(1).toString
        val branchTable = VersionedTable.branchTableOf(c, table, ref)
          .getOrElse(ref)
        val committed = VersionedTable.fastForward(c, table, c, branchTable)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.create_branch('t', 'dev')` — named-branch sugar
    * over the clone + fast_forward write-audit-publish cycle: zero-copy
    * clone t's head into an engine-named table, record the ref. Read
    * the branch with `VERSION AS OF 'dev'`, write to the returned
    * table, publish with `fast_forward('t', 'dev')`. */
  def createBranch(cat: () => Catalog): UnboundProcedure =
    new GraftProc("create_branch",
      "create a named branch (zero-copy clone) of a table's head",
      Array(param("table", StringType), param("name", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val bt = VersionedTable.createBranch(cat(),
          input.getUTF8String(0).toString,
          input.getUTF8String(1).toString)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("branch_table", StringType,
            nullable = false))),
          org.apache.spark.unsafe.types.UTF8String.fromString(bt))
      }
    }

  /** `CALL g.system.drop_branch('t', 'dev')` — drop the branch REF; the
    * branch's table remains an ordinary table until dropped itself. */
  def dropBranch(cat: () => Catalog): UnboundProcedure =
    new GraftProc("drop_branch",
      "drop a named branch ref (the branch table itself remains)",
      Array(param("table", StringType), param("name", StringType),
        ProcedureParameter.in("if_exists", BooleanType)
          .defaultValue("false").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val ifExists = !input.isNullAt(2) && input.getBoolean(2)
        val dropped = VersionedTable.dropBranch(cat(),
          input.getUTF8String(0).toString,
          input.getUTF8String(1).toString, ifExists)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("dropped", BooleanType,
            nullable = false))), dropped)
      }
    }

  /** `CALL g.system.branches('t')` — one row per branch (name,
    * branch_table, created_at millis), name-sorted. */
  def branches(cat: () => Catalog): UnboundProcedure =
    new GraftProc("branches",
      "list a table's named branches (pure metadata)",
      Array(param("table", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val rows = VersionedTable.branches(cat(),
          input.getUTF8String(0).toString).map { case (n, bt, ts) =>
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(n),
            org.apache.spark.unsafe.types.UTF8String.fromString(bt), ts))
            : InternalRow
        }.toArray
        val schema = StructType(Seq(
          org.apache.spark.sql.types.StructField("name", StringType,
            nullable = false),
          org.apache.spark.sql.types.StructField("branch_table", StringType,
            nullable = false),
          org.apache.spark.sql.types.StructField("created_at", LongType,
            nullable = false)))
        Collections.singletonList[Scan](
          new ResultScan(schema, rows)).iterator()
      }
    }

  /** `CALL g.system.remove_orphan_files('t'[, dry_run])` — reclaim
    * data/DV files no retained version references (crashed commits'
    * staged batches, lost-CAS leftovers) while keeping EVERY version
    * readable; returns the delete count. `dry_run => true` only
    * reports. */
  def removeOrphanFiles(cat: () => Catalog): UnboundProcedure =
    new GraftProc("remove_orphan_files",
      "reclaim files referenced by no retained version (history kept)",
      Array(param("table", StringType),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false").build(),
        // grace window: unreferenced files YOUNGER than this instant are
        // kept — they may be a concurrent writer's staged batch (the
        // Iceberg older_than rule; default = 24 h ago)
        ProcedureParameter.in("older_than", StringType)
          .defaultValue("''").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val dry = !input.isNullAt(1) && input.getBoolean(1)
        val cutoff = Option(input).filterNot(_.isNullAt(2))
          .map(_.getUTF8String(2).toString.trim).filter(_.nonEmpty)
          .map(graft.streaming.CdcStreamProvider.parseUtcMillis)
          .getOrElse(System.currentTimeMillis() - 24L * 3600 * 1000)
        val removed = VersionedTable.removeOrphanFiles(cat(),
          input.getUTF8String(0).toString, dryRun = dry,
          olderThanMs = cutoff)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("files_deleted", IntegerType,
            nullable = false))), removed)
      }
    }

  /** `CALL g.system.create_tag('t', 'v1_release', 3)` — NAMED REFS: an
    * immutable tag → version pointer (`SELECT ... FROM t VERSION AS OF
    * 'v1_release'`), one O(1) meta-dir file, no manifest commit. A tag
    * PINS retention: vacuum/expire keep every version at or after the
    * oldest tagged one until the tag is dropped. Returns the tagged
    * version. */
  def createTag(cat: () => Catalog): UnboundProcedure =
    new GraftProc("create_tag",
      "tag a retained version with an immutable name (pins retention)",
      Array(param("table", StringType), param("name", StringType),
        param("version", LongType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val v = input.getLong(2)
        VersionedTable.createTag(cat(), input.getUTF8String(0).toString,
          input.getUTF8String(1).toString, v)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("tagged_version", LongType,
            nullable = false))), v)
      }
    }

  /** `CALL g.system.drop_tag('t', 'v1_release')` — drop a tag (releases
    * its retention pin); returns whether a tag was dropped. */
  def dropTag(cat: () => Catalog): UnboundProcedure =
    new GraftProc("drop_tag",
      "drop a named tag, releasing its retention pin",
      Array(param("table", StringType), param("name", StringType),
        ProcedureParameter.in("if_exists", BooleanType)
          .defaultValue("false").build())) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val ifExists = !input.isNullAt(2) && input.getBoolean(2)
        val dropped = VersionedTable.dropTag(cat(),
          input.getUTF8String(0).toString,
          input.getUTF8String(1).toString, ifExists)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("dropped", BooleanType,
            nullable = false))), dropped)
      }
    }

  /** `CALL g.system.tags('t')` — one row per tag (name, version,
    * created_at millis), name-sorted. */
  def tags(cat: () => Catalog): UnboundProcedure =
    new GraftProc("tags",
      "list a table's named tags (pure metadata)",
      Array(param("table", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val rows = VersionedTable.tags(cat(),
          input.getUTF8String(0).toString).map { case (n, v, ts) =>
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(n), v, ts))
            : InternalRow
        }.toArray
        val schema = StructType(Seq(
          org.apache.spark.sql.types.StructField("name", StringType,
            nullable = false),
          org.apache.spark.sql.types.StructField("version", LongType,
            nullable = false),
          org.apache.spark.sql.types.StructField("created_at", LongType,
            nullable = false)))
        Collections.singletonList[Scan](
          new ResultScan(schema, rows)).iterator()
      }
    }

  /** `CALL g.system.eq_upsert('t', '<source>', 'k1,k2')` — the
    * WRITE-WITHOUT-READ keyed upsert in pure SQL: `source` is a
    * table/view name or any SELECT/WITH/VALUES statement; its frame
    * commits as data files plus ONE key tombstone, never probing the
    * target (the Iceberg equality-delete shape — O(batch) per
    * statement, the continuous-CDC-ingest write path). Matched rows'
    * surrogate ids are NOT preserved (delete + insert semantics, unlike
    * MERGE's copy-on-write merge); reads resolve the tombstones
    * in-task; compaction (or the `compact.trigger.eq_tombstones` prop)
    * materializes them. Returns the committed version. */
  def eqUpsert(cat: () => Catalog): UnboundProcedure =
    new GraftProc("eq_upsert",
      "write-without-read keyed upsert: batch files + one key tombstone",
      Array(param("table", StringType), param("source", StringType),
        param("keys", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val c = cat()
        val srcTxt = input.getUTF8String(1).toString.trim
        // a statement-shaped source runs as SQL; anything else resolves
        // as a table/view name (the two spellings users reach for)
        val df =
          if (srcTxt.matches("(?is)\\s*(select|with|values|from|table)\\b[\\s\\S]*"))
            c.spark.sql(srcTxt)
          else c.spark.table(srcTxt)
        val keys = input.getUTF8String(2).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val committed = VersionedTable.upsertEqualityDelete(c,
          input.getUTF8String(0).toString, df, keys)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.eq_delete('t', '<source>', 'k1,k2')` — the
    * WRITE-WITHOUT-READ keyed DELETE in pure SQL: `source` (a table/
    * view name or any SELECT/WITH/VALUES statement) provides the key
    * tuples; they commit as ONE key tombstone with NO data files, never
    * probing the target — the delete half of the CDC contract beside
    * [[eqUpsert]]. Null keys match null-safely; zero keys (or an empty
    * table) is a metadata no-op. Returns the committed version. */
  def eqDelete(cat: () => Catalog): UnboundProcedure =
    new GraftProc("eq_delete",
      "write-without-read keyed delete: one key tombstone, no data files",
      Array(param("table", StringType), param("source", StringType),
        param("keys", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val c = cat()
        val srcTxt = input.getUTF8String(1).toString.trim
        val df =
          if (srcTxt.matches("(?is)\\s*(select|with|values|from|table)\\b[\\s\\S]*"))
            c.spark.sql(srcTxt)
          else c.spark.table(srcTxt)
        val keys = input.getUTF8String(2).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val committed = VersionedTable.deleteKeysEquality(c,
          input.getUTF8String(0).toString, df, keys)
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }

  /** `CALL g.system.set_partition_spec('t', 'days(ts), truncate(4, h)')`
    * — partition-spec EVOLUTION as one metadata commit: old files stay
    * exactly as prunable as they were (file skipping reads zone maps,
    * never the spec), only later writes arrange by the new derivation;
    * an empty spec drops the declaration. Returns the committed
    * version. */
  def setPartitionSpec(cat: () => Catalog): UnboundProcedure =
    new GraftProc("set_partition_spec",
      "re-point a table's partition transforms (metadata-only)",
      Array(param("table", StringType), param("spec", StringType))) {
      override def run(input: InternalRow): JIterator[Scan] = {
        val committed = VersionedTable.setPartitionSpec(cat(),
          input.getUTF8String(0).toString,
          VersionedTable.parsePartSpec(input.getUTF8String(1).toString))
        one(StructType(Seq(
          org.apache.spark.sql.types.StructField("committed_version", LongType,
            nullable = false))), committed)
      }
    }
}
