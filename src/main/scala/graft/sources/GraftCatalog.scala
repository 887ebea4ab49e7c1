package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column => V2Column, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.{Catalog, VersionedTable}

/** Versioned tables as a Spark CATALOG — the pure-SQL management surface
  * (how the big table formats register):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.g.dir", "/data/warehouse")
  *
  *   CREATE TABLE g.default.events (k BIGINT, s STRING)
  *   INSERT INTO g.default.events VALUES (1, 'a')          -- one version
  *   SELECT * FROM g.default.events                        -- head
  *   SELECT * FROM g.default.events VERSION AS OF 3        -- time travel
  *   SELECT * FROM g.default.events TIMESTAMP AS OF '...'  -- by commit time
  *   CREATE TABLE g.default.copy AS SELECT ...             -- CTAS
  *   SHOW TABLES IN g.default / DROP TABLE g.default.events
  * }}}
  *
  * One flat namespace (`default`) over one graft [[Catalog]] directory;
  * every identifier maps to a versioned table under it. Reads route
  * through [[GraftBatchTable]] (zone-map file pruning, column pruning,
  * parquet pushdown); writes route through the same V1Write commit path
  * (`INSERT INTO` = one versioned commit; concurrent inserts serialize
  * through the manifest CAS). `CREATE TABLE` commits version 1 as one
  * empty schema-bearing file, so the table's schema exists from birth;
  * `CREATE OR REPLACE ... AS SELECT` stages atomically and preserves
  * history ([[GraftStagedTable]]).
  *
  * The ALTER surface is METADATA-ONLY across the board ([[alterTable]]):
  * ADD COLUMN(S) (with DEFAULT values — pre-ADD rows read the frozen
  * existence default), RENAME/DROP COLUMN (name-mode column mapping —
  * files keep immutable physical names), lossless ALTER COLUMN TYPE
  * widening, SET/DROP DEFAULT, COMMENT, SET/UNSET TBLPROPERTIES
  * (validated keys), and ADD/DROP CONSTRAINT (named CHECKs, validated
  * against existing rows). Type NARROWING and lossy changes refuse —
  * they would re-interpret committed files.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var dir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dir = options.get("dir")
    require(dir != null && dir.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.dir")
  }

  override def name(): String = catalogName

  /** DDL may declare column DEFAULT values (CREATE and ALTER): Spark
    * only parses/folds them when the catalog opts in — the values land
    * as field metadata in the recorded schema, where the parquet readers
    * fill `EXISTS_DEFAULT` for files physically lacking the column. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      // GENERATED ALWAYS AS (expr): Spark parses + validates the
      // expression at CREATE; the engine records it as field metadata
      // and computes/verifies it on every write (GeneratedCols)
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      // GENERATED { ALWAYS | BY DEFAULT } AS IDENTITY: the engine
      // assigns start + i*step to null slots on every write, next value
      // derived watermark-free from the head's zone maps
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  override def defaultNamespace(): Array[String] = Array("default")

  // ------------------------------------------------------------ namespaces
  //
  // Namespaces map to catalog SUBDIRECTORIES (the reference's two-DB
  // model — easy_etl/__init__.py:8-10 wires a source and a target
  // database; here `g.src.*` / `g.tgt.*` are sibling directories under
  // one root): `default` IS the root (back-compat — every pre-namespace
  // table keeps its path), any other namespace lives at `dir/<ns>/`,
  // marked by a `_graft_namespace` file so table-data directories can
  // never masquerade as namespaces. One level deep, like the big
  // formats' database level.

  private val NsMarker = "_graft_namespace"

  private def fsOf: org.apache.hadoop.fs.FileSystem =
    new Path(dir).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def isDefault(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  private def nsDir(ns: Array[String]): String =
    if (isDefault(ns)) dir else s"$dir/${ns.head}"

  private def wellFormed(ns: Array[String]): Boolean =
    ns.length <= 1 &&
      ns.headOption.forall(_.matches("[A-Za-z0-9_][A-Za-z0-9_-]*"))

  private def validNs(ns: Array[String]): Unit = {
    require(ns.length <= 1,
      s"graft namespaces are one level deep; got ${ns.mkString(".")}")
    ns.headOption.foreach(n => require(
      n.matches("[A-Za-z0-9_][A-Za-z0-9_-]*"),
      s"invalid namespace name '$n'"))
  }

  /** Contract-shaped: a malformed (multi-level / bad-name) namespace
    * simply does not exist — probes return false, resolution throws
    * NoSuchNamespaceException, never an opaque IllegalArgument. */
  override def namespaceExists(ns: Array[String]): Boolean =
    wellFormed(ns) &&
      (isDefault(ns) || fsOf.exists(new Path(s"${nsDir(ns)}/$NsMarker")))

  override def createNamespace(ns: Array[String],
                               metadata: JMap[String, String]): Unit = {
    validNs(ns)
    require(!isDefault(ns), "namespace 'default' always exists")
    // refuse-loudly convention: graft namespaces carry no metadata, so
    // CREATE NAMESPACE ... WITH PROPERTIES/COMMENT must not "succeed"
    // while silently dropping what the user declared (Spark itself
    // injects an 'owner' property — that one is tolerated and ignored)
    val declared = metadata.asScala.keySet - "owner"
    if (declared.nonEmpty)
      throw new UnsupportedOperationException(
        "graft namespaces carry no metadata — remove " +
          s"${declared.toSeq.sorted.mkString("'", "', '", "'")} " +
          "(properties/comments on CREATE NAMESPACE are unsupported)")
    if (namespaceExists(ns))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(ns)
    val f = fsOf
    f.mkdirs(new Path(nsDir(ns)))
    f.create(new Path(s"${nsDir(ns)}/$NsMarker"), true).close()
  }

  override def listNamespaces(): Array[Array[String]] = {
    val f = fsOf
    val p = new Path(dir)
    val subs =
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq
        .filter(st => st.isDirectory &&
          f.exists(new Path(st.getPath, NsMarker)))
        .map(_.getPath.getName)
    (Seq("default") ++ subs.sorted).map(n => Array(n)).toArray
  }

  override def listNamespaces(parent: Array[String]): Array[Array[String]] = {
    if (parent.isEmpty) listNamespaces()
    else if (namespaceExists(parent)) Array.empty // one level deep
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(parent)
  }

  override def loadNamespaceMetadata(ns: Array[String]): JMap[String, String] = {
    if (!namespaceExists(ns))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(ns)
    new java.util.HashMap[String, String]()
  }

  override def alterNamespace(ns: Array[String],
                              changes: org.apache.spark.sql.connector.catalog
                                .NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  /** DROP NAMESPACE: empty namespaces only (cascade refuses — dropping
    * tables is an explicit, clone-guarded operation). A non-empty
    * namespace surfaces as the contract's
    * [[org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException]]
    * shape, so SQL tooling that catches it (e.g. to offer CASCADE)
    * recognizes the refusal. */
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    validNs(ns)
    require(!isDefault(ns), "cannot drop the default namespace")
    if (!namespaceExists(ns)) false
    else {
      if (listTables(ns).nonEmpty)
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(ns,
            details = "drop its tables first — CASCADE is refused: " +
              "table drops are explicit, clone-guarded operations")
      fsOf.delete(new Path(nsDir(ns)), true)
    }
  }

  /** The graft [[Catalog]] rooted at a namespace's directory — every
    * table operation resolves through this, so `g.src.t` and `g.tgt.t`
    * are fully independent tables. */
  private def catFor(ns: Array[String]): Catalog = {
    if (!namespaceExists(ns))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(ns)
    new Catalog(SparkSession.active, nsDir(ns))
  }

  private def cat: Catalog = new Catalog(SparkSession.active, dir)

  // namespace validation happens in catFor (NoSuchNamespaceException —
  // the contract shape); the name needs no gate of its own
  private def tableName(ident: Identifier): String = ident.name

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val c = catFor(namespace)
    val p = new Path(c.dir)
    val fs = p.getFileSystem(c.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".__vmeta"))
      .map(_.stripSuffix(".__vmeta"))
      .sorted
      .map(n => Identifier.of(
        if (isDefault(namespace)) Array("default") else namespace, n))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    namespaceExists(ident.namespace) &&
      VersionedTable.currentVersion(catFor(ident.namespace),
        tableName(ident)).isDefined

  private def graftTable(ident: Identifier, extra: Map[String, String]): Table = {
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    if (VersionedTable.currentVersion(c, t).isEmpty)
      throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    val opts = Map("dir" -> c.dir, "table" -> t) ++ extra
    // the SQL surface hides the loader's surrogate id column: SELECT *
    // shows the user's columns, and INSERT arity/names align against
    // them (ids keep being stamped by the loader underneath). The
    // path-based format (spark.read.format("graft")) still exposes id.
    val schema = StructType(extra.get("versionAsOf").map(_.toLong)
      .fold(VersionedTable.read(c, t))(VersionedTable.readVersion(c, t, _))
      .schema.fields.filterNot(_.name == "id"))
    new GraftBatchTable(schema, opts, acceptAnySchema = false)
  }

  override def loadTable(ident: Identifier): Table = graftTable(ident, Map.empty)

  /** SQL `VERSION AS OF v` — a number is a version, anything else a
    * NAMED REF: a TAG resolves to a pinned version of THIS table, a
    * BRANCH redirects to the branch table's live head (the
    * write-audit-publish read surface — `VERSION AS OF 'dev'` shows the
    * audit state before `fast_forward` publishes it). Tags win on a
    * (refused-at-create) collision; both resolve through the same
    * VersionedTable helpers the reader-option path uses. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val c = catFor(ident.namespace)
    val t = tableName(ident)
    val s = version.trim
    if (!s.matches("[+-]?\\d+") && VersionedTable.tagVersion(c, t, s).isEmpty)
      VersionedTable.branchTableOf(c, t, s) match {
        case Some(bt) =>
          return graftTable(
            Identifier.of(ident.namespace, bt), Map.empty)
        case None => ()
      }
    graftTable(ident, Map("versionAsOf" ->
      VersionedTable.resolveVersionRef(c, t, version).toString))
  }

  /** SQL `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch.
    * Resolved against the identifier's NAMESPACE (like every other
    * table operation) — against the root dir, a namespaced table's
    * time travel would look up the wrong directory. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val v = VersionedTable.versionAt(catFor(ident.namespace), tableName(ident),
      Math.floorDiv(timestampMicros, 1000L))
    graftTable(ident, Map("versionAsOf" -> v.toString))
  }

  /** `PARTITIONED BY (...)` → graft layouts (HIDDEN partitioning, the
    * Iceberg model re-expressed Spark-first): `bucket(n, col)` becomes
    * the hash-bucket layout (bucket-pruned point lookups, F42);
    * `days(ts)`/`months`/`years`/`hours`/identity become a recorded
    * [[VersionedTable.PartitionSpecProp]] derivation — every write
    * range-clusters files on the derived value so the existing zone
    * maps prune RAW base-column predicates; no directory tree, no
    * user-managed derived column. Multiple temporal/identity transforms
    * compose; at most one bucket transform. */
  private def translatePartitions(partitions: Array[Transform])
      : (Option[(Seq[String], Int)], Seq[VersionedTable.PartTransform],
         Seq[String]) = {
    def one(t: Transform): String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"${t.name()}(...) must reference exactly one top-level column")
      refs.head.fieldNames().head
    }
    def intArg(t: Transform, what: String): Int =
      t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value() match {
            case i: java.lang.Integer => i.intValue()
            case x => x.toString.toInt
          }
      }.getOrElse(throw new IllegalArgumentException(
        s"${t.name()}(...) needs $what"))
    val spec = Seq.newBuilder[VersionedTable.PartTransform]
    var bucket: Option[(Seq[String], Int)] = None
    var clusterBy: Seq[String] = Nil
    partitions.foreach { t =>
      t.name() match {
        case "cluster_by" =>
          // `CLUSTER BY (a, b)` — Delta's liquid-clustering DDL shape,
          // expanded onto the identity-transform range-cluster layout
          // (every write arranges files on the columns, zone maps prune)
          // with the original declaration recorded for reporting
          require(clusterBy.isEmpty, "at most one CLUSTER BY clause")
          val cols = t.references().map { r =>
            require(r.fieldNames().length == 1,
              "CLUSTER BY must reference top-level columns")
            r.fieldNames().head
          }.toSeq
          require(cols.nonEmpty, "CLUSTER BY needs at least one column")
          clusterBy = cols
          cols.foreach(c =>
            spec += VersionedTable.PartTransform("identity", c))
        case "bucket" =>
          require(bucket.isEmpty, "at most one bucket(...) transform")
          val n = intArg(t, "a bucket count")
          val cols = t.references().map { r =>
            require(r.fieldNames().length == 1,
              "bucket(...) must reference top-level columns")
            r.fieldNames().head
          }
          require(cols.nonEmpty, "bucket(...) needs at least one column")
          bucket = Some((cols.toSeq, n))
        case fn @ ("years" | "months" | "days" | "hours") =>
          spec += VersionedTable.PartTransform(fn, one(t))
        case "identity" =>
          spec += VersionedTable.PartTransform("identity", one(t))
        case "truncate" =>
          spec += VersionedTable.PartTransform("truncate", one(t),
            intArg(t, "a width"))
        case other => throw new IllegalArgumentException(
          s"unsupported partition transform '$other' — graft supports " +
            "identity, years, months, days, hours, truncate(n, col), " +
            "bucket(n, col), and CLUSTER BY")
      }
    }
    (bucket, spec.result(), clusterBy)
  }

  override def createTable(ident: Identifier, columns: Array[V2Column],
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    val (bucketBy, pSpec, clusterCols) = translatePartitions(partitions)
    // `id` is the loader's RESERVED surrogate-key column: the load path
    // restamps it and the SQL surface hides it, so a user column of that
    // name would have its data silently destroyed — refuse at CREATE time
    // with the rename guidance instead
    columns.find(_.name.equalsIgnoreCase(graft.etl.Loader.IdCol)).foreach(c =>
      throw new IllegalArgumentException(
        s"column name '${c.name}' is reserved: graft tables stamp their own " +
          "surrogate 'id' column (hidden from the SQL surface) and a load " +
          "would silently overwrite yours — rename the column (e.g. " +
          s"'${tableName(ident)}_id')"))
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    if (VersionedTable.currentVersion(c, t).isDefined)
      throw new TableAlreadyExistsException(ident.asInstanceOf[Identifier])
    // defaults/comments ride the schema as field metadata — a CREATE-time
    // DEFAULT becomes the column's CURRENT_DEFAULT (all files carry the
    // column physically from birth, so EXISTS_DEFAULT never fires here);
    // generated-column declarations re-attach the same way (the base
    // conversion drops them)
    val schema = graft.etl.GeneratedCols.attachDeclarations(columns,
      org.apache.spark.sql.graft.DefaultColumns.v2ColumnsToStructType(columns))
    VersionedTable.validatePartSpec(pSpec, schema)
    VersionedTable.validateClusterLayout(
      properties.asScala.toMap, clusterCols, schema)
    // version 1 = one empty schema-bearing file: the table exists, reads
    // are empty, the first INSERT is version 2; the bucket layout and
    // the partition-transform derivations record WITH it, so every
    // later write lays files out accordingly
    val empty = c.spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    VersionedTable.load(c, t, empty, bucketBy = bucketBy,
      extraProps = validatedTableProps(c, schema, properties) ++
        (if (pSpec.isEmpty) Map.empty[String, String]
         else Map(VersionedTable.PartitionSpecProp ->
           VersionedTable.partSpecJson(pSpec))) ++
        (if (clusterCols.isEmpty) Map.empty[String, String]
         else Map(VersionedTable.ClusterByProp -> clusterCols.mkString(","))))
    new GraftBatchTable(schema, Map("dir" -> c.dir, "table" -> t),
      acceptAnySchema = false)
  }

  /** The CHECK / write.mode TBLPROPERTIES, validated eagerly against
    * `schema` — shared by CREATE and the staged CREATE/REPLACE paths.
    *
    * CHECK ('check' = '<boolean sql>') records the commit-time row gate
    * (Delta's constraint shape); the expression must RESOLVE against the
    * schema NOW — a typo'd column fails the CREATE, not the first
    * insert — and must be deterministic and subquery-free (Delta's ADD
    * CONSTRAINT discipline: a rand() gate would admit or refuse the same
    * row depending on evaluation time; a subquery would re-evaluate
    * against another table's state at each commit). write.mode selects
    * 'copy-on-write' (default) or 'merge-on-read' row-level ops. */
  private def validatedTableProps(c: Catalog, schema: StructType,
                                  properties: JMap[String, String])
      : Map[String, String] = {
    val check = Option(properties.get("check")).map(_.trim).filter(_.nonEmpty)
    check.foreach(validateCheckSql(c, schema, _))
    val mode = Option(properties.get("write.mode")).map(_.trim.toLowerCase)
      .filter(_.nonEmpty)
    mode.foreach(m => require(
      m == "copy-on-write" || m == VersionedTable.MergeOnRead,
      s"unknown write.mode '$m' — use 'copy-on-write' or 'merge-on-read'"))
    // the rest of the user's TBLPROPERTIES persist (same contract as
    // ALTER TABLE SET TBLPROPERTIES — visible in SHOW TBLPROPERTIES),
    // minus Spark's own bookkeeping keys and anything engine-reserved.
    // The INTERNAL spellings of the validated keys refuse at CREATE —
    // 'check_constraint' smuggled as a user prop would become an
    // UNVALIDATED write gate (use the validated 'check'/'write.mode'
    // aliases) — and the tunables validate here like SET TBLPROPERTIES.
    Seq(VersionedTable.CheckConstraintProp, VersionedTable.WriteModeProp)
      .foreach(k => require(properties.get(k) == null,
        s"TBLPROPERTIES key '$k' is the engine's internal spelling — " +
          "declare it as 'check' / 'write.mode' so it validates"))
    Option(properties.get(VersionedTable.DvMaxFractionProp)).foreach(v =>
      require(scala.util.Try(v.toDouble).toOption.exists(d => d > 0 && d <= 1),
        s"${VersionedTable.DvMaxFractionProp} must be a double in (0, 1], " +
          s"got '$v'"))
    Seq(VersionedTable.CompactDvBytesProp,
      VersionedTable.CompactSmallFilesProp,
      VersionedTable.CompactTargetBytesProp).foreach(k =>
      Option(properties.get(k)).foreach(v => require(
        scala.util.Try(v.toLong).toOption.exists(_ > 0),
        s"$k must be a positive long, got '$v'")))
    Option(properties.get(VersionedTable.BloomColsProp)).foreach { cs =>
      val have = schema.fieldNames.toSet
      val missing = cs.split(",").map(_.trim).filter(_.nonEmpty)
        .filterNot(have.contains)
      require(missing.isEmpty,
        s"bloom_cols names missing columns: ${missing.mkString(",")}")
    }
    val sparkInternal = Set("provider", "owner", "location", "comment",
      "external", "check", "write.mode")
    val user = properties.asScala.toMap.filter { case (k, _) =>
      !sparkInternal(k) && !k.startsWith("option.") &&
        !VersionedTable.isReservedProp(k)
    }
    user ++ check.map(VersionedTable.CheckConstraintProp -> _).toMap ++
      mode.filter(_ == VersionedTable.MergeOnRead)
        .map(VersionedTable.WriteModeProp -> _).toMap
  }

  /** The shared eager CHECK discipline lives on the engine
    * ([[VersionedTable.validateCheckSql]]) so the library twins get the
    * same resolution/determinism/subquery checks as the SQL DDL. */
  private def validateCheckSql(c: Catalog, schema: StructType,
                               sql: String): Unit =
    VersionedTable.validateCheckSql(c.spark, schema, sql)

  // ------------------------------------------- atomic CREATE OR REPLACE

  /** Shared staging entry: validates the declaration like [[createTable]]
    * and returns the staged table whose `commitStagedChanges` lands the
    * create/replace — data included — as ONE versioned commit
    * ([[GraftStagedTable]]). `requireExists`: Some(false) = CREATE,
    * Some(true) = REPLACE, None = CREATE OR REPLACE. */
  private def stage(ident: Identifier,
                    info: org.apache.spark.sql.connector.catalog.TableInfo,
                    requireExists: Option[Boolean])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val (bucketBy, pSpec, clusterCols) = translatePartitions(info.partitions())
    require(bucketBy.isEmpty,
      "bucket(...) transforms are not supported on CTAS/REPLACE — " +
        "CREATE the bucketed table first, then INSERT")
    info.columns().find(_.name.equalsIgnoreCase(graft.etl.Loader.IdCol))
      .foreach(c => throw new IllegalArgumentException(
        s"column name '${c.name}' is reserved: graft tables stamp their " +
          "own surrogate 'id' column — rename the column"))
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    val exists = VersionedTable.currentVersion(c, t).isDefined
    requireExists.foreach { must =>
      if (must && !exists)
        throw new NoSuchTableException(ident.asInstanceOf[Identifier])
      if (!must && exists)
        throw new TableAlreadyExistsException(ident.asInstanceOf[Identifier])
    }
    val schema = graft.etl.GeneratedCols.attachDeclarations(info.columns(),
      org.apache.spark.sql.graft.DefaultColumns
        .v2ColumnsToStructType(info.columns()))
    VersionedTable.validatePartSpec(pSpec, schema)
    VersionedTable.validateClusterLayout(
      info.properties().asScala.toMap, clusterCols, schema)
    new GraftStagedTable(c, t, schema,
      validatedTableProps(c, schema, info.properties()) ++
        (if (pSpec.isEmpty) Map.empty[String, String]
         else Map(VersionedTable.PartitionSpecProp ->
           VersionedTable.partSpecJson(pSpec))) ++
        (if (clusterCols.isEmpty) Map.empty[String, String]
         else Map(VersionedTable.ClusterByProp -> clusterCols.mkString(","))),
      requireExists)
  }

  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, info, Some(false))

  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, info, Some(true))

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stage(ident, info, None)

  /** `ALTER TABLE ... ADD COLUMN(S)` — a METADATA-ONLY commit (the
    * reference's dataset auto-ALTER, easy_etl/__init__.py:96,
    * README.md:185-197): [[VersionedTable.widenSchema]] carries the
    * parent's files verbatim and records the widened schema in the
    * manifest, so the ALTER reads, writes, and rewrites NOTHING —
    * genuinely O(1) commit bytes on a table of any size. Pre-ALTER files
    * read the new column as null; post-ALTER inserts carry it.
    * Everything else (drop, rename, type change) keeps the refusal:
    * dropping/renaming would re-interpret files already committed, so
    * those evolutions stay load-driven where every version is
    * self-describing. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    if (VersionedTable.currentVersion(c, t).isEmpty)
      throw new NoSuchTableException(ident.asInstanceOf[Identifier])
    val supported = changes.forall {
      case _: TableChange.AddColumn => true
      case _: TableChange.RenameColumn => true
      case _: TableChange.DeleteColumn => true
      case _: TableChange.UpdateColumnDefaultValue => true
      case _: TableChange.SetProperty => true
      case _: TableChange.RemoveProperty => true
      case _: TableChange.AddConstraint => true
      case _: TableChange.DropConstraint => true
      case _: TableChange.UpdateColumnComment => true
      case _: TableChange.UpdateColumnType => true
      case _: TableChange.ClusterBy => true
      case _ => false
    }
    if (changes.isEmpty || !supported)
      throw new UnsupportedOperationException(
        "graft supports ALTER TABLE ADD/RENAME/DROP COLUMN(S), SET/DROP " +
          "DEFAULT, and SET/UNSET TBLPROPERTIES only — type changes " +
          "would re-interpret already-committed files; evolve those " +
          "through loads (ensure widening) so every version stays " +
          "self-describing")
    // ATOMICITY: each clause kind lands as ONE commit (adds batch into
    // one widen, drops into one dropColumns, props into one
    // setTableProps), and a statement mixing SCHEMA-EVOLVING kinds is
    // refused up front — per-kind commits with no rollback would leave
    // a mid-statement failure half-applied. Spark's parser emits
    // single-kind statements, so this costs real users nothing.
    def kindOf(ch: TableChange): String = ch match {
      case _: TableChange.AddColumn => "add"
      case _: TableChange.RenameColumn => "rename"
      case _: TableChange.DeleteColumn => "drop"
      case _: TableChange.UpdateColumnType => "retype"
      case _: TableChange.UpdateColumnComment => "comment"
      case _: TableChange.UpdateColumnDefaultValue => "default"
      case _: TableChange.AddConstraint => "add-constraint"
      case _: TableChange.DropConstraint => "drop-constraint"
      case _: TableChange.ClusterBy => "cluster"
      case _ => "props"
    }
    val kinds = changes.map(kindOf).distinct
    require(kinds.size == 1,
      s"one ALTER kind per statement (got ${kinds.mkString(", ")}) — " +
        "mixed statements cannot apply atomically")
    require(kinds.head == "add" || kinds.head == "drop" ||
      kinds.head == "props" || changes.size == 1,
      s"multiple ${kinds.head} clauses in one statement are not supported")
    // multi-drop: ONE atomic commit, every name validated first
    val dropNames = changes.collect { case d: TableChange.DeleteColumn =>
      require(d.fieldNames.length == 1,
        s"nested column drops are not supported: ${d.fieldNames.mkString(".")}")
      d.fieldNames.head
    }
    if (dropNames.nonEmpty) VersionedTable.dropColumns(c, t, dropNames.toSeq)
    // SET/UNSET TBLPROPERTIES batch into ONE metadata commit (validated
    // keys: check, write.mode, dv_max_fraction, bloom_cols; reserved
    // engine keys refuse; the rest is the user's namespace)
    val setProps = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value
    }.toMap
    val unsetProps = changes.collect {
      case r: TableChange.RemoveProperty => r.property
    }
    if (setProps.nonEmpty || unsetProps.nonEmpty)
      VersionedTable.setTableProps(c, t, setProps, unsetProps.toSeq)
    // each change is its own metadata-only commit (ALTER statements
    // arrive one clause at a time from Spark's parser anyway); adds
    // batch into one widen like before
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.nonEmpty) {
      val existing = VersionedTable.read(c, t).schema
        .fields.filterNot(_.name == graft.etl.Loader.IdCol)
      val names = existing.map(_.name.toLowerCase).toSet
      val newFields = adds.map { a =>
        require(a.fieldNames.length == 1,
          s"nested column adds are not supported: ${a.fieldNames.mkString(".")}")
        val n = a.fieldNames.head
        require(!n.equalsIgnoreCase(graft.etl.Loader.IdCol),
          s"column name '$n' is reserved for the surrogate id")
        require(!names.contains(n.toLowerCase),
          s"column '$n' already exists on '$t'")
        require(a.isNullable,
          s"added column '$n' must be nullable — every pre-ALTER row reads " +
            "it as null, which a NOT NULL column would contradict")
        require(a.position() == null,
          "FIRST/AFTER positions are not supported — new columns append")
        val f = StructField(n, a.dataType, nullable = true)
        // ADD COLUMN ... DEFAULT v: still metadata-only — the default
        // freezes as EXISTS_DEFAULT (pre-ADD files fill it at read; the
        // parquet readers implement the fill natively) and records as
        // CURRENT_DEFAULT for future INSERTs
        if (a.defaultValue() == null) f
        else org.apache.spark.sql.graft.DefaultColumns
          .fieldWithDefault(f, a.defaultValue())
      }
      VersionedTable.widenSchema(c, t, newFields.toSeq)
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"nested column renames are not supported: ${r.fieldNames.mkString(".")}")
        // metadata-only: the column keeps its PHYSICAL in-file name
        // (name-mode column mapping) — no file is read or rewritten
        VersionedTable.renameColumn(c, t, r.fieldNames.head, r.newName)
      case _: TableChange.DeleteColumn => () // batched above (atomic)
      case a: TableChange.AddConstraint =>
        a.constraint() match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(chk.enforced(),
              "graft enforces every CHECK constraint — NOT ENFORCED is " +
                "not supported")
            val sql = Option(chk.predicateSql()).getOrElse(
              throw new IllegalArgumentException(
                s"constraint '${chk.name()}' carries no SQL predicate"))
            val tblSchema = StructType(VersionedTable.read(c, t).schema
              .fields.filterNot(_.name == graft.etl.Loader.IdCol))
            validateCheckSql(c, tblSchema, sql)
            // validates the EXISTING rows (one scan), then one metadata
            // commit — the manifest never advertises a violated CHECK
            VersionedTable.addCheckConstraint(c, t, chk.name(), sql)
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are enforced; '${other.toDDL}' " +
              "(unique/primary-key/foreign-key) is informational in SQL " +
              "engines and graft refuses to record what it cannot enforce")
        }
      case d: TableChange.DropConstraint =>
        VersionedTable.dropCheckConstraint(c, t, d.name(), d.ifExists())
      case ty: TableChange.UpdateColumnType =>
        require(ty.fieldNames.length == 1,
          s"nested column types are not supported: ${ty.fieldNames.mkString(".")}")
        // metadata-only for the lossless widening matrix; anything else
        // refuses inside (it would re-interpret committed files)
        VersionedTable.widenColumnType(c, t, ty.fieldNames.head, ty.newDataType())
      case cc: TableChange.UpdateColumnComment =>
        require(cc.fieldNames.length == 1,
          s"nested column comments are not supported: ${cc.fieldNames.mkString(".")}")
        VersionedTable.setColumnComment(c, t, cc.fieldNames.head, cc.newComment())
      case cb: TableChange.ClusterBy =>
        // `ALTER TABLE ... CLUSTER BY (a, b)` / `CLUSTER BY NONE` — one
        // metadata commit re-pointing the arrangement declaration (the
        // partition-spec evolution rule: old files stay exactly as
        // prunable, only later writes arrange by the new columns)
        val cols = cb.clusteringColumns().map { r =>
          require(r.fieldNames().length == 1,
            "CLUSTER BY must reference top-level columns")
          r.fieldNames().head
        }.toSeq
        VersionedTable.setPartitionSpec(c, t,
          cols.map(VersionedTable.PartTransform("identity", _)),
          clusterBy = Some(cols))
      case u: TableChange.UpdateColumnDefaultValue =>
        require(u.fieldNames.length == 1,
          s"nested column defaults are not supported: ${u.fieldNames.mkString(".")}")
        // SET/DROP DEFAULT re-points CURRENT_DEFAULT only — the frozen
        // EXISTS_DEFAULT is pre-ADD rows' history, never a dial
        VersionedTable.setColumnDefault(c, t, u.fieldNames.head,
          Option(u.newCurrentDefault()).map(
            org.apache.spark.sql.graft.DefaultColumns.currentSql).orNull)
      case _ => () // adds handled above
    }
    val after = VersionedTable.read(c, t).schema
      .fields.filterNot(_.name == graft.etl.Loader.IdCol)
    new GraftBatchTable(StructType(after),
      Map("dir" -> c.dir, "table" -> t), acceptAnySchema = false)
  }

  /** CLONE-SAFE drop: a zero-copy clone references this table's data
    * files by absolute path, so deleting them would strand every live
    * clone (the same liveness check [[VersionedTable.vacuum]] runs;
    * dead clones' markers expire inside it). `DROP TABLE ... PURGE`
    * ([[purgeTable]]) is the force escape. */
  override def dropTable(ident: Identifier): Boolean = {
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    if (VersionedTable.currentVersion(c, t).isEmpty) false
    else {
      val clones = VersionedTable.liveClones(c, t)
      if (clones.nonEmpty)
        throw new IllegalStateException(
          s"cannot drop '$t': live clone(s) still reference its data files — " +
            clones.map { case (d, n) => s"$n (in $d)" }.mkString(", ") +
            ". Drop the clone(s) first, or force with DROP TABLE ... PURGE")
      reallyDrop(c, t)
    }
  }

  /** `DROP TABLE ... PURGE` — the force escape past the live-clone guard
    * (the clones' reads will fail afterwards; that is what PURGE asks
    * for). */
  override def purgeTable(ident: Identifier): Boolean = {
    val t = tableName(ident)
    val c = catFor(ident.namespace)
    if (VersionedTable.currentVersion(c, t).isEmpty) false
    else reallyDrop(c, t)
  }

  private def reallyDrop(c: Catalog, t: String): Boolean = {
    val fs = new Path(c.dir)
      .getFileSystem(c.spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"${c.dirPath(t)}.__vdata"), true)
    fs.delete(new Path(s"${c.dirPath(t)}.__vmeta"), true)
    // streaming-sink staging (in-flight epochs of a query writing here)
    // dies with the table — otherwise a dropped table strands its stage
    fs.delete(new Path(s"${c.dirPath(t)}.__vstage"), true)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "renaming would invalidate clones' absolute file references; " +
        "clone to the new name and drop the old table instead")

  // ------------------------------------------------- SQL ops procedures
  // CALL g.system.history('t') / rollback('t', v) / vacuum('t', n) —
  // see [[GraftProcedures]]. Procedures live under any of the accepted
  // namespaces (`system` by convention, like the big formats).

  /** The ONE namespace gate both procedure entry points share: `system`
    * by convention (like the big formats), with the root and `default`
    * accepted as aliases — a single predicate so the two sets can never
    * drift apart. */
  private def procedureNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default")) ||
      ns.sameElements(Array("system"))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(procedureNamespace(ident.namespace),
      s"graft procedures live in the system namespace; got " +
        ident.namespace.mkString("."))
    ident.name.toLowerCase match {
      case "history" => GraftProcedures.history(() => cat)
      case "rollback" => GraftProcedures.rollback(() => cat)
      case "vacuum" => GraftProcedures.vacuum(() => cat)
      case "compact" => GraftProcedures.compact(() => cat)
      case "clone" => GraftProcedures.clone(() => cat)
      case "recluster" => GraftProcedures.recluster(() => cat)
      case "expire_snapshots" => GraftProcedures.expireSnapshots(() => cat)
      case "set_partition_spec" => GraftProcedures.setPartitionSpec(() => cat)
      case "create_tag" => GraftProcedures.createTag(() => cat)
      case "drop_tag" => GraftProcedures.dropTag(() => cat)
      case "tags" => GraftProcedures.tags(() => cat)
      case "remove_orphan_files" => GraftProcedures.removeOrphanFiles(() => cat)
      case "fast_forward" => GraftProcedures.fastForward(() => cat)
      case "create_branch" => GraftProcedures.createBranch(() => cat)
      case "drop_branch" => GraftProcedures.dropBranch(() => cat)
      case "branches" => GraftProcedures.branches(() => cat)
      case "eq_upsert" => GraftProcedures.eqUpsert(() => cat)
      case "eq_delete" => GraftProcedures.eqDelete(() => cat)
      case other => throw new UnsupportedOperationException(
        s"unknown graft procedure '$other' — available: history(table), " +
          "rollback(table, version), vacuum(table, keep_last), " +
          "compact(table, target_bytes), clone(source, target, version), " +
          "recluster(table, cluster_by, target_bytes), " +
          "expire_snapshots(table, older_than), " +
          "set_partition_spec(table, spec), " +
          "create_tag(table, name, version), drop_tag(table, name), " +
          "tags(table), remove_orphan_files(table), " +
          "fast_forward(table, branch), create_branch(table, name), " +
          "drop_branch(table, name), branches(table)")
    }
  }

  // ------------------------------------------------- catalog functions
  // the `bucket` transform's V2 function — what storage-partitioned
  // joins resolve each side's KeyGroupedPartitioning through
  // ([[GraftBucketFunction]]); same namespace gate as procedures.

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    if (procedureNamespace(ident.namespace) &&
        ident.name.equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident.asInstanceOf[Identifier])
  }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (procedureNamespace(namespace))
      Array(Identifier.of(Array("system"), "bucket"))
    else Array.empty

  override def functionExists(ident: Identifier): Boolean =
    procedureNamespace(ident.namespace) &&
      ident.name.equalsIgnoreCase("bucket")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    // exactly the namespaces loadProcedure's gate admits (root, default,
    // system — one shared predicate); any other namespace lists empty
    // rather than duplicating the set under every name
    if (procedureNamespace(namespace))
      Array("clone", "compact", "create_tag", "drop_tag", "expire_snapshots",
        "fast_forward", "history", "recluster", "remove_orphan_files",
        "rollback", "set_partition_spec", "tags", "vacuum")
        .map(n => Identifier.of(Array("system"), n))
    else Array.empty
}
