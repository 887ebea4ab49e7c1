package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A [[Catalog]] whose tables are VERSIONED: reads resolve the head
  * manifest through [[VersionedTable.read]], and [[EtlProcess.load]]
  * routes writes through [[VersionedTable.load]]. The reference pipeline
  * API (extract → transform → link → load) thereby gains time travel,
  * change feeds, O(1) rollback, and optimistic multi-writer commits with
  * ZERO API change beyond constructing the TARGET catalog as versioned —
  * the storage upgrade a reference user actually wants at 100 TB, where
  * "every load mutates the table in place"
  * (/root/reference/easy_etl/__init__.py:89-99) leaves no yesterday to
  * audit or roll back to.
  *
  * Incremental extracts (E4) read their `max(pk)` watermark from the
  * HEAD version; for integral pks the probe answers from the head
  * manifest's file footers — metadata-only, O(files), same strictness
  * rules as the flat-table fast path. Link lookups and `result()` read
  * the head snapshot. Layouts: `bucketBy` composes (bucket-scoped
  * versioned upserts); `partitionBy`/`clusterBy`/`targetFileBytes` are
  * Loader-layout features the versioned store intentionally routes
  * through buckets instead (see [[VersionedTable]]'s class doc).
  */
class VersionedCatalog(spark: SparkSession, dir: String)
  extends Catalog(spark, dir) {

  override def table(name: String): DataFrame =
    tableIfExists(name).getOrElse(
      throw new IllegalArgumentException(
        s"versioned table '$name' not found in $dir"))

  override def tableIfExists(name: String): Option[DataFrame] =
    VersionedTable.currentVersion(this, name)
      .map(_ => VersionedTable.read(this, name))
}
