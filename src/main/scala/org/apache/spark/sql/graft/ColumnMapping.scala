package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** NAME-MODE COLUMN MAPPING — the translation layer under metadata-only
  * `ALTER TABLE RENAME COLUMN` / `DROP COLUMN` on versioned tables
  * (Delta's name-mapping design, re-derived; the reference has no ALTER
  * surface at all — /root/reference/easy_etl/__init__.py mutates tables
  * only through full loads).
  *
  * The invariant everything rests on: a column's PHYSICAL name — the
  * name actually written into parquet files — is assigned at the
  * column's birth and NEVER changes. A rename only re-labels the logical
  * name in the manifest; a drop only removes the logical entry (and
  * retires the physical name so a later re-add of the same logical name
  * can never resurrect the old bytes). Old and new files therefore
  * always agree on physical names: there are no per-file eras, no file
  * rewrites, and an identity mapping (the overwhelmingly common case)
  * costs nothing — every helper here is a no-op on an empty map.
  *
  * The mapping `physOf` is logical → physical with identity entries
  * ABSENT: empty means "untranslated", and all existing tables stay
  * that way until their first RENAME/DROP commit. */
object ColumnMapping {

  /** The physical (in-file) name of logical column `c`. */
  def phys(physOf: Map[String, String], c: String): String =
    physOf.getOrElse(c, c)

  /** `schema` with field names translated logical → physical (order,
    * types, nullability, metadata untouched — readers emit rows
    * positionally, so only the names the parquet reader resolves by
    * change). */
  def physSchema(schema: StructType, physOf: Map[String, String]): StructType =
    if (physOf.isEmpty) schema
    else StructType(schema.fields.map(f =>
      if (physOf.contains(f.name)) f.copy(name = physOf(f.name)) else f))

  /** Rename `df`'s mapped columns logical → physical — the WRITE
    * boundary: every parquet file a mapped table commits carries
    * physical names, so the stable-name invariant holds for files
    * written before AND after any rename. */
  def toPhysical(df: DataFrame, physOf: Map[String, String]): DataFrame =
    if (physOf.isEmpty) df
    else {
      // ONE positional rename, not a withColumnRenamed fold: renaming
      // a→b while b→c is also pending would transiently duplicate b
      // (logical 'label'→physical 'v' collides with logical 'v' still
      // in flight) — toDF renames every column simultaneously
      val names = df.columns.map(c => physOf.getOrElse(c, c))
      if (names.sameElements(df.columns)) df else df.toDF(names.toSeq: _*)
    }

  /** Restore logical names on a frame read with [[physSchema]] —
    * POSITIONAL (`toDF`), so a physical name that happens to collide
    * with another logical name can never cross wires. `logical` must be
    * the un-translated field names in schema order. */
  def toLogicalNames(df: DataFrame, logical: Seq[String]): DataFrame =
    if (df.columns.toSeq == logical) df else df.toDF(logical: _*)

  /** physical → logical (the reverse view), for translating predicates
    * that were pushed through a rename-alias projection. */
  def reverse(physOf: Map[String, String]): Map[String, String] =
    physOf.map(_.swap)

  /** Translate a ZonePred tree's column names through `names`
    * (missing = identity). Used with [[reverse]] to bring a
    * physical-named pushed predicate back into the manifest's logical
    * stat domain. */
  def mapZonePred(p: ZonePred.P, names: Map[String, String]): ZonePred.P =
    if (names.isEmpty) p
    else p match {
      case ZonePred.And(ps) => ZonePred.And(ps.map(mapZonePred(_, names)))
      case ZonePred.Or(ps) => ZonePred.Or(ps.map(mapZonePred(_, names)))
      case ZonePred.Leaf(c, op, vs) =>
        ZonePred.Leaf(names.getOrElse(c, c), op, vs)
      case ZonePred.NullCheck(c, isNot) =>
        ZonePred.NullCheck(names.getOrElse(c, c), isNot)
      case other => other
    }

  /** Translate data-source filters logical → physical for the parquet
    * readers' row-group/page skipping. A filter shape this walker
    * doesn't know is DROPPED (None) — safe by construction here: every
    * caller re-applies the full predicate to the returned rows, so a
    * dropped filter only loses skipping, never correctness. Translating
    * (rather than dropping all) keeps row-group pruning working on
    * renamed columns; translating is also REQUIRED for soundness — an
    * untranslated logical name could coincide with a retired physical
    * column still present in old files and prune on the wrong bytes. */
  def translateFilter(f: sources.Filter,
                      physOf: Map[String, String]): Option[sources.Filter] = {
    def t(c: String) = phys(physOf, c)
    f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(t(a), v))
      case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(t(a), v))
      case sources.GreaterThan(a, v) => Some(sources.GreaterThan(t(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(t(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(t(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(t(a), v))
      case sources.In(a, vs) => Some(sources.In(t(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(t(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(t(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(t(a), v))
      case sources.StringEndsWith(a, v) => Some(sources.StringEndsWith(t(a), v))
      case sources.StringContains(a, v) => Some(sources.StringContains(t(a), v))
      case sources.Not(c) => translateFilter(c, physOf).map(sources.Not)
      // And/Or/Not all require BOTH children to translate: a partially
      // kept And would be unsound under an enclosing Not (¬(a∧b) ⊅ ¬a),
      // and Spark splits top-level conjuncts into separate array
      // elements before pushdown anyway, so strictness costs nothing in
      // practice
      case sources.And(l, r) =>
        for {
          a <- translateFilter(l, physOf)
          b <- translateFilter(r, physOf)
        } yield sources.And(a, b)
      case sources.Or(l, r) =>
        for {
          a <- translateFilter(l, physOf)
          b <- translateFilter(r, physOf)
        } yield sources.Or(a, b)
      case _: sources.AlwaysTrue => Some(f)
      case _: sources.AlwaysFalse => Some(f)
      case _ => None
    }
  }

  def translateFilters(fs: Seq[sources.Filter],
                       physOf: Map[String, String]): Seq[sources.Filter] =
    if (physOf.isEmpty) fs else fs.flatMap(translateFilter(_, physOf))
}
