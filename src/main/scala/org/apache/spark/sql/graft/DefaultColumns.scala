package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.connector.catalog.{CatalogV2Util, ColumnDefaultValue, Column => V2Column}
import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** COLUMN DEFAULT VALUES on versioned tables — the bridge between
  * Spark's DDL surface (`CREATE TABLE (c INT DEFAULT 5)`, `ALTER TABLE
  * ADD COLUMN c INT DEFAULT 5`) and the manifest's recorded schema.
  *
  * Spark's own parquet readers implement the hard part already: a
  * requested column PHYSICALLY ABSENT from a file fills with the
  * field's `EXISTS_DEFAULT` metadata instead of null (both the
  * vectorized and row readers). Because the recorded schema — metadata
  * included — round-trips through the manifest's `schema_json` and is
  * exactly what every read path hands those readers, `ALTER TABLE ADD
  * COLUMN ... DEFAULT` stays a METADATA-ONLY commit: pre-ADD files read
  * the frozen default, post-ADD writes materialize the column
  * physically (the loader always writes the full recorded schema, so
  * "file lacks the column" is precisely "file predates the ADD").
  *
  * Two-key discipline (Delta's): `EXISTS_DEFAULT` is the value FROZEN at
  * ADD time for pre-existing rows (a later `ALTER ... SET DEFAULT` must
  * not rewrite history); `CURRENT_DEFAULT` is what future INSERTs omit
  * to — the analyzer resolves it from the table's V2 columns, which
  * derive from the same metadata. */
object DefaultColumns {

  val CurrentKey: String = ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
  val ExistsKey: String = ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY

  /** V2 columns → StructType with defaults/comments preserved as field
    * metadata (CatalogV2Util is private[sql] — hence this bridge). */
  def v2ColumnsToStructType(cols: Array[V2Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(cols)

  /** The SQL rendering of a default's FOLDED literal — Spark validated
    * constant-foldability at DDL analysis and ships the result in
    * `getValue`; rendering the literal (not the user text) freezes
    * `EXISTS_DEFAULT` against non-determinism (`current_date()` folds to
    * the ALTER-day's date, as it must: pre-existing rows have one value). */
  private def foldedSql(dv: ColumnDefaultValue): String = {
    val lv = dv.getValue
    require(lv != null,
      "column default did not fold to a literal — graft freezes the " +
        "existence default at ALTER time and needs a constant")
    new org.apache.spark.sql.catalyst.expressions.Literal(
      lv.value, lv.dataType).sql
  }

  /** The SQL text to record for `dv` as CURRENT_DEFAULT: the user's own
    * text when Spark kept it, else the folded literal rendered through
    * Catalyst's `Literal.sql` — NEVER `toString`, which has no SQL
    * round-trip guarantee (a default supplied only as a folded literal
    * must not record unparseable text). */
  def currentSql(dv: ColumnDefaultValue): String =
    Option(dv.getSql).getOrElse(foldedSql(dv))

  /** Same for the plain `DefaultValue` the SET DEFAULT TableChange
    * carries (no folded literal field): user text when kept, else the
    * V2 literal expression rendered via `Literal.sql`; anything else
    * refuses — recording text that cannot re-parse would poison every
    * later INSERT's analysis. */
  def currentSql(dv: org.apache.spark.sql.connector.catalog.DefaultValue): String =
    Option(dv.getSql).getOrElse(dv.getExpression match {
      case lv: org.apache.spark.sql.connector.expressions.LiteralValue[_] =>
        new org.apache.spark.sql.catalyst.expressions.Literal(
          lv.value, lv.dataType).sql
      case other => throw new IllegalArgumentException(
        "SET DEFAULT carried no SQL text and a non-literal expression " +
          s"($other) — graft records only re-parseable default text")
    })

  /** `field` carrying `dv` as CURRENT (user SQL text) + EXISTS (folded
    * literal) metadata — the ALTER ADD COLUMN conversion. */
  def fieldWithDefault(field: StructField, dv: ColumnDefaultValue): StructField = {
    val sql = currentSql(dv)
    field.copy(metadata = new MetadataBuilder().withMetadata(field.metadata)
      .putString(CurrentKey, sql)
      .putString(ExistsKey, foldedSql(dv))
      .build())
  }

  /** `field` with CURRENT_DEFAULT replaced (SET DEFAULT) or removed
    * (DROP DEFAULT) — EXISTS_DEFAULT stays frozen: pre-ADD rows' values
    * are history, not a dial. */
  def fieldWithCurrentDefault(field: StructField,
                              sqlOrNull: String): StructField = {
    val b = new MetadataBuilder().withMetadata(field.metadata)
    if (sqlOrNull == null) b.remove(CurrentKey)
    else b.putString(CurrentKey, sqlOrNull)
    field.copy(metadata = b.build())
  }

  /** The existence-default of `field` as a typed Column — what a row
    * from a file lacking the column READS as; `lit(null)` when the field
    * has no default (the plain metadata-widening behavior). Used by the
    * change feed to align pre-ADD rows with what a head read returns. */
  def existsDefaultColumn(field: StructField): Column = {
    val base =
      if (field.metadata.contains(ExistsKey))
        expr(field.metadata.getString(ExistsKey))
      else lit(null)
    base.cast(field.dataType)
  }

  def hasExistsDefault(field: StructField): Boolean =
    field.metadata.contains(ExistsKey)

  /** Eager `SET DEFAULT` validation — delegates to the SAME analysis
    * Spark runs for CREATE/ADD COLUMN defaults
    * (`ResolveDefaultColumns.analyze`): the expression must parse,
    * resolve WITHOUT column references, CONSTANT-FOLD (a `rand()`
    * "default" would differ per INSERT), and cast to the column's type —
    * all refused at ALTER time, never at the next INSERT's analysis. */
  def validateDefault(field: StructField, sql: String): Unit =
    try ResolveDefaultColumns.analyze(field.name, field.dataType, sql,
      "ALTER TABLE ... SET DEFAULT")
    catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"invalid DEFAULT for '${field.name}': ($sql) — ${e.getMessage}")
    }
}
