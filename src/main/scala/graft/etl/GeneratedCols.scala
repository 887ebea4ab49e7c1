package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
import org.apache.spark.sql.connector.catalog.{Column => V2Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** GENERATED COLUMNS (`c BIGINT GENERATED ALWAYS AS (k * 2)`) — the
  * engine side of Spark's `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS`
  * catalog capability. Spark's DDL parses and validates the expression
  * (deterministic, resolves against the table's other non-generated
  * columns, no subqueries) and hands it to `createTable` on the V2
  * column; the CONNECTOR owns everything after that — Spark's analyzer
  * does nothing on DML. So the engine:
  *
  *  - records the expression as field metadata in the versioned schema
  *    (Spark's own `GENERATION_EXPRESSION_METADATA_KEY`, so
  *    `Table.columns()` re-derives the declaration for DESCRIBE / SHOW
  *    CREATE TABLE with no extra plumbing), and
  *  - COMPUTES the column on every write path ([[materialize]]): an
  *    omitted / null value computes from the row's base columns; a
  *    provided non-null value must MATCH the computed one (null-safe)
  *    or the write refuses — Delta's enforcement shape, evaluated
  *    in-flight via `raise_error` so it costs no extra pass or action
  *    and fails the job before any manifest CAS.
  *
  * The reference has no generated columns (its schema is whatever the
  * extract SELECT returns — /root/reference/easy_etl/__init__.py:87);
  * extension scope, the Delta/Iceberg-class DDL tier. */
object GeneratedCols {

  val GenKey: String = GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY

  /** (field, generation SQL) for every generated column of `schema`. */
  def generationExprs(schema: StructType): Seq[(StructField, String)] =
    schema.fields.toSeq.flatMap(f =>
      GeneratedColumn.getGenerationExpression(f).map(f -> _))

  def hasGenerated(schema: StructType): Boolean =
    GeneratedColumn.hasGeneratedColumns(schema)

  /** (field, identity spec) for every identity column of `schema`. */
  def identitySpecs(schema: StructType)
      : Seq[(StructField, org.apache.spark.sql.connector.catalog.IdentityColumnSpec)] =
    schema.fields.toSeq.flatMap(f =>
      IdentityColumn.getIdentityInfo(f).map(f -> _))

  def hasIdentity(schema: StructType): Boolean =
    IdentityColumn.hasIdentityColumns(schema)

  /** CREATE-time bridge: `v2ColumnsToStructType` carries comments and
    * defaults but drops generation expressions and identity specs —
    * re-attach them as the field-metadata keys Spark's own utilities
    * read back (`structTypeToV2Columns` re-derives the V2 declaration
    * from exactly these keys). Positional: `schema` came from `columns`. */
  def attachDeclarations(columns: Array[V2Column],
                         schema: StructType): StructType =
    StructType(schema.fields.zip(columns).map { case (f, c) =>
      val gen = Option(c.generationExpression())
      val ident = Option(c.identityColumnSpec())
      if (gen.isEmpty && ident.isEmpty) f
      else {
        val b = new MetadataBuilder().withMetadata(f.metadata)
        gen.foreach(e => b.putString(GenKey, e))
        ident.foreach { s =>
          b.putLong(IdentityColumn.IDENTITY_INFO_START, s.getStart)
          b.putLong(IdentityColumn.IDENTITY_INFO_STEP, s.getStep)
          b.putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            s.isAllowExplicitInsert)
        }
        f.copy(metadata = b.build())
      }
    })

  /** Column names a generation expression references (top-level; the
    * expression is unresolved here — CREATE-time validation already
    * proved it resolves against the table's base columns). */
  def referencedCols(spark: SparkSession, sql: String): Set[String] =
    scala.util.Try(
      spark.sessionState.sqlParser.parseExpression(sql)
        .references.map(_.name).toSet).getOrElse(Set.empty)

  /** Compute/verify every generated column of `tableSchema` on a write
    * frame: absent or null values COMPUTE from the row's base columns;
    * a provided non-null value must null-safe-equal the computed one or
    * the job fails (`raise_error` in the projection — no extra action,
    * refused before any commit). Base columns a narrow frame omits are
    * null for its rows — added as typed nulls for the computation and
    * dropped again, so the frame's shape is unchanged. */
  def materialize(spark: SparkSession, tableSchema: StructType,
                  df: DataFrame, verifyProvided: Boolean = true): DataFrame = {
    val gens = generationExprs(tableSchema)
    if (gens.isEmpty) return df
    gens.foldLeft(df) { case (d, (f, sql)) =>
      val missingRefs = referencedCols(spark, sql)
        .filterNot(r => d.columns.exists(_.equalsIgnoreCase(r))).toSeq.sorted
      val typedNulls = missingRefs.map { r =>
        val bf = tableSchema.fields.find(_.name.equalsIgnoreCase(r)).getOrElse(
          throw new IllegalArgumentException(
            s"generated column '${f.name}' = ($sql) references '$r', " +
              "which is not a table column"))
        bf.name -> bf.dataType
      }
      val d1 = typedNulls.foldLeft(d) { case (x, (r, dt)) =>
        x.withColumn(r, lit(null).cast(dt))
      }
      val computed = expr(sql).cast(f.dataType)
      val out =
        if (d1.columns.exists(_.equalsIgnoreCase(f.name)) && verifyProvided) {
          val provided = col(f.name)
          d1.withColumn(f.name,
            when(provided.isNotNull && !(provided <=> computed),
              raise_error(concat(
                lit(s"GENERATED ALWAYS AS column '${f.name}' = ($sql): " +
                  "provided value "),
                provided.cast("string"),
                lit(" does not match the computed value "),
                coalesce(computed.cast("string"), lit("NULL"))))
                .cast(f.dataType))
              .otherwise(computed))
        } else
          // absent → compute; present with verifyProvided=false → the
          // copy-on-write row-op path, whose frames carry the PRE-update
          // derived values Spark scanned — recompute unconditionally so
          // a SET on a base column can never leave the derived one stale
          d1.withColumn(f.name, computed)
      typedNulls.map(_._1).foldLeft(out)((x, r) => x.drop(r))
    }
  }

  /** BOUND full-row projection recomputing every generated column — the
    * merge-on-read row-op path's executor-side twin of [[materialize]]:
    * the delta writers receive InternalRows (no DataFrame to transform),
    * so the generation expressions analyze ONCE on the driver against an
    * empty frame of the write schema, bind by ordinal, and ship to the
    * tasks as serializable Catalyst expressions (each task builds one
    * codegen'd UnsafeProjection from them). Row-op semantics match the
    * copy-on-write path: recompute unconditionally — the frames re-emit
    * pre-update derived values. None when the schema declares no
    * generated column present in the write schema. */
  def boundRowProjection(spark: SparkSession, tableSchema: StructType,
                         writeSchema: StructType)
      : Option[Seq[org.apache.spark.sql.catalyst.expressions.Expression]] = {
    val genByName = generationExprs(tableSchema)
      .map { case (f, sql) => f.name.toLowerCase -> sql }.toMap
    if (genByName.isEmpty ||
        !writeSchema.fieldNames.exists(n => genByName.contains(n.toLowerCase)))
      return None
    val cols = writeSchema.fields.map { f =>
      genByName.get(f.name.toLowerCase) match {
        case Some(sql) => expr(sql).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }
    val analyzed = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), writeSchema)
      .select(scala.collection.immutable.ArraySeq.unsafeWrapArray(cols): _*)
      .queryExecution.analyzed
    val project = analyzed.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }.getOrElse(throw new IllegalStateException(
      "generated-column projection did not analyze to a Project"))
    Some(project.projectList.map { e =>
      val child = e match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case x => x
      }
      org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(child, project.child.output)
    })
  }
}
