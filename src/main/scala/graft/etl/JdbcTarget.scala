package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC WRITE target — parity with the reference's `write_db`: easy-etl
  * loads into (and link-queries) a SQL database
  * (/root/reference/easy_etl/__init__.py:42 `write_db[self.write_table_name]`,
  * :130 link lookups), while graft's default [[Catalog]] writes parquet.
  * A [[JdbcCatalog]] target gives a migrating user the missing path: loads
  * land in MySQL/Postgres/Derby with the same surrogate-id / upsert /
  * ensure / safe semantics, and links + incremental watermarks read back
  * through the same connection.
  *
  * Scale notes: a JDBC sink is bounded by the database, not by Spark —
  * writes batch per partition (`writePartitions` caps connection
  * concurrency so a 1000-executor job can't open 1000 connections), and
  * the merge/readback work (joins, id assignment) stays distributed in
  * Spark with only the final INSERT stream crossing into the DB. Upserts
  * rewrite through a staging table + transactional rename swap, the same
  * all-or-nothing contract as [[Loader]]'s parquet dir swap.
  */
class JdbcCatalog(val spark: SparkSession, val url: String,
                  val props: java.util.Properties = new java.util.Properties)
    extends TableStore {

  private[etl] def withConnection[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Case-insensitive existence check (Derby/Oracle store unquoted
    * identifiers uppercase; MySQL/Postgres keep or lower them).
    * getTables takes a PATTERN — `_`/`%` in the name are escaped with the
    * driver's search escape so `my_table` can't false-match `myxtable`
    * (a false positive would turn the create-table path into a read of a
    * missing table). */
  def exists(name: String): Boolean = withConnection { conn =>
    val md = conn.getMetaData
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    def pat(s: String) =
      s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    Seq(name, name.toUpperCase, name.toLowerCase).distinct.exists { n =>
      val rs = md.getTables(null, null, pat(n), null)
      try rs.next() finally rs.close()
    }
  }

  def table(name: String): DataFrame =
    tableIfExists(name).getOrElse(
      throw new IllegalArgumentException(s"table '$name' not found at $url"))

  def tableIfExists(name: String): Option[DataFrame] =
    if (!exists(name)) None
    else {
      val r = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", name)
      props.stringPropertyNames().forEach(k => r.option(k, props.getProperty(k)))
      val df = r.load()
      // normalize dialect-uppercased identifiers back to the lowercase
      // spelling the pipeline (and the oracle) uses
      Some(df.toDF(df.columns.map(_.toLowerCase): _*))
    }
}

/** The [[Loader]] semantics against a [[JdbcCatalog]]: surrogate ids
  * continuing from the table's max, O(batch) INSERT append when the schema
  * is unchanged, join-based upsert and schema evolution through a staging
  * table swapped in with the dialect's atomic protocol
  * ([[JdbcLoader.swapStatements]]: transactional DROP+RENAME on
  * Derby/Postgres, a single atomic multi-RENAME on MySQL where DDL
  * auto-commits).
  */
object JdbcLoader {

  import Loader.IdCol

  def load(tgt: JdbcCatalog, table: String, incoming0: DataFrame,
           upsertFields: Seq[String] = Nil, ensure: Boolean = true,
           safe: Boolean = false, idOrder: Seq[String] = Nil,
           writePartitions: Int = 8): Unit = {
    val incoming = if (incoming0.columns.contains(IdCol)) incoming0.drop(IdCol) else incoming0
    if (incoming.isEmpty) return

    val existing = tgt.tableIfExists(table)
    val order = if (idOrder.nonEmpty) idOrder else incoming.columns.toSeq
    val maxId: Long = existing match {
      case Some(ex) if ex.columns.contains(IdCol) =>
        val r = ex.agg(max(col(IdCol))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      case _ => 0L
    }

    existing match {
      case None =>
        append(tgt, table, Loader.withSurrogateIds(incoming, maxId, order), writePartitions)

      case Some(ex) if upsertFields.nonEmpty =>
        swapIn(tgt, table,
          Loader.upsertMerged(ex, incoming, upsertFields, maxId, order, ensure, safe),
          writePartitions)

      case Some(ex) =>
        val withIds = Loader.withSurrogateIds(incoming, maxId, order)
        val target = Loader.finalSchema(ex, withIds, ensure, safe)
        if (Loader.sameShape(target, ex.schema))
          // O(batch) fast path: plain INSERTs of the new rows only
          append(tgt, table, Loader.unionAligned(Seq(withIds), target), writePartitions)
        else
          // actual schema evolution: rewrite through the staging swap
          swapIn(tgt, table, Loader.unionAligned(Seq(ex, withIds), target), writePartitions)
    }
  }

  private def cap(df: DataFrame, writePartitions: Int): DataFrame =
    if (df.rdd.getNumPartitions > writePartitions) df.coalesce(writePartitions) else df

  private def append(tgt: JdbcCatalog, table: String, df: DataFrame,
                     writePartitions: Int): Unit = {
    val w = cap(df, writePartitions).write.format("jdbc")
      .option("url", tgt.url)
      .option("dbtable", table)
    tgt.props.stringPropertyNames().forEach(k => w.option(k, tgt.props.getProperty(k)))
    w.mode(SaveMode.Append).save() // creates the table when absent
  }

  /** The dialect-correct swap statements replacing `table` with `stage`.
    * Derby/Postgres have transactional DDL, so DROP + RENAME in one
    * transaction is atomic. MySQL auto-commits every DDL — there a single
    * multi-rename statement (itself atomic) does the swap and the old
    * snapshot drops afterwards. */
  private def swapStatements(url: String, table: String, stage: String): Seq[String] =
    if (url.startsWith("jdbc:postgresql"))
      Seq(s"DROP TABLE $table", s"ALTER TABLE $stage RENAME TO $table")
    else if (url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb"))
      Seq(s"RENAME TABLE $table TO ${table}__swapout, $stage TO $table",
        s"DROP TABLE ${table}__swapout")
    else // Derby (this container's driver) and RENAME TABLE dialects
      Seq(s"DROP TABLE $table", s"RENAME TABLE $stage TO $table")

  /** Write `merged` to `<table>__stage` (the plan may lazily READ the live
    * table — staging keeps the read and the write on different tables),
    * then swap with the dialect's atomic rename protocol.
    */
  private def swapIn(tgt: JdbcCatalog, table: String, merged: DataFrame,
                     writePartitions: Int): Unit = {
    val stage = table + "__stage"
    val w = cap(merged, writePartitions).write.format("jdbc")
      .option("url", tgt.url)
      .option("dbtable", stage)
    tgt.props.stringPropertyNames().forEach(k => w.option(k, tgt.props.getProperty(k)))
    w.mode(SaveMode.Overwrite).save() // full result durably staged
    tgt.withConnection { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        swapStatements(tgt.url, table, stage).foreach(st.execute)
        conn.commit()
      } catch {
        case e: java.sql.SQLException => conn.rollback(); throw e
      } finally st.close()
    }
  }
}
