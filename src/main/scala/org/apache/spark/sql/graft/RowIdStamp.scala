package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The surrogate-id stamp's row-format bridge: prepend a GAPLESS
  * `id = startId + 1-based position` in `df`'s partition-major row
  * order without ever leaving Tungsten's unsafe-row representation.
  *
  * Why not pure Catalyst: a global gapless rank needs a per-partition
  * counter plus per-partition offsets. The Catalyst spellings all cost
  * more than they save — a global `Window.orderBy` is the single-
  * partition bottleneck this replaced; `row_number() OVER (PARTITION BY
  * spark_partition_id())` plans a SECOND full hash exchange; and a
  * two-action counts-then-join plan re-executes the range shuffle twice
  * (DataFrame actions never reuse each other's exchanges). RDD
  * `zipWithIndex` on the SAME lineage reuses the one sort shuffle across
  * its count job and its map job — the cheapest correct shape — and the
  * historical cost of `.rdd` was never the RDD node: it was
  * deserializing every UnsafeRow into a boxed `Row` and re-encoding it
  * back. This bridge keeps `queryExecution.toRdd`'s unsafe rows as-is,
  * joins the id in front, and re-projects to unsafe — no boxing, no
  * encoder pass. (Lives in the `org.apache.spark.sql` tree for the
  * `private[sql]` `internalCreateDataFrame` seam.)
  *
  * Rows are REUSED per-partition (the standard operator contract:
  * buffering consumers — sorts, exchanges — copy what they keep). */
object RowIdStamp {

  def zipWithIds(df: DataFrame, startId: Long, idCol: String): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = StructType(
      StructField(idCol, LongType, nullable = false) +: df.schema.fields)
    val zipped = df.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        val joined = new JoinedRow
        val idRow = new GenericInternalRow(1)
        it.map { case (r, i) =>
          idRow.setLong(0, startId + i + 1L)
          proj(joined(idRow, r)): InternalRow
        }
      }
    spark.internalCreateDataFrame(zipped, schema)
  }
}
