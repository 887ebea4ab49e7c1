package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** IDENTITY-column assignment's row-format bridge (the [[RowIdStamp]]
  * pattern): fill `colName`'s NULL slots with `next + i * step`, `i`
  * the row's 0-based position in partition-major zip order, keeping
  * provided non-null values untouched — ONE pass over
  * `queryExecution.toRdd`'s unsafe rows, the zip's count and map jobs
  * sharing the plan's one execution like the surrogate-id stamp.
  *
  * Values are MONOTONE but not gapless (rows arriving with explicit
  * values burn their index — the Delta/SQL-standard identity contract
  * promises uniqueness and direction, never density). The column must
  * already exist in `df` (callers add a typed null column for frames
  * omitting it). */
object IdentityStamp {

  def stamp(df: DataFrame, colName: String, next: Long, step: Long): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = df.schema
    val idx = schema.fieldIndex(colName)
    val types = schema.fields.map(_.dataType)
    val assigned: Long => Any = types(idx) match {
      case LongType => v => v
      case IntegerType => v => Math.toIntExact(v)
      case ShortType => v => {
        val i = Math.toIntExact(v)
        require(i >= Short.MinValue && i <= Short.MaxValue,
          s"identity value $v overflows SHORT column '$colName'")
        i.toShort
      }
      case other => throw new IllegalArgumentException(
        s"identity column '$colName' must be integral, got $other")
    }
    val zipped = df.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        val n = types.length
        it.map { case (r, i) =>
          val buf = new Array[Any](n)
          var j = 0
          while (j < n) {
            buf(j) = if (r.isNullAt(j)) null else r.get(j, types(j))
            j += 1
          }
          if (r.isNullAt(idx)) buf(idx) = assigned(next + i * step)
          proj(new GenericInternalRow(buf)): InternalRow
        }
      }
    spark.internalCreateDataFrame(zipped, schema)
  }
}
