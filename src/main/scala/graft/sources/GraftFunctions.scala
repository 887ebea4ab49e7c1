package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-level V2 FUNCTION behind graft's `bucket(n, keys...)`
  * partition transform — what lets Spark plan STORAGE-PARTITIONED JOINS
  * (SPJ) between co-bucketed graft tables with NO shuffle: both scans
  * report `KeyGroupedPartitioning(bucket(n, k))`, the planner resolves
  * `bucket` through this catalog function on each side, sees the SAME
  * canonical function with the SAME arguments, and joins the bucket
  * groups directly (`spark.sql.sources.v2.bucketing.enabled`) — at
  * 100 TB the difference between a fact-fact join shuffling both sides
  * and reading them co-located.
  *
  * The result MUST equal the write path's [[graft.etl.Loader.bucketIdExpr]]:
  * portable md5 hash of the NULL-skipping ``-joined stringified
  * key tuple, mod the bucket count — reproduced here over InternalRow
  * values with Spark's own cast-to-string rendering for the supported
  * key types (the write path stringifies through Cast). Types outside
  * the reproduced set refuse loudly rather than silently disagreeing
  * with the writer. */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, keys...) — graft's hash-bucket partition transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      "bucket(n, keys...) takes the bucket count and at least one key")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket count must be INT, got ${inputType.fields.head.dataType}")
    val keyTypes = inputType.fields.tail.map(_.dataType)
    keyTypes.foreach {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           BooleanType | DateType => ()
      case other => throw new UnsupportedOperationException(
        s"graft bucket() cannot reproduce the writer's stringification " +
          s"for ${other.simpleString} keys")
    }
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] =
        IntegerType +: keyTypes
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        // concat_ws semantics: NULL components are SKIPPED (no doubled
        // separator) — must match Loader.bucketIdExpr exactly
        val parts = keyTypes.zipWithIndex.collect {
          case (dt, i) if !input.isNullAt(i + 1) => dt match {
            case StringType => input.getUTF8String(i + 1).toString
            case LongType => input.getLong(i + 1).toString
            case IntegerType => input.getInt(i + 1).toString
            case ShortType => input.getShort(i + 1).toString
            case ByteType => input.getByte(i + 1).toString
            case BooleanType => input.getBoolean(i + 1).toString
            case DateType => java.time.LocalDate.ofEpochDay(
              input.getInt(i + 1).toLong).toString
            case other => throw new IllegalStateException(
              s"unreachable key type $other")
          }
        }
        Int.box((graft.functions.PortableHash
          .hmodJvm(parts.mkString("\u0001")) % n).toInt)
      }
    }
  }
}
