package org.apache.spark.sql.graft

import org.apache.spark.rdd.DeterministicLevel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType}
import org.apache.spark.storage.StorageLevel

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
  * omitting it).
  *
  * DETERMINISM: zipWithIndex's count job and the downstream write
  * execute the lineage independently, so a NONDETERMINATE source
  * (`rand()`, sampling, a round-robin repartition) could change
  * per-partition row counts between the passes and overlap the index
  * ranges — silently committing duplicate identity values. When the
  * incoming RDD cannot promise determinate re-execution, the rows PIN
  * behind a persist barrier (rows copied out of the scan's reused
  * buffers first); the count job materializes the cache and every later
  * pass replays the pinned bytes. The barrier costs nothing on the
  * common deterministic path, and the cached RDD unpersists with the
  * ContextCleaner once the plan's last reference drops. */
object IdentityStamp {

  /** Mutable row view overriding ONE integral ordinal of an underlying
    * row — the zero-allocation bridge between the scanned row and the
    * projection (the [[org.apache.spark.sql.catalyst.expressions.JoinedRow]]
    * idea, specialized to a single-slot patch: no per-row `Array[Any]`,
    * no field boxing). Only the identity ordinal's getters consult the
    * override; everything else delegates. */
  private final class OverrideRow(idx: Int, types: Array[DataType])
      extends InternalRow {
    private var row: InternalRow = _
    private var ov: Long = _

    def set(r: InternalRow, v: Long): InternalRow = { row = r; ov = v; this }

    override def numFields: Int = row.numFields
    override def setNullAt(i: Int): Unit =
      throw new UnsupportedOperationException("read-only view")
    override def update(i: Int, value: Any): Unit =
      throw new UnsupportedOperationException("read-only view")
    override def copy(): InternalRow = {
      val buf = new Array[Any](numFields)
      var j = 0
      while (j < buf.length) {
        buf(j) = if (isNullAt(j)) null else get(j, types(j)); j += 1
      }
      new GenericInternalRow(buf)
    }
    override def isNullAt(i: Int): Boolean = i != idx && row.isNullAt(i)
    override def getLong(i: Int): Long =
      if (i == idx) ov else row.getLong(i)
    override def getInt(i: Int): Int =
      if (i == idx) ov.toInt else row.getInt(i)
    override def getShort(i: Int): Short =
      if (i == idx) ov.toShort else row.getShort(i)
    override def getBoolean(i: Int): Boolean = row.getBoolean(i)
    override def getByte(i: Int): Byte = row.getByte(i)
    override def getFloat(i: Int): Float = row.getFloat(i)
    override def getDouble(i: Int): Double = row.getDouble(i)
    override def getDecimal(i: Int, precision: Int, scale: Int) =
      row.getDecimal(i, precision, scale)
    override def getUTF8String(i: Int) = row.getUTF8String(i)
    override def getBinary(i: Int) = row.getBinary(i)
    override def getInterval(i: Int) = row.getInterval(i)
    override def getStruct(i: Int, numFields: Int) = row.getStruct(i, numFields)
    override def getArray(i: Int) = row.getArray(i)
    override def getMap(i: Int) = row.getMap(i)
    override def getVariant(i: Int) = row.getVariant(i)
    override def getGeography(i: Int) = row.getGeography(i)
    override def getGeometry(i: Int) = row.getGeometry(i)
    override def get(i: Int, dt: DataType): AnyRef =
      if (i == idx) (types(idx) match {
        case LongType => java.lang.Long.valueOf(ov)
        case IntegerType => java.lang.Integer.valueOf(ov.toInt)
        case _ => java.lang.Short.valueOf(ov.toShort)
      }) else row.get(i, dt).asInstanceOf[AnyRef]
  }

  /** Overflow validation for the declared integral width — called once
    * per ASSIGNED value, before it reaches the override slot. */
  private def validator(dt: DataType, colName: String): Long => Unit =
    dt match {
      case LongType => _ => ()
      case IntegerType => v => {
        if (v < Int.MinValue || v > Int.MaxValue)
          throw new ArithmeticException(
            s"identity value $v overflows INT column '$colName'")
      }
      case ShortType => v => {
        if (v < Short.MinValue || v > Short.MaxValue)
          throw new IllegalArgumentException(
            s"identity value $v overflows SHORT column '$colName'")
      }
      case other => throw new IllegalArgumentException(
        s"identity column '$colName' must be integral, got $other")
    }

  /** Per-task identity assigner for the merge-on-read DELTA writers —
    * the path with no DataFrame and no global zip: each task fills NULL
    * identity slots with `base + step * (taskIndex + numTasks * i)`,
    * `i` its own 0-based assigned-row counter. A strided interleave of
    * the statement's reservation: disjoint across tasks by construction,
    * every value beyond the statement's high-water `base` in the step
    * direction, ONE pass, zero coordination. Values are NOT contiguous
    * and not globally ordered — the documented monotone-not-gapless
    * identity contract (uniqueness + direction, never density). A task
    * RETRY replays the same (taskIndex, counter) sequence, so attempts
    * are idempotent; the commit protocol keeps exactly one. Reinserted
    * rows (updates) arrive with their identity slot non-null and pass
    * through untouched — like BY DEFAULT explicit inserts, the engine
    * guarantees uniqueness only for values IT assigns. */
  final class TaskIdentityAssigner(schema: org.apache.spark.sql.types.StructType,
                                   specs: Seq[(String, Long, Long)],
                                   taskIndex: Int, numTasks: Int) {
    private val types = schema.fields.map(_.dataType)
    private val proj = UnsafeProjection.create(schema)
    private final class Slot(val idx: Int, base: Long, step: Long) {
      private val validate = validator(types(idx), schema.fields(idx).name)
      val view = new OverrideRow(idx, types)
      private var i = 0L
      def next(): Long = {
        val v = base + step * (taskIndex.toLong + numTasks.toLong * i)
        validate(v); i += 1; v
      }
    }
    private val slots: Array[Slot] = specs.flatMap { case (c, base, step) =>
      schema.fields.zipWithIndex
        .find(_._1.name.equalsIgnoreCase(c))
        .map { case (_, idx) => new Slot(idx, base, step) }
    }.toArray

    /** The row with NULL identity slots filled (projected to unsafe) —
      * or the input row untouched when nothing needed assignment. */
    def apply(row: InternalRow): InternalRow = {
      var r = row
      var touched = false
      var k = 0
      while (k < slots.length) {
        val s = slots(k)
        if (r.isNullAt(s.idx)) { r = s.view.set(r, s.next()); touched = true }
        k += 1
      }
      if (touched) proj(r) else row
    }
  }

  def stamp(df: DataFrame, colName: String, next: Long, step: Long,
            refuseExplicit: Boolean = false): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = df.schema
    val idx = schema.fieldIndex(colName)
    val types = schema.fields.map(_.dataType)
    val validate = validator(types(idx), colName)
    val base = df.queryExecution.toRdd
    // determinism barrier (class doc): pin nondeterminate sources so the
    // count and write passes see the SAME rows. Two detectors, both
    // cheap: the RDD's own level (covers RDD-bred indeterminism), and a
    // plan walk for nondeterministic EXPRESSIONS — a `WHERE rand() <
    // 0.5` changes per-partition COUNTS between executions while its
    // RDD still reports DETERMINATE (SQL plans don't propagate
    // expression nondeterminism into the RDD flag). copy() first — the
    // scan's unsafe rows are reused buffers and cannot be cached as-is.
    val planNondeterministic = df.queryExecution.analyzed.exists(
      p => !p.expressions.forall(_.deterministic))
    val pinned =
      if (base.outputDeterministicLevel == DeterministicLevel.DETERMINATE &&
        !planNondeterministic) base
      else base.map(_.copy()).persist(StorageLevel.MEMORY_AND_DISK)
    val zipped = pinned.zipWithIndex()
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema)
        val view = new OverrideRow(idx, types)
        it.map { case (r, i) =>
          if (r.isNullAt(idx)) {
            val v = next + i * step
            validate(v)
            proj(view.set(r, v)): InternalRow
          } else if (refuseExplicit)
            // GENERATED ALWAYS AS IDENTITY: refused IN-TASK — no probe
            // action over the incoming plan, the job fails before any
            // file stages or manifest commits
            throw new IllegalArgumentException(
              s"identity column '$colName' is GENERATED ALWAYS — " +
                "explicit values are not accepted (declare GENERATED BY " +
                "DEFAULT to allow them)")
          else proj(r): InternalRow // pass-through, normalized to unsafe
        }
      }
    spark.internalCreateDataFrame(zipped, schema)
  }
}
