package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of ("closest value") joins — the reference's `link_closest`
  * (L2/L3, /root/reference/easy_etl/__init__.py:53-56, 119-136), generalized.
  *
  * Semantics (per direction):
  *   - ">=" / ">" : attach the dim row with the SMALLEST dim value ≥ (resp. >)
  *     the fact value (reference `WHERE child >= v ORDER BY child`, first row).
  *   - "<=" / "<" : the LARGEST dim value ≤ (resp. <) the fact value
  *     (the "July 1st bucket" case, reference README.md:159-173).
  *   - No qualifying dim row ⇒ null payload (reference returns None).
  *   - Duplicate dim keys ⇒ deterministic min payload per key (the reference
  *     takes whichever row the DB returns first; we pin it down).
  *
  * Two physical strategies, selected by [[asOfAuto]] on the DEDUPED key
  * count:
  *   - [[asOf]] (broadcast binary-search): collect the sorted distinct dim
  *     keys, broadcast, binary-search per fact row, attach payloads via a
  *     broadcast hash join on the match index. O(|fact|·log|dim|), zero
  *     shuffle of the fact side. For dims that fit on the driver (a date
  *     dimension: 10 years of days = 3652 rows).
  *   - [[asOfShuffled]] (range-partitioned merge): for dims too large to
  *     broadcast — one shuffle of each side, in-partition merge scan,
  *     O(partitions) carry-in driver state. Survives any dim size.
  */
object AsOfJoin {

  /** Hard row cap for the broadcast strategy. The collect materializes full
    * generic `Row`s (ordinal + payloads), not packed longs — 1M rows of a
    * few boxed fields is ~100–300 MB on the driver heap, a safe ceiling for
    * a default driver; [[asOfAuto]] additionally applies a byte budget
    * estimated from the payload schema and falls back to the merge strategy
    * well before the heap cliff.
    */
  val MaxDimRowsDefault: Int = 1_000_000
  /** Estimated-bytes budget for the broadcast collect (schema-based). */
  val MaxBroadcastBytesDefault: Long = 128L << 20

  /** Rows that fit in `maxBytes`, bounded by `maxRows`. Row width comes
    * from [[graft.sources.RowWidth.estimate]] (fixed widths from the
    * schema, variable widths MEASURED over a bounded sample — Catalyst's
    * 20-byte string default would let a 10 KB-payload dim sail into a
    * driver-OOM broadcast), plus generic-Row JVM overhead (object header,
    * per-field reference, boxing) per row.
    */
  private def broadcastRowBudget(dim: DataFrame, cols: Seq[String],
                                 maxRows: Int, maxBytes: Long): Int = {
    val perRow = graft.sources.RowWidth.estimate(dim, cols) + 24L + 16L * cols.length
    math.min(maxRows.toLong, math.max(1L, maxBytes / perRow)).toInt
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isTemporal(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** Map a key column to its Long ordinal domain (µs for temporal keys). */
  private def toOrd(df: DataFrame, name: String, keyType: DataType): Column = {
    val c = df(name)
    if (isTemporal(keyType)) graft.functions.TimeCols.usec(c)
    else if (isIntegral(keyType)) c.cast(LongType)
    else throw new IllegalArgumentException(
      s"unsupported as-of key type $keyType; map to an integral domain first")
  }

  private def checkKeys(direction: String, factType: DataType, keyType: DataType): Unit = {
    require(Seq(">=", ">", "<=", "<").contains(direction), s"bad direction: $direction")
    require(isIntegral(factType) == isIntegral(keyType) &&
      isTemporal(factType) == isTemporal(keyType),
      s"fact/dim as-of key types differ: $factType vs $keyType")
  }

  /** Dedupe the dimension: one row per key, deterministic min payload.
    * Null dim keys are dropped HERE so both physical strategies treat them
    * identically (a null key can never be the "closest" value; the reference
    * SQL's `WHERE child >= v` also never matches NULL). Without this the
    * broadcast path would NPE on `getLong` of a null ordinal while the merge
    * path silently filtered — strategy-dependent behavior.
    */
  private def dedupDim(dim: DataFrame, dimCol: String, payloadCols: Seq[String]): DataFrame =
    dim.where(col(dimCol).isNotNull)
      .groupBy(col(dimCol))
      .agg(min(struct(payloadCols.map(col): _*)).as("__p"))
      .select(col(dimCol) +: payloadCols.map(p => col(s"__p.$p").as(p)): _*)

  /** Broadcast binary-search as-of. A guard refuses dims above `maxDimRows`
    * so a silently huge dimension fails loudly instead of OOMing the driver
    * (use [[asOfAuto]] to degrade to the shuffled strategy instead).
    */
  def asOf(fact: DataFrame, factCol: String,
           dim: DataFrame, dimCol: String,
           payloadCols: Seq[String],
           direction: String = ">=",
           rename: Map[String, String] = Map.empty,
           maxDimRows: Int = MaxDimRowsDefault): DataFrame =
    asOfBroadcast(fact, factCol, dedupDim(dim, dimCol, payloadCols), dimCol,
      payloadCols, direction, rename, Some(maxDimRows))

  /** As-of with automatic strategy on the deduped key count: broadcast
    * binary-search under `maxBroadcastRows` distinct keys, distributed
    * range-merge above. The at-scale entry point. One dedup + one bounded
    * count, shared by whichever strategy runs.
    */
  def asOfAuto(fact: DataFrame, factCol: String,
               dim: DataFrame, dimCol: String,
               payloadCols: Seq[String],
               direction: String = ">=",
               rename: Map[String, String] = Map.empty,
               maxBroadcastRows: Int = MaxDimRowsDefault,
               maxBroadcastBytes: Long = MaxBroadcastBytesDefault): DataFrame = {
    val deduped = dedupDim(dim, dimCol, payloadCols)
    // row budget = min(row cap, byte budget / measured row width): wide or
    // string-heavy payloads flip to the merge strategy at far fewer rows
    // than a bare row count would allow
    val budget = broadcastRowBudget(deduped, dimCol +: payloadCols,
      maxBroadcastRows, maxBroadcastBytes)
    val small = deduped.limit(budget + 1).count() <= budget
    if (small)
      asOfBroadcast(fact, factCol, deduped, dimCol, payloadCols, direction, rename, None)
    else
      asOfMerge(fact, factCol, deduped, dimCol, payloadCols, direction, rename, 0)
  }

  /** Distributed range-merge as-of (public form; dedups internally). */
  def asOfShuffled(fact: DataFrame, factCol: String,
                   dim: DataFrame, dimCol: String,
                   payloadCols: Seq[String],
                   direction: String = ">=",
                   rename: Map[String, String] = Map.empty,
                   numPartitions: Int = 0): DataFrame =
    asOfMerge(fact, factCol, dedupDim(dim, dimCol, payloadCols), dimCol,
      payloadCols, direction, rename, numPartitions)

  /** Broadcast impl over a pre-deduped dim. `guard` = max rows to collect
    * (None when the caller already bounded the size). */
  private def asOfBroadcast(fact: DataFrame, factCol: String,
                            dimDedup: DataFrame, dimCol: String,
                            payloadCols: Seq[String], direction: String,
                            rename: Map[String, String],
                            guard: Option[Int]): DataFrame = {
    val keyType = dimDedup.schema(dimCol).dataType
    checkKeys(direction, fact.schema(factCol).dataType, keyType)
    val spark = fact.sparkSession

    val dimSorted = dimDedup.orderBy(col(dimCol))
    guard.foreach { maxDimRows =>
      // Guard BEFORE any collect: fail loudly, don't OOM mid-collect.
      val guardCount = dimSorted.limit(maxDimRows + 1).count()
      require(guardCount <= maxDimRows,
        s"as-of dimension has > $maxDimRows rows; pre-aggregate it or use asOfAuto")
    }
    // One collect for keys + payload together.
    val collected: Array[Row] =
      dimSorted.select(toOrd(dimSorted, dimCol, keyType).as("__ord") +:
        payloadCols.map(col): _*).collect()
    val keys: Array[Long] = collected.map(_.getLong(0))

    val dimIndexed = {
      val schema = StructType(StructField("__asof_idx", IntegerType, nullable = false) +:
        payloadCols.map(p => dimSorted.schema(p)))
      val rows = collected.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(i +: (1 until r.length).map(r.get))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
    }

    // Native codegen expression, not a UDF: the index probe runs once per
    // fact row (the hottest path of the whole join) and must stay inside
    // whole-stage codegen. Boundary = first key >/≥ v; ">="/">" take the
    // boundary element, "<="/"<" the one below it (AsOfSearch semantics).
    val strictUpper = direction == ">" || direction == "<="
    val takeLower = direction == "<=" || direction == "<"
    val idxCol = graft.functions.ColumnBridge.column(
      graft.functions.AsOfIndexLookup(
        graft.functions.ColumnBridge.expression(toOrd(fact, factCol, keyType)),
        keys, strictUpper, takeLower))

    val renamedDim = payloadCols.foldLeft(dimIndexed) { (d, p) =>
      d.withColumnRenamed(p, rename.getOrElse(p, p))
    }
    fact
      .withColumn("__asof_idx", idxCol)
      .join(broadcast(renamedDim), Seq("__asof_idx"), "left")
      .drop("__asof_idx")
  }

  /** Range-merge impl over a pre-deduped dim: both sides range-partition on
    * the (direction-normalized) key with ONE shared partitioner, sort within
    * partitions, and merge-scan; each partition starts from a carry-in — the
    * best dim row from all earlier partitions (numPartitions-sized driver
    * state, not the dim itself). One shuffle of each side, no broadcast.
    */
  private def asOfMerge(fact: DataFrame, factCol: String,
                        dimDedup: DataFrame, dimCol: String,
                        payloadCols: Seq[String], direction: String,
                        rename: Map[String, String],
                        numPartitions: Int): DataFrame = {
    val keyType = dimDedup.schema(dimCol).dataType
    checkKeys(direction, fact.schema(factCol).dataType, keyType)
    val spark = fact.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

    // Normalize direction: negate keys for ">"/">=" so the merge is always
    // "best dim key ≤ fact key", strict or not.
    val sign = if (direction.startsWith(">")) -1L else 1L
    val strict = direction == "<" || direction == ">"

    val dimPairs = dimDedup
      .select(toOrd(dimDedup, dimCol, keyType).as("__ord"),
        struct(payloadCols.map(col): _*).as("__p"))
      .where(col("__ord").isNotNull)
      .rdd.map(r => (sign * r.getLong(0), r.getStruct(1)))
    val factWithOrd = fact.withColumn("__ord", toOrd(fact, factCol, keyType))
    val factNullKey = factWithOrd.where(col("__ord").isNull).drop("__ord")
    val factPairs = factWithOrd.where(col("__ord").isNotNull)
      .rdd.map(r => (sign * r.getLong(r.length - 1), r))

    import org.apache.spark.RangePartitioner
    val partitioner = new RangePartitioner(parts, factPairs)
    val dimParted = dimPairs.repartitionAndSortWithinPartitions(partitioner)
    val factParted = factPairs.repartitionAndSortWithinPartitions(partitioner)

    // carry-in: for each partition, the best (largest-key) dim row of all
    // EARLIER partitions — O(partitions) driver state.
    val lastPerPart: Array[(Int, (Long, Row))] = dimParted
      .mapPartitionsWithIndex { (i, it) =>
        var last: (Long, Row) = null
        it.foreach(last = _)
        if (last == null) Iterator.empty else Iterator((i, last))
      }.collect()
    val carryIn: Array[Option[(Long, Row)]] = {
      val byPart = lastPerPart.toMap
      val arr = new Array[Option[(Long, Row)]](partitioner.numPartitions)
      var best: Option[(Long, Row)] = None
      for (p <- 0 until partitioner.numPartitions) {
        arr(p) = best
        byPart.get(p).foreach(l => best = Some(l))
      }
      arr
    }
    val bcCarry = spark.sparkContext.broadcast(carryIn)

    val payloadWidth = payloadCols.length
    val joined = factParted.zipPartitions(dimParted, preservesPartitioning = false) {
      (fit, dit) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var current: Option[(Long, Row)] = bcCarry.value(pid)
        val dims = dit.buffered
        fit.map { case (fk, frow) =>
          // advance: consume dim rows usable for this fact key
          while (dims.hasNext && (if (strict) dims.head._1 < fk else dims.head._1 <= fk)) {
            current = Some(dims.next())
          }
          val payload: Seq[Any] = current match {
            case Some((_, p)) => (0 until payloadWidth).map(p.get)
            case None => Seq.fill(payloadWidth)(null)
          }
          Row.fromSeq(frow.toSeq.dropRight(1) ++ payload) // drop __ord
        }
    }

    val outSchema = StructType(fact.schema.fields ++ payloadCols.map { p =>
      val f = dimDedup.schema(p)
      StructField(rename.getOrElse(p, p), f.dataType, nullable = true)
    })
    val main = spark.createDataFrame(joined, outSchema)
    val nullSide = payloadCols.foldLeft(factNullKey) { (d, p) =>
      d.withColumn(rename.getOrElse(p, p), lit(null).cast(dimDedup.schema(p).dataType))
    }
    main.unionByName(nullSide)
  }
}
