package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest ZONE MAPS: per-file [min,max] column ranges recorded at commit
  * time (parquet footers — metadata-only) and used by [[VersionedTable
  * .readWhere]] to skip whole files on the driver before any scan task
  * launches. Contracts pinned here:
  *
  *   - a selective range predicate SKIPS the files whose ranges exclude it
  *     and the result equals the unpruned `readVersion().where()`;
  *   - the scanned plan's `inputFiles` is exactly the surviving file set
  *     (the skipping is real, not cosmetic);
  *   - appends CARRY the parent's zone maps forward (no re-footer-read of
  *     old files at commit time — and pruning keeps working across
  *     versions);
  *   - delete / compact / rollback all preserve zone maps;
  *   - unsupported predicate shapes, stats-less columns and pre-stats
  *     manifests degrade to a FULL read — never a wrong one;
  *   - string domains prune only inside ASCII, where Java and UTF-8 byte
  *     order agree.
  */
class VersionedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vstats"))

  /** Three appends with disjoint k-ranges → one file per batch (tiny
    * data collapses to one partition), three files with disjoint zone
    * maps. */
  private def threeBatches(tgt: Catalog): Unit = {
    def df(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"s$i", i * 1.5)).toDF("k", "s", "x")
    VersionedTable.load(tgt, "t", df(1L, 100L), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", df(101L, 200L), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", df(201L, 300L), idOrder = Seq("k"))
  }

  test("range predicate skips files outside the zone map and matches the full read") {
    val tgt = freshCat()
    threeBatches(tgt)
    val all = VersionedTable.files(tgt, "t", 3L)
    assert(all.size >= 3)
    val pred = col("k") >= 150L && col("k") <= 160L
    val skipped = VersionedTable.skippedFiles(tgt, "t", 3L, pred)
    assert(skipped.size >= 2,
      s"batches 1 and 3 must be skipped, got ${skipped.size}: $skipped")
    val pruned = VersionedTable.readWhere(tgt, "t", 3L, pred)
    val full = VersionedTable.readVersion(tgt, "t", 3L).where(pred)
    assert(pruned.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    // the skipping is physical: no skipped file appears in the scan
    val scanned = pruned.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    val skippedPaths = skipped.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned.intersect(skippedPaths).isEmpty)
    assert(scanned.size == all.size - skipped.size)
  }

  test("equality, IN, string and double conjuncts all prune; disjunctions don't") {
    val tgt = freshCat()
    threeBatches(tgt)
    def skippedCount(pred: org.apache.spark.sql.Column): Int =
      VersionedTable.skippedFiles(tgt, "t", 3L, pred).size
    assert(skippedCount(col("k") === 250L) >= 2, "equality prunes")
    assert(skippedCount(col("k").isin(5L, 7L)) >= 2, "IN prunes")
    assert(skippedCount(col("x") > lit(350.0)) >= 2, "double prunes (x = k*1.5)")
    assert(skippedCount(col("s") === "s105") >= 1, "ASCII string prunes")
    // OR prunes by interval union: batch 2 (101..200) excludes BOTH
    // branches; batches 1 and 3 each admit one
    val pred = col("k") === 5L || col("k") === 250L
    assert(skippedCount(pred) == 1, "the middle batch excludes both branches")
    assert(VersionedTable.readWhere(tgt, "t", 3L, pred).count() == 2L)
    // an OR with an unsupported branch can never skip (it may match rows
    // the supported branch excludes)
    assert(skippedCount(col("k") === 5L || length(col("s")) > 100) == 0)
    // AND nested under OR still skips where both disjuncts exclude
    assert(skippedCount((col("k") >= 1L && col("k") <= 50L) ||
      (col("k") >= 250L && col("k") <= 260L)) == 1)
  }

  test("IS NULL and IS NOT NULL prune on recorded null counts; unknown counts never skip") {
    val tgt = freshCat()
    val noNulls = (1L to 50L).map(i => (i, java.lang.Long.valueOf(i * 10)))
      .toDF("k", "v")
    val allNull = (51L to 60L).map(i => (i, null: java.lang.Long)).toDF("k", "v")
    val mixed = Seq((61L, java.lang.Long.valueOf(7L)), (62L, null: java.lang.Long))
      .toDF("k", "v")
    VersionedTable.load(tgt, "t", noNulls, idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", allNull, idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", mixed, idOrder = Seq("k"))
    // IS NULL skips the no-null file only
    assert(VersionedTable.skippedFiles(tgt, "t", 3L, col("v").isNull).size == 1)
    assert(VersionedTable.readWhere(tgt, "t", 3L, col("v").isNull).count() == 11L)
    // IS NOT NULL skips the all-null file only
    assert(VersionedTable.skippedFiles(tgt, "t", 3L, col("v").isNotNull).size == 1)
    assert(VersionedTable.readWhere(tgt, "t", 3L, col("v").isNotNull).count() == 51L)
    // composition: a range AND a null check
    assert(VersionedTable.readWhere(tgt, "t", 3L,
      col("k") <= 55L && col("v").isNull).count() == 5L)
    // planning-time twin: a plain .where over readVersion prunes the same
    val scan = VersionedTable.readVersion(tgt, "t", 3L).where(col("v").isNull)
    assert(scan.count() == 11L)
    val plan = scan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case x => x
    }
    val numFiles = plan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    assert(numFiles < VersionedTable.files(tgt, "t", 3L).size,
      "the Catalyst scan must mount fewer files on IS NULL")
    // a manifest stripped of null counts degrades to a full read
    // (legacy layout: a pre-delta writer left a full manifest per version)
    VersionedTable.forceFullManifests(tgt, "t")
    val v3f = new java.io.File(s"${tgt.dirPath("t")}.__vmeta/v3.manifest.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(v3f).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("nulls"); root.remove("rows")
    java.nio.file.Files.write(v3f.toPath, mapper.writeValueAsBytes(root))
    assert(VersionedTable.skippedFiles(tgt, "t", 3L, col("v").isNull).isEmpty)
    assert(VersionedTable.readWhere(tgt, "t", 3L, col("v").isNull).count() == 11L)
  }

  test("a delete fully covered by zone maps commits with zero data I/O") {
    val tgt = freshCat()
    threeBatches(tgt) // k ranges 1-100, 101-200, 201-300
    val m3 = VersionedTable.readManifest(tgt, "t", 3L).get
    val dataDir = new java.io.File(s"${tgt.dirPath("t")}.__vdata")
    def allDataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dataDir).filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSet
    }
    val before = allDataFiles()
    // k <= 100 covers batch 1 entirely: metadata-only drop
    val v4 = VersionedTable.delete(tgt, "t", col("k") <= 100L)
    assert(allDataFiles() == before,
      "a fully-covered delete must not write (or delete) any data file")
    val m4 = VersionedTable.readManifest(tgt, "t", v4).get
    assert(m4.files.toSet.subsetOf(m3.files.toSet) &&
      m4.files.size < m3.files.size, "covered files drop from the manifest")
    assert(VersionedTable.read(tgt, "t").count() == 200L)
    assert(VersionedTable.read(tgt, "t").agg(min("k")).head().getLong(0) == 101L)
    // boundary delete: covers batch 2 fully, cuts batch 3 partially —
    // exactly one file rewrites
    val v5 = VersionedTable.delete(tgt, "t", col("k") <= 250L)
    val m5 = VersionedTable.readManifest(tgt, "t", v5).get
    assert((m5.files.toSet -- m4.files.toSet).nonEmpty,
      "the boundary file must be rewritten")
    assert(VersionedTable.read(tgt, "t").count() == 50L)
    // prior versions untouched (snapshot safety)
    assert(VersionedTable.readVersion(tgt, "t", 3L).count() == 300L)
    // covering EVERYTHING still leaves a readable (empty) head with schema
    val v6 = VersionedTable.delete(tgt, "t", col("k") >= 1L)
    assert(VersionedTable.read(tgt, "t").count() == 0L)
    assert(VersionedTable.read(tgt, "t").columns.contains("s"))
    assert(v6 == 6L)
  }

  test("appends carry the parent's zone maps; pruning works on old files") {
    val tgt = freshCat()
    threeBatches(tgt)
    val m3 = VersionedTable.readManifest(tgt, "t", 3L).get
    val m2 = VersionedTable.readManifest(tgt, "t", 2L).get
    // every v2 file's stats entry is present, verbatim, in v3's manifest
    m2.files.foreach { f =>
      assert(m3.stats.get(f) == m2.stats.get(f),
        s"stats for carried file $f must carry forward unchanged")
    }
    assert(m3.stats.keySet == m3.files.toSet,
      "every committed file carries a zone map")
  }

  test("delete, compact and rollback preserve zone maps and pruning") {
    val tgt = freshCat()
    threeBatches(tgt)
    VersionedTable.delete(tgt, "t", col("k") === 150L) // v4: rewrites 1 file
    val m4 = VersionedTable.readManifest(tgt, "t", 4L).get
    assert(m4.stats.keySet == m4.files.toSet)
    assert(VersionedTable.skippedFiles(tgt, "t", 4L,
      col("k") >= 250L).size >= 2)
    assert(VersionedTable.readWhere(tgt, "t", 4L, col("k") >= 140L &&
      col("k") <= 160L).count() == 20L) // 150 deleted
    val v5 = VersionedTable.compact(tgt, "t", 512L * 1024 * 1024) // all small
    if (v5 > 4L) {
      val m5 = VersionedTable.readManifest(tgt, "t", v5).get
      assert(m5.stats.keySet == m5.files.toSet,
        "compaction output files must carry fresh zone maps")
    }
    val v6 = VersionedTable.rollback(tgt, "t", 3L)
    val m6 = VersionedTable.readManifest(tgt, "t", v6).get
    assert(m6.stats == VersionedTable.readManifest(tgt, "t", 3L).get.stats,
      "rollback restores the target version's zone maps")
  }

  test("an all-null column and a NaN double disable skipping for their files only") {
    val tgt = freshCat()
    val withNull = Seq((1L, null: java.lang.Double), (2L, null: java.lang.Double))
      .toDF("k", "x")
    val withNaN = Seq((10L, java.lang.Double.valueOf(Double.NaN)),
      (11L, java.lang.Double.valueOf(2.0))).toDF("k", "x")
    val normal = Seq((100L, java.lang.Double.valueOf(5.0))).toDF("k", "x")
    VersionedTable.load(tgt, "t", withNull, idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", withNaN, idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", normal, idOrder = Seq("k"))
    val man = VersionedTable.readManifest(tgt, "t", 3L).get
    // x has no recorded range in the null/NaN files → they are never
    // skipped on x; the normal file's range still prunes
    val skipped = VersionedTable.skippedFiles(tgt, "t", 3L, col("x") > 100.0)
    assert(skipped.size == 1, s"only the normal file can skip on x: $skipped")
    // correctness unharmed either way
    // Spark orders NaN GREATER than any double, so NaN > 1.0 is TRUE —
    // and the NaN file carries no x range (parquet omits stats when NaN
    // is present), so it can never be wrongly skipped
    assert(VersionedTable.readWhere(tgt, "t", 3L, col("x") > 1.0)
      .count() == 3L) // NaN, 2.0 and 5.0
    // k pruning still works everywhere (k stats exist in all files)
    assert(VersionedTable.skippedFiles(tgt, "t", 3L, col("k") === 100L).size == 2)
  }

  test("a pre-stats manifest (no 'stats' field) reads fully and never skips") {
    val tgt = freshCat()
    threeBatches(tgt)
    // strip the stats field from v3's manifest, simulating a table
    // committed by a pre-zone-map writer (which wrote full manifests only)
    VersionedTable.forceFullManifests(tgt, "t")
    val md = new java.io.File(s"${tgt.dirPath("t")}.__vmeta")
    val v3 = new java.io.File(md, "v3.manifest.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(v3).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("stats")
    java.nio.file.Files.write(v3.toPath, mapper.writeValueAsBytes(root))
    assert(VersionedTable.readManifest(tgt, "t", 3L).get.stats.isEmpty)
    assert(VersionedTable.skippedFiles(tgt, "t", 3L, col("k") === 5L).isEmpty)
    assert(VersionedTable.readWhere(tgt, "t", 3L, col("k") === 5L).count() == 1L)
  }

  test("non-ASCII string bounds refuse to prune; ASCII bounds prune") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t",
      Seq((1L, "éclair"), (2L, "zebra")).toDF("k", "s"), // é > 'z' in UTF-8
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t",
      Seq((3L, "apple"), (4L, "banana")).toDF("k", "s"), idOrder = Seq("k"))
    // file 1 has a non-ASCII bound: must never be skipped on s
    val skipped = VersionedTable.skippedFiles(tgt, "t", 2L, col("s") === "zzz")
    val man = VersionedTable.readManifest(tgt, "t", 2L).get
    val asciiOnly = man.stats.collect {
      case (f, st) if st.get("s").exists { case (_, lo, hi) =>
        lo.forall(_ < 128.toChar) && hi.forall(_ < 128.toChar) } => f
    }.toSet
    assert(skipped.nonEmpty, "the ASCII-bounded file must skip on s = 'zzz'")
    skipped.foreach(f => assert(asciiOnly.exists(f.endsWith),
      s"only ASCII-bounded files may be skipped, got $f"))
    assert(VersionedTable.readWhere(tgt, "t", 2L, col("s") >= "a").count() == 4L)
  }

  test("long string bounds truncate to valid short bounds; pruning stays sound") {
    val tgt = freshCat()
    val longA = "a" * 100 + "LOW"   // 103 chars, > MaxStringBound (64)
    val longY = "y" * 100 + "HIGH"
    VersionedTable.load(tgt, "t",
      Seq((1L, longA), (2L, longY)).toDF("k", "s"), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t",
      Seq((3L, "mmm")).toDF("k", "s"), idOrder = Seq("k"))
    val man = VersionedTable.readManifest(tgt, "t", 2L).get
    val sBounds = man.stats.values.flatMap(_.get("s")).toSeq
    assert(sBounds.nonEmpty)
    sBounds.foreach { case (_, lo, hi) =>
      assert(lo.length <= 65 && hi.length <= 65,
        s"bounds must be truncated, got |lo|=${lo.length} |hi|=${hi.length}")
    }
    // a probe below every bound skips both files; the real values are
    // still inside their truncated ranges (readWhere finds them)
    assert(VersionedTable.skippedFiles(tgt, "t", 2L, col("s") === "0").size == 2)
    assert(VersionedTable.readWhere(tgt, "t", 2L, col("s") === longY).count() == 1L)
    assert(VersionedTable.readWhere(tgt, "t", 2L, col("s") >= "a").count() == 3L)
  }

  test("planning-time pruning: a plain .where on readVersion skips files at the scan") {
    val tgt = freshCat()
    threeBatches(tgt)
    val man = VersionedTable.readManifest(tgt, "t", 3L).get
    val df = VersionedTable.readVersion(tgt, "t", 3L)
      .where(col("k") >= 150L && col("k") <= 160L)
    assert(df.count() == 11L)
    def scanOf(d: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.execution.FileSourceScanExec = {
      val plan = d.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan // AQE wraps plans with exchanges; unwrap to the real tree
        case x => x
      }
      plan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    }
    val numFiles = scanOf(df).metrics("numFiles").value
    assert(numFiles < man.files.size,
      s"the scan must mount fewer files than the manifest lists: " +
        s"$numFiles/${man.files.size}")
    // SQL over a registered view prunes the same way — no graft API in
    // the query path at all
    VersionedTable.readVersion(tgt, "t", 3L).createOrReplaceTempView("zm_t")
    val sqlDf = spark.sql("SELECT count(*) AS n FROM zm_t WHERE k = 250")
    assert(sqlDf.head().getLong(0) == 1L)
    assert(scanOf(sqlDf).metrics("numFiles").value < man.files.size)
    // and an unfiltered read still sees everything
    assert(VersionedTable.readVersion(tgt, "t", 3L).count() == 300L)
  }

  test("recluster turns overlapping file ranges into prunable ones (1-D range sort)") {
    val tgt = freshCat()
    // four interleaved appends: every file's k-range spans the whole
    // domain, so zone maps exist but can't skip anything
    (0 until 4).foreach { i =>
      val rows = (0 until 1000).map(j => (j * 4L + i, s"pad-$j-${j * 2654435761L}"))
      VersionedTable.load(tgt, "t", rows.toDF("k", "pad"), idOrder = Seq("k"))
    }
    val pred = col("k") >= 1000L && col("k") < 1200L
    assert(VersionedTable.skippedFiles(tgt, "t", 4L, pred).isEmpty,
      "interleaved appends leave nothing to skip")
    val before = VersionedTable.readVersion(tgt, "t", 4L)
      .collect().map(_.toSeq).toSet
    val v5 = VersionedTable.recluster(tgt, "t", Seq("k"), 4L * 1024)
    assert(v5 == 5L)
    val man5 = VersionedTable.readManifest(tgt, "t", 5L).get
    assert(man5.files.size >= 3, s"recluster must size multiple output files")
    val skipped = VersionedTable.skippedFiles(tgt, "t", 5L, pred)
    assert(skipped.size >= man5.files.size / 2,
      s"after reclustering, a 5% range must skip most files: " +
        s"${skipped.size}/${man5.files.size}")
    // logical state unchanged; pruned read equals it
    assert(VersionedTable.readVersion(tgt, "t", 5L)
      .collect().map(_.toSeq).toSet == before)
    assert(VersionedTable.readWhere(tgt, "t", 5L, pred).count() == 200L)
    // snapshot safety: the pre-recluster version still reads its own files
    assert(VersionedTable.readVersion(tgt, "t", 4L).count() == 4000L)
  }

  test("z-order recluster makes BOTH dimensions prunable") {
    val tgt = freshCat()
    // a 64x64 grid appended in row-major order: natural files span the
    // full b-range and wide a-ranges
    val grid = (0 until 4096).map(i => (i / 64L, i % 64L, s"p-$i-${i * 2654435761L}"))
    VersionedTable.load(tgt, "t", grid.toDF("a", "b", "pad"), idOrder = Seq("a", "b"))
    val v2 = VersionedTable.recluster(tgt, "t", Seq("a", "b"), 4L * 1024)
    val man = VersionedTable.readManifest(tgt, "t", v2).get
    assert(man.files.size >= 6)
    val skipA = VersionedTable.skippedFiles(tgt, "t", v2, col("a") === 3L)
    val skipB = VersionedTable.skippedFiles(tgt, "t", v2, col("b") === 3L)
    assert(skipA.nonEmpty && skipB.nonEmpty,
      s"z-order must give both dimensions skipping: a=${skipA.size} b=${skipB.size}")
    assert(VersionedTable.readWhere(tgt, "t", v2, col("a") === 3L).count() == 64L)
    assert(VersionedTable.readWhere(tgt, "t", v2, col("b") === 3L).count() == 64L)
    // a bucketed table refuses to recluster
    val tgt2 = freshCat()
    VersionedTable.load(tgt2, "t", grid.take(10).toDF("a", "b", "pad"),
      idOrder = Seq("a"), bucketBy = Some((Seq("a"), 2)))
    intercept[IllegalArgumentException] {
      VersionedTable.recluster(tgt2, "t", Seq("a", "b"), 1024L)
    }
  }

  test("manifests record exact file sizes; readers use them and survive their absence") {
    val tgt = freshCat()
    threeBatches(tgt)
    val man = VersionedTable.readManifest(tgt, "t", 3L).get
    assert(man.sizes.keySet == man.files.toSet,
      "every committed file must carry its byte size")
    man.files.foreach { r =>
      val actual = new java.io.File(
        s"${tgt.dirPath("t")}.__vdata/$r").length()
      assert(man.sizes(r) == actual,
        s"recorded size must equal the on-disk size for $r")
    }
    // carried on append and rollback
    val m2 = VersionedTable.readManifest(tgt, "t", 2L).get
    m2.files.foreach(f => assert(man.sizes.get(f) == m2.sizes.get(f)))
    val v4 = VersionedTable.rollback(tgt, "t", 2L)
    assert(VersionedTable.readManifest(tgt, "t", v4).get.sizes == m2.sizes)
    // a pre-sizes manifest (field stripped) still reads correctly via the
    // per-file status fallback (legacy layout: full manifests only)
    VersionedTable.forceFullManifests(tgt, "t")
    val v3f = new java.io.File(s"${tgt.dirPath("t")}.__vmeta/v3.manifest.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(v3f).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("sizes")
    java.nio.file.Files.write(v3f.toPath, mapper.writeValueAsBytes(root))
    assert(VersionedTable.readManifest(tgt, "t", 3L).get.sizes.isEmpty)
    assert(VersionedTable.readVersion(tgt, "t", 3L).count() == 300L)
    assert(VersionedTable.readWhere(tgt, "t", 3L,
      col("k") === 150L).count() == 1L)
  }

  test("fractional literals on a long column never prune (Spark widens the column)") {
    val tgt = freshCat()
    // 2^60 + 1 is not representable as a double: Spark compares
    // double(k) = 2^60 against the double literal 2^60 and MATCHES the
    // row — an exact integer comparison would skip the file and lose it
    val big = (1L << 60) + 1L
    VersionedTable.load(tgt, "t", Seq(Tuple1(big)).toDF("k"), idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq(Tuple1(5L)).toDF("k"), idOrder = Seq("k"))
    val pred = col("k") === lit((1L << 60).toDouble)
    assert(VersionedTable.skippedFiles(tgt, "t", 2L, pred).isEmpty,
      "a double literal must never prune a long column")
    assert(VersionedTable.readWhere(tgt, "t", 2L, pred).count() ==
      VersionedTable.readVersion(tgt, "t", 2L).where(pred).count())
    // numeric STRING literals also widen to double on a long column
    assert(VersionedTable.skippedFiles(tgt, "t", 2L, col("k") === "5").isEmpty)
    // exact long literals still prune
    assert(VersionedTable.skippedFiles(tgt, "t", 2L, col("k") === 5L).size == 1)
  }

  test("huge integral literals on a double column compare in Spark's double domain") {
    val tgt = freshCat()
    val big = (1L << 60).toDouble // exactly 2^60
    VersionedTable.load(tgt, "t", Seq(Tuple1(big)).toDF("x"), idOrder = Seq("x"))
    VersionedTable.load(tgt, "t", Seq(Tuple1(1.0)).toDF("x"), idOrder = Seq("x"))
    // the literal 2^60+1 rounds to 2^60 when Spark casts it to double —
    // the zone map must admit the file (and the row matches)
    val pred = col("x") === lit((1L << 60) + 1L)
    assert(VersionedTable.readWhere(tgt, "t", 2L, pred).count() == 1L)
    // and a literal far outside still prunes after the same rounding
    assert(VersionedTable.skippedFiles(tgt, "t", 2L,
      col("x") === lit(12345L)).size == 2)
  }

  test("case-sensitive twin columns bind conjuncts exactly, not to the wrong twin") {
    val prev = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      val tgt = freshCat()
      val df = spark.range(1).select(lit(5L).as("v"), lit(5000L).as("V"))
      VersionedTable.load(tgt, "t", df, idOrder = Seq("V"))
      VersionedTable.load(tgt, "t",
        spark.range(1).select(lit(7L).as("v"), lit(7000L).as("V")),
        idOrder = Seq("V"))
      // exact binding: a predicate on V uses V's range [5000,7000], not
      // v's [5,7] — 5000 must NOT skip file 1 (old lowercase-collectFirst
      // binding could resolve V to v's range and skip it unsoundly)
      assert(VersionedTable.skippedFiles(tgt, "t", 2L,
        col("V") === lit(5000L)).size == 1) // only file 2 skips
      assert(VersionedTable.readWhere(tgt, "t", 2L,
        col("V") === lit(5000L)).count() == 1L)
      // a name matching both twins only case-insensitively is ambiguous:
      // never prune on it
      assert(VersionedTable.skippedFiles(tgt, "t", 2L,
        upper(lit("dummy")) === "X" && col("v") === lit(99L)).size == 2,
        "exact lower-v binding still prunes (both files outside 99)")
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  test("timestamp and date zone maps prune with typed literals") {
    val tgt = freshCat()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def dt(s: String) = java.sql.Date.valueOf(s)
    VersionedTable.load(tgt, "t",
      Seq((1L, ts("2024-01-01 00:00:00"), dt("2024-01-01")),
          (2L, ts("2024-01-31 23:59:59"), dt("2024-01-31"))).toDF("k", "t", "d"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t",
      Seq((3L, ts("2024-06-01 00:00:00"), dt("2024-06-01")),
          (4L, ts("2024-06-30 12:00:00"), dt("2024-06-30"))).toDF("k", "t", "d"),
      idOrder = Seq("k"))
    assert(VersionedTable.skippedFiles(tgt, "t", 2L,
      col("t") >= lit(ts("2024-05-01 00:00:00"))).size == 1)
    assert(VersionedTable.skippedFiles(tgt, "t", 2L,
      col("d") < lit(dt("2024-02-01"))).size == 1)
    assert(VersionedTable.readWhere(tgt, "t", 2L,
      col("t") >= lit(ts("2024-05-01 00:00:00"))).count() == 2L)
    assert(VersionedTable.readWhere(tgt, "t", 2L,
      col("d") < lit(dt("2024-02-01"))).count() == 2L)
  }
}
