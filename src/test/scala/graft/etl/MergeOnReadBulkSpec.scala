package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bulk-scale merge-on-read contracts (round-14 hardening):
  *
  *   - DML positions travel as EXECUTOR-written fragment sidecars; the
  *     task commit messages carry only (file → fragment path) pointers —
  *     never the position arrays — so a bulk DELETE is O(files) through
  *     the driver's commit hop;
  *   - the `dv_max_fraction` fallback: a statement that deletes most of
  *     a file's rows (≥ fraction AND ≥ the absolute floor) REWRITES that
  *     file copy-on-write instead of growing its DV — a DV can never
  *     balloon toward the file's own size;
  *   - the LIBRARY path ([[VersionedTable.delete]]/[[deleteKeys]]) on a
  *     `write.mode = merge-on-read` table commits DVs exactly like SQL
  *     DELETE on the catalog surface: untouched files carried verbatim.
  */
class MergeOnReadBulkSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gmor")
  spark.conf.set("spark.sql.catalog.gmor", classOf[graft.sources.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmor.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  private def morProps = Map(VersionedTable.WriteModeProp -> VersionedTable.MergeOnRead)

  test("bulk DELETE above dv_max_fraction rewrites the files copy-on-write") {
    spark.sql("CREATE TABLE gmor.default.bulk (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gmor.default.bulk " +
      "SELECT id, id * 10 FROM range(0, 12000)")
    val v2Files = VersionedTable.files(lib, "bulk", 2L).toSet
    assert(v2Files.nonEmpty)
    // 60% of EVERY file (k % 10 < 6 is uniform across any row layout):
    // per-file merged DV ≥ floor (1024) and ≥ 0.5 × rows → CoW fallback
    spark.sql("DELETE FROM gmor.default.bulk WHERE k % 10 < 6")
    val v3Files = VersionedTable.files(lib, "bulk", 3L).toSet
    assert(VersionedTable.deletionVectors(lib, "bulk", 3L).isEmpty,
      "a bulk delete must not commit DVs — the fraction fallback rewrites")
    val carried = v3Files intersect v2Files
    if (carried.nonEmpty) {
      // only the row-less v1 schema file may carry through a bulk rewrite
      assert(spark.read.parquet(carried.toSeq: _*).count() == 0L,
        s"heavily-deleted files must be replaced, not carried: $carried")
    }
    val got = spark.sql("SELECT count(*), sum(v) FROM gmor.default.bulk")
      .as[(Long, Long)].head()
    val live = (0 until 12000).filter(_ % 10 >= 6)
    assert(got == ((live.size.toLong, live.map(_ * 10L).sum)),
      s"rewritten table must hold exactly the live rows: $got")
    // time travel: the pre-delete version is untouched
    assert(spark.sql(
      "SELECT count(*) FROM gmor.default.bulk VERSION AS OF 2")
      .as[Long].head() == 12000L)
  }

  test("a small scattered DELETE stays a DV (below the rewrite floor)") {
    spark.sql("CREATE TABLE gmor.default.sm (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gmor.default.sm SELECT id, id FROM range(0, 12000)")
    val pre = VersionedTable.files(lib, "sm", 2L).toSet
    spark.sql("DELETE FROM gmor.default.sm WHERE k % 100 = 7") // 1% per file
    assert(VersionedTable.files(lib, "sm", 3L).toSet == pre,
      "a scattered 1% delete must carry every data file verbatim")
    val dvs = VersionedTable.deletionVectors(lib, "sm", 3L)
    assert(dvs.nonEmpty && dvs.values.map(_._2).sum == 120L,
      s"the 120 deleted positions must land in DVs: $dvs")
    assert(spark.sql("SELECT count(*) FROM gmor.default.sm")
      .as[Long].head() == 11880L)
  }

  test("library-path delete on a merge-on-read table commits a DV, files verbatim") {
    VersionedTable.load(lib, "libm",
      spark.range(0, 500).select($"id".as("k"), ($"id" * 2).as("v")),
      extraProps = morProps)
    VersionedTable.load(lib, "libm",
      spark.range(500, 1000).select($"id".as("k"), ($"id" * 2).as("v")))
    val pre = VersionedTable.files(lib, "libm", 2L).toSet
    val v = VersionedTable.delete(lib, "libm", col("k") === 123L || col("k") === 777L)
    assert(v == 3L)
    assert(VersionedTable.files(lib, "libm", 3L).toSet == pre,
      "the library MOR delete must not rewrite or add a single data file")
    val dvs = VersionedTable.deletionVectors(lib, "libm", 3L)
    assert(dvs.size == 2 && dvs.values.map(_._2).sum == 2L,
      s"one position in each touched file's DV: $dvs")
    assert(VersionedTable.read(lib, "libm").count() == 998L)
    assert(VersionedTable.read(lib, "libm")
      .where(col("k").isin(123L, 777L)).count() == 0L)
    // time travel + a second delete MERGES into a new sidecar
    assert(VersionedTable.readVersion(lib, "libm", 2L).count() == 1000L)
    VersionedTable.delete(lib, "libm", col("k") === 124L)
    val dvs2 = VersionedTable.deletionVectors(lib, "libm", 4L)
    assert(dvs2.values.map(_._2).sum == 3L, s"merged positions: $dvs2")
    // a delete matching NOTHING commits a metadata-only version
    val v5 = VersionedTable.delete(lib, "libm", col("k") === -1L)
    assert(v5 == 5L)
    assert(VersionedTable.files(lib, "libm", 5L).toSet == pre)
    assert(VersionedTable.read(lib, "libm").count() == 997L)
  }

  test("library-path deleteKeys on a merge-on-read table commits a DV") {
    VersionedTable.load(lib, "libk",
      spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("v")),
      extraProps = morProps)
    val pre = VersionedTable.files(lib, "libk", 1L).toSet
    val victims = Seq(3L, 99L, 512L).toDF("k")
    val v = VersionedTable.deleteKeys(lib, "libk", victims, Seq("k"))
    assert(v == 2L)
    assert(VersionedTable.files(lib, "libk", 2L).toSet == pre,
      "deleteKeys on MOR must carry every data file verbatim")
    assert(VersionedTable.deletionVectors(lib, "libk", 2L)
      .values.map(_._2).sum == 3L)
    assert(VersionedTable.read(lib, "libk").count() == 997L)
    assert(VersionedTable.read(lib, "libk")
      .where(col("k").isin(3L, 99L, 512L)).count() == 0L)
    // library CHANGE FEED sees the three deletes
    val feed = VersionedTable.changes(lib, "libk", 1L, 2L, Seq("k"))
      .select("op", "k").as[(String, Long)].collect().toSet
    assert(feed == Set(("delete", 3L), ("delete", 99L), ("delete", 512L)),
      s"the DV delete must surface in the change feed: $feed")
  }

  test("a keyed upsert on a merge-on-read table commits DVs + merged rows, files verbatim") {
    VersionedTable.load(lib, "ups",
      spark.range(0, 1000).select($"id".as("k"), ($"id" * 10).as("v"),
        concat(lit("s"), $"id").as("s")),
      idOrder = Seq("k"), extraProps = morProps)
    VersionedTable.load(lib, "ups",
      spark.range(1000, 2000).select($"id".as("k"), ($"id" * 10).as("v"),
        concat(lit("s"), $"id").as("s")), idOrder = Seq("k"))
    val pre = VersionedTable.files(lib, "ups", 2L).toSet
    // CoW twin for semantics comparison (same history, copy-on-write)
    VersionedTable.load(lib, "upsCow",
      spark.range(0, 1000).select($"id".as("k"), ($"id" * 10).as("v"),
        concat(lit("s"), $"id").as("s")), idOrder = Seq("k"))
    VersionedTable.load(lib, "upsCow",
      spark.range(1000, 2000).select($"id".as("k"), ($"id" * 10).as("v"),
        concat(lit("s"), $"id").as("s")), idOrder = Seq("k"))
    // update 3 scattered keys (one dup — last wins), insert 2 fresh
    val batch = Seq(
      (7L, -7L, "U7a"), (7L, -77L, "U7"), (512L, -512L, "U512"),
      (1999L, -1999L, "U1999"), (5000L, 50L, "N5000"), (5001L, 51L, "N5001"))
      .toDF("k", "v", "s")
    VersionedTable.load(lib, "ups", batch, upsertFields = Seq("k"),
      idOrder = Seq("k"))
    VersionedTable.load(lib, "upsCow", batch, upsertFields = Seq("k"),
      idOrder = Seq("k"))
    // files verbatim + DVs recorded for the matched rows
    assert(pre.subsetOf(VersionedTable.files(lib, "ups", 3L).toSet),
      "the MOR upsert must carry every pre-existing data file verbatim")
    val dvs = VersionedTable.deletionVectors(lib, "ups", 3L)
    assert(dvs.values.map(_._2).sum == 3L,
      s"three matched rows' old versions must be DV'd: $dvs")
    // bit-identical semantics vs the copy-on-write upsert — INCLUDING ids
    // (matched rows keep theirs, fresh rows continue above the floor)
    val got = VersionedTable.read(lib, "ups")
      .select("id", "k", "v", "s").orderBy("k")
      .as[(Long, Long, Long, String)].collect().toSeq
    val want = VersionedTable.read(lib, "upsCow")
      .select("id", "k", "v", "s").orderBy("k")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == want,
      s"MOR upsert must equal the CoW upsert bit-for-bit (ids included)")
    // time travel reads the pre-upsert state; the change feed carries
    // exactly the updates + inserts
    assert(VersionedTable.readVersion(lib, "ups", 2L).count() == 2000L)
    val feed = VersionedTable.changes(lib, "ups", 2L, 3L, Seq("k"))
      .select("op", "k").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(feed == Map(
      "update" -> Set(7L, 512L, 1999L), "insert" -> Set(5000L, 5001L)),
      s"the MOR upsert's change feed: $feed")
    // a second upsert touching an already-DV'd file merges positions
    VersionedTable.load(lib, "ups", Seq((8L, -8L, "U8")).toDF("k", "v", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    assert(VersionedTable.files(lib, "ups", 3L).toSet
      .subsetOf(VersionedTable.files(lib, "ups", 4L).toSet))
    assert(VersionedTable.read(lib, "ups").where($"k" === 8L)
      .select("s").as[String].head() == "U8")
  }

  test("a bucketed merge-on-read upsert DVs in place of the bucket rewrite") {
    VersionedTable.load(lib, "upsb",
      spark.range(0, 2000).select($"id".as("k"), ($"id" % 7).as("v")),
      idOrder = Seq("k"), bucketBy = Some((Seq("k"), 4)),
      extraProps = morProps)
    val pre = VersionedTable.files(lib, "upsb", 1L).toSet
    VersionedTable.load(lib, "upsb",
      Seq((13L, -1L), (9999L, -2L)).toDF("k", "v"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    assert(pre.subsetOf(VersionedTable.files(lib, "upsb", 2L).toSet),
      "bucketed MOR upsert must not rewrite even the touched bucket")
    assert(VersionedTable.deletionVectors(lib, "upsb", 2L)
      .values.map(_._2).sum == 1L)
    val got = VersionedTable.read(lib, "upsb").where($"v" < 0)
      .select("k", "v").orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == Seq((13L, -1L), (9999L, -2L)), s"got $got")
    assert(VersionedTable.read(lib, "upsb").count() == 2001L)
    // bucket-pruned lookup still works over the DV'd bucketed layout
    assert(VersionedTable.lookup(lib, "upsb", 2L, Map("k" -> 13L)).count() == 1L)
  }

  test("a MOR delete that empties the table never resurrects rows (TRUNCATE shape)") {
    // review-found regression: the keep-one-schema-file fallback used to
    // re-mount a fully-deleted file BARE (Gone files carry no committed
    // DV) — the delete "succeeded" while every row survived
    VersionedTable.load(lib, "trunc",
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"),
      idOrder = Seq("k"), extraProps = morProps)
    val v = VersionedTable.delete(lib, "trunc", col("k") >= 0L)
    assert(v == 2L)
    assert(VersionedTable.read(lib, "trunc").count() == 0L,
      "a full-coverage MOR delete must leave ZERO rows at the head")
    assert(VersionedTable.read(lib, "trunc").columns.toSeq.nonEmpty,
      "the empty head must still read its schema")
    assert(VersionedTable.readVersion(lib, "trunc", 1L).count() == 3L,
      "the pre-delete version still time-travels")
    // deleteKeys emptying the table behaves the same
    VersionedTable.load(lib, "trunck",
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      idOrder = Seq("k"), extraProps = morProps)
    VersionedTable.deleteKeys(lib, "trunck", Seq(1L, 2L).toDF("k"), Seq("k"))
    assert(VersionedTable.read(lib, "trunck").count() == 0L,
      "deleteKeys emptying a MOR table must leave zero rows")
    // and the table stays WRITABLE after the truncate
    VersionedTable.load(lib, "trunc", Seq((9L, 90L)).toDF("k", "v"))
    assert(VersionedTable.read(lib, "trunc").select("k", "v")
      .as[(Long, Long)].collect().toSeq == Seq((9L, 90L)))
  }

  test("a full-overlap MOR upsert replaces every row without duplication") {
    // review-found regression twin: incoming matches EVERY live row (the
    // dimension-refresh shape) — the old fallback kept an old data file
    // verbatim alongside the merged rows, duplicating every key
    VersionedTable.load(lib, "full",
      spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("v")),
      idOrder = Seq("k"), extraProps = morProps)
    VersionedTable.load(lib, "full",
      spark.range(0, 100).select($"id".as("k"), ($"id" * 100).as("v")),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    val got = VersionedTable.read(lib, "full").select("k", "v")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == (0L until 100L).map(k => (k, k * 100L)),
      s"every key exactly once with the incoming value: ${got.take(6)}...")
    // matched rows keep their ids (the upsertMerged contract)
    val ids = VersionedTable.read(lib, "full").select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == (1L to 100L), s"ids preserved, no re-issue: ${ids.take(6)}")
  }

  test("a zone-covered file drops metadata-only through the library MOR delete") {
    VersionedTable.load(lib, "libz",
      spark.range(0, 100).select($"id".as("k")), extraProps = morProps,
      idOrder = Seq("k"))
    VersionedTable.load(lib, "libz",
      spark.range(100, 200).select($"id".as("k")))
    val preFiles = VersionedTable.files(lib, "libz", 2L)
    VersionedTable.delete(lib, "libz", col("k") < 100L)
    val post = VersionedTable.files(lib, "libz", 3L).toSet
    assert(post.subsetOf(preFiles.toSet) && post.size < preFiles.size,
      "fully-covered files must drop without a rewrite")
    assert(VersionedTable.deletionVectors(lib, "libz", 3L).isEmpty,
      "a whole-file drop needs no DV")
    assert(VersionedTable.read(lib, "libz").count() == 100L)
  }
}
