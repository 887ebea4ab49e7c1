package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ports of the reference's pytest suite
  * (/root/reference/tests/test_etl_process.py, intent per SURVEY.md §5 —
  * the committed suite has Python-3 bugs; assertions here encode the
  * documented semantics). Fixtures are seeded/deterministic versions of
  * conftest.py:8-30's 3-row `mytable`.
  */
class EtlProcessSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  /** Build a src catalog holding `mytable` (+extras), and an empty tgt. */
  def fixture(extra: Map[String, DataFrame] = Map.empty): (Catalog, Catalog) = {
    val srcDir = tmpDir("graft-src")
    val tgtDir = tmpDir("graft-tgt")
    val mytable = spark.createDataFrame(
      Seq(("Joe", 23, "Smith"), ("Mary", 61, "Jones"), ("Tom", 5, "Baker"))
    ).toDF("name", "age", "last_name")
    mytable.write.parquet(s"$srcDir/mytable")
    extra.foreach { case (n, df) => df.write.parquet(s"$srcDir/$n") }
    (new Catalog(spark, srcDir), new Catalog(spark, tgtDir))
  }

  def proc(src: Catalog, tgt: Catalog, table: String = "target_table"): EtlProcess = {
    val p = new EtlProcess(src, tgt, table)
    p.idOrder = Seq("name") // deterministic ids in tests
    p
  }

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.get))

  // test_etl (test_etl_process.py:7-16): extract one column → [id, name]
  test("extract string SQL → target gets id + selected columns") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable")
    p.load()
    val out = p.result()
    assert(out.columns.toSet == Set("id", "name"))
    assert(out.count() == 3)
    assert(out.orderBy("id").select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "Joe"), (2L, "Mary"), (3L, "Tom")))
  }

  // E2: .sql file extract (tests/test.sql)
  test("extract from .sql file") {
    val (src, tgt) = fixture()
    val sqlFile = java.nio.file.Files.createTempFile("extract", ".sql")
    java.nio.file.Files.writeString(sqlFile, "SELECT name FROM mytable;\n".stripSuffix(";\n") )
    val p = proc(src, tgt)
    p.extract(sqlFile.toString)
    p.load()
    assert(p.result().count() == 3)
    assert(p.result().columns.toSet == Set("id", "name"))
  }

  // test_extract_override (:19-29)
  test("extract_override replaces extraction") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.idOrder = Seq("test")
    p.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1("value"), Tuple1("value"), Tuple1("value"))).toDF("test"))
    p.load()
    assert(p.result().columns.toSet == Set("id", "test"))
    assert(p.result().count() == 3)
  }

  // test_middleware (:32-45): added key becomes a column
  test("middleware adds a column") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable")
    p.middleware(df => df.withColumn("extra", lit(true)))
    p.load()
    assert(p.result().columns.toSet == Set("id", "name", "extra"))
    assert(p.result().where(col("extra") === true).count() == 3)
  }

  // test_transform upper (:48-57) and chaining upper→lower (:60-69)
  test("transform upper and chained upper→lower") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, last_name FROM mytable")
    p.transform("name").upper()
    p.load()
    assert(p.result().select("name").collect().map(_.getString(0)).toSet
      == Set("JOE", "MARY", "TOM"))

    val p2 = proc(src, tgt, "t2")
    p2.extract("SELECT name FROM mytable")
    p2.transform("name").upper().lower()
    p2.load()
    assert(p2.result().select("name").collect().map(_.getString(0)).toSet
      == Set("joe", "mary", "tom"))
  }

  // transform retention: later transform() calls retain earlier fields' chains
  test("transform chains accumulate across transform() calls (verified reference behavior)") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, last_name FROM mytable")
    p.transform("name").upper()
    p.transform("last_name").lower() // must NOT clear the chain on name
    p.load()
    val out = p.result().orderBy("id").collect()
    assert(out.map(_.getAs[String]("name")).toSet == Set("JOE", "MARY", "TOM"))
    assert(out.map(_.getAs[String]("last_name")).toSet == Set("smith", "jones", "baker"))
  }

  test("transform replace is literal, not regex") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1("a.b c"))).toDF("name"))
    p.transform("name").replace(".", "-").replace(" ", "_")
    p.load()
    assert(p.result().select("name").head().getString(0) == "a-b_c")
  }

  test("transform str-method surface: ljust/rjust/swapcase/affixes/predicates") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.idOrder = Seq("name")
    p.extractOverride(() => spark.createDataFrame(
      Seq(("Ab#xy", "pre_valUE", "LONGERTHAN6"))).toDF("name", "v", "w"))
    p.transform("name").removeprefix("Ab#").rjust(5, "0")
    p.transform("v").removeprefix("pre_").swapcase()
    p.transform("w").ljust(6, "*") // longer than width: must NOT truncate
    p.load()
    val r = p.result().head()
    assert(r.getAs[String]("name") == "000xy")
    assert(r.getAs[String]("v") == "VALue")
    assert(r.getAs[String]("w") == "LONGERTHAN6")

    val q = proc(src, tgt, "t2")
    q.idOrder = Seq("name")
    q.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1("hello.txt"), Tuple1("other.md"))).toDF("name"))
    q.transform("name").endswith(".txt")
    q.load()
    // idOrder sorts the POST-transform value (a boolean): false < true
    assert(q.result().orderBy("id").collect().map(_.getAs[Boolean]("name")).toSeq
      == Seq(false, true))
  }

  // T2: default replaces FALSY values (null, "", 0), not just null
  test("default replaces falsy values per type") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.idOrder = Seq("k")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, null, 0L), Row(2L, "", 5L), Row(3L, "x", 0L)),
      StructType(Seq(StructField("k", LongType), StructField("s", StringType),
        StructField("n", LongType))))
    p.extractOverride(() => df)
    p.transform("s").default("unknown")
    p.transform("n").default(-1L)
    p.load()
    val out = p.result().orderBy("k").collect()
    assert(out.map(_.getAs[String]("s")).toSeq == Seq("unknown", "unknown", "x"))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(-1L, 5L, -1L))
  }

  // T3: func scalar UDF
  test("func applies a scalar UDF") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable")
    p.transform("name").func(udf((s: String) => s.reverse))
    p.load()
    assert(p.result().select("name").collect().map(_.getString(0)).toSet
      == Set("eoJ", "yraM", "moT"))
  }

  // test_ignore (:72-79)
  test("ignore drops fields before load") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, last_name FROM mytable")
    p.ignore("last_name")
    p.load()
    assert(p.result().columns.toSet == Set("id", "name"))
  }

  // test_drop_columns / safe (:82-94)
  test("schema narrowing by default; safe=true keeps stale columns") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, last_name FROM mytable"); p.load()
    assert(p.result().columns.toSet == Set("id", "name", "last_name"))

    p.extract("SELECT name FROM mytable"); p.load()
    assert(p.result().columns.toSet == Set("id", "name"))

    val (src2, tgt2) = fixture()
    val q = proc(src2, tgt2)
    q.extract("SELECT name, last_name FROM mytable"); q.load()
    q.extract("SELECT name FROM mytable"); q.load(safe = true)
    val out = q.result()
    assert(out.columns.toSet == Set("id", "name", "last_name"))
    // rows from the second load read null for the stale column
    assert(out.where(col("last_name").isNull).count() == 3)
  }

  // test_load_twice (:97-103): append semantics, ids continue
  test("append load: ids continue across loads") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable"); p.load()
    p.extract("SELECT name FROM mytable"); p.load()
    val out = p.result()
    assert(out.count() == 6)
    assert(out.agg(max("id")).head().getLong(0) == 6L)
    assert(out.agg(countDistinct("id")).head().getLong(0) == 6L)
  }

  // test_load_upsert (:106-117): same keys → update, count unchanged, ids kept
  test("upsert updates matching keys, keeps ids, inserts fresh keys") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, age FROM mytable"); p.load()
    val idsBefore = p.result().select("name", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    p.extract("SELECT name, age + 100 AS age FROM mytable")
    p.load(upsertFields = Seq("name"))
    val out = p.result()
    assert(out.count() == 3)
    assert(out.select("age").collect().map(_.getAs[Int]("age")).forall(_ > 100))
    val idsAfter = out.select("name", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idsAfter == idsBefore)

    // fresh key inserts with a new id
    p.extractOverride(() => spark.createDataFrame(Seq(("Zed", 1))).toDF("name", "age"))
    p.load(upsertFields = Seq("name"))
    assert(p.result().count() == 4)
    assert(p.result().where(col("name") === "Zed").head().getAs[Long]("id") == 4L)
  }

  // test_link (:120-140, corrected arity per SURVEY §5): exact FK lookup
  test("link: exact dimension lookup with miss → null") {
    val (src, tgt) = fixture()
    // dimension in the TARGET db: i = 5,6,7 → ids 1,2,3
    val dimP = proc(src, tgt, "dimension")
    dimP.idOrder = Seq("i")
    dimP.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1(5), Tuple1(6), Tuple1(7))).toDF("i"))
    dimP.load()

    // facts: i = 5,6,8 (8 misses)
    val p = proc(src, tgt, "facts")
    p.idOrder = Seq("i")
    p.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1(5), Tuple1(6), Tuple1(8))).toDF("i"))
    p.link("dim_id", target = "i", tableName = "dimension", childField = "i")
    p.load()
    val out = p.result().orderBy("i").collect()
    assert(out.map(r => Option(r.getAs[Any]("dim_id"))).toSeq
      == Seq(Some(1L), Some(2L), None))
  }

  // link name default: output column defaults to `field` (documented intent)
  test("link: name defaults to field name") {
    val (src, tgt) = fixture()
    val dimP = proc(src, tgt, "dim2")
    dimP.idOrder = Seq("i")
    dimP.extractOverride(() => spark.createDataFrame(Seq(Tuple1(1))).toDF("i"))
    dimP.load()
    val p = proc(src, tgt, "facts2")
    p.idOrder = Seq("i")
    p.extractOverride(() => spark.createDataFrame(Seq(Tuple1(1))).toDF("i"))
    p.link("my_link", target = "i", tableName = "dim2", childField = "i")
    p.load()
    assert(p.result().columns.contains("my_link"))
  }

  // test_link_closest (:143-164): >= takes smallest dim value >= fact value
  test("linkClosest >= and <= directions") {
    val (src, tgt) = fixture()
    // dim values 10, 20, 30 → ids 1, 2, 3
    val dimP = proc(src, tgt, "datedim")
    dimP.idOrder = Seq("d")
    dimP.extractOverride(() => spark.createDataFrame(
      Seq(Tuple1(10L), Tuple1(20L), Tuple1(30L))).toDF("d"))
    dimP.load()

    val facts = Seq(5L, 10L, 15L, 31L)
    val p = proc(src, tgt, "f_ge")
    p.idOrder = Seq("v")
    p.extractOverride(() => spark.createDataFrame(facts.map(Tuple1(_))).toDF("v"))
    p.linkClosest("dd", target = "v", tableName = "datedim", childField = "d", method = ">=")
    p.load()
    val ge = p.result().orderBy("v").collect().map(r => Option(r.getAs[Any]("dd"))).toSeq
    // 5→10(id1), 10→10(id1), 15→20(id2), 31→none
    assert(ge == Seq(Some(1L), Some(1L), Some(2L), None))

    val q = proc(src, tgt, "f_le")
    q.idOrder = Seq("v")
    q.extractOverride(() => spark.createDataFrame(facts.map(Tuple1(_))).toDF("v"))
    q.linkClosest("dd", target = "v", tableName = "datedim", childField = "d", method = "<=")
    q.load()
    val le = q.result().orderBy("v").collect().map(r => Option(r.getAs[Any]("dd"))).toSeq
    // 5→none, 10→10(id1), 15→10(id1), 31→30(id3)
    assert(le == Seq(None, Some(1L), Some(1L), Some(3L)))
  }

  // test_types (:167-173): extract-time casts
  test("types cast at extract") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, age FROM mytable", types = Map("age" -> DoubleType))
    p.load()
    assert(p.result().schema("age").dataType == DoubleType)
  }

  // E4: incremental extract via {} watermark
  test("incremental extract: {} substituted with target max(pk)") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt, "inc")
    p.idOrder = Seq("age")
    p.extract("SELECT name, age FROM mytable WHERE age <= 23")
    p.load()
    assert(p.result().count() == 2) // ages 5, 23

    p.extract("SELECT name, age FROM mytable WHERE age > {}", writePkField = Some("age"))
    p.load()
    assert(p.result().count() == 3) // + age 61
    // re-run: nothing new
    p.extract("SELECT name, age FROM mytable WHERE age > {}", writePkField = Some("age"))
    p.load()
    assert(p.result().count() == 3)
  }

  // VERDICT r4 #7: transform tail — values verified against CPython
  test("transform tail: expandtabs/format/partition match CPython") {
    def one(input: String)(build: TransformPipeline => Unit): Row = {
      val df = spark.createDataFrame(Seq(Tuple1(input))).toDF("v")
      val tp = new TransformPipeline
      build(tp.on(Seq("v")))
      tp(df).head()
    }
    // expandtabs: column advances to the next tabsize multiple; \n and \r
    // reset the counter (expected strings are CPython outputs)
    assert(one("a\tbc\td")(_.expandtabs(8)).getString(0) == "a       bc      d")
    assert(one("ab\nc\td")(_.expandtabs(4)).getString(0) == "ab\nc   d")
    assert(one("xy\r12345\t!")(_.expandtabs(4)).getString(0) == "xy\r12345   !")
    assert(one("\t")(_.expandtabs(8)).getString(0) == "        ")
    assert(one("abcdefgh\ti")(_.expandtabs(8)).getString(0) == "abcdefgh        i")
    // format: value is the template; surplus args ignored, missing raise
    assert(one("v={} w={}")(_.format(3, "q")).getString(0) == "v=3 w=q")
    assert(one("v={}")(_.format(3, "extra")).getString(0) == "v=3")
    assertThrows[Exception](one("v={} {}")(_.format(3)))
    // argument VALUES containing braces must not be re-scanned as
    // placeholders (CPython: split-once semantics)
    assert(one("id={}")(_.format("{}")).getString(0) == "id={}")
    assert(one("a{}b{}")(_.format("{}", "x")).getString(0) == "a{}bx")
    assert(one("plain")(_.format()).getString(0) == "plain")
    // partition / rpartition incl. the absent-separator tuples
    assert(one("MEDIUM POLISHED")(_.partition("ED")).getSeq[String](0)
      == Seq("M", "ED", "IUM POLISHED"))
    assert(one("MEDIUM POLISHED")(_.rpartition("ED")).getSeq[String](0)
      == Seq("MEDIUM POLISH", "ED", ""))
    assert(one("nope")(_.partition("ED")).getSeq[String](0) == Seq("nope", "", ""))
    assert(one("nope")(_.rpartition("ED")).getSeq[String](0) == Seq("", "", "nope"))
  }

  // VERDICT r4 #2: the watermark must carry ANY pk type (the reference
  // substitutes whatever MAX(pk) returns via str.format), not just longs
  test("incremental extract: string and timestamp watermarks") {
    val events = spark.createDataFrame(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123456"), "a'b"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 11:30:00.654321"), "mid"),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 09:15:00.000001"), "zed")
    )).toDF("k", "ts", "name")
    val (src, tgt) = fixture(Map("ev" -> events))

    // timestamp watermark: micro-precision literal must round-trip exactly
    val p = proc(src, tgt, "inc_ts")
    p.idOrder = Seq("k")
    p.extract("SELECT k, ts FROM ev WHERE ts <= TIMESTAMP '2024-01-02 12:00:00'")
    p.load()
    assert(p.result().count() == 2)
    p.extract("SELECT k, ts FROM ev WHERE ts > {}", writePkField = Some("ts"))
    p.load()
    assert(p.result().count() == 3)
    p.extract("SELECT k, ts FROM ev WHERE ts > {}", writePkField = Some("ts"))
    p.load()
    assert(p.result().count() == 3) // re-run: micro digits survived the round trip

    // string watermark, including embedded quote escaping
    val q = proc(src, tgt, "inc_str")
    q.idOrder = Seq("k")
    q.extract("SELECT k, name FROM ev WHERE name <= 'a~'") // just "a'b"
    q.load()
    assert(q.result().count() == 1)
    q.extract("SELECT k, name FROM ev WHERE name > {}", writePkField = Some("name"))
    q.load()
    assert(q.result().count() == 3)
  }

  // ADVICE r1 (medium): upsert + safe=true must RETAIN existing column
  // values on matched rows — only the supplied (incoming) fields update.
  test("upsert with safe=true keeps existing columns not in the incoming set") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name, age, last_name FROM mytable"); p.load()

    // narrower incoming: only name + age; last_name must survive on matches
    p.extract("SELECT name, age + 100 AS age FROM mytable WHERE name <> 'Tom'")
    p.load(upsertFields = Seq("name"), safe = true)
    val out = p.result().orderBy("id").collect()
    assert(out.length == 3)
    val byName = out.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("Joe").getAs[String]("last_name") == "Smith")   // retained
    assert(byName("Mary").getAs[String]("last_name") == "Jones")  // retained
    assert(byName("Joe").getAs[Int]("age") == 123)                // updated
    assert(byName("Tom").getAs[Int]("age") == 5)                  // untouched
  }

  // ADVICE r1: duplicate upsert keys in incoming must collapse to one row
  // per key (last under the deterministic order), not multiply rows.
  test("upsert collapses duplicate incoming keys to one row per key") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.idOrder = Seq("name", "age")
    p.extractOverride(() => spark.createDataFrame(
      Seq(("A", 1), ("B", 2))).toDF("name", "age"))
    p.load()
    // incoming has key A twice: ages 10 then 20 — last (20) must win
    p.idOrder = Seq("name", "age")
    p.extractOverride(() => spark.createDataFrame(
      Seq(("A", 10), ("A", 20), ("C", 3))).toDF("name", "age"))
    p.load(upsertFields = Seq("name"))
    val out = p.result().orderBy("name").collect()
    assert(out.map(r => (r.getAs[String]("name"), r.getAs[Int]("age"))).toSeq
      == Seq(("A", 20), ("B", 2), ("C", 3)))
    // no duplicate ids
    assert(p.result().agg(countDistinct("id")).head().getLong(0) == 3L)
  }

  // ADVICE r1 + review: a stranded .__old dir (crash between rename-aside
  // and rename-in) is SERVED read-only to readers, and physically recovered
  // on the next write — readers never mutate (they could race a live
  // writer's swap window).
  test("stranded .__old table: readers serve it, the write path recovers it") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable"); p.load()
    // simulate a crash window: table renamed aside, new dir never arrived
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val tablePath = new org.apache.hadoop.fs.Path(tgt.dirPath("target_table"))
    val aside = new org.apache.hadoop.fs.Path(tgt.dirPath("target_table") + ".__old-deadbeef")
    assert(fs.rename(tablePath, aside))
    // read path: serves the stranded snapshot WITHOUT renaming
    assert(tgt.table("target_table").count() == 3)
    assert(!fs.exists(tablePath) && fs.exists(aside))
    assert(tgt.tableNames().contains("target_table")) // still discoverable
    // write path: next load recovers (rename back) and appends on top
    p.extract("SELECT name FROM mytable"); p.load()
    assert(fs.exists(tablePath) && !fs.exists(aside))
    assert(p.result().count() == 6)
  }

  // S3: ensure=false — new incoming columns do NOT widen the target
  // (dataset insert without ensure ignores unknown keys)
  test("load with ensure=false drops incoming-only columns") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable"); p.load()
    p.extract("SELECT name, age FROM mytable"); p.load(ensure = false)
    assert(p.result().columns.toSet == Set("id", "name"))
    assert(p.result().count() == 6)
  }

  // Scale: same-schema appends must ADD files, not rewrite the table
  test("append with unchanged schema keeps existing files (no table rewrite)") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt)
    p.extract("SELECT name FROM mytable"); p.load()
    def partFiles = new java.io.File(tgt.dirPath("target_table"))
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val before = partFiles
    p.extract("SELECT name FROM mytable"); p.load()
    val after = partFiles
    assert(before.subsetOf(after), "append rewrote existing files")
    assert(after.size > before.size, "append added no files")
    assert(p.result().count() == 6)
    assert(p.result().agg(countDistinct("id")).head().getLong(0) == 6L)
  }

  test("empty extract result skips the write (reference `if rows:`)") {
    val (src, tgt) = fixture()
    val p = proc(src, tgt, "empty")
    p.extract("SELECT name FROM mytable WHERE 1 = 0")
    p.load()
    assert(!tgt.exists("empty"))
  }
}
