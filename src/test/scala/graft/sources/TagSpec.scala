package graft.sources

import graft.SparkSpec
import graft.etl.{Catalog, VersionedTable}

/** NAMED REFS (tags): immutable name → version pointers (Iceberg's
  * `create_tag` shape). `VERSION AS OF 'name'` resolves tags on both
  * the SQL and reader-option surfaces; tags pin vacuum/expire retention
  * until dropped; creation is create-exclusive (immutable refs). */
class TagSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = tmpDir("gtag")
  spark.conf.set("spark.sql.catalog.gtag",
    classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtag.dir", warehouse)
  private val lib = new Catalog(spark, warehouse)

  test("create/read/list/drop: tags resolve on every surface") {
    spark.sql("CREATE TABLE gtag.default.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gtag.default.t VALUES (1, 'a'), (2, 'b')") // v2
    spark.sql("CALL gtag.system.create_tag('t', 'first_load', 2)")
    spark.sql("INSERT INTO gtag.default.t VALUES (3, 'c')")           // v3

    // SQL time travel by tag name
    assert(spark.sql(
      "SELECT count(*) FROM gtag.default.t VERSION AS OF 'first_load'")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM gtag.default.t")
      .head().getLong(0) == 3L)
    // numeric VERSION AS OF keeps working unchanged
    assert(spark.sql("SELECT count(*) FROM gtag.default.t VERSION AS OF 2")
      .head().getLong(0) == 2L)
    // reader-option surface resolves the same ref
    assert(spark.read.format("graft")
      .option("dir", warehouse).option("table", "t")
      .option("versionAsOf", "first_load").load().count() == 2L)

    // listing reports (name, version, created_at)
    val tags = spark.sql("CALL gtag.system.tags('t')").collect()
    assert(tags.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("first_load", 2L)))
    assert(tags.head.getLong(2) > 0L)

    // drop releases the name; reads by it refuse afterwards
    assert(spark.sql("CALL gtag.system.drop_tag('t', 'first_load')")
      .head().getBoolean(0))
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM gtag.default.t VERSION AS OF 'first_load'").collect())
    assert(e.getMessage.contains("no tag"))
    // if_exists tolerates the absence; the bare form refuses
    assert(!spark.sql("CALL gtag.system.drop_tag('t', 'first_load', true)")
      .head().getBoolean(0))
    intercept[Exception](spark.sql(
      "CALL gtag.system.drop_tag('t', 'first_load')").collect())
  }

  test("refusals: immutable refs, digit-led names, unknown versions") {
    spark.sql("CREATE TABLE gtag.default.r (k BIGINT)")
    spark.sql("INSERT INTO gtag.default.r VALUES (1)") // v2
    VersionedTable.createTag(lib, "r", "stable", 2L)
    // immutable: re-creating the same name refuses (drop + create to move)
    val dup = intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "r", "stable", 1L))
    assert(dup.getMessage.contains("already exists"))
    // digit-led names would be ambiguous with version numbers
    intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "r", "123", 2L))
    intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "r", "1release", 2L))
    // tagging a version that does not exist refuses
    intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "r", "future", 99L))
  }

  test("a damaged tag file never bricks listings or vacuum") {
    VersionedTable.load(lib, "tt", Seq((1L, "a")).toDF("k", "v"))
    VersionedTable.load(lib, "tt", Seq((2L, "b")).toDF("k", "v"))
    VersionedTable.createTag(lib, "tt", "good", 2L)
    // simulate a torn pre-atomic-write tag (manual surgery class)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$warehouse/tt.__vmeta/tag-torn.json"),
      "{not json".getBytes)
    // listings skip it, the good tag survives
    assert(VersionedTable.tags(lib, "tt").map(_._1) == Seq("good"))
    // resolution by the torn name reads as missing
    assert(VersionedTable.tagVersion(lib, "tt", "torn").isEmpty)
    // vacuum still runs (and still honors the good tag's pin)
    VersionedTable.vacuum(lib, "tt", keepLast = 1)
    assert(VersionedTable.versions(lib, "tt") == Seq(2L))
    // drop_tag repairs the name
    assert(VersionedTable.dropTag(lib, "tt", "torn"))
    VersionedTable.createTag(lib, "tt", "torn", 2L)
    assert(VersionedTable.tagVersion(lib, "tt", "torn").contains(2L))
  }

  test("tags pin vacuum retention; dropping the tag releases it") {
    VersionedTable.load(lib, "vt", Seq((1L, "a")).toDF("k", "v"))   // v1
    VersionedTable.load(lib, "vt", Seq((2L, "b")).toDF("k", "v"))   // v2
    VersionedTable.load(lib, "vt", Seq((3L, "c")).toDF("k", "v"))   // v3
    VersionedTable.load(lib, "vt", Seq((4L, "d")).toDF("k", "v"))   // v4
    VersionedTable.createTag(lib, "vt", "keepme", 2L)
    // vacuum keep_last=1 would normally retain only v4 — the tag pins
    // the suffix back to v2
    VersionedTable.vacuum(lib, "vt", keepLast = 1)
    assert(VersionedTable.versions(lib, "vt") == Seq(2L, 3L, 4L))
    assert(VersionedTable.readVersion(lib, "vt", 2L).count() == 2L)
    // v1 is genuinely gone
    intercept[Exception](VersionedTable.readVersion(lib, "vt", 1L).collect())
    // dropping the tag releases the pin: the next vacuum reclaims
    VersionedTable.dropTag(lib, "vt", "keepme")
    VersionedTable.vacuum(lib, "vt", keepLast = 1)
    assert(VersionedTable.versions(lib, "vt") == Seq(4L))
    assert(VersionedTable.read(lib, "vt").count() == 4L)
  }

  test("startingTag starts the append-tail stream at the tagged version") {
    spark.sql("CREATE TABLE gtag.default.st (k BIGINT)")
    spark.sql("INSERT INTO gtag.default.st VALUES (1), (2)")  // v2
    spark.sql("INSERT INTO gtag.default.st VALUES (3)")       // v3
    spark.sql("CALL gtag.system.create_tag('st', 'resume_here', 3)")
    spark.sql("INSERT INTO gtag.default.st VALUES (4), (5)")  // v4
    val out = tmpDir("gtag-stream-out")
    val ckpt = tmpDir("gtag-stream-ckpt")
    val q = spark.readStream.format("graft")
      .option("dir", warehouse).option("table", "st")
      .option("startingTag", "resume_here")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // the feed begins AT the tagged version's appends: {3} then {4,5}
    val got = spark.read.parquet(out).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 4L, 5L), got.toString)
    // an unknown tag refuses loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("dir", warehouse).option("table", "st")
        .option("startingTag", "nope").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("gtag-ckpt2"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(60000)
    }
    assert(e.getMessage != null)
  }

  test("tags survive rollback and expire_snapshots protects them") {
    spark.sql("CREATE TABLE gtag.default.s (k BIGINT)")
    spark.sql("INSERT INTO gtag.default.s VALUES (1)")   // v2
    spark.sql("INSERT INTO gtag.default.s VALUES (2)")   // v3
    spark.sql("CALL gtag.system.create_tag('s', 'pre_rb', 3)")
    spark.sql("CALL gtag.system.rollback('s', 2)")       // v4 = v2 state
    assert(spark.sql("SELECT count(*) FROM gtag.default.s")
      .head().getLong(0) == 1L)
    // the tag still answers with the pre-rollback state
    assert(spark.sql(
      "SELECT count(*) FROM gtag.default.s VERSION AS OF 'pre_rb'")
      .head().getLong(0) == 2L)
    // time-based expiry routes through vacuum → same pin
    spark.sql("CALL gtag.system.expire_snapshots('s', " +
      s"'${System.currentTimeMillis() + 60000}')").collect()
    assert(VersionedTable.versions(lib, "s").contains(3L),
      "expire_snapshots must keep the tagged version")
    assert(spark.sql(
      "SELECT count(*) FROM gtag.default.s VERSION AS OF 'pre_rb'")
      .head().getLong(0) == 2L)
  }

  test("tags and branches reserve one shared ref namespace exclusively") {
    spark.sql("CREATE TABLE gtag.default.x (k BIGINT)")
    spark.sql("INSERT INTO gtag.default.x VALUES (1)") // v2
    // the reservation marker lands with the tag and releases with it
    VersionedTable.createTag(lib, "x", "shared", 2L)
    val marker = new java.io.File(warehouse, "x.__vmeta/ref-shared.json")
    assert(marker.exists(), "a tag create must reserve the shared ref name")
    intercept[IllegalArgumentException](
      VersionedTable.createBranch(lib, "x", "shared"))
    VersionedTable.dropTag(lib, "x", "shared")
    assert(!marker.exists(), "dropping the tag must release the reservation")
    // the freed name is creatable as the OTHER kind
    VersionedTable.createBranch(lib, "x", "shared")
    assert(marker.exists(), "a branch create reserves the same marker")
    // dropping a NON-EXISTENT tag of that name must NOT release the
    // branch's reservation (the cross-kind shadowing this guards against)
    assert(!VersionedTable.dropTag(lib, "x", "shared", ifExists = true))
    assert(marker.exists(),
      "a tag drop must not free a name a live branch still holds")
    intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "x", "shared", 2L))
    VersionedTable.dropBranch(lib, "x", "shared")
    assert(!marker.exists())
    // a STALE reservation (crashed create: marker only, no ref of either
    // kind) blocks creation until swept by a drop with ifExists
    val stale = new java.io.File(warehouse, "x.__vmeta/ref-crashed.json")
    java.nio.file.Files.write(stale.toPath,
      """{"kind":"tag","created_at":0}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      VersionedTable.createTag(lib, "x", "crashed", 2L))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    assert(!VersionedTable.dropTag(lib, "x", "crashed", ifExists = true))
    assert(!stale.exists(), "ifExists drop sweeps a stale reservation")
    VersionedTable.createTag(lib, "x", "crashed", 2L)
    assert(VersionedTable.tagVersion(lib, "x", "crashed").contains(2L))
  }
}
