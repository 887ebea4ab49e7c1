package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference pipeline API over a VERSIONED target: identical
  * observable semantics to a flat target, plus version history —
  * constructing the target as [[VersionedCatalog]] is the ONLY change. */
class VersionedCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): (Catalog, VersionedCatalog, Catalog) = {
    val srcDir = tmpDir("vc-src")
    val mytable = Seq(("Joe", 23, "Smith"), ("Mary", 61, "Jones"),
      ("Tom", 5, "Baker")).toDF("name", "age", "last_name")
    mytable.write.parquet(s"$srcDir/mytable")
    (new Catalog(spark, srcDir),
      new VersionedCatalog(spark, tmpDir("vc-tgt")),
      new Catalog(spark, tmpDir("vc-flat")))
  }

  test("EtlProcess loads land as versions; state matches the flat target exactly") {
    val (src, vt, flat) = fixture()
    def run(tgt: TableStore): Unit = {
      val p = new EtlProcess(src, tgt, "t")
      p.idOrder = Seq("name")
      p.extract("SELECT name, age FROM mytable")
      p.load()
      val q = new EtlProcess(src, tgt, "t")
      q.idOrder = Seq("name")
      q.extract("SELECT name, age * 2 AS age FROM mytable WHERE name = 'Joe'")
      q.load(upsertFields = Seq("name"))
    }
    run(vt); run(flat)
    def snap(t: TableStore) = t.table("t").select("id", "name", "age")
      .as[(Long, String, Int)].collect().toSet
    assert(snap(vt) == snap(flat),
      "versioned target must be observationally identical to the flat target")
    // plus history: the upsert is v2, v1 still reads the pre-upsert state
    assert(VersionedTable.versions(vt, "t") == Seq(1L, 2L))
    assert(VersionedTable.readVersion(vt, "t", 1L)
      .where(col("name") === "Joe").select("age").as[Int].head() == 23)
  }

  test("incremental {} watermark answers from the versioned head's footers") {
    val (src, vt, _) = fixture()
    val p = new EtlProcess(src, vt, "inc")
    p.idOrder = Seq("age")
    p.extract("SELECT name, age FROM mytable WHERE age <= 23")
    p.load()
    assert(p.result().count() == 2) // ages 5, 23
    // integral pk → the watermark literal must come from footer stats of
    // the head manifest's files (no scan): assert the rendered literal
    val lit23 = p.footerWatermarkLiteral(vt.table("inc"), "age")
    assert(lit23.contains("23"), s"expected footer watermark 23, got $lit23")
    p.extract("SELECT name, age FROM mytable WHERE age > {}",
      writePkField = Some("age"))
    p.load()
    assert(p.result().count() == 3) // + age 61
    p.extract("SELECT name, age FROM mytable WHERE age > {}",
      writePkField = Some("age"))
    p.load()
    assert(p.result().count() == 3) // idempotent re-run
    assert(VersionedTable.versions(vt, "inc") == Seq(1L, 2L, 3L))
  }

  test("links resolve against the versioned head; rollback rewinds the pipeline") {
    val (src, vt, _) = fixture()
    // dim table loaded versioned first
    val d = new EtlProcess(src, vt, "dim")
    d.idOrder = Seq("name")
    d.extract("SELECT name FROM mytable")
    d.load()
    // fact links name → dim id through the versioned head
    val f = new EtlProcess(src, vt, "fact")
    f.idOrder = Seq("name")
    f.extract("SELECT name, age FROM mytable")
    f.link("dim_id", "name", "dim", "name")
    f.load()
    val got = vt.table("fact").select("name", "dim_id")
      .as[(String, Long)].collect().toMap
    val dimIds = vt.table("dim").select("name", "id")
      .as[(String, Long)].collect().toMap
    assert(got == dimIds)
    // a bad second load of the fact, rolled back, leaves the link state
    val g = new EtlProcess(src, vt, "fact")
    g.idOrder = Seq("name")
    g.extract("SELECT name, age * 0 AS age FROM mytable") // the mistake
    g.load(upsertFields = Seq("name"))
    assert(vt.table("fact").agg(sum("age")).head().getLong(0) == 0L)
    VersionedTable.rollback(vt, "fact", 1L)
    assert(vt.table("fact").agg(sum("age")).head().getLong(0) == (23 + 61 + 5).toLong)
  }

  test("bucketBy composes; flat-Loader layout knobs are rejected loudly") {
    val (src, vt, _) = fixture()
    val p = new EtlProcess(src, vt, "b")
    p.idOrder = Seq("name")
    p.bucketBy = Some((Seq("name"), 3))
    p.extract("SELECT name, age FROM mytable")
    p.load()
    assert(VersionedTable.bucketSpec(vt, "b").contains((Seq("name"), 3)))
    val q = new EtlProcess(src, vt, "b2")
    q.idOrder = Seq("name")
    q.partitionBy = Seq("name")
    q.extract("SELECT name, age FROM mytable")
    intercept[IllegalArgumentException] { q.load() }
  }
}
