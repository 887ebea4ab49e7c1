package graft.etl

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints at the library boundary — the properties the SQL
  * spec (GraftCatalogSpec) can't reach:
  *
  *  - enforcement validates the STAGED files, i.e. the exact bytes that
  *    would commit — not a separate execution of the incoming plan,
  *    which a non-deterministic source would re-run with fresh values;
  *  - a narrow (ensure) append whose frame lacks a constrained column
  *    null-fills it and NULL satisfies (SQL CHECK semantics);
  *  - declaring a NEW constraint on a populated table validates the
  *    EXISTING rows first (Delta's ADD CONSTRAINT scan) — the manifest
  *    never advertises a CHECK its committed data violates.
  */
class CheckConstraintSpec extends SparkSpec {

  private val checkProp = "check_constraint"

  test("validation is atomic with the committed bytes under non-determinism") {
    val cat = new Catalog(spark, tmpDir("chkA"))
    // a nondeterministic column: every EXECUTION of the plan produces a
    // fresh sequence — a plan-side probe would see different values than
    // the write. The gate must judge what lands on disk.
    val counter = new AtomicLong()
    val nd = udf(() => counter.incrementAndGet()).asNondeterministic()
    val df = spark.range(50).repartition(1)
      .select(col("id").as("k"), nd().as("v"))
    VersionedTable.load(cat, "t", df,
      extraProps = Map(checkProp -> "v <= 1000"))
    // whatever execution committed, every COMMITTED row satisfies
    val committed = VersionedTable.read(cat, "t")
    assert(committed.where(col("v") > 1000).isEmpty &&
      committed.count() == 50L)

    // same shape against an impossible constraint: refused, no version,
    // no stray staged files
    val cat2 = new Catalog(spark, tmpDir("chkB"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.load(cat2, "t", df,
        extraProps = Map(checkProp -> "v <= 0"))
    }
    assert(e.getMessage.contains("CHECK constraint"))
    assert(VersionedTable.currentVersion(cat2, "t").isEmpty)
  }

  test("narrow ensure-append null-fills the constrained column and passes") {
    val cat = new Catalog(spark, tmpDir("chkN"))
    VersionedTable.load(cat, "t",
      spark.range(5).selectExpr("id AS a", "id + 1 AS b"),
      extraProps = Map(checkProp -> "b > 0"))
    // incoming lacks `b` entirely: the staged schema is the final one,
    // b reads NULL for the new rows — NULL satisfies, the load lands
    VersionedTable.load(cat, "t",
      spark.range(5, 8).selectExpr("id AS a"), safe = true)
    val t = VersionedTable.read(cat, "t")
    assert(t.count() == 8L && t.where(col("b").isNull).count() == 3L)
    // a FALSE row still refuses through the same path
    intercept[IllegalArgumentException] {
      VersionedTable.load(cat, "t",
        spark.range(1).selectExpr("99 AS a", "-1 AS b"))
    }
  }

  test("declaring a constraint on a populated table validates existing rows") {
    val cat = new Catalog(spark, tmpDir("chkE"))
    VersionedTable.load(cat, "t",
      spark.range(3).selectExpr("id AS k", "id - 1 AS v")) // v = -1 exists
    val e = intercept[IllegalArgumentException] {
      VersionedTable.load(cat, "t",
        spark.range(3, 5).selectExpr("id AS k", "id AS v"),
        extraProps = Map(checkProp -> "v >= 0"))
    }
    assert(e.getMessage.contains("CHECK constraint"),
      s"existing violating rows must refuse the declaration: ${e.getMessage}")
    // with a constraint the existing data satisfies, the declaration
    // lands and gates the NEXT load
    VersionedTable.load(cat, "t",
      spark.range(3, 5).selectExpr("id AS k", "id AS v"),
      extraProps = Map(checkProp -> "v >= -1"))
    intercept[IllegalArgumentException] {
      VersionedTable.load(cat, "t",
        spark.range(1).selectExpr("9 AS k", "-7 AS v"))
    }
  }
}
