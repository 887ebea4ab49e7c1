package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style checks over seeded random datasets: the upsert/append
  * invariants the reference's sequential semantics imply, which must hold
  * for ANY input under the distributed implementation (SURVEY.md §7.5
  * item 1).
  */
class LoaderPropsSpec extends SparkSpec {

  private def randomRows(rnd: Random, n: Int): Seq[(String, Int, String)] =
    Seq.fill(n)((s"k${rnd.nextInt(8)}", rnd.nextInt(1000), s"v${rnd.nextInt(100)}"))

  // partitioned-vs-flat equivalence: multi-round random loads through the
  // partition-scoped path must converge to EXACTLY the flat table's state
  // (ids included) — the scoped merge is an optimization, never a semantic
  private def randomPartRows(rnd: Random, n: Int): Seq[(Long, String, Double)] =
    Seq.fill(n)((rnd.nextInt(40).toLong,
      Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(500).toDouble))

  for (seed <- Seq(7, 99)) {
    test(s"partitioned scoped upsert equals flat upsert over random rounds (seed=$seed)") {
      val rnd = new Random(seed)
      val pt = new Catalog(spark, tmpDir("props-part"))
      val flat = new Catalog(spark, tmpDir("props-flat"))
      // unique (k, typ) per batch: duplicate-key collapse order among
      // identical keys is tested elsewhere; here the subject is routing
      def batch(n: Int) = {
        val rows = randomPartRows(rnd, n).distinctBy(r => (r._1, r._2))
        spark.createDataFrame(rows).toDF("k", "typ", "v")
      }
      val seed0 = batch(30)
      Loader.load(pt, "t", seed0, idOrder = Seq("k", "typ"), partitionBy = Seq("typ"))
      Loader.load(flat, "t", seed0, idOrder = Seq("k", "typ"))
      for (_ <- 1 to 3) {
        val b = batch(12)
        Loader.load(pt, "t", b, upsertFields = Seq("k", "typ"), idOrder = Seq("k", "typ"))
        Loader.load(flat, "t", b, upsertFields = Seq("k", "typ"), idOrder = Seq("k", "typ"))
      }
      def snap(c: Catalog) = c.table("t").select("id", "k", "typ", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
      assert(snap(pt) == snap(flat),
        s"partitioned state diverged from flat after 3 upsert rounds (seed=$seed)")
    }
  }

  for (seed <- Seq(1, 42, 2026)) {
    test(s"upsert invariants hold on seeded random data (seed=$seed)") {
      val rnd = new Random(seed)
      val tgt = new Catalog(spark, tmpDir("props-tgt"))
      val base = randomRows(rnd, 12)
      val incoming = randomRows(rnd, 10)

      val baseDf = spark.createDataFrame(base).toDF("k", "n", "v")
      Loader.load(tgt, "t", baseDf, idOrder = Seq("k", "n", "v"))
      val before = tgt.table("t").collect()
        .map(r => r.getAs[String]("k") -> r.getAs[Long]("id")).toMap

      val incDf = spark.createDataFrame(incoming).toDF("k", "n", "v")
      Loader.load(tgt, "t", incDf, upsertFields = Seq("k"), idOrder = Seq("k", "n", "v"))
      val after = tgt.table("t").collect()

      // (a) exactly one row per key among keys that were unique before;
      //     keys duplicated in the BASE keep their multiplicity (SQL UPDATE
      //     updates all), incoming dupes are collapsed
      val baseCount = base.groupBy(_._1).map { case (k, vs) => k -> vs.size }
      val incKeys = incoming.map(_._1).toSet
      after.groupBy(_.getAs[String]("k")).foreach { case (k, rows) =>
        val expected = baseCount.getOrElse(k, 1) // base multiplicity, or 1 fresh row
        assert(rows.length == expected, s"key $k multiplicity: got ${rows.length}, want $expected")
      }
      // (b) surviving pre-existing keys keep their ids
      after.foreach { r =>
        val k = r.getAs[String]("k")
        if (before.contains(k) && baseCount(k) == 1)
          assert(r.getAs[Long]("id") == before(k), s"id changed for $k")
      }
      // (c) matched rows carry the LAST incoming values under idOrder
      val lastPerKey = incoming.groupBy(_._1).map { case (k, vs) =>
        k -> vs.maxBy(t => (t._2, t._3))
      }
      after.filter(r => incKeys.contains(r.getAs[String]("k"))).foreach { r =>
        val exp = lastPerKey(r.getAs[String]("k"))
        assert(r.getAs[Int]("n") == exp._2 && r.getAs[String]("v") == exp._3)
      }
      // (d) idempotence: repeating the same upsert changes nothing
      Loader.load(tgt, "t", incDf, upsertFields = Seq("k"), idOrder = Seq("k", "n", "v"))
      val again = tgt.table("t").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("k"), r.getAs[Int]("n"), r.getAs[String]("v")))
        .sortBy(_._1)
      val afterSorted = after
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("k"), r.getAs[Int]("n"), r.getAs[String]("v")))
        .sortBy(_._1)
      assert(again.toSeq == afterSorted.toSeq, "upsert not idempotent")
      // (e) ids are unique and contiguous from 1
      val ids = after.map(_.getAs[Long]("id")).sorted
      assert(ids.distinct.length == ids.length)
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
  }

  test("append loads always produce unique contiguous ids (seeded)") {
    val rnd = new Random(7)
    val tgt = new Catalog(spark, tmpDir("props-append"))
    var total = 0
    for (_ <- 1 to 3) {
      val n = 5 + rnd.nextInt(6)
      total += n
      val df = spark.createDataFrame(randomRows(rnd, n)).toDF("k", "n", "v")
      Loader.load(tgt, "t", df, idOrder = Seq("k", "n", "v"))
    }
    val ids = tgt.table("t").collect().map(_.getAs[Long]("id")).sorted
    assert(ids.length == total)
    assert(ids.head == 1L && ids.last == total.toLong && ids.distinct.length == total)
  }
}
