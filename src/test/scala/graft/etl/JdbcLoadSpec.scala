package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JDBC WRITE target against embedded Derby — parity with the reference's
  * `write_db` (easy_etl/__init__.py:42): loads land IN the database with
  * surrogate ids, appends are O(batch) inserts, upserts go through the
  * staging-table swap, links and the incremental watermark read back
  * through the same connection.
  */
class JdbcLoadSpec extends SparkSpec {

  private def withDerby[T](f: JdbcCatalog => T): T = {
    val db = "graftsink" + java.util.UUID.randomUUID().toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    try f(new JdbcCatalog(spark, url))
    finally {
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // drop signals via exception
    }
  }

  private def proc(tgt: JdbcCatalog, table: String): EtlProcess = {
    val p = new EtlProcess(new Catalog(spark, SfDir), tgt, table)
    p.idOrder = Seq("n_nationkey")
    p
  }

  test("load into JDBC: table created, ids contiguous across appends") {
    withDerby { tgt =>
      val p = proc(tgt, "t")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey < 10")
      p.load()
      val first = p.result().select("id", "n_nationkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(first.map(_._1).toSeq == (1L to first.length))

      // second load APPENDS with ids continuing from the table max
      p.idOrder = Seq("n_nationkey")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey >= 10")
      p.load()
      val ids = p.result().select("id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (1L to ids.length), "ids must stay contiguous across batches")
      assert(ids.length == 25)
    }
  }

  test("upsert into JDBC is idempotent under re-run; ids kept on matches") {
    withDerby { tgt =>
      val p = proc(tgt, "t")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, n_regionkey FROM nation")
      p.load()
      val before = p.result().select("id", "n_nationkey").collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap

      // upsert a modified subset, twice — second run must change nothing
      for (_ <- 1 to 2) {
        p.idOrder = Seq("n_nationkey")
        p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, lower(n_name) AS n_name, n_regionkey FROM nation WHERE n_nationkey < 5")
        p.load(upsertFields = Seq("n_nationkey"))
      }
      val out = p.result().orderBy("id").collect()
      assert(out.length == 25, "upsert must not multiply rows")
      out.foreach { r =>
        val k = r.getAs[Long]("n_nationkey")
        assert(r.getAs[Long]("id") == before(k), "matched rows must keep their ids")
        val name = r.getAs[String]("n_name")
        if (k < 5) assert(name == name.toLowerCase) else assert(name == name.toUpperCase)
      }
    }
  }

  test("links resolve against JDBC dimension tables (reference write_db reads)") {
    withDerby { tgt =>
      val dim = proc(tgt, "nation_dim")
      dim.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation")
      dim.load()

      val p = new EtlProcess(new Catalog(spark, SfDir), tgt, "t")
      p.idOrder = Seq("c_custkey")
      p.extract("SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer WHERE c_custkey < 50")
      p.link("nation_id", target = "c_nationkey", tableName = "nation_dim",
        childField = "n_nationkey")
      p.ignore("c_nationkey")
      p.load()
      val out = p.result().collect()
      assert(out.length == 50)
      assert(out.forall(r => !r.isNullAt(r.fieldIndex("nation_id"))))
      // spot-check: link ids equal the dim's ids for the same nation key
      val dimIds = dim.result().collect()
        .map(r => r.getAs[Long]("n_nationkey") -> r.getAs[Long]("id")).toMap
      val cust = spark.read.parquet(s"$SfDir/customer.parquet")
        .where(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_nationkey").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.foreach { r =>
        val ck = r.getAs[Long]("c_custkey")
        assert(r.getAs[Long]("nation_id") == dimIds(cust(ck)))
      }
    }
  }

  test("incremental {} watermark reads max(pk) from the JDBC target") {
    withDerby { tgt =>
      val p = proc(tgt, "t")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey <= 12")
      p.load()
      p.idOrder = Seq("n_nationkey")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey > {}",
        writePkField = Some("n_nationkey"))
      p.load()
      val ks = p.result().select("n_nationkey").collect().map(_.getLong(0)).sorted
      assert(ks.toSeq == (0L to 24L))
    }
  }

  test("schema evolution through the staging swap: ensure widens, safe narrows") {
    withDerby { tgt =>
      val p = proc(tgt, "t")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey < 5")
      p.load()
      // new column arrives: staging-swap rewrite, old rows read null
      p.idOrder = Seq("n_nationkey")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 5 AND n_nationkey < 10")
      p.load()
      val cols1 = p.result().columns.toSet
      assert(cols1 == Set("id", "n_nationkey", "n_name", "n_regionkey"))
      assert(p.result().where(col("n_nationkey") < 5)
        .collect().forall(_.isNullAt(3)))
      // narrower incoming + safe=false drops the stale column
      p.idOrder = Seq("n_nationkey")
      p.extract("SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 12")
      p.load(safe = false)
      assert(p.result().columns.toSet == Set("id", "n_nationkey", "n_name"))
      assert(p.result().count() == 12)
    }
  }
}
