package graft.etl

import graft.SparkSpec

/** JDBC extract path against embedded Derby (the only database driver on
  * this container's Spark classpath): pushdown query extract and the
  * incremental `{}` watermark, end-to-end through EtlProcess.
  */
class JdbcExtractSpec extends SparkSpec {

  private def withDerby[T](f: String => T): T = {
    val db = "grafttest" + java.util.UUID.randomUUID().toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    try f(url)
    finally {
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLException => () } // drop signals via exception
    }
  }

  test("extractJdbc: pushdown query extract loads with surrogate ids") {
    withDerby { url =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.createStatement().execute(
          "CREATE TABLE src (k BIGINT, name VARCHAR(32))")
        val ps = conn.prepareStatement("INSERT INTO src VALUES (?, ?)")
        Seq(3L -> "c", 1L -> "a", 2L -> "b", 10L -> "x").foreach { case (k, v) =>
          ps.setLong(1, k); ps.setString(2, v); ps.addBatch()
        }
        ps.executeBatch()
      } finally conn.close()

      val tgt = new Catalog(spark, tmpDir("graft-jdbc-tgt"))
      val p = new EtlProcess(new Catalog(spark, SfDir), tgt, "t")
      p.idOrder = Seq("k")
      p.extractJdbc(url, "SELECT k, name FROM src WHERE k < 10")
      p.load()
      val rows = p.result().select("id", "k", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c")))
    }
  }

  test("extractJdbc: incremental {} watermark substitutes target max(pk)") {
    withDerby { url =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.createStatement().execute("CREATE TABLE src (k BIGINT)")
        val ps = conn.prepareStatement("INSERT INTO src VALUES (?)")
        (1L to 6L).foreach { k => ps.setLong(1, k); ps.addBatch() }
        ps.executeBatch()
      } finally conn.close()

      val tgt = new Catalog(spark, tmpDir("graft-jdbc-tgt2"))
      val p = new EtlProcess(new Catalog(spark, SfDir), tgt, "t")
      p.idOrder = Seq("k")
      p.extractJdbc(url, "SELECT k FROM src WHERE k <= 3")
      p.load()
      // second load sees max(k)=3 in the target and extracts only k > 3
      p.idOrder = Seq("k")
      p.extractJdbc(url, "SELECT k FROM src WHERE k > {}", writePkField = Some("k"))
      p.load()
      val ks = p.result().select("k").collect().map(_.getLong(0)).sorted
      assert(ks.toSeq == (1L to 6L))
    }
  }
}
