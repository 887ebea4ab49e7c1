package graft.etl

import graft.SparkSpec

/** S6: progress reporting parity (reference VERBOSE/tqdm,
  * easy_etl/__init__.py:33-40) — per-phase row counts through a pluggable
  * sink, off by default.
  */
class ProgressSpec extends SparkSpec {

  test("verbose load reports extract and load row counts") {
    val tgt = new Catalog(spark, tmpDir("graft-progress"))
    val p = new EtlProcess(new Catalog(spark, SfDir), tgt, "t")
    val messages = scala.collection.mutable.Buffer.empty[String]
    p.verbose = true
    p.progress = messages += _
    p.idOrder = Seq("n_nationkey")
    p.extract("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 7")
    p.load()
    assert(messages.exists(_.matches("extract: 7 rows")))
    assert(messages.exists(_.matches("load: 7 rows -> t")))
  }

  test("progress stays silent when verbose is off") {
    val tgt = new Catalog(spark, tmpDir("graft-progress2"))
    val p = new EtlProcess(new Catalog(spark, SfDir), tgt, "t")
    val messages = scala.collection.mutable.Buffer.empty[String]
    p.progress = messages += _
    p.extract("SELECT n_nationkey FROM nation")
    p.load()
    assert(messages.isEmpty)
  }
}
