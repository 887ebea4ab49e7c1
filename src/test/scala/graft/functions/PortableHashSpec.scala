package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver-side JVM hash twins must be bit-identical to the column
  * expressions — bucketLookup's correctness (reading ONE bucket dir for a
  * key) rests entirely on this parity.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("hmodJvm/h60Jvm match the column hashes on long keys") {
    val keys = (Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue) ++
      (1 to 200).map(i => i * 2654435761L)).distinct
    val got = keys.toDF("k")
      .select(col("k"), PortableHash.hmod(col("k").cast("string")).as("hm"),
        PortableHash.h60(col("k").cast("string")).as("h60"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    keys.foreach { k =>
      val s = String.valueOf(k)
      assert(got(k)._1 == PortableHash.hmodJvm(s), s"hmod mismatch for $k")
      assert(got(k)._2 == PortableHash.h60Jvm(s), s"h60 mismatch for $k")
    }
  }

  test("hmodJvm matches the column hash on strings incl. unicode and empties") {
    val keys = Seq("", "a", "hello world", "héllo", "漢字テスト", "x" * 500,
      "tab\tnl\n", "quote'and\"double")
    val got = keys.toDF("k")
      .select(col("k"), PortableHash.hmod(col("k")).as("hm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(got(k) == PortableHash.hmodJvm(k), s"hmod mismatch for '$k'")
    }
  }

  test("multi-key bucket encoding: concat_ws twin matches the driver join") {
    // the exact construction bucketIdExpr/bucketLookup share
    val df = Seq((7L, "a"), (42L, "bc"), (0L, "")).toDF("k", "g")
    val n = 16
    val sep = "\u0001"
    val got = df.select(col("k"), col("g"),
        (PortableHash.hmod(concat_ws(sep, col("k").cast("string"),
          col("g").cast("string"))) % n).cast("int").as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    got.keys.foreach { case (k, g) =>
      val driver = (PortableHash.hmodJvm(s"$k$sep$g") % n).toInt
      assert(got((k, g)) == driver, s"bucket mismatch for ($k, $g)")
    }
  }
}
