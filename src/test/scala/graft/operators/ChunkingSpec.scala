package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("windows start at stride multiples, overlap, and cover every token") {
    val df = Seq((1L, doc(10))).toDF("id", "text")
    val got = Chunking.tokenChunks(df, "id", "text", chunkSize = 5, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    // starts 0,3,6: [t1..t5], [t4..t8], [t7..t10]
    assert(got.map(_._4).toSeq === Seq(
      "t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(got.map(_._3).toSeq === Seq(5L, 5L, 4L))
    assert(got.map(_._2).toSeq === Seq(0L, 1L, 2L))
  }

  test("documents shorter than one chunk yield a single full-document chunk") {
    val df = Seq((1L, doc(3)), (2L, "")).toDF("id", "text")
    val got = Chunking.tokenChunks(df, "id", "text", chunkSize = 8, stride = 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, 3L, "t1 t2 t3"), (2L, 0L, 0L, "")))
  }

  test("NULL text behaves as empty — the row still yields its chunk-0 row") {
    val df = Seq((1L, Some(doc(2))), (2L, None)).toDF("id", "text")
    val got = Chunking.tokenChunks(df, "id", "text", chunkSize = 4, stride = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, 2L, "t1 t2"), (2L, 0L, 0L, "")))
  }

  test("non-overlapping stride == chunkSize partitions the token stream") {
    val df = Seq((1L, doc(12))).toDF("id", "text")
    val got = Chunking.tokenChunks(df, "id", "text", chunkSize = 4, stride = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(got.length === 3 && got.forall(_._3 == 4L))
    assert(got.flatMap(_._4.split(" ")).toSeq === (1 to 12).map(i => s"t$i"))
  }

  test("boundary: size dividing evenly emits no empty trailing window") {
    // n = 8, size 4, stride 2: starts 0,2,4 (last start = ceil(4/2)*2 = 4)
    val got = Chunking.tokenChunks(Seq((1L, doc(8))).toDF("id", "text"),
        "id", "text", chunkSize = 4, stride = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(got.map(_._4).toSeq === Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8"))
  }
}
