package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack1(rows: Seq[(Long, Long)], budget: Long) =
    Chunking.packSequences(rows.toDF("id", "n"), "id", "n", budget, numShards = 1)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      .map(r => (r._1, r._4, r._5)) // (id, pack, pack_pos)

  test("greedy first-fit-contiguous walk in id order") {
    // budget 10: [4,5] | [6,3] | [8] | [2]... walk: 4+5=9, +6 overflow ->
    // pack1: 6+3=9, +8 overflow -> pack2: 8, +2 overflow(10? 8+2=10 fits!)
    val got = pack1(Seq((1L, 4L), (2L, 5L), (3L, 6L), (4L, 3L), (5L, 8L), (6L, 2L)), 10)
    assert(got.toSeq === Seq(
      (1L, 0L, 1L), (2L, 0L, 2L), (3L, 1L, 1L), (4L, 1L, 2L),
      (5L, 2L, 1L), (6L, 2L, 2L)))
  }

  test("a document larger than the budget gets its own pack") {
    val got = pack1(Seq((1L, 3L), (2L, 99L), (3L, 3L), (4L, 4L)), 10)
    assert(got.toSeq === Seq(
      (1L, 0L, 1L), (2L, 1L, 1L), (3L, 2L, 1L), (4L, 2L, 2L)))
  }

  test("every pack respects the budget unless it holds one oversized doc") {
    val rows = (1L to 200L).map(i => (i, (i * 37 % 23) + 1))
    val df = rows.toDF("id", "n")
    val got = Chunking.packSequences(df, "id", "n", budget = 50, numShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length === 200)
    val byPack = got.groupBy(r => (r._3, r._4))
    byPack.foreach { case (_, docs) =>
      val tot = docs.map(_._2).sum
      assert(tot <= 50 || docs.length == 1, s"pack over budget: $tot")
    }
    // pack ids contiguous from 0 within each shard
    got.groupBy(_._3).foreach { case (_, ds) =>
      val packs = ds.map(_._4).distinct.sorted
      assert(packs === (0L until packs.length).toArray)
    }
  }

  test("a shard's packing is independent of other shards' contents") {
    val base = (1L to 100L).map(i => (i, i % 17 + 1))
    val all = Chunking.packSequences(base.toDF("id", "n"), "id", "n", 40, numShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val someShard = all.head._3
    val shardIds = all.filter(_._3 == someShard).map(_._1).toSet
    val only = Chunking.packSequences(
        base.filter(r => shardIds(r._1)).toDF("id", "n"), "id", "n", 40, numShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(only.map(r => (r._1, r._4, r._5)).sortBy(_._1).toSeq ===
      all.filter(_._3 == someShard).map(r => (r._1, r._4, r._5)).sortBy(_._1).toSeq)
  }

  test("a non-integral id column is rejected eagerly, not cast to NULL") {
    val df = Seq(("a", 5L), ("b", 7L)).toDF("id", "n")
    val e = intercept[IllegalArgumentException] {
      Chunking.packSequences(df, "id", "n", 40, numShards = 2)
    }
    assert(e.getMessage.contains("integral id column"))
  }
}
