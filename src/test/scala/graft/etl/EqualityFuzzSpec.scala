package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded property suite for the equality-tombstone machinery — the
  * PushdownFuzzSpec insurance pattern over the write-without-read
  * upsert: random interleavings of appends, equality upserts, keyed
  * CoW upserts, range deletes, tombstone-only equality deletes, mixed
  * upsert+delete (Debezium-shaped) batches, and compactions, with every retained
  * version checked against an exact in-memory model (full state,
  * filtered reads, and time travel). Catches stamp-bookkeeping
  * mistakes no hand-written case would think of. */
class EqualityFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("seeded fuzz: random eq-upsert histories ≡ the in-memory model") {
    fuzz(Map.empty)
  }

  test("seeded fuzz: the same histories on a MERGE-ON-READ table") {
    // the CoW keyed upserts in the mix route through morUpsertAttempt
    // and the range deletes through deleteMorAttempt — the DV + eq
    // composition on every interleaving (the probe-read class of bug
    // hand-written cases missed)
    fuzz(Map("write_mode" -> "merge-on-read"))
  }

  private def fuzz(tableProps: Map[String, String]): Unit = {
    import scala.util.Random
    for (seed <- Seq(7L, 23L, 91L)) {
      val rnd = new Random(seed)
      val cat = new Catalog(spark, tmpDir("geqf"))
      // model: key -> value at each committed version
      var state = Map.empty[Long, Double]
      var history = Vector.empty[(Long, Map[Long, Double])] // (version, state)
      def df(m: Seq[(Long, Double)]) = m.toDF("k", "v")
      def commit(v: Long): Unit = history :+= (v, state)

      // first load
      val base = (0L until 200L).map(k => k -> (k * 1.0))
      state = base.toMap
      commit(VersionedTable.load(cat, "f", df(base), idOrder = Seq("k"),
        upsertFields = Seq("k"), extraProps = tableProps))

      for (step <- 0 until 7) {
        val prevState = state
        val prevV = history.last._1
        rnd.nextInt(8) match {
          case 0 => // append fresh keys
            val lo = 1000L * (step + 1)
            val rows = (lo until lo + 30 + rnd.nextInt(40)).map(k =>
              k -> (k * 1.0))
            state = state ++ rows
            commit(VersionedTable.load(cat, "f", df(rows)))
          case 1 | 2 => // equality upsert over a random key window
            val lo = rnd.nextInt(250).toLong
            val rows = (lo until lo + 20 + rnd.nextInt(60)).map(k =>
              k -> (-(step + 1) * 1000.0 - k))
            state = state ++ rows
            commit(VersionedTable.upsertEqualityDelete(cat, "f", df(rows),
              keys = Seq("k")))
          case 3 => // CoW keyed upsert interleaves with the eq machinery
            val lo = rnd.nextInt(200).toLong
            val rows = (lo until lo + 10 + rnd.nextInt(30)).map(k =>
              k -> ((step + 1) * 10000.0 + k))
            state = state ++ rows
            commit(VersionedTable.load(cat, "f", df(rows),
              upsertFields = Seq("k")))
          case 4 => // compaction materializes mid-history
            val v = VersionedTable.compact(cat, "f", 256L * 1024 * 1024)
            commit(v)
          case 5 => // CoW range delete interleaves (prunes carried stamps)
            val lo = rnd.nextInt(250).toLong
            val hi = lo + 5 + rnd.nextInt(25)
            state = state.filterNot { case (k, _) => k >= lo && k < hi }
            commit(VersionedTable.delete(cat, "f",
              col("k") >= lo && col("k") < hi))
          case 6 => // WRITE-WITHOUT-READ delete: tombstone-only commit
            val lo = rnd.nextInt(250).toLong
            val ks = (lo until lo + 5 + rnd.nextInt(20)).toSeq
            state = state -- ks
            commit(VersionedTable.deleteKeysEquality(cat, "f",
              ks.toDF("k"), Seq("k")))
          case 7 => // mixed Debezium-shaped batch: upserts + deletes, ONE commit
            val lo = rnd.nextInt(230).toLong
            val rows = (lo until lo + 10 + rnd.nextInt(30)).map(k =>
              k -> ((step + 1) * 100000.0 + k))
            val dlo = rnd.nextInt(250).toLong
            val dks = (dlo until dlo + 3 + rnd.nextInt(15))
              .filterNot(rows.map(_._1).contains)
            state = state ++ rows -- dks
            commit(VersionedTable.upsertEqualityDelete(cat, "f", df(rows),
              keys = Seq("k"), deleteKeyRows = Some(dks.toDF("k"))))
        }
        // CHANGE FEED vs the model: the (prevV, curV] diff must equal
        // the state diff — including ACROSS live tombstones (an
        // eq-upsert's implied deletes/updates resolve at read). Updates
        // compare by VALUE below; an eq reinsert of an identical value
        // would also surface (new id) but the fuzz's step-salted values
        // make that impossible.
        val curV = history.last._1
        if (curV > prevV) {
          val feed = VersionedTable.changes(cat, "f", prevV, curV, Seq("k"))
            .select("op", "k", "v").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
          val want = (prevState.keySet ++ state.keySet).flatMap { k =>
            (prevState.get(k), state.get(k)) match {
              case (None, Some(nv)) => Some(("insert", k, nv))
              case (Some(ov), None) => Some(("delete", k, ov))
              case (Some(ov), Some(nv)) if ov != nv => Some(("update", k, nv))
              case _ => None
            }
          }
          assert(feed == want, s"seed $seed step $step: feed diverged " +
            s"(${(feed diff want).take(3)} vs ${(want diff feed).take(3)})")
        }
        // current state: full, filtered (both pruning-eligible and not)
        val got = VersionedTable.read(cat, "f").select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == state, s"seed $seed step $step: full state diverged " +
          s"(${(got.toSet diff state.toSet).take(3)} vs " +
          s"${(state.toSet diff got.toSet).take(3)})")
        val cut = rnd.nextInt(300).toLong
        val gotF = VersionedTable.readWhere(cat, "f", col("k") >= cut)
          .select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(gotF == state.filter(_._1 >= cut),
          s"seed $seed step $step: filtered read diverged at k >= $cut")
        // negative-value filter exercises non-key pruning columns
        val gotN = VersionedTable.read(cat, "f").where(col("v") < 0)
          .count()
        assert(gotN == state.count(_._2 < 0),
          s"seed $seed step $step: value filter diverged")
      }
      // TIME TRAVEL: every retained version reads back its own state
      history.takeRight(5).foreach { case (v, st) =>
        val got = VersionedTable.readVersion(cat, "f", v).select("k", "v")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == st, s"seed $seed: time travel to v$v diverged")
      }
      // and a final full materialization converges to a clean manifest
      VersionedTable.compact(cat, "f", 256L * 1024 * 1024)
      val head = VersionedTable.currentVersion(cat, "f").get
      assert(VersionedTable.eqTombstoneKeyCols(cat, "f", head).isEmpty,
        s"seed $seed: full compaction must materialize all tombstones")
      val fin = VersionedTable.read(cat, "f").select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fin == state, s"seed $seed: post-materialization state diverged")
    }
  }
}
