package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Catalog, VersionedTable}

/** Scale probe for the equality-tombstone / CDC family (the verdict's
  * standing ask: the registry exercises these at sf0.1 where each
  * statement runs in well under a second — too small to catch
  * superlinear behavior in tombstone resolution, envelope pruning, or
  * diff planning). The probe amplifies the sf0.1 `orders` table by
  * key-shifted unions (deterministic — no synthetic value drift) and
  * replays the same keyed-CDC shape at each scale:
  *
  *   - `load_s`        — keyed base load (O(table): the linear yardstick)
  *   - `eq_upsert_s`   — mean of K write-without-read upserts of a FIXED
  *                       5k-row batch (the O(batch) claim: must stay flat
  *                       as the table grows 10x)
  *   - `eq_delete_s`   — mean of K tombstone-only deletes (same claim)
  *   - `read_s`        — full resolved scan (agg over live tombstones;
  *                       linear in table, NOT in tombstone count)
  *   - `feed_s`        — one change-feed span across the tombstone era
  *                       (O(delta): flat-ish as the table grows)
  *   - `sql_limit_s`   — pushed LIMIT over live tombstones (truncation
  *                       pad path: near-constant)
  *
  * Usage: `sbt "runMain graft.ScaleProbe 2 10"` (multipliers of sf0.1 ≈
  * sf0.2 and sf1). Prints ONE JSON line per multiplier; wall-clock only,
  * single-JVM local[32] — compare SHAPE across scales, not absolutes. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dedupMode = args.headOption.contains("dedup")
    val numArgs: Seq[String] = if (dedupMode) args.drop(1).toSeq else args.toSeq
    val mults = (if (numArgs.nonEmpty) numArgs else Seq("2", "10")).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (dedupMode) { dedupProbe(spark, sfDir, mults); spark.stop(); return }
    val orders0 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    orders0.cache().count() // warm: decode + JIT off the measured path

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    mults.foreach { m =>
      // key-shifted union: m disjoint key eras, same value distribution
      val amplified = (0 until m).map(i => orders0.select(
        (col("o_orderkey") + lit(i.toLong * 10_000_000L)).as("o_orderkey"),
        col("o_totalprice"), col("o_orderdate"))).reduce(_ unionByName _)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scale$m").toString
      val cat = new Catalog(spark, dir)
      val nameCat = s"gsp$m"
      spark.conf.set(s"spark.sql.catalog.$nameCat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$nameCat.dir", dir)
      val (_, loadS) = timed {
        VersionedTable.load(cat, "t", amplified,
          upsertFields = Seq("o_orderkey"), idOrder = Seq("o_orderkey"),
          // hold auto-compaction clear of the probe: a mid-loop compact
          // would fold the tombstone cost into one arbitrary statement
          extraProps = Map("compact.trigger.eq_tombstones" -> "1000"))
      }
      val vBase = VersionedTable.currentVersion(cat, "t").get
      val total = m.toLong * 150_000L
      val rnd = new scala.util.Random(42)
      val k = 8
      // FIXED 5k-key batches over random eras — the per-statement cost
      // the O(batch) claim is about
      def batch(i: Int): DataFrame = {
        val era = rnd.nextInt(m).toLong * 10_000_000L
        val lo = 1L + rnd.nextInt(140_000)
        spark.range(lo, lo + 5_000L)
          .select((col("id") * 6 + era).as("o_orderkey"),
            (col("id") % 1000 * 1.5 + i).as("o_totalprice"),
            lit(java.sql.Date.valueOf("2026-01-01")).as("o_orderdate"))
      }
      val upS = (1 to k).map { i =>
        timed(VersionedTable.upsertEqualityDelete(cat, "t", batch(i),
          keys = Seq("o_orderkey")))._2
      }
      val delS = (1 to k).map { i =>
        timed(VersionedTable.deleteKeysEquality(cat, "t",
          batch(i).select("o_orderkey").limit(2_500),
          Seq("o_orderkey")))._2
      }
      val vEnd = VersionedTable.currentVersion(cat, "t").get
      val (nLive, readS) = timed {
        VersionedTable.read(cat, "t")
          .agg(count(lit(1)), sum("o_totalprice")).head().getLong(0)
      }
      val (nFeed, feedS) = timed {
        VersionedTable.changes(cat, "t", vBase + k, vEnd, Seq("o_orderkey"))
          .agg(count(lit(1))).head().getLong(0)
      }
      val (_, limS) = timed {
        spark.sql(s"SELECT * FROM $nameCat.default.t LIMIT 100").count()
      }
      val fmt = new java.text.DecimalFormat("0.###")
      def s(d: Double) = fmt.format(d)
      println(s"""{"probe":"eq_cdc_scale","mult":$m,"rows":$total,""" +
        s""""live_rows":$nLive,"feed_rows":$nFeed,""" +
        s""""load_s":${s(loadS)},"eq_upsert_mean_s":${s(upS.sum / k)},""" +
        s""""eq_upsert_max_s":${s(upS.max)},""" +
        s""""eq_delete_mean_s":${s(delS.sum / k)},""" +
        s""""read_s":${s(readS)},"feed_s":${s(feedS)},""" +
        s""""sql_limit_s":${s(limS)}}""")
      // leave nothing behind: the probe's temp tables are disposable
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }

  /** Scale probe for the MINHASH DEDUP family (the suite's biggest CPU
    * family, previously sampled only at sf0.1): amplify the documents
    * corpus by era-shifted unions whose texts share NO shingles across
    * eras (an `eraN` marker is interleaved into every token gap, so every
    * 3-gram shingle of era i contains a token era j never has) — the
    * near-dup structure grows LINEARLY with the corpus (each era carries
    * the registry's own every-10th-doc truncated-copy shape) instead of
    * quadratically (plain text copies would make every doc an m-way
    * duplicate cluster and measure the data, not the algorithm).
    * Reported per multiplier (one warm JVM; compare shape, not absolutes):
    *
    *   - `pairs_s` / `n_pairs` — the banded-minhash candidate/verify
    *     pipeline alone (must grow ~linearly: shingling O(corpus),
    *     banding O(corpus × perms), verify O(candidates))
    *   - `drop_s` / `n_kept`   — the full dropNearDuplicates action
    *     (pairs + components + anti-join)
    *
    * Usage: `sbt "runMain graft.ScaleProbe dedup 1 2 4 10"`. */
  private def dedupProbe(spark: SparkSession, sfDir: String,
                         mults: Seq[Int]): Unit = {
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs0.cache().count() // warm: decode + JIT off the measured path
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val fmt = new java.text.DecimalFormat("0.###")
    mults.foreach { m =>
      val base = (0 until m).map { i =>
        docs0.select((col("doc_id") + lit(i.toLong * 1_000_000L)).as("doc_id"),
          regexp_replace(col("text"), "\\s+", s" era$i ").as("text"))
      }.reduce(_ unionByName _)
      // the registry's q_dedup_drop shape: every 10th doc also present as
      // a head-truncated near-copy under a shifted id
      val toks = split(col("text"), "\\s+")
      val near = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(500_000_000L)).as("doc_id"),
          concat_ws(" ", slice(toks, lit(3), size(toks))).as("text"))
      val corpus = base.unionByName(near)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = corpus.count()
      val (nPairs, pairsS) = timed {
        val p = graft.operators.Dedup.minHashPairs(corpus, "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6)
        val c = p.count(); p.unpersist(); c
      }
      val (nKept, dropS) = timed {
        graft.operators.Dedup.dropNearDuplicates(corpus, "doc_id", "text",
          n = 3, numPerms = 16, bands = 4, threshold = 0.6).count()
      }
      def s(d: Double) = fmt.format(d)
      println(s"""{"probe":"dedup_scale","mult":$m,"docs":$nDocs,""" +
        s""""n_pairs":$nPairs,"n_kept":$nKept,""" +
        s""""pairs_s":${s(pairsS)},"drop_s":${s(dropS)}}""")
      corpus.unpersist()
    }
  }
}
