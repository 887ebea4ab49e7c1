package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.streaming.Sessions

/** Oracle-checked queries for the multimodal plumbing and the unified
  * batch/streaming session operator.
  *
  * The multimodal decode is [[Multimodal.DecoderStub]] — deterministic
  * integer arithmetic over the payload bytes — so DuckDB reproduces it
  * from the source text (documents are pure ASCII: byte i == ord(char i),
  * verified against the driver data). What the oracle actually checks is
  * the real plumbing: binary column construction, per-partition decode
  * pass, frame slicing.
  *
  * q_stream_session_batch runs [[Sessions.sessionAgg]] — the SAME operator
  * that runs under readStream — on the batch events table; native
  * session_window semantics (new session when gap ≥ g, window end = last
  * event + g) are mirrored in the oracle SQL.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private val P = graft.functions.PortableHash.P

  /** One partitioned copy of events per (JVM, sfDir); see q_partitioned_read. */
  private val partitionedEventsDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, Q] = Map(

    "q_multimodal_decode" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Multimodal.decodeFeatures(
          Multimodal.attachBinary(docs, "text"), "doc_id")
        .orderBy("doc_id")
    },

    // REAL image decode (javax.imageio): deterministic PNGs generated on
    // the executors from (w, h, seed=doc_id), decoded back to
    // width/height/pixel-checksum. The oracle reproduces all three from
    // the generator parameters alone — a faithful decode is invisible.
    "q_multimodal_image" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (lit(8) + col("doc_id") % 16).as("w"),
          (lit(8) + (col("doc_id") * 3) % 16).as("h"))
      Multimodal.decodeImageFeatures(
          Multimodal.attachGeneratedPng(docs, "doc_id", "w", "h"), "doc_id")
        .orderBy("doc_id")
    },

    // IMAGE NEAR-DUP: generated variant PNGs (97 pattern families × 3
    // brightness-lattice variants) → REAL decode → 60-bit perceptual
    // average-hash → banded Hamming pairs (the same guarded pipeline as
    // text SimHash). The oracle recomputes every pixel, block mean, hash
    // bit, and pair from the generator parameters alone.
    "q_multimodal_imagedup" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (col("doc_id") % 97).as("seed"),
          expr("(doc_id DIV 97) % 3").as("variant"))
        .select(col("doc_id"), col("seed"), col("variant"),
          (lit(8) + col("seed") % 16).as("w"),
          (lit(8) + (col("seed") * 3) % 16).as("h"))
      val hashes = Multimodal.imageAHash(
        Multimodal.attachGeneratedPngVariant(docs, "doc_id", "w", "h", "seed", "variant"),
        "doc_id")
      graft.operators.Dedup.hammingPairs(hashes, "doc_id", "ahash",
          bits = 60, maxDist = 3)
        .orderBy("id_a", "id_b")
    },

    // audio near-duplicate detection: loudness-profile perceptual hash
    // (audio aHash60) over real PCM decodes, banded Hamming pairs — docs
    // sharing a seed differ only by a sparse sample perturbation and hash
    // within the radius; the oracle recomputes every hash from the
    // generator parameters and brute-forces the ≤3 pairs
    "q_multimodal_audiodup" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (col("doc_id") % 89).as("seed"),
          expr("(doc_id DIV 89) % 3").as("variant"))
        .select(col("doc_id"), col("seed"), col("variant"),
          (lit(100) + col("seed")).as("nf"), lit(8000).as("rate"))
      val hashes = Multimodal.audioAHash(
        Multimodal.attachGeneratedWavVariant(docs, "doc_id", "nf", "rate",
          "seed", "variant"),
        "doc_id")
      graft.operators.Dedup.hammingPairs(hashes, "doc_id", "audio_hash",
          bits = 60, maxDist = 3)
        .orderBy("id_a", "id_b")
    },

    // REAL audio decode (javax.sound.sampled): deterministic 16-bit PCM
    // WAVs generated from (n_frames, rate, seed=doc_id), decoded back to
    // rate/channels/frames/sample-checksum the oracle recomputes from the
    // generator parameters
    "q_multimodal_audio" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (lit(50) + col("doc_id") % 100).as("nf"), lit(8000).as("rate"))
      Multimodal.decodeAudioFeatures(
          Multimodal.attachGeneratedWav(docs, "doc_id", "nf", "rate"), "doc_id")
        .orderBy("doc_id")
    },

    "q_multimodal_frames" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Multimodal.frameSample(
          Multimodal.attachBinary(docs, "text"), "doc_id",
          frameBytes = 16, stride = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // REAL video decode (pure-JVM Y4M parse — r5's last remaining stub):
    // deterministic uncompressed C420 videos generated from
    // (w, h, n_frames, seed=doc_id), decoded back to dims/framerate/frame
    // count/luma checksum the oracle recomputes from the parameters alone
    "q_multimodal_video" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (lit(8) + (col("doc_id") % 8) * 2).as("w"),
          (lit(8) + ((col("doc_id") * 3) % 8) * 2).as("h"),
          (lit(3) + col("doc_id") % 5).as("nf"))
      Multimodal.decodeVideoFeatures(
          Multimodal.attachGeneratedY4m(docs, "doc_id", "w", "h", "nf"), "doc_id")
        .orderBy("doc_id")
    },

    // video frame sampling by OFFSET SEEK (fixed frame size -> jump to
    // every 2nd frame, read one luma plane, skip the rest of the payload)
    "q_multimodal_video_frames" -> { (spark, sfDir) =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          (lit(8) + (col("doc_id") % 8) * 2).as("w"),
          (lit(8) + ((col("doc_id") * 3) % 8) * 2).as("h"),
          (lit(3) + col("doc_id") % 5).as("nf"))
      Multimodal.videoFrameSample(
          Multimodal.attachGeneratedY4m(docs, "doc_id", "w", "h", "nf"),
          "doc_id", stride = 2)
        .orderBy("doc_id", "frame_idx")
    },

    // Hive-style partitioned layout: write events partitioned by event_type,
    // read back with a partition predicate. Correctness (vs an unpartitioned
    // oracle scan) is checked here; the PLAN property — the scan listing
    // only the one partition directory (PartitionFilters, not a data
    // filter) — is asserted in PartitionedLayoutSpec. At 100 TB this is the
    // difference between scanning one event type and scanning the corpus.
    "q_partitioned_read" -> { (spark, sfDir) =>
      // partitioned copy written once per (JVM, sfDir) — repeated bench
      // invocations measure the partition-pruned READ, not the write, and
      // don't leak a fresh temp dir per call
      val dir = partitionedEventsDir.computeIfAbsent(sfDir, { _ =>
        val ev = new graft.etl.Catalog(spark, sfDir).table("events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            graft.functions.TimeCols.usec(col("ts")).as("us"))
        val d = java.nio.file.Files.createTempDirectory("graft-part").toString
        ev.write.partitionBy("event_type").parquet(s"$d/events_by_type")
        d
      })
      spark.read.parquet(s"$dir/events_by_type")
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"),
          col("event_type").cast("string").as("event_type"))
        .orderBy("event_id")
    },

    // Salting changes the partitioning, never the result — so the oracle is
    // the PLAIN join: if the salted join added/lost/duplicated a row, the
    // hash compare would catch it.
    "q_skew_join" -> { (spark, sfDir) =>
      val cat = new graft.etl.Catalog(spark, sfDir)
      val li = cat.table("lineitem").select("l_orderkey", "l_extendedprice")
      val ord = cat.table("orders").select("o_orderkey", "o_orderpriority")
      graft.operators.SkewJoin.saltedJoin(li, ord, "l_orderkey", "o_orderkey", buckets = 8)
        .groupBy("o_orderpriority")
        .agg(count("*").as("n"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("price_cents"))
        .orderBy("o_orderpriority")
    },

    "q_stream_session_batch" -> { (spark, sfDir) =>
      // events.ts is TIMESTAMP(NANOS) parquet — must go through the
      // Catalog/ParquetSource path, which rewrites it to µs TimestampType
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .select(col("user_id"), col("ts"))
      Sessions.sessionAgg(ev, "30 minutes")
        .select(col("user_id"),
          graft.functions.TimeCols.usec(col("session_start")).as("start_us"),
          graft.functions.TimeCols.usec(col("session_end")).as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    },

    // the streaming tumbling-count aggregation, batch-replayed: identical
    // code path as readStream (watermark is a no-op on a batch input);
    // epoch-aligned 10-minute windows are pure SQL for the oracle
    "q_stream_windowed_counts" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .select(col("ts"), col("event_type"))
      Sessions.windowedCounts(ev, "10 minutes", "1 hour")
        .select(graft.functions.TimeCols.usec(col("window_start")).as("window_start_us"),
          col("event_type"), col("n"))
        .orderBy("window_start_us", "event_type")
    },

    // the stream-stream interval join, batch-replayed: view→click
    // attribution within 2 hours per user (user subset keeps the pair
    // volume bounded at bench scale)
    "q_stream_interval_join" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .where(col("user_id") < 200)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      Sessions.intervalJoin(views, clicks, "user_id", "ts", "2 HOURS",
          leftPayload = Seq("view_id"), rightPayload = Seq("click_id"))
        .select(col("user_id"), col("view_id"), col("click_id"),
          graft.functions.TimeCols.usec(col("l_ts")).as("view_us"),
          graft.functions.TimeCols.usec(col("r_ts")).as("click_us"))
        .orderBy("user_id", "view_id", "click_id")
    },

    // the mapGroupsWithState sessionizer, batch-replayed: in batch mode each
    // user's full history arrives in ONE group invocation, so the emitted
    // update is the user's LAST session — which the oracle reproduces by
    // ingest-time streaming dedup, batch-replayed: every 3rd event is
    // injected as a duplicate, the operator must collapse them exactly
    "q_stream_dedup" -> { (spark, sfDir) =>
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .select("event_id", "ts", "event_type")
      val dupped = ev.unionByName(ev.where(col("event_id") % 3 === 0))
      Sessions.streamingDedup(dupped, Seq("event_id"), "ts", "1 hour")
        .select("event_id").orderBy("event_id")
    },

    // picking the latest session of the gap-split grouping (the same
    // grouping q_sql_sessionize / q_stream_session_batch verify)
    "q_stream_stateful_sessions" -> { (spark, sfDir) =>
      import spark.implicits._
      implicit val s: SparkSession = spark
      val ev = new graft.etl.Catalog(spark, sfDir).table("events")
        .select(col("user_id"), col("event_id"), graft.functions.TimeCols.usec(col("ts")).as("us"))
        .as[Sessions.SessionEvent]
      Sessions.statefulSessions(ev, 1800000000L).toDF()
        .orderBy("user_id")
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q_multimodal_decode" ->
      s"""WITH b AS (SELECT doc_id,
         |  list_transform(generate_series(1, length(text)), i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bs
         |FROM documents)
         |SELECT doc_id,
         |  CAST(len(bs) AS BIGINT) AS n_bytes,
         |  CAST(len(bs) % 251 AS BIGINT) AS width,
         |  CAST((len(bs) * 31) % 251 AS BIGINT) AS height,
         |  CAST(list_sum(bs) AS BIGINT) % $P AS checksum,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), bs), (a, x) -> (a * 31 + x) % $P) AS phash
         |FROM b ORDER BY doc_id""".stripMargin,

    // width/height/checksum recomputed from the PNG generator's parameters:
    // pixel (x,y) = (x*31 + y*17 + doc_id*13) % 256 in all three channels
    "q_multimodal_image" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(8 + doc_id % 16 AS INT) AS w,
        |             CAST(8 + (doc_id * 3) % 16 AS INT) AS h
        |           FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 * list_sum(list_transform(generate_series(0, w - 1), x ->
        |    list_sum(list_transform(generate_series(0, h - 1), y ->
        |      (x*31 + y*17 + doc_id*13) % 256)))) AS BIGINT) AS checksum
        |FROM d ORDER BY doc_id""".stripMargin,

    // the full aHash pipeline recomputed from generator parameters: pixel
    // g = 3·((x·31 + y·17 + seed·13 + bump) % 256), 10×6 floor-boundary
    // blocks, bit = blockSum·n >= totalSum·blockCount, pairs at
    // bit_count(xor) <= 3 — every stage integer-exact in both engines
    "q_multimodal_imagedup" ->
      """WITH d AS (SELECT doc_id, doc_id % 97 AS seed, (doc_id // 97) % 3 AS variant,
        |             CAST(8 + (doc_id % 97) % 16 AS INT) AS w,
        |             CAST(8 + ((doc_id % 97) * 3) % 16 AS INT) AS h
        |           FROM documents),
        |px AS (SELECT doc_id,
        |         3 * ((x.i*31 + y.i*17 + seed*13 +
        |               CASE WHEN (x.i*7 + y.i*11) % 13 = 0 THEN variant*5 ELSE 0 END) % 256) AS g,
        |         (y.i * 6 // h) * 10 + (x.i * 10 // w) AS b
        |       FROM d,
        |            unnest(generate_series(0, CAST(w - 1 AS BIGINT))) AS x(i),
        |            unnest(generate_series(0, CAST(h - 1 AS BIGINT))) AS y(i)),
        |blk AS (SELECT doc_id, b, sum(g) AS bs, count(*) AS bc FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(g) AS ts, count(*) AS n FROM px GROUP BY 1),
        |hs AS (SELECT blk.doc_id,
        |         CAST(sum(CASE WHEN bs * n >= ts * bc
        |                       THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS ahash
        |       FROM blk JOIN tot ON blk.doc_id = tot.doc_id GROUP BY blk.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // every hash from the WAV-variant generator's parameters: sample i =
    // ((i*31 + seed*13 + [i%17=0]·variant*3) % 65536) − 32768, windows
    // i*60//nf, bit = window mean |s| ≥ global mean (cross-multiplied)
    "q_multimodal_audiodup" ->
      """WITH d AS (SELECT doc_id, doc_id % 89 AS seed, (doc_id // 89) % 3 AS variant,
        |             CAST(100 + doc_id % 89 AS INT) AS nf
        |           FROM documents),
        |sm AS (SELECT doc_id,
        |         abs(((i.i*(257 + seed*97) + seed*13 +
        |               CASE WHEN i.i % 17 = 0 THEN variant*3 ELSE 0 END) % 65536) - 32768) AS g,
        |         i.i * 60 // nf AS b
        |       FROM d, unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS i(i)),
        |blk AS (SELECT doc_id, b, sum(g) AS bs, count(*) AS bc FROM sm GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(g) AS ts, count(*) AS n FROM sm GROUP BY 1),
        |hs AS (SELECT blk.doc_id,
        |         CAST(sum(CASE WHEN bs * n >= ts * bc
        |                       THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS audio_hash
        |       FROM blk JOIN tot ON blk.doc_id = tot.doc_id GROUP BY blk.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.audio_hash, b.audio_hash)) AS BIGINT) AS hamming
        |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.audio_hash, b.audio_hash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // rate/channels/frames from the WAV generator's parameters; checksum =
    // Σ over frames of ((i*31 + doc_id*13) % 65536) - 32768
    "q_multimodal_audio" ->
      """WITH d AS (SELECT doc_id, CAST(50 + doc_id % 100 AS INT) AS nf FROM documents)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(generate_series(0, nf - 1), i ->
        |    ((i*31 + doc_id*13) % 65536) - 32768)) AS BIGINT) AS checksum
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_multimodal_frames" ->
      s"""WITH t AS (SELECT doc_id, text, length(text) // 16 AS nf FROM documents),
         |f AS (SELECT doc_id, text,
         |        unnest(generate_series(0, CAST(nf - 1 AS BIGINT), 2)) AS frame_idx
         |      FROM t)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  CAST(list_sum(list_transform(
         |    generate_series(CAST(frame_idx * 16 + 1 AS INTEGER), CAST(frame_idx * 16 + 16 AS INTEGER)),
         |    i -> ord(substr(text, i, 1)))) AS BIGINT) % $P AS f_checksum
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // every feature from the Y4M generator's parameters: luma pixel
    // (x, y, frame f) = (x*31 + y*17 + f*7 + doc_id*13) % 256
    "q_multimodal_video" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(8 + (doc_id % 8) * 2 AS INT) AS w,
        |             CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS h,
        |             CAST(3 + doc_id % 5 AS INT) AS nf
        |           FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(25 AS BIGINT) AS fps_num, CAST(1 AS BIGINT) AS fps_den,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(generate_series(0, nf - 1), f ->
        |    list_sum(list_transform(generate_series(0, w - 1), x ->
        |      list_sum(list_transform(generate_series(0, h - 1), y ->
        |        (x*31 + y*17 + f*7 + doc_id*13) % 256)))))) AS BIGINT) AS luma_checksum
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_multimodal_video_frames" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(8 + (doc_id % 8) * 2 AS INT) AS w,
        |             CAST(8 + ((doc_id * 3) % 8) * 2 AS INT) AS h,
        |             CAST(3 + doc_id % 5 AS INT) AS nf
        |           FROM documents),
        |f AS (SELECT doc_id, w, h,
        |        unnest(generate_series(0, CAST(nf - 1 AS BIGINT), 2)) AS frame_idx
        |      FROM d)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(list_sum(list_transform(generate_series(0, w - 1), x ->
        |    list_sum(list_transform(generate_series(0, h - 1), y ->
        |      (x*31 + y*17 + frame_idx*7 + doc_id*13) % 256)))) AS BIGINT) AS luma_checksum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q_partitioned_read" ->
      s"""SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
         |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_skew_join" ->
      s"""SELECT o.o_orderpriority, count(*) AS n,
         |       CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,

    "q_stream_session_batch" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |s AS (SELECT user_id, event_id, us,
         |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |g AS (SELECT user_id, us,
         |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
         |      FROM s)
         |SELECT user_id, CAST(min(us) AS BIGINT) AS start_us,
         |       CAST(max(us) + 1800000000 AS BIGINT) AS end_us,
         |       count(*) AS n_events
         |FROM g GROUP BY user_id, sess ORDER BY user_id, start_us""".stripMargin,

    "q_stream_interval_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |           FROM events WHERE user_id < 200),
        |v AS (SELECT user_id, event_id AS view_id, us AS view_us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, us AS click_us FROM e WHERE event_type = 'click')
        |SELECT v.user_id AS user_id, view_id, click_id, view_us, click_us
        |FROM v JOIN c ON v.user_id = c.user_id
        | AND click_us > view_us AND click_us <= view_us + 7200000000
        |ORDER BY v.user_id, view_id, click_id""".stripMargin,

    "q_stream_windowed_counts" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT CAST((us // 600000000) * 600000000 AS BIGINT) AS window_start_us,
        |       event_type, count(*) AS n
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT event_id FROM events ORDER BY event_id""",

    "q_stream_stateful_sessions" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |s AS (SELECT user_id, event_id, us,
         |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |                  >= 1800000000 THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |g AS (SELECT user_id, us,
         |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
         |      FROM s),
         |sessions AS (SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
         |                    CAST(max(us) AS BIGINT) AS session_end_us,
         |                    count(*) AS n_events
         |             FROM g GROUP BY user_id, sess),
         |last AS (SELECT user_id, max(session_start_us) AS mx FROM sessions GROUP BY user_id)
         |SELECT s.user_id, s.session_start_us, s.session_end_us, s.n_events
         |FROM sessions s JOIN last l ON s.user_id = l.user_id AND s.session_start_us = l.mx
         |ORDER BY s.user_id""".stripMargin
  )
}
