package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash.P

/** Multimodal-column pipeline plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct, and decode/feature-extract
  * runs as a per-partition batch pass. Extension scope beyond the reference.
  *
  * IMAGE, AUDIO, and VIDEO decode are REAL, via pure-JVM paths (no
  * external jars): [[ImageDecoder]] drives `javax.imageio`
  * (PNG/JPEG/BMP/GIF → width/height/pixel-checksum), [[AudioDecoder]]
  * drives `javax.sound.sampled` (WAV/AIFF/AU → rate/channels/frames/
  * sample-checksum), and [[VideoDecoder]] parses the uncompressed Y4M
  * container (YUV4MPEG2 → dims/framerate/frame-count/luma-checksum, plus
  * offset-seek frame sampling) — the same decoder shape as the WAV path:
  * header parse, fixed-size payload walk, integer-exact features. Corrupt
  * payloads surface as null features in every modality. Compressed video
  * codecs (H.264 etc.) don't ship in the JDK; [[DecoderStub]] remains as
  * the documented swap-in point for an ffmpeg-style library, computing
  * deterministic integer features from raw bytes meanwhile. Everything
  * AROUND the codecs is the real 100 TB design and is what's tested:
  *
  *   - storage layout: `content: binary` + `media_meta: struct` columns in
  *     parquet (the parquet-binary/Petastorm shape — media inlined with
  *     scalars so one scan feeds both);
  *   - decode runs via `mapPartitions` with ONE decoder init per partition
  *     (the per-partition-model-load pattern — at scale the init is an
  *     expensive codec/model handle you must not pay per row);
  *   - the row iterator stays lazy — partitions stream through the decoder
  *     without materializing the partition in memory;
  *   - frame sampling slices the binary without copying the full payload
  *     per frame.
  *
  * To swap in a real decoder, implement [[FeatureCodec]] +
  * [[CodecFactory]] and pass the factory to [[decodeFeatures]] — bytes
  * in, fixed-width features out (None = undecodable → null features),
  * handle opened once per partition. CodecSeamSpec registers a fake
  * codec against the seam so the contract can't silently rot.
  */
object Multimodal {

  /** Attach the binary payload + metadata struct for a text-derived fake
    * "image": content = UTF-8 bytes of `textCol`. Stands in for reading
    * real media; the downstream plumbing treats it as opaque bytes.
    */
  def attachBinary(df: DataFrame, textCol: String,
                   modality: String = "image"): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(modality).as("modality"),
        lit(s"$modality/fake").as("mime"),
        length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes")))

  /** THE CODEC SEAM — the one interface a real compressed-codec build
    * (H.264, JPEG2000, a vision model) implements to slot into the
    * feature pipeline: bytes in, fixed-width integer features out, None
    * for an undecodable payload (surfaced as null features — one corrupt
    * blob must never fail a 100 TB stage). Implementations need not be
    * thread-safe: each partition gets its own instance from the factory.
    */
  trait FeatureCodec {
    def decode(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)]
  }

  /** Ships to executors; `open()` runs ONCE PER PARTITION — the place for
    * the expensive init (loading libjpeg/ffmpeg, mmapping a model). */
  trait CodecFactory extends Serializable {
    def open(): FeatureCodec
  }

  /** The stubbed codec. `open()` is the expensive once-per-partition init
    * (a real build would load libjpeg/ffmpeg/a vision model here).
    */
  final class DecoderStub private () extends FeatureCodec {
    /** Deterministic integer features of a byte payload — a stand-in for
      * real decode+feature-extract. (A real implementation would return
      * pixels/frames; this returns arithmetic the oracle can reproduce.)
      */
    def decode(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
      val n = bytes.length.toLong
      var checksum = 0L
      var phash = 0L
      var i = 0
      while (i < bytes.length) {
        val b = (bytes(i) & 0xff).toLong
        checksum = (checksum + b) % P
        phash = (phash * 31L + b) % P
        i += 1
      }
      val width = n % 251L
      val height = (n * 31L) % 251L
      Some((n, width, height, checksum, phash))
    }
  }
  object DecoderStub extends CodecFactory {
    def open(): DecoderStub = new DecoderStub() // per-partition init point
  }

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("checksum", LongType, nullable = true),
    StructField("phash", LongType, nullable = true)))

  // ---- real image decode (javax.imageio — ships in the JDK) --------------

  /** Real PNG/JPEG/BMP/GIF decode. `open()` is the once-per-partition init
    * (disables ImageIO's temp-file cache — executors decode in memory).
    * Payloads ImageIO does not recognize decode to None; callers surface
    * null features rather than failing the batch (a 100 TB media corpus
    * always contains corrupt blobs — one bad file must not kill a stage).
    */
  final class ImageDecoder private () {
    javax.imageio.ImageIO.setUseCache(false)

    /** The decoded image itself, or None for anything ImageIO rejects.
      * NonFatal, not just IOException: ImageIO throws RuntimeExceptions
      * (NegativeArraySize, CMMException, IndexOutOfBounds) on malformed
      * headers/profiles — a corrupt blob must decode to None, not fail
      * the task deterministically on every retry. */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img)
    }

    /** (width, height, checksum) where checksum = Σ over pixels of
      * (R + G + B) — integer-exact, reproducible by an oracle from the
      * generator parameters of a synthetic image. */
    def decode(bytes: Array[Byte]): Option[(Long, Long, Long)] =
      decodeImage(bytes).map { im =>
        val w = im.getWidth
        val h = im.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (w.toLong, h.toLong, sum)
      }
  }
  object ImageDecoder {
    def open(): ImageDecoder = new ImageDecoder() // per-partition init point
  }

  /** Deterministic grayscale PNG: pixel (x,y) carries value
    * v = (x·31 + y·17 + seed·13) mod 256 in all three channels. PNG is
    * lossless, so a decode recovers exactly these values — the oracle can
    * reproduce width/height/checksum from (w, h, seed) without ever seeing
    * the bytes. */
  def makePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 31L + y * 17L + seed * 13L) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic grayscale PNG with a variant perturbation: pixel (x,y)
    * carries v = (x·31 + y·17 + seed·13 + bump) mod 256 in all three
    * channels, where bump = variant·5 on the sparse lattice
    * (x·7 + y·11) mod 13 = 0 and 0 elsewhere. Images sharing (w, h, seed,
    * variant) are identical; across variants of one seed only ~8% of
    * pixels move slightly — a controlled near-duplicate image family whose
    * pixels the oracle reproduces from the parameters alone. */
  def makePngVariant(w: Int, h: Int, seed: Long, variant: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bump = if ((x * 7L + y * 11L) % 13L == 0L) variant * 5L else 0L
        val v = ((x * 31L + y * 17L + seed * 13L + bump) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a generated variant PNG per row ([[makePngVariant]] of the
    * row's dims/seed/variant columns); generation runs on the executors. */
  def attachGeneratedPngVariant(df: DataFrame, idCol: String, wCol: String,
                                hCol: String, seedCol: String,
                                variantCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType),
        col(wCol).cast(IntegerType), col(hCol).cast(IntegerType),
        col(seedCol).cast(LongType), col(variantCol).cast(LongType)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0),
          makePngVariant(r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      })
    spark.createDataFrame(rdd, schema)
  }

  /** 60-bit average-hash (aHash) of a decoded image: per-pixel grayscale
    * g = R + G + B, a 10×6 grid of blocks with floor boundaries
    * (bx = ⌊x·10/w⌋, by = ⌊y·6/h⌋), bit by·10+bx set iff the block's mean
    * is ≥ the global mean — compared integer-exactly by cross-
    * multiplication (blockSum·nPixels ≥ totalSum·blockPixels), so the hash
    * is bit-identical across engines and platforms. 60 bits keeps every
    * value positive in a signed 64-bit int (the [[graft.functions.PortableHash]]
    * convention — shifts and xor stay sign-safe in both engines).
    * Uniform brightness shifts move block and global means together, so
    * the hash is invariant to them — the property that makes it a
    * NEAR-duplicate detector rather than a checksum. */
  def aHash60(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val bs = new Array[Long](60)
    val bc = new Array[Long](60)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 6 / h
      var x = 0
      while (x < w) {
        val rgb = im.getRGB(x, y)
        val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
        val b = by * 10 + x * 10 / w
        bs(b) += g
        bc(b) += 1
        total += g
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hash = 0L
    var i = 0
    while (i < 60) {
      if (bc(i) > 0 && bs(i) * n >= total * bc(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  private val aHashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = true)))

  /** Perceptual hash per image: real decode ([[ImageDecoder]], one init per
    * partition) → [[aHash60]]. Unrecognized payloads hash to null — feed
    * the result to [[Dedup.hammingPairs]], which drops nulls before
    * banding. */
  def imageAHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = ImageDecoder.open() // once per partition, NOT per row
        iter.map { r =>
          decoder.decodeImage(r.getAs[Array[Byte]](1)) match {
            case Some(im) => Row(r.getLong(0), aHash60(im))
            case None => Row(r.getLong(0), null)
          }
        }
      }
    spark.createDataFrame(rdd, aHashSchema)
  }

  /** Attach a generated PNG payload per row: content = [[makePng]] of the
    * row's `wCol` × `hCol` dims seeded by `idCol`. Generation runs on the
    * executors (mapPartitions), never the driver. */
  def attachGeneratedPng(df: DataFrame, idCol: String,
                         wCol: String, hCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType),
        col(wCol).cast(IntegerType), col(hCol).cast(IntegerType)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), makePng(r.getInt(1), r.getInt(2), r.getLong(0)))
      })
    spark.createDataFrame(rdd, schema)
  }

  private val imageFeatSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("checksum", LongType, nullable = true)))

  /** REAL image decode features: one [[ImageDecoder.open]] per partition,
    * lazy iteration. Unrecognized payloads yield null width/height/checksum
    * (decode failure is data, not an error, at corpus scale). */
  def decodeImageFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = ImageDecoder.open() // once per partition, NOT per row
        iter.map { r =>
          decoder.decode(r.getAs[Array[Byte]](1)) match {
            case Some((w, h, cs)) => Row(r.getLong(0), w, h, cs)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, imageFeatSchema)
  }

  // ---- real audio decode (javax.sound.sampled — ships in the JDK) --------

  /** Real WAV/AIFF/AU decode. Features: sample rate, channel count, frame
    * count, and a sample checksum — for 16-bit signed little-endian PCM
    * the sum of the signed samples (integer-exact, oracle-reproducible);
    * other encodings fall back to a raw byte sum. Unrecognized payloads
    * decode to None. */
  final class AudioDecoder private () {
    def decode(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          val frames = ais.getFrameLength
          val raw = ais.readAllBytes()
          val pcm16le = f.getSampleSizeInBits == 16 && !f.isBigEndian &&
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          var cs = 0L
          var i = 0
          if (pcm16le)
            while (i + 1 < raw.length) {
              cs += (((raw(i + 1) & 0xff) << 8) | (raw(i) & 0xff)).toShort.toLong
              i += 2
            }
          else
            while (i < raw.length) { cs += (raw(i) & 0xff).toLong; i += 1 }
          Some((f.getSampleRate.toLong, f.getChannels.toLong, frames, cs))
        } finally ais.close()
      } catch {
        // includes UnsupportedAudioFileException/IOException plus the
        // RuntimeExceptions header parsers throw on truncated payloads
        case scala.util.control.NonFatal(_) => None
      }
  }
  object AudioDecoder {
    def open(): AudioDecoder = new AudioDecoder() // per-partition init point
  }

  /** Deterministic mono 16-bit PCM WAV: frame i carries the signed sample
    * ((i·31 + seed·13) mod 65536) − 32768. PCM is lossless, so a decode
    * recovers exactly these samples — the oracle reproduces
    * frames/rate/checksum from (nFrames, sampleRate, seed) alone. */
  def makeWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((i * 31L + seed * 13L) % 65536L) - 32768L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** [[makeWav]] with a sparse sample perturbation (the audio twin of the
    * PNG `variant` knob): every 17th sample adds `variant·3` INSIDE the
    * 16-bit wrap, so rows sharing a seed but differing in variant decode
    * to nearly-identical loudness profiles — the deterministic near-dup
    * fixture for [[audioAHash]]. */
  def makeWavVariant(nFrames: Int, sampleRate: Int, seed: Long,
                     variant: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    // step 257 + seed·97 wraps the 16-bit range dozens of times per clip,
    // so each seed has its own oscillating loudness profile (a non-wrapping
    // stream would give every clip the same monotone |s| shape and make
    // all fingerprints collide)
    var i = 0
    while (i < nFrames) {
      val pert = if (i % 17 == 0) variant * 3L else 0L
      val s = (((i * (257L + seed * 97L) + seed * 13L + pert) % 65536L) - 32768L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach [[makeWavVariant]] payloads: frames/seed/variant per row,
    * generation on the executors. */
  def attachGeneratedWavVariant(df: DataFrame, idCol: String, framesCol: String,
                                rateCol: String, seedCol: String,
                                variantCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType),
        col(framesCol).cast(IntegerType), col(rateCol).cast(IntegerType),
        col(seedCol).cast(LongType), col(variantCol).cast(LongType)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), makeWavVariant(r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      })
    spark.createDataFrame(rdd, schema)
  }

  /** Attach a generated WAV payload per row: content = [[makeWav]] with
    * the row's `framesCol` frames at `rateCol` Hz, seeded by `idCol`.
    * Generation runs on the executors. */
  def attachGeneratedWav(df: DataFrame, idCol: String,
                         framesCol: String, rateCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType),
        col(framesCol).cast(IntegerType), col(rateCol).cast(IntegerType)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), makeWav(r.getInt(1), r.getInt(2), r.getLong(0)))
      })
    spark.createDataFrame(rdd, schema)
  }

  private val audioFeatSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("checksum", LongType, nullable = true)))

  /** REAL audio decode features: one [[AudioDecoder.open]] per partition,
    * lazy iteration; unrecognized payloads yield null features. */
  def decodeAudioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = AudioDecoder.open() // once per partition, NOT per row
        iter.map { r =>
          decoder.decode(r.getAs[Array[Byte]](1)) match {
            case Some((rate, ch, fr, cs)) => Row(r.getLong(0), rate, ch, fr, cs)
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, audioFeatSchema)
  }

  /** 60-bit loudness-profile hash of a mono PCM sample stream: bucket the
    * samples into 60 equal time windows (sample i → window i·60/n, the
    * [[aHash60]] binning), sum |s| per window, set bit w when the window's
    * mean magnitude is ≥ the global mean (cross-multiplied — integer-exact,
    * oracle-reproducible). The audio twin of the image average-hash: time
    * stretch/shift flips many bits, but a lightly-perturbed re-encode of
    * the same audio keeps most windows on the same side of the mean. */
  def audioAHash60(samples: Array[Int]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val bs = new Array[Long](60)
    val bc = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < n) {
      val g = math.abs(samples(i).toLong)
      val b = (i.toLong * 60L / n).toInt
      bs(b) += g
      bc(b) += 1
      total += g
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < 60) {
      if (bc(w) > 0 && bs(w) * n >= total * bc(w)) hash |= 1L << w
      w += 1
    }
    hash
  }

  private val audioHashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("audio_hash", LongType, nullable = true)))

  /** Perceptual hash per audio payload: real decode (PCM16LE mono via
    * javax.sound, one init per partition) → [[audioAHash60]]. Non-PCM16 /
    * unrecognized payloads hash to null — [[graft.operators.Dedup
    * .hammingPairs]] drops nulls before banding. Near-dup detection for an
    * audio corpus composes exactly like the image path
    * ([[imageAHash]] → hammingPairs). */
  def audioAHash(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        iter.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val hash: Any =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val f = ais.getFormat
                if (f.getSampleSizeInBits == 16 && !f.isBigEndian &&
                  f.getChannels == 1 &&
                  f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
                  val raw = ais.readAllBytes()
                  val samples = new Array[Int](raw.length / 2)
                  var i = 0
                  while (i < samples.length) {
                    samples(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toInt
                    i += 1
                  }
                  audioAHash60(samples)
                } else null
              } finally ais.close()
            } catch { case scala.util.control.NonFatal(_) => null }
          Row(r.getLong(0), hash)
        }
      }
    spark.createDataFrame(rdd, audioHashSchema)
  }

  // ---- real video decode (Y4M container — pure-JVM parse) ----------------

  /** Real YUV4MPEG2 (Y4M) decode — the uncompressed video container
    * (header "YUV4MPEG2 W.. H.. F<num>:<den> ..", then per frame a
    * "FRAME..." line and a fixed-size planar payload; C420: w·h luma +
    * 2·(w/2)·(h/2) chroma bytes). Features: width, height, framerate
    * num/den, frame count, and the summed LUMA plane over all frames
    * (integer-exact, oracle-reproducible for generated payloads).
    * Malformed magic/params/truncated frames decode to None. */
  final class VideoDecoder private () {

    /** (width, height, fpsNum, fpsDen, frameDataOffset) or None. */
    private[operators] def header(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Int)] = {
      val magic = "YUV4MPEG2"
      if (bytes.length < magic.length ||
        new String(bytes, 0, magic.length, "US-ASCII") != magic) return None
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(bytes, magic.length, nl - magic.length, "US-ASCII")
        .trim.split("\\s+").filter(_.nonEmpty)
      try {
        var w = -1; var h = -1; var fn = -1L; var fd = -1L
        params.foreach { p =>
          p.charAt(0) match {
            case 'W' => w = p.substring(1).toInt
            case 'H' => h = p.substring(1).toInt
            case 'F' =>
              val Array(n, d) = p.substring(1).split(":", 2)
              fn = n.toLong; fd = d.toLong
            case _ => // interlacing/aspect/colourspace params — irrelevant here
          }
        }
        if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) None
        else Some((w, h, fn, fd, nl + 1))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** (width, height, fps_num, fps_den, n_frames, luma_checksum).
      * All size arithmetic runs in LONG: header dims are untrusted, and a
      * corrupt Y4M declaring huge W/H must surface as None — never an Int
      * overflow that walks out of bounds or stops pos from advancing. */
    def decode(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long, Long)] =
      try header(bytes).flatMap { case (w, h, fn, fd, off) =>
        if (w % 2 != 0 || h % 2 != 0) return None // C420 needs even dims
        val frameSizeL = w.toLong * h + 2L * ((w / 2).toLong * (h / 2))
        var pos = off
        var frames = 0L
        var luma = 0L
        while (pos < bytes.length) {
          // each frame opens with a "FRAME[ params]\n" line
          if (pos + 5 > bytes.length ||
            new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
          val nl = bytes.indexOf('\n'.toByte, pos)
          // Long-domain bound: declared frame larger than the payload → None
          // (also proves frameSizeL fits in Int below)
          if (nl < 0 || nl + 1L + frameSizeL > bytes.length) return None
          var i = nl + 1
          val yEnd = i + w * h // ≤ bytes.length by the Long check above
          while (i < yEnd) { luma += (bytes(i) & 0xff).toLong; i += 1 }
          val next = nl + 1 + frameSizeL.toInt
          if (next <= pos) return None // frames are non-empty: must advance
          pos = next
          frames += 1
        }
        Some((w.toLong, h.toLong, fn, fd, frames, luma))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Luma checksum of every `stride`-th frame, BY OFFSET SEEK — our
      * generator writes bare "FRAME\n" lines, so frame f sits at
      * off + f·(6 + frameSize): the video-frame-sampling shape (jump,
      * slice one plane, never touch the frames between). Falls back to
      * None when any header line deviates (a general player would walk;
      * a sampler on fixed-layout corpora seeks). */
    def sampleFrames(bytes: Array[Byte], stride: Int): Option[Seq[(Long, Long)]] =
      try header(bytes).flatMap { case (w, h, _, _, off) =>
        if (stride < 1 || w % 2 != 0 || h % 2 != 0) return None
        // Long-domain sizes: untrusted header dims must not overflow the
        // step (a zero/negative step would divide by zero or never advance)
        val frameSizeL = w.toLong * h + 2L * ((w / 2).toLong * (h / 2))
        val stepL = 6L + frameSizeL // "FRAME\n" + payload
        val n = ((bytes.length - off) / stepL).toInt
        if (off + n * stepL != bytes.length) return None
        if (n > 0 && stepL > bytes.length - off) return None
        val out = Seq.newBuilder[(Long, Long)]
        var f = 0
        while (f < n) {
          val base = off + f * stepL.toInt // stepL ≤ payload: fits in Int
          if (new String(bytes, base, 6, "US-ASCII") != "FRAME\n") return None
          var luma = 0L
          var i = base + 6
          val yEnd = i + w * h
          while (i < yEnd) { luma += (bytes(i) & 0xff).toLong; i += 1 }
          out += ((f.toLong, luma))
          f += stride
        }
        Some(out.result())
      } catch { case scala.util.control.NonFatal(_) => None }
  }
  object VideoDecoder {
    def open(): VideoDecoder = new VideoDecoder() // per-partition init point
  }

  /** Deterministic C420 Y4M at `fpsNum`:`fpsDen`: frame f's luma pixel
    * (x, y) = (x·31 + y·17 + f·7 + seed·13) mod 256; chroma planes are
    * flat (f·5 + seed·11) mod 256 and (f·3 + seed·7) mod 256. Y4M is
    * uncompressed, so a decode recovers exactly these values — the oracle
    * reproduces every feature from (w, h, nFrames, seed) alone. Dims must
    * be even (C420 subsampling). */
  def makeY4m(w: Int, h: Int, nFrames: Int, seed: Long,
              fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims: ${w}x$h")
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes("US-ASCII")
    val frameSize = w * h + 2 * ((w / 2) * (h / 2))
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (6 + frameSize))
    out.write(header)
    var f = 0
    while (f < nFrames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out.write(((x * 31L + y * 17L + f * 7L + seed * 13L) % 256L).toInt)
          x += 1
        }
        y += 1
      }
      val u = ((f * 5L + seed * 11L) % 256L).toInt
      val v = ((f * 3L + seed * 7L) % 256L).toInt
      val cp = (w / 2) * (h / 2)
      var i = 0
      while (i < cp) { out.write(u); i += 1 }
      i = 0
      while (i < cp) { out.write(v); i += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Attach a generated Y4M payload per row ([[makeY4m]] of the row's
    * dims/frame-count, seeded by the id); generation runs on executors. */
  def attachGeneratedY4m(df: DataFrame, idCol: String, wCol: String,
                         hCol: String, framesCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType),
        col(wCol).cast(IntegerType), col(hCol).cast(IntegerType),
        col(framesCol).cast(IntegerType)).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), makeY4m(r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(0)))
      })
    spark.createDataFrame(rdd, schema)
  }

  private val videoFeatSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("fps_num", LongType, nullable = true),
    StructField("fps_den", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("luma_checksum", LongType, nullable = true)))

  /** REAL video (Y4M) decode features: one [[VideoDecoder.open]] per
    * partition, lazy iteration; unrecognized payloads yield null features. */
  def decodeVideoFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = VideoDecoder.open() // once per partition, NOT per row
        iter.map { r =>
          decoder.decode(r.getAs[Array[Byte]](1)) match {
            case Some((w, h, fn, fd, nf, cs)) => Row(r.getLong(0), w, h, fn, fd, nf, cs)
            case None => Row(r.getLong(0), null, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, videoFeatSchema)
  }

  private val videoFrameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("luma_checksum", LongType, nullable = false)))

  /** Every `stride`-th video frame's luma checksum via offset seek
    * ([[VideoDecoder.sampleFrames]]); undecodable payloads contribute no
    * rows (frame-level features of a corrupt video are not data). */
  def videoFrameSample(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = VideoDecoder.open()
        iter.flatMap { r =>
          val id = r.getLong(0)
          decoder.sampleFrames(r.getAs[Array[Byte]](1), stride)
            .getOrElse(Seq.empty)
            .map { case (f, cs) => Row(id, f, cs) }
        }
      }
    spark.createDataFrame(rdd, videoFrameSchema)
  }

  /** Decode features for every row through the [[CodecFactory]] seam:
    * one `open()` per partition, lazy row iteration (the batch shape a
    * real codec needs), undecodable payloads → null features. Input must
    * carry `idCol` and a binary `content` column. The default codec is
    * [[DecoderStub]]; a real compressed-codec build passes its own
    * factory — CodecSeamSpec pins this swap-in contract.
    */
  def decodeFeatures(df: DataFrame, idCol: String,
                     codec: CodecFactory = DecoderStub): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        val decoder = codec.open() // once per partition, NOT per row
        iter.map { r =>
          decoder.decode(r.getAs[Array[Byte]](1)) match {
            case Some((n, w, h, cs, ph)) => Row(r.getLong(0), n, w, h, cs, ph)
            case None => Row(r.getLong(0), null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, featSchema)
  }

  /** Sample every `stride`-th fixed-size frame from the binary payload —
    * the video-frame-sampling shape (slice, don't copy the whole payload).
    * Emits one row per sampled frame: (id, frame_idx, f_checksum).
    */
  def frameSample(df: DataFrame, idCol: String,
                  frameBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("f_checksum", LongType, nullable = false)))
    val rdd = df.select(col(idCol).cast(LongType), col("content")).rdd
      .mapPartitions { iter =>
        iter.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = bytes.length / frameBytes // full frames only
          (0 until nFrames by stride).iterator.map { f =>
            var cs = 0L
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) { cs = (cs + (bytes(i) & 0xff)) % P; i += 1 }
            Row(id, f.toLong, cs)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
