package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the compressed-codec swap-in contract ([[Multimodal.CodecFactory]]
  * / [[Multimodal.FeatureCodec]]): a third-party codec registered against
  * the seam must (1) receive every payload, (2) init once per partition —
  * never per row, (3) surface undecodable payloads as null features
  * without failing the stage, (4) produce the same schema the stub does.
  * If the production path ever stops routing through the factory, or the
  * once-per-partition shape regresses, this spec fails. */
object FakeCodec extends Multimodal.CodecFactory {
  // local-mode executors share the JVM, so static counters observe the
  // per-partition open()s and per-row decode()s directly
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); decodes.set(0) }
  def open(): Multimodal.FeatureCodec = {
    opens.incrementAndGet()
    new Multimodal.FeatureCodec {
      def decode(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
        decodes.incrementAndGet()
        // an "unsupported container": first byte 'X' → undecodable
        if (bytes.nonEmpty && bytes(0) == 'X'.toByte) None
        else Some((bytes.length.toLong, 640L, 480L, 7L, 42L))
      }
    }
  }
}

class CodecSeamSpec extends SparkSpec {
  import spark.implicits._

  test("a registered codec replaces the stub: per-partition init, null-on-undecodable") {
    FakeCodec.reset()
    val df = Multimodal.attachBinary(
      Seq((1L, "good"), (2L, "Xbad"), (3L, "also fine"), (4L, "Xnope"))
        .toDF("doc_id", "text").repartition(2), "text")
    // collect WITHOUT a sort: orderBy adds a range-sampling pass that
    // re-evaluates the decode RDD and would double the observed counts
    val out = Multimodal.decodeFeatures(df, "doc_id", FakeCodec)
      .collect().sortBy(_.getLong(0))
    // same schema as the stub path
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "checksum", "phash"))
    // decodable rows carry the codec's features verbatim
    assert(out(0).getLong(2) == 640L && out(0).getLong(3) == 480L &&
      out(0).getLong(5) == 42L)
    // undecodable rows survive as null features — the stage never fails
    assert(out(1).isNullAt(1) && out(1).isNullAt(5))
    assert(out(3).isNullAt(1))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // the seam's cost contract: one open() per partition, one decode() per row
    assert(FakeCodec.decodes.get() == 4, "every payload must reach the codec")
    assert(FakeCodec.opens.get() == 2,
      s"open() must run once per partition (2), not per row: ${FakeCodec.opens.get()}")
  }

  test("the default path still routes through the stub factory with identical features") {
    val df = Multimodal.attachBinary(Seq((7L, "abcd")).toDF("doc_id", "text"), "text")
    val viaDefault = Multimodal.decodeFeatures(df, "doc_id").head()
    val viaSeam = Multimodal.decodeFeatures(df, "doc_id", Multimodal.DecoderStub).head()
    assert(viaDefault == viaSeam)
    assert(viaDefault.getLong(1) == 4L) // n_bytes of "abcd"
  }
}
