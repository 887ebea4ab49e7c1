package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.DeletionVectors
import org.scalatest.funsuite.AnyFunSuite

/** The deletion-vector sidecar FORMAT: delta-varint (GDV2) round-trips
  * any sorted distinct position set exactly, compresses dense vectors
  * ~8×, and the GDV1 raw-long format from earlier rounds still reads. */
class DvFormatSpec extends AnyFunSuite {

  private val dir = java.nio.file.Files.createTempDirectory("dvfmt").toString
  private val fs = new Path(dir).getFileSystem(new Configuration())

  private def roundTrip(name: String, positions: Array[Long]): Unit = {
    val p = new Path(dir, s"$name.dv")
    DeletionVectors.write(fs, p, positions)
    val back = DeletionVectors.read(fs, p)
    assert(back.sameElements(positions),
      s"$name: ${back.take(5).toSeq}... != ${positions.take(5).toSeq}...")
  }

  test("delta-varint round-trips: empty, zero, dense, sparse, extremes, fuzz") {
    roundTrip("empty", Array.empty[Long])
    roundTrip("zero", Array(0L))
    roundTrip("dense", (0L until 10000L).toArray)
    roundTrip("sparse", Array(5L, 1000000L, 123456789012L))
    roundTrip("maxish", Array(0L, Long.MaxValue - 1, Long.MaxValue))
    val rnd = new scala.util.Random(20260815L)
    for (i <- 1 to 20) {
      val n = 1 + rnd.nextInt(5000)
      val set = scala.collection.mutable.SortedSet[Long]()
      while (set.size < n) set += math.abs(rnd.nextLong()) % 100000000L
      roundTrip(s"fuzz$i", set.toArray)
    }
  }

  test("dense vectors compress ~8x vs raw longs") {
    val positions = (0L until 1000000L).filter(_ % 10 != 9).toArray // 900k, gaps 1-2
    val p = new Path(dir, "compress.dv")
    DeletionVectors.write(fs, p, positions)
    val bytes = fs.getFileStatus(p).getLen
    assert(bytes < positions.length * 2L,
      s"dense DV must encode ~1 byte/position, got $bytes for ${positions.length}")
    assert(DeletionVectors.read(fs, p).sameElements(positions))
  }

  test("GDV1 (raw big-endian longs) sidecars from earlier rounds still read") {
    val positions = Array(3L, 42L, 99L, 1L << 40)
    val p = new Path(dir, "legacy.dv")
    val out = new java.io.DataOutputStream(fs.create(p, false))
    try {
      out.writeInt(0x47445631) // GDV1
      out.writeInt(positions.length)
      positions.foreach(out.writeLong)
    } finally out.close()
    assert(DeletionVectors.read(fs, p).sameElements(positions))
  }

  test("mergeSortedRuns == concat.distinct.sorted on fuzzed sorted runs") {
    val rnd = new scala.util.Random(4242)
    for (round <- 0 until 200) {
      val k = rnd.nextInt(6) // 0..5 runs
      val runs = Seq.fill(k) {
        val n = rnd.nextInt(50)
        // sorted distinct within a run; heavy overlap ACROSS runs
        Array.fill(n)(rnd.nextInt(80).toLong).distinct.sorted
      }
      val got = DeletionVectors.mergeSortedRuns(runs).toSeq
      val want = runs.flatten.distinct.sorted.toSeq
      assert(got == want, s"round $round: $got != $want (runs=$runs)")
    }
    // degenerate shapes
    assert(DeletionVectors.mergeSortedRuns(Nil).isEmpty)
    assert(DeletionVectors.mergeSortedRuns(
      Seq(Array.emptyLongArray, Array.emptyLongArray)).isEmpty)
    assert(DeletionVectors.mergeSortedRuns(
      Seq(Array(0L, 5L), Array(0L, 5L))).toSeq == Seq(0L, 5L))
    assert(DeletionVectors.mergeSortedRuns(
      Seq(Array(Long.MaxValue - 1, Long.MaxValue))).toSeq ==
      Seq(Long.MaxValue - 1, Long.MaxValue))
  }

  test("a non-DV file refuses loudly") {
    val p = new Path(dir, "junk.dv")
    val out = fs.create(p, false)
    try out.write("not a dv".getBytes) finally out.close()
    intercept[IllegalArgumentException] { DeletionVectors.read(fs, p) }
  }
}
