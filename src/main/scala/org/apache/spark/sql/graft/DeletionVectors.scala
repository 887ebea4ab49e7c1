package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** DELETION-VECTOR sidecar IO — the merge-on-read companion files of the
  * versioned layer (the Iceberg position-delete / Delta DV pattern,
  * re-derived): one sidecar per (file, commit) holding the SORTED row
  * positions deleted from that data file, applied at read time so a
  * 1-row DML on a 100 TB table commits O(row) bytes instead of
  * rewriting the file.
  *
  * On-disk format (GDV2): magic, count, then the positions as
  * DELTA-VARINT — the first position LEB128-encoded, then each gap to
  * the next (≥ 1 on sorted distinct input). Dense deletions (the common
  * bulk shape below the `dv_max_fraction` rewrite threshold) encode at
  * ~1 byte/position instead of 8, so a 10M-position vector is a ~10 MB
  * sidecar, not 80 — the cheap four-fifths of the RoaringBitmap win
  * without a bitmap dependency. GDV1 (raw big-endian longs) still
  * reads for sidecars written by earlier rounds. In-memory stays a
  * sorted long array (binary-search probes in the readers).
  *
  * Sidecars live in the table's data directory (`dv-<uuid>.dv`) and are
  * referenced from the manifest (`dvs`: relPath → (sidecar, count)), so
  * vacuum's liveness reasoning covers them like data files. They are
  * immutable once written: a later DML on the same file writes a NEW
  * merged sidecar and re-points the manifest — time travel reads each
  * version's own DV state.
  */
object DeletionVectors {

  /** Positions buffered per (task, file) before a writer spills a
    * fragment sidecar — 4M longs = 32 MB: small enough to never
    * threaten a task heap, big enough that fragments stay few and
    * chunky. ONE constant for both fragment writers (the SQL DML task
    * writer and the library probe), because the per-fragment contract
    * (sorted within a fragment) is what the commit-side merge relies on. */
  val FragmentFlushPositions: Int = 4 << 20

  private val Magic = 0x47445631  // "GDV1": count × big-endian longs
  private val Magic2 = 0x47445632 // "GDV2": count × delta-varint

  private def writeVarint(out: java.io.DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.writeByte(((v & 0x7FL) | 0x80L).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private def readVarint(in: java.io.DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  /** Write `positions` (must be sorted ascending, distinct) to `p`. */
  def write(fs: FileSystem, p: Path, positions: Array[Long]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, false)))
    try {
      out.writeInt(Magic2)
      out.writeInt(positions.length)
      var prev = 0L
      var i = 0
      while (i < positions.length) {
        writeVarint(out, positions(i) - prev) // first = absolute, then gaps
        prev = positions(i)
        i += 1
      }
    } finally out.close()
  }

  /** Read a sidecar's sorted position array (either format version). */
  /** Streaming K-WAY MERGE + dedup of already-sorted position runs —
    * the driver-side DV merge (prior DV ∪ a statement's fragment
    * sidecars, every input sorted by construction: the prior sidecar
    * wrote distinct-sorted, fragments sortWithinPartitions before the
    * spill). O(total) time and ONE output allocation, replacing the
    * concat + distinct + sort that re-sorted data already in order.
    * Duplicates across runs (a re-DELETE of an already-vectored row —
    * the probe scan skips DV filtering by design) collapse. */
  def mergeSortedRuns(runs: Seq[Array[Long]]): Array[Long] = {
    val live = runs.filter(_.nonEmpty).toArray
    if (live.isEmpty) return Array.emptyLongArray
    val total = live.iterator.map(_.length).sum
    val out = new Array[Long](total)
    var n = 0
    // entries are Array(value, runIdx, posInRun) — reused in place so
    // the merge allocates nothing per element
    val pq = new java.util.PriorityQueue[Array[Long]](live.length,
      (a: Array[Long], b: Array[Long]) => java.lang.Long.compare(a(0), b(0)))
    var i = 0
    while (i < live.length) { pq.add(Array(live(i)(0), i, 0)); i += 1 }
    var last = 0L
    while (!pq.isEmpty) {
      val e = pq.poll()
      val v = e(0)
      if (n == 0 || v != last) { out(n) = v; n += 1; last = v }
      val r = e(1).toInt
      val p = e(2).toInt + 1
      if (p < live(r).length) { e(0) = live(r)(p); e(2) = p; pq.add(e) }
    }
    if (n == total) out else java.util.Arrays.copyOf(out, n)
  }

  def read(fs: FileSystem, p: Path): Array[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p)))
    try {
      val magic = in.readInt()
      require(magic == Magic || magic == Magic2,
        s"not a graft deletion vector: $p")
      val n = in.readInt()
      require(n >= 0, s"corrupt deletion vector (count $n): $p")
      val a = new Array[Long](n)
      if (magic == Magic) {
        var i = 0
        while (i < n) { a(i) = in.readLong(); i += 1 }
      } else {
        var prev = 0L
        var i = 0
        while (i < n) {
          prev += readVarint(in)
          a(i) = prev
          i += 1
        }
      }
      a
    } finally in.close()
  }

  /** Read via a fresh FileSystem from `conf` — the executor-side entry
    * (readers carry a SerializableConfiguration, not a FileSystem). */
  def read(conf: Configuration, path: String): Array[Long] = {
    val p = new Path(path)
    read(p.getFileSystem(conf), p)
  }

  /** Per-JVM LRU of decoded sidecars — sidecars are IMMUTABLE once
    * written (a merge writes a NEW sidecar), so caching by path is
    * always sound. Bounded by DECODED BYTES, not entry count: a legal
    * DV can reach dv_max_fraction of a big file's rows (hundreds of MB
    * decoded), so an entry-count cap could pin gigabytes on a
    * long-lived executor. Oversized single vectors are returned
    * uncached rather than evicting the whole working set. */
  private val CacheMaxBytes = 256L << 20
  private var cacheBytes = 0L
  private val cache =
    new java.util.LinkedHashMap[String, Array[Long]](16, 0.75f, true)

  def readCached(conf: Configuration, path: String): Array[Long] = {
    cache.synchronized { Option(cache.get(path)) } match {
      case Some(a) => a
      case None =>
        val a = read(conf, path)
        val bytes = a.length.toLong * 8L
        if (bytes <= CacheMaxBytes / 4) cache.synchronized {
          if (!cache.containsKey(path)) {
            cacheBytes += bytes
            cache.put(path, a)
            val it = cache.entrySet().iterator()
            while (cacheBytes > CacheMaxBytes && it.hasNext) {
              cacheBytes -= it.next().getValue.length.toLong * 8L
              it.remove()
            }
          }
        }
        a
    }
  }

  /** Membership probe over a sorted position array. */
  def contains(sorted: Array[Long], pos: Long): Boolean =
    java.util.Arrays.binarySearch(sorted, pos) >= 0
}
