package graft.etl

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** Sharded manifests: commit metadata must cost O(changed files), never
  * O(table). Every child version CASes a small DELTA (`vN.delta.json` —
  * added entries with zone maps, removed relPaths); full manifests are
  * advisory checkpoints written every [[VersionedTable.CheckpointEvery]]
  * versions (the Delta-log pattern: deltas are the commits, checkpoints
  * are reconstructible caches). Without this, a 1-row append on a 1M-file
  * table rewrites ~10⁷ stat entries of JSON per commit and re-parses them
  * per plan on the driver. Contracts pinned here:
  *
  *   - append CAS bytes are flat in table file count (counter-asserted
  *     through the commit protocol at 2 sizes) and a fraction of the full
  *     manifest's bytes;
  *   - the artifact layout is exact: full at v1 + checkpoint multiples,
  *     delta everywhere else;
  *   - deleting EVERY checkpoint loses nothing — the chain replays from
  *     the v1 root to a state identical to the checkpoint (field-exact
  *     Manifest equality, not just row counts);
  *   - the parsed-manifest cache answers repeat plans with ZERO artifact
  *     reads, and an append costs O(1) reads, not O(chain);
  *   - upsert (remove+add deltas), rollback and time travel round-trip
  *     across delta chains;
  *   - vacuum materializes a full checkpoint at the new floor before
  *     deleting the chain that anchored it;
  *   - a legacy all-full-manifest table keeps working and new commits on
  *     top of it go delta.
  */
class ManifestDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("mdelta"))

  private def metaFile(tgt: Catalog, name: String) =
    new java.io.File(s"${tgt.dirPath("t")}.__vmeta/$name")

  /** Append one tiny batch; returns the committed version. */
  private def append(tgt: Catalog, k: Long): Long =
    VersionedTable.load(tgt, "t", Seq((k, s"s$k")).toDF("k", "s"),
      idOrder = Seq("k"))

  /** Wrap the commit protocol to count CAS'd bytes per artifact path. */
  private final class CountingCommit extends ManifestCommit {
    val byPath = scala.collection.mutable.Map[String, Long]()
    def putIfAbsent(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = {
      byPath(p.getName) = bytes.length.toLong
      FsAtomicCommit.putIfAbsent(fs, p, bytes)
    }
  }

  test("artifact layout: full root, deltas between, checkpoints at the interval") {
    val tgt = freshCat()
    val n = (VersionedTable.CheckpointEvery + 3).toInt
    (1 to n).foreach(k => append(tgt, k.toLong))
    assert(metaFile(tgt, "v1.manifest.json").exists, "v1 is the full root")
    assert(!metaFile(tgt, "v1.delta.json").exists)
    (2 to n).foreach { v =>
      assert(metaFile(tgt, s"v$v.delta.json").exists, s"v$v must commit a delta")
      val isCkpt = v.toLong % VersionedTable.CheckpointEvery == 0L
      assert(metaFile(tgt, s"v$v.manifest.json").exists == isCkpt,
        s"full manifest at v$v iff checkpoint multiple")
    }
    // the table reads correctly through the mixed chain
    assert(VersionedTable.read(tgt, "t").count() == n.toLong)
    assert(VersionedTable.readVersion(tgt, "t", 5L).count() == 5L)
  }

  test("append CAS bytes are flat in file count and a fraction of the full manifest") {
    val counter = new CountingCommit
    def appendBytesAt(nFiles: Int): (Long, Long) = {
      val tgt = freshCat()
      (1 to nFiles).foreach(k => append(tgt, k.toLong))
      // measure the NEXT append, at a non-checkpoint version
      var v = VersionedTable.currentVersion(tgt, "t").get + 1
      while (v % VersionedTable.CheckpointEvery == 0L) { append(tgt, v); v += 1 }
      VersionedTable.commitProtocol.withValue(counter) { append(tgt, 9999L) }
      val deltaBytes = counter.byPath(s"v$v.delta.json")
      val fullBytes = VersionedTable.fullManifestBytes(tgt, "t", v)
      (deltaBytes, fullBytes)
    }
    val (small, smallFull) = appendBytesAt(8)
    val (big, bigFull) = appendBytesAt(40)
    assert(big < 4096L, s"a 1-file append's delta must stay tiny, was $big B")
    assert(big <= small * 2,
      s"append bytes grew with table size: $small B @8 files vs $big B @40 files")
    assert(bigFull > smallFull * 3,
      "sanity: the FULL manifest does grow with file count " +
        s"($smallFull B vs $bigFull B) — the delta is what stays flat")
    assert(big * 4 < bigFull,
      s"delta ($big B) must be a fraction of the full manifest ($bigFull B)")
  }

  test("deleting every checkpoint replays the chain to a field-exact state") {
    val tgt = freshCat()
    val n = (2 * VersionedTable.CheckpointEvery + 5).toInt
    (1 to n).foreach(k => append(tgt, k.toLong))
    // an upsert and a delete in the middle so deltas carry removes too
    VersionedTable.load(tgt, "t", Seq((3L, "S3")).toDF("k", "s"),
      upsertFields = Seq("k"), idOrder = Seq("k"))
    VersionedTable.delete(tgt, "t", col("k") === 7L)
    val head = VersionedTable.currentVersion(tgt, "t").get
    val before = VersionedTable.readManifest(tgt, "t", head).get
    val rowsBefore = VersionedTable.read(tgt, "t")
      .orderBy("k").select("k", "s").as[(Long, String)].collect.toSeq
    // drop EVERY full manifest except the v1 root, and the cache
    (2L to head).foreach { v =>
      val f = metaFile(tgt, s"v$v.manifest.json")
      if (f.exists) assert(f.delete())
      val crc = metaFile(tgt, s".v$v.manifest.json.crc")
      if (crc.exists) crc.delete()
    }
    VersionedTable.invalidateManifestCache()
    val after = VersionedTable.readManifest(tgt, "t", head).get
    assert(after == before, "replayed state must equal the checkpointed state " +
      "field-exactly (files, stats, sizes, nulls, rows, props, maxId)")
    val rowsAfter = VersionedTable.read(tgt, "t")
      .orderBy("k").select("k", "s").as[(Long, String)].collect.toSeq
    assert(rowsAfter == rowsBefore)
    assert(rowsAfter.exists(_ == (3L, "S3")) && !rowsAfter.exists(_._1 == 7L))
    // time travel through the replayed chain still answers
    assert(VersionedTable.readVersion(tgt, "t", 4L).count() == 4L)
  }

  test("parsed-manifest cache: repeat plans read zero artifacts; appends read O(1)") {
    val tgt = freshCat()
    (1 to 12).foreach(k => append(tgt, k.toLong))
    val head = VersionedTable.currentVersion(tgt, "t").get
    VersionedTable.readManifest(tgt, "t", head) // warm
    val r0 = VersionedTable.manReads.get()
    VersionedTable.readManifest(tgt, "t", head)
    VersionedTable.readManifest(tgt, "t", head)
    assert(VersionedTable.manReads.get() == r0,
      "re-planning an unchanged version must not re-read manifest JSON")
    // an append = parse its own new delta only (parent chain is cached)
    append(tgt, 100L)
    val r1 = VersionedTable.manReads.get()
    VersionedTable.readManifest(tgt, "t", head + 1)
    assert(VersionedTable.manReads.get() - r1 <= 1,
      "reading the new head must cost at most the new delta, not the chain")
    // cold cache: the walk is bounded by the distance to the nearest
    // checkpoint, not the table's age
    VersionedTable.invalidateManifestCache()
    val r2 = VersionedTable.manReads.get()
    VersionedTable.readManifest(tgt, "t", head + 1)
    assert(VersionedTable.manReads.get() - r2 <=
      VersionedTable.CheckpointEvery + 1)
  }

  test("parsed-manifest cache is WEIGHT-bounded by total cached file entries") {
    val tgt = freshCat()
    (1 to 10).foreach(k => append(tgt, k.toLong)) // vN references N files
    val saved = VersionedTable.manCacheMaxFiles
    try {
      VersionedTable.manCacheMaxFiles = 8L
      VersionedTable.invalidateManifestCache()
      // touching every version would cache 1+2+...+10 = 55 file entries
      // under a count-only cap; the weight bound must evict instead
      (1L to 10L).foreach(v => VersionedTable.readManifest(tgt, "t", v))
      val (n, weight) = VersionedTable.manifestCacheStats
      assert(weight <= 8L || n == 1,
        s"cache must hold <= 8 file entries total (or a single oversized " +
          s"most-recent entry); got $n manifests / $weight entries")
      assert(n >= 1, "the most-recent manifest must survive eviction")
      // reads stay correct through evictions — only the cache shrank
      assert(VersionedTable.readVersion(tgt, "t", 10L).count() == 10L)
    } finally {
      VersionedTable.manCacheMaxFiles = saved
      VersionedTable.invalidateManifestCache()
    }
  }

  test("vacuum checkpoints the new floor, then drops the chain it hung from") {
    val tgt = freshCat()
    (1 to 10).foreach(k => append(tgt, k.toLong))
    VersionedTable.vacuum(tgt, "t", keepLast = 3)
    assert(VersionedTable.versions(tgt, "t") == (8L to 10L))
    assert(metaFile(tgt, "v8.manifest.json").exists,
      "the new floor must stand alone as a full checkpoint")
    (1 to 7).foreach { v =>
      assert(!metaFile(tgt, s"v$v.delta.json").exists)
      assert(!metaFile(tgt, s"v$v.manifest.json").exists)
    }
    VersionedTable.invalidateManifestCache()
    assert(VersionedTable.read(tgt, "t").count() == 10L)
    assert(VersionedTable.readVersion(tgt, "t", 9L).count() == 9L)
    assert(VersionedTable.readManifest(tgt, "t", 5L).isEmpty,
      "vacuumed versions answer None, not a phantom chain")
    // appends continue on the vacuumed table
    append(tgt, 11L)
    assert(VersionedTable.read(tgt, "t").count() == 11L)
  }

  test("legacy all-full-manifest tables interop; new commits go delta on top") {
    val tgt = freshCat()
    (1 to 5).foreach(k => append(tgt, k.toLong))
    VersionedTable.forceFullManifests(tgt, "t")
    (1 to 5).foreach(v => assert(!metaFile(tgt, s"v$v.delta.json").exists))
    VersionedTable.invalidateManifestCache()
    assert(VersionedTable.read(tgt, "t").count() == 5L)
    val v6 = append(tgt, 6L)
    assert(metaFile(tgt, s"v$v6.delta.json").exists &&
      !metaFile(tgt, s"v$v6.manifest.json").exists,
      "a commit on a legacy table writes a delta against the full parent")
    assert(VersionedTable.read(tgt, "t").count() == 6L)
    assert(VersionedTable.readVersion(tgt, "t", 3L).count() == 3L)
  }

  test("rollback and change feeds traverse delta chains") {
    val tgt = freshCat()
    (1 to 6).foreach(k => append(tgt, k.toLong))
    val v7 = VersionedTable.rollback(tgt, "t", 3L)
    assert(VersionedTable.read(tgt, "t").count() == 3L)
    assert(metaFile(tgt, s"v$v7.delta.json").exists,
      "rollback is a normal commit: a delta removing the rolled-over files")
    // ids never reissue across the rollback (floor is history-global)
    append(tgt, 77L)
    val ids = VersionedTable.read(tgt, "t").select("id").as[Long].collect.toSet
    assert(ids.max > 6L, "the id floor must survive the rollback's delta")
  }
}
