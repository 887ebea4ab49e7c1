package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest format + commit-protocol contracts:
  *   - the JSON manifest round-trips hostile content (a real parser — not
  *     field-order or bracket-free-path string hacking);
  *   - [[ConditionalPutCommit]] prevents lost updates using ONLY a
  *     conditional-put primitive (the object-store commit story, raced
  *     here against a mock store with no atomic rename at all);
  *   - the rollback id floor is history-global: ids issued by
  *     rolled-back-over versions are never reissued.
  */
class ManifestCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = new Catalog(spark, tmpDir("vtc"))

  test("manifest JSON survives file names with brackets, quotes and field-shaped text") {
    // written through the real serializer and re-read: a path containing
    // '[', '"' or a max_id-shaped substring must not corrupt the parse
    // (the old substring parser relied on none of these ever appearing)
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, """a["max_id": 999]\"x""")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", Seq((2L, "b")).toDF("k", "s"), idOrder = Seq("k"))
    // ids continue from the RECORDED floor (1), not a mis-parsed 999
    assert(VersionedTable.read(tgt, "t").agg(max("id")).head().getLong(0) == 2L)
    // field order independence: a hand-written manifest with files FIRST
    // and extra unknown fields still parses (legacy layout first, so the
    // hand-written FULL file is the version's sole artifact)
    VersionedTable.forceFullManifests(tgt, "t")
    val md = new java.io.File(s"${tgt.dirPath("t")}.__vmeta")
    val v2 = new java.io.File(md, "v2.manifest.json")
    val m = VersionedTable.readManifest(tgt, "t", 2L).get
    val reordered = s"""{"files": [${m.files.map(f => "\"" + f + "\"").mkString(", ")}],
                       | "future_field": {"nested": [1, 2]},
                       | "max_id": ${m.maxId.get}, "version": 2}""".stripMargin
    java.nio.file.Files.write(v2.toPath, reordered.getBytes("UTF-8"))
    val back = VersionedTable.readManifest(tgt, "t", 2L).get
    assert(back.files.toSet == m.files.toSet && back.maxId == m.maxId &&
      back.version == 2L)
    assert(VersionedTable.read(tgt, "t").count() == 2L)
  }

  test("conditional-put protocol: racing writers never lose an update without atomic rename") {
    // mock object store: the ONLY atomic primitive is putIfAbsent on a key
    // map (S3 If-None-Match stand-in); the manifest file write happens
    // after winning it and is deliberately NOT the arbiter
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val protocol = new ConditionalPutCommit(key => claimed.add(key))
    val tgt = freshCat()
    VersionedTable.commitProtocol.withValue(protocol) {
      VersionedTable.load(tgt, "t", Seq((0L, "base")).toDF("k", "s"),
        idOrder = Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (1 to 4).map { i =>
        Future {
          // DynamicVariable is thread-local — re-scope inside the worker
          VersionedTable.commitProtocol.withValue(protocol) {
            VersionedTable.load(tgt, "t", Seq((i.toLong, s"w$i")).toDF("k", "s"),
              idOrder = Seq("k"))
          }
        }
      }
      val committed = Await.result(Future.sequence(writers), 120.seconds)
      assert(committed.toSet.size == 4, "every writer must win a distinct version")
      assert(VersionedTable.versions(tgt, "t") == (1L to 5L))
      val head = VersionedTable.read(tgt, "t")
      assert(head.count() == 5L)
      assert(head.select("s").as[String].collect().toSet ==
        Set("base", "w1", "w2", "w3", "w4"))
    }
  }

  test("FsAtomicCommit rejects schemes outside the rename-safe allowlist by default") {
    // a store whose rename OVERWRITES (many object-store connectors) would
    // let two racing writers both believe they committed — the default
    // protocol must refuse such schemes instead of silently running the
    // weaker CAS, and accept them only after an explicit opt-in
    class MockS3Fs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "mocks3"
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new MockS3Fs
    fs.setConf(conf)
    fs.initialize(new java.net.URI("file:///"), conf)
    val dir = tmpDir("scheme-gate")
    val p = new org.apache.hadoop.fs.Path(dir, "v1.manifest.json")
    val err = intercept[IllegalStateException] {
      FsAtomicCommit.putIfAbsent(fs, p, "{}".getBytes("UTF-8"))
    }
    assert(err.getMessage.contains("ConditionalPutCommit"),
      "the rejection must point at the object-store protocol")
    assert(!new java.io.File(p.toUri.getPath).exists(),
      "a rejected commit must not publish a manifest")
    // explicit opt-in: the deployer verified the connector's rename fails
    // on an existing destination
    FsAtomicCommit.trustScheme("mocks3")
    try {
      assert(FsAtomicCommit.putIfAbsent(fs, p, "{}".getBytes("UTF-8")))
      assert(!FsAtomicCommit.putIfAbsent(fs, p, "{}".getBytes("UTF-8")),
        "a second writer must lose the CAS, not overwrite")
    } finally FsAtomicCommit.untrustScheme("mocks3")
    // and the default local scheme is unaffected
    val local = new org.apache.hadoop.fs.Path(dir, "v2.manifest.json")
      .getFileSystem(conf)
    assert(FsAtomicCommit.putIfAbsent(local,
      new org.apache.hadoop.fs.Path(dir, "v2.manifest.json"),
      "{}".getBytes("UTF-8")))
  }

  test("a connector without getScheme falls into the gate's curated rejection") {
    // Hadoop's base FileSystem.getScheme THROWS UnsupportedOperationException
    // for connectors that never override it — such a store must get the
    // gate's explanatory message (unknown rename semantics), not an opaque
    // "Not implemented"
    class NoSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String =
        throw new UnsupportedOperationException("Not implemented by NoSchemeFs")
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new NoSchemeFs
    fs.setConf(conf)
    fs.initialize(new java.net.URI("file:///"), conf)
    val p = new org.apache.hadoop.fs.Path(tmpDir("no-scheme"), "v1.manifest.json")
    val err = intercept[IllegalStateException] {
      FsAtomicCommit.putIfAbsent(fs, p, "{}".getBytes("UTF-8"))
    }
    assert(err.getMessage.contains("ConditionalPutCommit"),
      "the rejection must still point at the object-store protocol")
  }

  test("delete matching nothing commits a metadata-only version") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      idOrder = Seq("k"))
    val before = VersionedTable.files(tgt, "t", 1L).toSet
    val v2 = VersionedTable.delete(tgt, "t", col("k") === 999L)
    assert(v2 == 2L)
    assert(VersionedTable.files(tgt, "t", 2L).toSet == before,
      "a no-match delete must not stage a single byte")
    assert(VersionedTable.read(tgt, "t").count() == 2L)
  }

  test("delete rewrites only the files that contain matching rows") {
    val tgt = freshCat()
    // two appends → two disjoint file sets; the delete hits only batch 2
    VersionedTable.load(tgt, "t", (1L to 50L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    VersionedTable.load(tgt, "t", (51L to 60L).map(i => (i, s"v$i")).toDF("k", "s"),
      idOrder = Seq("k"))
    val v1Files = VersionedTable.files(tgt, "t", 1L).toSet
    val v2Files = VersionedTable.files(tgt, "t", 2L).toSet
    VersionedTable.delete(tgt, "t", col("k") === 55L)
    val v3Files = VersionedTable.files(tgt, "t", 3L).toSet
    assert(v1Files.subsetOf(v3Files),
      "files without matches must carry into the new manifest untouched")
    assert((v2Files -- v1Files -- v3Files).nonEmpty,
      "the file containing the match must be replaced")
    assert(VersionedTable.read(tgt, "t").count() == 59L)
    assert(VersionedTable.read(tgt, "t").where(col("k") === 55L).count() == 0L)
  }

  test("rollback floor is history-global: rolled-back-over ids are never reissued") {
    val tgt = freshCat()
    VersionedTable.load(tgt, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      idOrder = Seq("k"))                                     // ids 1,2
    VersionedTable.load(tgt, "t", Seq((3L, "c"), (4L, "d")).toDF("k", "s"),
      idOrder = Seq("k"))                                     // ids 3,4
    VersionedTable.rollback(tgt, "t", 1L)                     // v3 = v1's state
    VersionedTable.load(tgt, "t", Seq((5L, "e")).toDF("k", "s"),
      idOrder = Seq("k"))                                     // must get id 5, NOT 3
    val ids = VersionedTable.read(tgt, "t").select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 5L),
      s"post-rollback load must continue past the rolled-back-over ids, got $ids")
    // cross-version audit join stays unambiguous: id 3 means ONLY v2's row
    val v2ById = VersionedTable.readVersion(tgt, "t", 2L)
      .where(col("id") === 3L).select("k").as[Long].collect().toSeq
    assert(v2ById == Seq(3L))
  }
}
