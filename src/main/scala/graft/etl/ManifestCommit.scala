package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit primitive under [[VersionedTable]]'s optimistic concurrency:
  * publish `bytes` at `finalPath` if and only if NO manifest exists there
  * yet, atomically — the one operation a multi-writer table format needs
  * from its store. Everything else (staging, retry, merge-against-new-head)
  * is protocol-independent and lives in [[VersionedTable]].
  *
  * Two families of stores, two implementations:
  *
  *   - [[FsAtomicCommit]] — filesystems with an atomic create-or-fail
  *     primitive: local (hard link, EEXIST is atomic) and HDFS-semantics
  *     stores (rename fails on an existing destination). This is the
  *     default and requires NOTHING beyond the Hadoop FileSystem API.
  *   - [[ConditionalPutCommit]] — object stores whose rename OVERWRITES
  *     (some connectors): rename-based CAS silently loses one of two racing
  *     commits there. The store's own conditional put (S3 If-None-Match,
  *     GCS if-generation-match, an etcd/DynamoDB lock row) must arbitrate
  *     instead; this impl takes that primitive as a function and only
  *     writes the manifest file AFTER winning it, so the file write is
  *     never the arbiter.
  *
  * (The reference has no concurrent-writer story at all — its loads are
  * sequential INSERT/UPDATE against one SQL connection,
  * /root/reference/easy_etl/__init__.py:89-99; this layer is extension
  * scope for the multi-writer lake.)
  */
trait ManifestCommit {
  /** True = this writer owns `finalPath` and the bytes are durably
    * published there; false = another writer committed first (caller
    * re-merges against the new head and retries). Any other failure
    * throws — a non-contention error must surface, not masquerade as a
    * lost race. */
  def putIfAbsent(fs: FileSystem, finalPath: Path, bytes: Array[Byte]): Boolean
}

/** Default protocol: atomic create-or-fail on the filesystem itself.
  * Local scheme uses link(2) (EEXIST is atomic — two racing writers can
  * never both win, where a rename would silently overwrite); HDFS-like
  * schemes use rename, which there fails on an existing destination. On a
  * store with OVERWRITING rename semantics this protocol is unsafe under
  * concurrent writers — use [[ConditionalPutCommit]] with the store's own
  * conditional primitive instead; the exists() pre/post checks here only
  * narrow that window, they cannot close it.
  *
  * SCHEME GATE: rather than silently running the weaker rename protocol
  * on a store whose rename overwrites (a misconfigured object-store
  * deployment would lose one of two racing commits with no error),
  * schemes outside the known fail-on-existing-rename allowlist are
  * REJECTED at commit time with a pointer at the alternatives. A
  * deployment that has verified its connector's rename semantics opts in
  * explicitly via [[FsAtomicCommit.trustScheme]]. */
object FsAtomicCommit extends ManifestCommit {

  /** Schemes whose Hadoop FileSystem rename fails (returns false) when
    * the destination exists — the property the CAS below arbitrates on.
    * `file` never reaches the rename path (it uses link(2)). */
  private val SafeSchemes = Set("file", "hdfs", "viewfs", "webhdfs", "swebhdfs")

  private val trusted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Declare `scheme`'s rename verified fail-on-existing by the deployer
    * — the explicit opt-in for stores outside the built-in allowlist. */
  def trustScheme(scheme: String): Unit = trusted.add(scheme.toLowerCase)

  /** Test seam / reconfiguration: withdraw an opt-in. */
  def untrustScheme(scheme: String): Unit = trusted.remove(scheme.toLowerCase)

  def putIfAbsent(fs: FileSystem, finalPath: Path, bytes: Array[Byte]): Boolean = {
    // Try, not Option: the base FileSystem.getScheme THROWS
    // UnsupportedOperationException for connectors that never override it —
    // such a store must fall into the gate's explanatory rejection below,
    // not die with an opaque "Not implemented"
    val scheme = scala.util.Try(fs.getScheme).toOption
      .map(_.toLowerCase).getOrElse("")
    if (!SafeSchemes.contains(scheme) && !trusted.contains(scheme))
      throw new IllegalStateException(
        s"FsAtomicCommit cannot guarantee atomic create-or-fail on scheme " +
          s"'$scheme': if its rename overwrites an existing destination, two " +
          "racing writers would both believe they committed. Use " +
          "ConditionalPutCommit with the store's own conditional primitive " +
          "(S3 If-None-Match, GCS if-generation-match, a lock row), or — " +
          "after verifying the connector's rename fails on an existing " +
          s"destination — opt in via FsAtomicCommit.trustScheme(\"$scheme\")")
    if (fs.exists(finalPath)) return false
    // stage under a uuid so concurrent writers never clobber each other's
    // tmp; strays from crashed commits die in VersionedTable.vacuum
    val tmp = new Path(finalPath.getParent,
      finalPath.getName + s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val won =
      if (scheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(finalPath.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else if (fs.exists(finalPath)) false
      else if (fs.rename(tmp, finalPath)) true
      else if (fs.exists(finalPath)) false // raced: the winner landed mid-rename
      else {
        // a rename failure with NO winning manifest is not contention —
        // quota, permissions, a vacuumed tmp. Retrying would re-stage the
        // full batch and then blame a phantom race; surface it now.
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"manifest commit rename failed (not a version conflict): $finalPath")
      }
    if (scheme == "file" || !won) fs.delete(tmp, false)
    won
  }
}

/** Object-store protocol: the caller supplies the store's conditional-put
  * primitive (`reserve(key)` → true iff this caller, uniquely and
  * atomically, claimed the key — S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, a DynamoDB/etcd lock row). The manifest FILE is
  * written only after the reservation is won, so the (non-atomic) file
  * write is never the arbiter; a crash between reservation and write
  * leaves a claimed-but-absent version that [[VersionedTable]] surfaces on
  * the next read rather than silently losing a committed update. */
final class ConditionalPutCommit(reserve: String => Boolean) extends ManifestCommit {
  def putIfAbsent(fs: FileSystem, finalPath: Path, bytes: Array[Byte]): Boolean = {
    if (!reserve(finalPath.toUri.getPath)) return false
    // a real object-store PUT is all-or-nothing (no reader ever observes a
    // partial object); model that visibility here by staging the full
    // content first and publishing with one rename — a concurrent reader
    // sees either no manifest or the complete one, never a torn write
    val tmp = new Path(finalPath.getParent,
      finalPath.getName + s".put-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!fs.rename(tmp, finalPath)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"conditional-put publish failed after winning the reservation: $finalPath")
    }
    true
  }
}
