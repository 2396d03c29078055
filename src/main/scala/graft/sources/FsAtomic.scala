package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The coordination primitive the lock/lease and versioned-manifest
  * protocols rest on — the Delta LogStore analogue: CREATE-EXCLUSIVE
  * that is actually atomic for a given storage scheme.
  *
  * Contract: return `true` iff THIS call created `path` (winning any
  * race); `false` iff the path already existed or the race was lost.
  * On `true`, a reader that observes the path SHOULD observe the full
  * `content` — implementations that cannot guarantee content atomicity
  * (plain `fs.create`) are still safe ONLY because every manifest
  * reader fails closed on incomplete JSON
  * ([[graft.operators.Versioned.parseManifest]]). */
trait ManifestCoordinator {
  def createExclusive(fs: FileSystem, path: Path, content: String): Boolean
}

/** Scheme-dispatched [[ManifestCoordinator]] registry plus the two
  * built-in implementations.
  *
  * Hadoop's `FileSystem.create(path, overwrite = false)` is atomic on
  * HDFS (namenode-side) but on `RawLocalFileSystem` it is CHECK-THEN-ACT
  * — `exists()` followed by an open — so two local contenders can both
  * pass the check and both believe they won (surfaced by the four-writer
  * merge soak: two lease holders, interleaved stage-and-swaps,
  * FAILED_READ_FILE). For the `file` scheme [[LocalLinkCoordinator]]
  * uses `link(2)` — atomic at the kernel. Other schemes get
  * [[HadoopCreateCoordinator]]'s `fs.create(overwrite = false)`
  * (atomic on HDFS/ABFS).
  *
  * RAW S3 SUPPORTS NEITHER primitive THROUGH THE HADOOP API: S3A's
  * create(overwrite=false) is last-writer-wins, so concurrent writers
  * on `s3a` can BOTH believe they published the same version — exactly
  * the caveat Delta documents for its S3 LogStore. The store ITSELF
  * does offer the needed arbiter since conditional writes shipped
  * (`If-None-Match: *` on PUT): wrap the bucket client in
  * [[FsAtomic.ConditionalObjectStore]] and register a
  * [[FsAtomic.ConditionalPutCoordinator]] for `s3a` via
  * [[FsAtomic.register]] BEFORE any writer starts — it carries the
  * full serialization guarantee, including ambiguous-outcome
  * (timeout/5xx) attribution by read-back. Absent a registration,
  * single-writer discipline is the caller's responsibility. */
object FsAtomic {

  /** `file` scheme: the bytes are written to a same-directory temp
    * file first and `link(2)`'d into place — EEXIST arbitrates the
    * race exactly like O_EXCL, and a reader can never observe the file
    * existing with partial content (a create-then-write sequence has a
    * window where a racing `parseManifest` would read a TORN manifest
    * and, e.g., silently drop deletion-vector entries). */
  object LocalLinkCoordinator extends ManifestCoordinator {
    def createExclusive(fs: FileSystem, path: Path, content: String): Boolean = {
      val p = java.nio.file.Paths.get(path.toUri.getPath)
      var tmp: java.nio.file.Path = null
      try {
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        tmp = java.nio.file.Files.createTempFile(
          p.getParent, "." + p.getFileName.toString + ".", ".tmp")
        java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
        java.nio.file.Files.createLink(p, tmp) // atomic: EEXIST if present
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException =>
          // hard links unsupported on this mount (CIFS/FAT/some FUSE):
          // fall back to O_EXCL create + write — existence stays atomic
          // (the race arbiter), content does not, which is SAFE because
          // every manifest reader fails closed on incomplete JSON.
          // Without the fallback each publish would read as a lost race
          // and retry forever.
          var created = false
          try {
            java.nio.file.Files.createFile(p)
            created = true
            java.nio.file.Files.write(p, content.getBytes("UTF-8"))
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: java.io.IOException =>
              // if WE created the file but could not write its content,
              // remove it: an empty manifest left in place would occupy
              // the version slot forever (readers fail closed on it, and
              // the publish loop would slide past it — a permanently
              // poisoned version)
              if (created)
                scala.util.Try(java.nio.file.Files.deleteIfExists(p))
              false
          }
      } finally {
        if (tmp != null) java.nio.file.Files.deleteIfExists(tmp)
      }
    }
  }

  /** Non-local schemes with an atomic create-no-overwrite (HDFS, ABFS):
    * existence is the race arbiter; content is NOT atomic (readers
    * fail closed on torn JSON). Bytes go through an explicit UTF-8
    * encode — `DataOutputStream.writeBytes` would truncate every char
    * to its LOW byte, silently mojibake-ing any manifest carrying a
    * non-ASCII column name, constraint expression, or schema DDL. */
  object HadoopCreateCoordinator extends ManifestCoordinator {
    def createExclusive(fs: FileSystem, path: Path, content: String): Boolean =
      try {
        val out = fs.create(path, false)
        try out.write(content.getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  /** Client-side view of an object store offering CONDITIONAL PUT —
    * the primitive modern S3 exposes as an `If-None-Match: *`
    * precondition on PUT: create the object only if absent, arbitrated
    * ATOMICALLY server-side. Implementations adapt a concrete SDK
    * client; the contract is exactly what
    * [[ConditionalPutCoordinator]] needs and nothing more.
    *
    * `putIfAbsent` returns true iff THIS call created the object and
    * false when the precondition failed (the object existed — the race
    * was lost). It throws `IOException` ONLY for AMBIGUOUS outcomes
    * (network timeout, 5xx after the request may have been applied):
    * the put may or may not have landed, and the coordinator settles
    * the question by read-back. */
  trait ConditionalObjectStore {
    def putIfAbsent(key: String, content: Array[Byte]): Boolean
    /** The object's bytes, or None if absent. Reads-after-conditional-
      * write are strongly consistent on S3 — the contract this relies
      * on. */
    def get(key: String): Option[Array[Byte]]
  }

  /** [[ManifestCoordinator]] over a conditional-PUT object store — the
    * raw-S3 arbiter the scheme registry was built for (register it for
    * `s3a` via [[FsAtomic.register]] before any writer starts; the
    * same role Delta's S3 LogStore fills with DynamoDB, solved here
    * with the store's own precondition).
    *
    * AMBIGUITY RESOLUTION — the part a naive adapter gets wrong: when
    * the put outcome is unknown (timeout after the bytes may have been
    * applied), the slot is settled by READ-BACK. Stored bytes equal to
    * OURS = our put landed, we won; different bytes = another writer
    * holds the slot, we lost; absent = the put never applied, retry.
    * Byte-equality identifies the writer because record bytes are
    * unique per committer (fresh group UUIDs and a fresh
    * `committed_at` instant in every serialized record) — two writers
    * can never submit identical bytes for one version slot. */
  final class ConditionalPutCoordinator(
      store: ConditionalObjectStore,
      maxRetries: Int = 5) extends ManifestCoordinator {
    def createExclusive(fs: FileSystem, path: Path, content: String): Boolean = {
      val key = path.toUri.toString
      val bytes = content.getBytes("UTF-8")
      var attempt = 0
      var ambiguous = false
      while (true) {
        try {
          if (store.putIfAbsent(key, bytes)) return true
          // Precondition failed: the slot is occupied. If an earlier
          // attempt of OURS ended ambiguous, the occupant may be our
          // own put, applied server-side AFTER its read-back saw
          // nothing — misreading that as "lost" would make the caller
          // slide to the next version and COMMIT TWICE. Attribute by
          // read-back before answering.
          return ambiguous &&
            store.get(key).exists(java.util.Arrays.equals(_, bytes))
        } catch {
          case e: java.io.IOException =>
            ambiguous = true
            store.get(key) match {
              case Some(stored) =>
                return java.util.Arrays.equals(stored, bytes)
              case None =>
                attempt += 1
                if (attempt > maxRetries) throw e
                Thread.sleep(25L << math.min(attempt, 5))
            }
        }
      }
      false // unreachable
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ManifestCoordinator]()

  /** Install a coordinator for `scheme` (e.g. "s3a") — the pluggable
    * seam an object-store deployment uses to supply its external
    * arbiter. Overwrites any previous registration for the scheme. */
  def register(scheme: String, coordinator: ManifestCoordinator): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), coordinator)

  /** Remove a registered coordinator; the scheme falls back to the
    * built-in dispatch. */
  def unregister(scheme: String): Unit =
    registry.remove(scheme.toLowerCase(java.util.Locale.ROOT))

  /** The coordinator that will serve `path` on `fs` — registered
    * impl first, then the built-ins by scheme. */
  def coordinatorFor(fs: FileSystem, path: Path): ManifestCoordinator = {
    val scheme = Option(path.toUri.getScheme)
      .getOrElse(fs.getUri.getScheme)
    val key = Option(scheme).map(_.toLowerCase(java.util.Locale.ROOT)).orNull
    val registered = if (key == null) null else registry.get(key)
    if (registered != null) registered
    else if (key == null || key == "file") LocalLinkCoordinator
    else HadoopCreateCoordinator
  }

  /** Atomically create `path` with `content`; false if it already
    * exists (or the race was lost). Dispatches by scheme — see the
    * object doc for the per-scheme guarantees and the S3 caveat. */
  def createExclusive(fs: FileSystem, path: Path, content: String): Boolean =
    coordinatorFor(fs, path).createExclusive(fs, path, content)
}
