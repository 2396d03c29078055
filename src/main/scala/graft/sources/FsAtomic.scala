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
private[graft] trait ManifestCoordinator {
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
  * RAW S3 SUPPORTS NEITHER primitive: S3 PUT is last-writer-wins with
  * no preconditions the Hadoop API exposes, so concurrent writers on
  * `s3a` can BOTH believe they published the same version — exactly
  * the caveat Delta documents for its S3 LogStore. Running against an
  * object store requires registering an external coordinator (a
  * DynamoDB-style conditional-put table, or a bucket with
  * If-None-Match support surfaced through a custom impl) via
  * [[FsAtomic.register]] BEFORE any writer starts; absent one,
  * single-writer discipline is the caller's responsibility. */
private[graft] object FsAtomic {

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
