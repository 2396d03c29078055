package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one primitive the lock/lease and versioned-manifest protocols
  * rest on: CREATE-EXCLUSIVE that is actually atomic.
  *
  * Hadoop's `FileSystem.create(path, overwrite = false)` is atomic on
  * HDFS (namenode-side) but on `RawLocalFileSystem` it is CHECK-THEN-ACT
  * — `exists()` followed by an open — so two local contenders can both
  * pass the check and both believe they won (surfaced by the four-writer
  * merge soak: two lease holders, interleaved stage-and-swaps,
  * FAILED_READ_FILE). For the `file` scheme this delegates to
  * `java.nio.file.Files.createFile`, which is POSIX `O_CREAT|O_EXCL` —
  * atomic at the kernel. Other schemes keep `fs.create(overwrite =
  * false)` (atomic on HDFS/ABFS; raw S3 needs an external coordinator
  * for this, the same caveat Delta documents for its S3 LogStore). */
private[graft] object FsAtomic {

  /** Atomically create `path` with `content`; false if it already
    * exists (or the race was lost).
    *
    * CONTENT is atomic too on the `file` scheme: the bytes are written
    * to a same-directory temp file first and `link(2)`'d into place —
    * EEXIST arbitrates the race exactly like O_EXCL, and a reader can
    * never observe the file existing with partial content (a
    * create-then-write sequence has a window where a racing
    * `parseManifest` would read a TORN manifest and, e.g., silently
    * drop deletion-vector entries). Non-local schemes keep
    * `fs.create(overwrite = false)` — content there is not atomic, so
    * manifest READERS must fail closed on incomplete JSON (they do:
    * [[graft.operators.Versioned.parseManifest]]). */
  def createExclusive(fs: FileSystem, path: Path, content: String): Boolean = {
    val scheme = Option(path.toUri.getScheme)
      .getOrElse(fs.getUri.getScheme)
    if (scheme == null || scheme == "file") {
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
    } else {
      try {
        val out = fs.create(path, false)
        out.writeBytes(content)
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }
}
