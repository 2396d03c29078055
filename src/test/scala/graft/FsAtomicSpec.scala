package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.sources.{FsAtomic, ManifestCoordinator}

class FsAtomicSpec extends SparkSpec {

  private def localFs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("HadoopCreateCoordinator roundtrips non-ASCII content byte-exactly") {
    // the non-local arm (HDFS/ABFS) — exercised directly on the local
    // FS: a schema DDL / constraint / column mapping with non-ASCII
    // characters must publish verbatim (writeBytes would have written
    // the LOW byte of each char — mojibake parsed without error)
    val dir = Files.createTempDirectory("graft-atomic-utf8")
    val target = new Path(dir.toString, "m.json")
    val content = "{\"schema\":\"`prix_\u20ac` DOUBLE, `n\u00e4me` STRING\"," +
      "\"check\":\"n\u00e4me != '\u65e5\u672c\u8a9e'\"}"
    assert(FsAtomic.HadoopCreateCoordinator.createExclusive(localFs, target, content))
    val back = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, "m.json")), "UTF-8")
    assert(back == content)
    // exclusivity holds on the fs.create(overwrite=false) arm too
    assert(!FsAtomic.HadoopCreateCoordinator.createExclusive(localFs, target, "{}"))
  }

  test("scheme dispatch: file goes to the link coordinator, others to create") {
    val fs = localFs
    assert(FsAtomic.coordinatorFor(fs, new Path("file:/tmp/x")) eq
      FsAtomic.LocalLinkCoordinator)
    assert(FsAtomic.coordinatorFor(fs, new Path("/tmp/x")) eq
      FsAtomic.LocalLinkCoordinator) // scheme-less: falls back to fs scheme
    assert(FsAtomic.coordinatorFor(fs, new Path("hdfs://nn/x")) eq
      FsAtomic.HadoopCreateCoordinator)
    assert(FsAtomic.coordinatorFor(fs, new Path("s3a://bucket/x")) eq
      FsAtomic.HadoopCreateCoordinator)
  }

  test("a registered coordinator intercepts its scheme and only its scheme") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val mock = new ManifestCoordinator {
      def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
          path: Path, content: String): Boolean = {
        calls += ((path.toString, content))
        true
      }
    }
    FsAtomic.register("mock", mock)
    try {
      // the mock scheme routes to the registration — no filesystem I/O
      assert(FsAtomic.createExclusive(localFs, new Path("mock://t/0.json"), "{\"v\":0}"))
      assert(calls == Seq(("mock://t/0.json", "{\"v\":0}")))
      // the file scheme is untouched by the registration
      val dir = Files.createTempDirectory("graft-atomic-dispatch")
      val target = new Path(dir.toString, "m.json")
      assert(FsAtomic.createExclusive(localFs, target, "{\"a\":1}"))
      assert(!FsAtomic.createExclusive(localFs, target, "{\"b\":2}"))
      assert(calls.size == 1)
    } finally FsAtomic.unregister("mock")
    // after unregister the scheme falls back to the built-in dispatch
    assert(FsAtomic.coordinatorFor(localFs, new Path("mock://t/1.json")) eq
      FsAtomic.HadoopCreateCoordinator)
  }
}
