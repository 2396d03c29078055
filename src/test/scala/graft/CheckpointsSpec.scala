package graft

import org.apache.spark.sql.functions._
import graft.operators.{Checkpoints, Components}

/** [[Checkpoints.cap]] — the one lineage-cap primitive: localCheckpoint
  * by default, reliable `checkpoint()` under
  * `spark.graft.checkpoint.reliable=true` (cluster executor-loss
  * tolerance for long iterative runs). The cap must never change a
  * result, so both modes are run through a real iterative operator and
  * compared exactly. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("identical results in local and reliable mode; reliable mode persists to the checkpoint dir") {
    val edges = Seq((0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 4), (4, 4))
    def ranks(): Map[Int, Double] =
      Components.pageRank(edges.toDF("s", "t"), "s", "t", iterations = 6)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val local = ranks()
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", ckptDir)
    val reliable =
      try ranks()
      finally {
        spark.conf.unset("spark.graft.checkpoint.reliable")
        spark.conf.unset("spark.graft.checkpoint.dir")
      }
    assert(local.keySet == reliable.keySet)
    local.foreach { case (k, v) =>
      assert(v == reliable(k), s"node $k: $v != ${reliable(k)}") }
    // the reliable run actually wrote replicatable checkpoint data
    def rddFiles(d: java.io.File): Int =
      Option(d.listFiles()).toSeq.flatten
        .map(f => if (f.isDirectory) rddFiles(f) else 1).sum
    assert(rddFiles(new java.io.File(ckptDir)) > 0,
      s"no checkpoint data under $ckptDir")
  }

  test("cap is type-preserving for typed Datasets") {
    val ds = Seq(1, 2, 3).toDS()
    assert(Checkpoints.cap(ds).collect().sorted.toSeq == Seq(1, 2, 3))
  }
}
