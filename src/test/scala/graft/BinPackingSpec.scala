package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** [[Packing.packBestFitDecreasing]] — validity (nothing lost, no pack
  * over budget, oversize isolated), determinism, and the efficiency
  * contract vs the in-order window packer. A scala-side best-fit
  * reference recomputes the exact assignment for one shard. */
class BinPackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Int, shards: Int) =
    Packing.packBestFitDecreasing(
      rows.toDF("id", "tokens"), "id", "tokens", budget, shards)

  test("validity: totals preserved, no pack over budget, oversize isolated") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 997 == 0) 700L else rnd.nextInt(256).toLong))
    val out = pack(rows, budget = 512, shards = 8).localCheckpoint()
    assert(out.count() == 3000L)
    assert(out.agg(sum("tokens")).as[Long].head() == rows.map(_._2).sum)
    val packs = out.groupBy("shard", "pack_id")
      .agg(sum("tokens").as("pt"), count(lit(1)).as("n"))
    // Oversize docs (700 > 512) sit alone; all other packs fit.
    assert(packs.filter(col("pt") > 512 && col("n") > 1).count() == 0L)
    // Shard assignment is id-determined.
    assert(out.filter(pmod(col("id"), lit(8L)) =!= col("shard")).count() == 0L)
  }

  test("matches a sequential best-fit-decreasing reference on one shard") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 400L).map(i => (i, 1L + rnd.nextInt(100).toLong))
    val budget = 128
    val got = pack(rows, budget, shards = 1)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // Reference: same order, best-fit = smallest sufficient residual,
    // tie to lowest pack id.
    val residual = scala.collection.mutable.ArrayBuffer[Long]()
    val expect = scala.collection.mutable.Map[Long, Long]()
    rows.sortBy { case (id, t) => (-t, id) }.foreach { case (id, t) =>
      val fits = residual.zipWithIndex.filter(_._1 >= t)
      if (fits.isEmpty) { residual += (budget - t); expect(id) = residual.size - 1L }
      else {
        val (_, bin) = fits.minBy { case (r, b) => (r, b) }
        residual(bin) -= t; expect(id) = bin.toLong
      }
    }
    assert(got == expect.toMap)
  }

  test("deterministic across runs; near-optimal whole-doc packing") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 5000L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    val a = pack(rows, 512, 8).orderBy("id").collect().toSeq
    val b = pack(rows, 512, 8).orderBy("id").collect().toSeq
    assert(a == b, "rerun must be bit-identical")
    val bfd = pack(rows, 512, 8)
      .select("shard", "pack_id").distinct().count()
    val totalTokens = rows.map(_._2).sum
    val lower = math.ceil(totalTokens / 512.0).toLong
    assert(bfd >= lower, s"BFD packs $bfd below the token lower bound $lower")
    // Whole-doc packing can't hit the split-docs bound exactly, but BFD
    // should stay within a few percent of it (deterministic workload).
    val utilization = totalTokens.toDouble / (bfd * 512.0)
    assert(utilization >= 0.97, s"utilization $utilization")
    // And it must clearly beat naive one-doc-per-pack or next-fit-in-id
    // -order style waste: a scala next-fit reference per shard.
    val nf = rows.groupBy { case (id, _) => id % 8 }.map { case (_, docs) =>
      var bins = 0L; var room = 0L
      docs.sortBy(_._1).foreach { case (_, t) =>
        if (t <= room) room -= t else { bins += 1; room = 512L - math.min(t, 512L) }
      }
      bins
    }.sum
    assert(bfd <= nf, s"BFD packs $bfd worse than next-fit $nf")
  }
}
