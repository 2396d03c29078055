package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

import scala.util.Random

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String = {
    val p = s"/tmp/graft_layout/$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  test("z-order write preserves the data exactly") {
    val rnd = new Random(7)
    val df = Seq.fill(5000)((rnd.nextInt(1000), rnd.nextDouble() * 100, rnd.nextInt(5)))
      .toDF("a", "b", "c")
    val p = scratch("roundtrip")
    Layout.zorderWrite(df, Seq("a", "b"), p, numFiles = 8)
    val back = spark.read.parquet(p)
    assert(back.count() == 5000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("z-order keeps per-file ranges narrow on BOTH dims; single-sort only on one") {
    val rnd = new Random(42)
    // Uniform 2-d data: the adversarial case for a single-column sort.
    val df = Seq.fill(40000)((rnd.nextDouble() * 1000, rnd.nextDouble() * 1000))
      .toDF("x", "y")
    val nFiles = 16
    val pLinear = scratch("linear")
    val pZ = scratch("zorder")
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(pLinear)
    Layout.zorderWrite(df, Seq("x", "y"), pZ, numFiles = nFiles)

    def touched(path: String, dim: String, lo: Double, hi: Double): Int =
      Layout.fileRanges(spark, path, dim).count { case (_, mn, mx) => mx >= lo && mn <= hi }

    // Narrow predicate on y (the non-sort dim): the x-sorted layout
    // cannot prune at all; the z-ordered one must skip most files.
    val linearY = touched(pLinear, "y", 100.0, 150.0)
    val zY = touched(pZ, "y", 100.0, 150.0)
    assert(linearY == nFiles, s"x-sorted layout should be unprunable on y, touched $linearY")
    assert(zY <= nFiles / 2, s"z-order should prune most files on y, touched $zY of $nFiles")
    // And the z-layout still prunes on x too (a z-curve trades a little
    // x-locality for y-locality; it must beat 'touch everything').
    val zX = touched(pZ, "x", 100.0, 150.0)
    assert(zX <= nFiles / 2, s"z-order should still prune on x, touched $zX of $nFiles")
  }

  test("skewed dimension still spreads across the curve (equi-depth ranks)") {
    val rnd = new Random(11)
    // 90% of mass on one hot value of a — linear min/max scaling would
    // put the hot value in one bucket and lose all pruning on b.
    val df = Seq.fill(20000) {
      val a = if (rnd.nextDouble() < 0.9) 7.0 else rnd.nextDouble() * 1000
      (a, rnd.nextDouble() * 1000)
    }.toDF("a", "b")
    val p = scratch("skew")
    Layout.zorderWrite(df, Seq("a", "b"), p, numFiles = 16)
    val touchedB = Layout.fileRanges(spark, p, "b")
      .count { case (_, mn, mx) => mx >= 100.0 && mn <= 150.0 }
    assert(touchedB <= 8, s"skewed dim must not destroy b-pruning, touched $touchedB of 16")
  }

  test("nulls and single-dim degenerate cases round-trip") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 1.0), (2.0, null), (null, null), (3.0, 4.0)).toDF("a", "b")
    val p = scratch("nulls")
    Layout.zorderWrite(df, Seq("a", "b"), p, numFiles = 2)
    assert(spark.read.parquet(p).count() == 4)
    val p1 = scratch("onedim")
    Layout.zorderWrite(df, Seq("b"), p1, numFiles = 1)
    assert(spark.read.parquet(p1).count() == 4)
  }
}
