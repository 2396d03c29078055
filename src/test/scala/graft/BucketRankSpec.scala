package graft

import org.apache.spark.sql.functions._

/** Pins the native graft_bucket_rank (binary search) to the semantics of
  * the filter-HOF formulation it replaced in the z-order layout path:
  * rank = count of edges at or below the value, duplicates counted,
  * NaN ranks 0, below-all ranks 0, at-or-above-all ranks edges.length. */
class BucketRankSpec extends SparkSpec {

  private def hofRank(xs: Seq[Double], edges: Array[Double]): Seq[Long] = {
    val arr = array(edges.map(lit(_)): _*)
    spark.createDataFrame(xs.zipWithIndex.map(_.swap))
      .toDF("i", "x").orderBy("i")
      .select(size(filter(arr, b => b <= col("x"))).cast("long"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def nativeRank(xs: Seq[Double], edges: Array[Double]): Seq[Long] =
    spark.createDataFrame(xs.zipWithIndex.map(_.swap))
      .toDF("i", "x").orderBy("i")
      .select(graft.sources.Layout.bucketRank(col("x"), edges))
      .collect().map(_.getLong(0)).toSeq

  test("matches the filter-HOF count on random values, duplicate edges included") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // duplicated + clustered edges, as approxQuantile produces on skew
    val edges = (Seq.fill(40)(rnd.nextInt(20).toDouble) ++
      Seq(0.0, 0.0, 5.0, 5.0, 5.0, 19.0, 19.0)).sorted.toArray
    val xs = Seq.tabulate(200)(_ => rnd.nextInt(25).toDouble - 2.0) ++
      Seq(Double.NegativeInfinity, Double.PositiveInfinity, Double.NaN,
        -0.0, 0.0, 5.0, 19.0, 18.999999, 19.000001)
    assert(nativeRank(xs, edges) === hofRank(xs, edges))
  }

  test("boundary cases: empty-ish extremes and exact-edge hits") {
    graft.functions.GraftFunctions.register(spark)
    val edges = Array(1.0, 2.0, 2.0, 3.0)
    // NaN ranks 4: Spark's double ordering places NaN above every value,
    // so the filter-HOF formulation counted all edges <= NaN.
    val xs = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 99.0, Double.NaN)
    assert(nativeRank(xs, edges) === Seq(0L, 1L, 1L, 3L, 3L, 4L, 4L, 4L))
  }

  test("rejects a non-foldable edges argument") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.createDataFrame(Seq((1.0, 2.0))).toDF("x", "y")
    val e = intercept[Exception] {
      df.select(call_function("graft_bucket_rank",
        col("x"), array(col("y")))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }
}
