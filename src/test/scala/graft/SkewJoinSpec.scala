package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** 10k fact rows where key 7 holds 60% of the mass; 20-row dim. */
  private def fact = spark.range(0, 10000).toDF("i")
    .withColumn("k", when(col("i") % 10 < 6, 7L).otherwise(pmod(col("i"), lit(20))))
    .withColumn("v", col("i") * 2)
  private def dim = spark.range(0, 20).toDF("k")
    .withColumn("name", concat(lit("dim_"), col("k")))

  test("hot-key detection finds the dominant key deterministically") {
    val hot = SkewJoin.detectHotKeys(fact, "k", sampleFraction = 0.5,
      hotFraction = 0.1, maxHotKeys = 10, seed = 1L)
    assert(hot.map(_.asInstanceOf[Long]) == Seq(7L))
    val again = SkewJoin.detectHotKeys(fact, "k", sampleFraction = 0.5,
      hotFraction = 0.1, maxHotKeys = 10, seed = 1L)
    assert(hot == again)
  }

  test("skew-safe join returns exactly the plain join's rows") {
    val plain = fact.join(dim, "k")
    val safe = SkewJoin.join(fact, dim, "k",
      sampleFraction = 0.5, hotFraction = 0.1)
    assert(safe.count() == plain.count())
    assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty)
  }

  test("hot path broadcasts; plan has no cartesian product") {
    val safe = SkewJoin.join(fact, dim, "k", sampleFraction = 0.5, hotFraction = 0.1)
    val p = safe.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"hot slice not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cross join:\n$p")
  }

  test("no hot keys → falls back to a single plain join") {
    val uniform = spark.range(0, 1000).toDF("i")
      .withColumn("k", pmod(col("i"), lit(500)))
    val out = SkewJoin.join(uniform, dim, "k",
      sampleFraction = 0.5, hotFraction = 0.1)
    assert(out.count() == uniform.filter(col("k") < 20).count())
  }
}
