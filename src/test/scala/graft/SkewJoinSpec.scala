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

  /** The guard must GUARD for non-string key types: detection collects
    * native values (java.sql.Timestamp, BigDecimal, Double), and the hot
    * filter must match the column in its own type. The old string-cast
    * compare matched ZERO timestamp rows (java toString "… 00:00:00.0"
    * vs Spark cast "… 00:00:00") — results stayed correct but every hot
    * row silently took the cold shuffle path. */
  test("hot routing matches in the key's native type (timestamp/decimal/double)") {
    def skewed(keyExpr: String, hotExpr: String) = spark.range(0, 4000).toDF("i")
      .withColumn("k", expr(s"IF(i % 10 < 6, $hotExpr, $keyExpr)"))
      .withColumn("v", col("i"))
    val cases = Seq(
      // timestamp: hot key midnight-exact (fractional-second toString trap)
      ("timestamp_seconds(1700000000 + (i % 20) * 86400)",
        "timestamp_seconds(1700000000)"),
      // decimal with trailing-zero scale
      ("CAST(i % 20 AS DECIMAL(10,2)) / 100", "CAST(0.10 AS DECIMAL(10,2))"),
      ("CAST(i % 20 AS DOUBLE) / 10", "CAST(1.1 AS DOUBLE)"))
    cases.foreach { case (keyExpr, hotExpr) =>
      val f = skewed(keyExpr, hotExpr)
      val hot = SkewJoin.detectHotKeys(f, "k", sampleFraction = 0.5,
        hotFraction = 0.2, maxHotKeys = 5, seed = 1L)
      assert(hot.nonEmpty, s"hot key not detected for $hotExpr")
      val matched = f.filter(SkewJoin.hotKeyFilter(col("k"), hot)).count()
      assert(matched >= 2000, s"hot rows not matched in native type " +
        s"($hotExpr): matched=$matched of expected >=2400")
      val d = f.select(col("k")).distinct()
        .withColumn("name", concat(lit("d_"), col("k").cast("string")))
      val plain = f.join(d, "k")
      val safe = SkewJoin.join(f, d, "k", sampleFraction = 0.5, hotFraction = 0.2)
      assert(safe.count() == plain.count())
      assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty)
    }
  }

  /** Property-style: for randomized skew shapes and key types, the
    * skew-safe join is row-for-row the plain join (fixed seed). */
  test("skew-safe join ≡ plain join over randomized skew shapes") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 10).foreach { _ =>
      val nKeys = 5 + rnd.nextInt(30)
      val hotKey = rnd.nextInt(nKeys)
      val hotPct = 30 + rnd.nextInt(60)
      val f = spark.range(0, 2000).toDF("i")
        .withColumn("k",
          expr(s"IF(i % 100 < $hotPct, $hotKey, CAST(i % $nKeys AS INT))"))
        .withColumn("v", col("i") * 3)
      val d = spark.range(0, nKeys).toDF("k").select(col("k").cast("int").as("k"))
        .withColumn("name", concat(lit("d_"), col("k")))
      val plain = f.join(d, "k")
      val safe = SkewJoin.join(f, d, "k",
        sampleFraction = 0.5, hotFraction = 0.15,
        maxHotKeys = 4, seed = rnd.nextInt(1000))
      assert(safe.count() == plain.count())
      assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty)
    }
  }
}
