package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Packing, Sampling}

/** Property-style invariants of the sampling/packing/as-of operators over
  * randomized inputs (fixed seed — deterministic). These pin the algebra,
  * not specific outputs:
  *   - sampling: nesting, disjoint exhaustive splits, stratum isolation;
  *   - packing: per-shard prefix-sum consistency, no row lost, offsets
  *     inside the budget;
  *   - as-of: window formulation equals the brute-force max/min-ts join.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("streaming packing ≡ batch packing under random budgets/shards/splits") {
    import graft.streaming.StreamingPacking
    import graft.operators.Packing
    (1 to 3).foreach { wave =>
      val n = 150 + rnd.nextInt(200)
      val rows = (0L until n.toLong).map(id => (id, 1L + rnd.nextInt(90).toLong))
      val df = rows.toDF("id", "tokens")
      val budget = 16 + rnd.nextInt(113)
      val shards = 2 + rnd.nextInt(7)
      // random id-ordered split into 2-4 batches (the operator's contract)
      val cuts = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(n).toLong)
        .distinct.sorted
      val bounds = (0L +: cuts :+ n.toLong).distinct.sorted
      val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
        df.filter(col("id") >= lo && col("id") < hi)
      }.toSeq
      val batch = Packing.packSequences(df, "id", "tokens", budget, shards)
        .select(col("id"), col("pack_id"), col("pack_offset"))
        .as[(Long, Long, Long)].collect().toSet
      val streamed = StreamingPacking.packStaged(spark, batches,
        "id", "tokens", budget, shards)
        .select(col("id"), col("pack_id"), col("pack_offset"))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"wave $wave (budget=$budget shards=$shards cuts=$cuts): " +
          s"stream-only=${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
    }
  }

  test("sampling fractions nest and rates hold per stratum (randomized)") {
    (1 to 5).foreach { _ =>
      val n = 2000 + rnd.nextInt(3000)
      val seed = rnd.nextLong() & Long.MaxValue
      val df = spark.range(0, n).toDF("id")
        .withColumn("grp", pmod(col("id"), lit(3)).cast("string"))
      val f1 = 0.1 + rnd.nextDouble() * 0.3
      val f2 = f1 + rnd.nextDouble() * (0.95 - f1)
      val small = Sampling.deterministicSample(df, "id", f1, seed)
      val large = Sampling.deterministicSample(df, "id", f2, seed)
      // nesting: raising the rate only ADDS rows
      assert(small.join(large, Seq("id"), "left_anti").count() == 0)
      // a stratum's selection is unaffected by other strata's rates
      val strat = Sampling.stratifiedSample(df, "id", "grp",
        Map("0" -> f1), defaultFraction = f2, seed = seed)
      val stratZero = strat.filter(col("grp") === "0").select("id")
      val plainZero = small.filter(col("grp") === "0").select("id")
      assert(stratZero.exceptAll(plainZero).isEmpty &&
        plainZero.exceptAll(stratZero).isEmpty)
    }
  }

  test("splits partition every row for random weight vectors") {
    (1 to 5).foreach { _ =>
      val n = 1000 + rnd.nextInt(2000)
      val seed = rnd.nextLong() & Long.MaxValue
      val w1 = 0.1 + rnd.nextDouble() * 0.5
      val w2 = rnd.nextDouble() * (0.9 - w1)
      val df = spark.range(0, n).toDF("id")
      val out = Sampling.assignSplits(df, "id",
        Seq("a" -> w1, "b" -> w2, "c" -> (1.0 - w1 - w2)), seed)
      assert(out.count() == n)                       // no row lost
      assert(out.filter(col("split").isNull).count() == 0)
      assert(out.select("id").distinct().count() == n) // no row duplicated
    }
  }

  test("packing is a per-shard prefix sum: offsets consistent, no row lost") {
    (1 to 5).foreach { _ =>
      val n = 500 + rnd.nextInt(1500)
      val budget = 64 + rnd.nextInt(1000)
      val shards = 1 + rnd.nextInt(6)
      val rows = (0L until n).map(i => (i, rnd.nextInt(300).toLong))
      val df = rows.toDF("id", "n_tokens")
      val out = Packing.packSequences(df, "id", "n_tokens", budget, shards)
      assert(out.count() == n)
      // reconstruct the prefix sum per shard on the driver and compare
      val got = out.select("id", "shard", "pack_id", "pack_offset")
        .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
      val cum = collection.mutable.Map.empty[Int, Long]
      got.foreach { case (id, shard, packId, off) =>
        val before = cum.getOrElse(shard, 0L)
        assert(packId == before / budget, s"id=$id")
        assert(off == before % budget, s"id=$id")
        assert(off >= 0 && off < budget)
        cum(shard) = before + rows(id.toInt)._2
      }
    }
  }

  test("as-of equals brute-force nearest-ts join both directions (randomized)") {
    (1 to 3).foreach { _ =>
      val nl = 50 + rnd.nextInt(100)
      val nr = 50 + rnd.nextInt(100)
      val left = (0 until nl).map(i =>
        (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
        .toDF("lid", "k", "ts")
      val right = (0 until nr).map(i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i * 1.0))
        .toDF("k", "ts", "price")
      // brute force: per left row pick the max/min right ts (sentinel ts
      // for unmatched rows so null-field structs can't win the min/max)
      val bfBack = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
        .groupBy("lid").agg(max(struct(
          coalesce(col("r.ts"), lit(Long.MinValue)).as("ts"),
          col("price").as("p"))).as("m"))
        .select(col("lid"), col("m.p").as("price"))
      val back = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts")
        .select("lid", "price")
      assert(back.exceptAll(bfBack).isEmpty && bfBack.exceptAll(back).isEmpty)

      val bfFwd = left.as("l").join(right.as("r"),
          col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
        .groupBy("lid").agg(min(struct(
          coalesce(col("r.ts"), lit(Long.MaxValue)).as("ts"),
          (col("price") * -1).as("np"))).as("m"))
        .select(col("lid"), (col("m.np") * -1).as("price"))
      val fwd = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts",
        direction = "forward")
        .select("lid", "price")
      assert(fwd.exceptAll(bfFwd).isEmpty && bfFwd.exceptAll(fwd).isEmpty)
    }
  }
}
