package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 10000).toDF("id")

  test("deterministic sample keeps ~fraction and is exactly reproducible") {
    val a = Sampling.deterministicSample(ids, "id", 0.3, seed = 42L)
    val b = Sampling.deterministicSample(ids, "id", 0.3, seed = 42L)
    val n = a.count()
    assert(math.abs(n - 3000L) < 300, s"kept $n of 10000 at fraction 0.3")
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq)
  }

  test("different seeds select different rows; nested fractions nest") {
    val s1 = Sampling.deterministicSample(ids, "id", 0.3, seed = 1L)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(ids, "id", 0.3, seed = 2L)
      .select("id").as[Long].collect().toSet
    assert(s1 != s2)
    // a smaller fraction at the same seed is a subset of a larger one —
    // the property that makes sampling rates tunable without resampling
    val small = Sampling.deterministicSample(ids, "id", 0.1, seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(s1))
  }

  test("stratified sample applies per-stratum rates") {
    val df = ids.withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratifiedSample(df, "id", "grp",
      Map("a" -> 0.1), defaultFraction = 0.9, seed = 5L)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(byGrp("a") - 500L) < 120, s"grp a kept ${byGrp("a")} of 5000 at 0.1")
    assert(math.abs(byGrp("b") - 4500L) < 200, s"grp b kept ${byGrp("b")} of 5000 at 0.9")
  }

  test("splits are disjoint, exhaustive, and proportional") {
    val out = Sampling.assignSplits(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 9L)
    assert(out.count() == 10000)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000L) < 300)
    assert(math.abs(counts("val") - 1000L) < 150)
    assert(math.abs(counts("test") - 1000L) < 150)
  }

  test("mixture plan: most over-target domain keeps 100%, others scale by ratio; absent domains drop") {
    val df = ids.withColumn("dom",
      when(col("id") % 10 < 6, "en")         // 60% actual
        .when(col("id") % 10 < 9, "fr")      // 30% actual
        .otherwise("legacy"))                // 10%, absent from target
    val plan = Sampling.mixturePlan(df, "dom",
      Seq("en" -> 0.5, "fr" -> 0.5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // fr ratio = .5/.3 > en ratio = .5/.6 → fr keeps all, en keeps
    // (0.5/0.6)/(0.5/0.3) = 0.5
    assert(plan("fr")._4 == 1.0)
    assert(math.abs(plan("en")._4 - 0.5) < 1e-9)
    assert(plan("legacy")._4 == 0.0)
  }

  test("mixture resample hits the target proportions and is deterministic") {
    val df = ids.withColumn("dom",
      when(col("id") % 10 < 6, "en").otherwise("fr"))
    val shares = Seq("en" -> 0.5, "fr" -> 0.5)
    val out = Sampling.resampleToMixture(df, "id", "dom", shares, seed = 21L)
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // fr (4000 actual) keeps ~all; en (6000) downsamples to ~4000
    assert(counts("fr") == 4000L)
    assert(math.abs(counts("en") - 4000L) < 250, s"en kept ${counts("en")}")
    // deterministic: identical row set on a re-run
    val again = Sampling.resampleToMixture(df, "id", "dom", shares, seed = 21L)
    assert(out.select("id").exceptAll(again.select("id")).isEmpty)
  }

  test("bucketSql matches the Column implementation exactly") {
    // evaluate the SQL-string form through Spark itself: same arithmetic,
    // so any drift between the two forms breaks here before the oracle
    val viaSql = ids.selectExpr(
      "id", Sampling.bucketSql("id", 7L).replace("//", " DIV ") + " AS b")
    val viaCol = ids.select(col("id"), Sampling.bucket(col("id"), 7L).as("b"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("shuffleShards: deterministic permutation, decorrelated from id order") {
    val n = 2000L
    val df = (0L until n).toDF("id")
    val a = Sampling.shuffleShards(df, "id", numShards = 8, seed = 9L)
      .select("id", "shard", "shuffle_ord").as[(Long, Long, Long)].collect()
    val b = Sampling.shuffleShards(df, "id", numShards = 8, seed = 9L)
      .select("id", "shard", "shuffle_ord").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)), "not reproducible")
    assert(a.forall(r => r._2 >= 0 && r._2 < 8), "shard out of range")
    val counts = a.groupBy(_._2).view.mapValues(_.size)
    assert(counts.values.forall(c => c > n / 16 && c < n / 4), s"skewed shards: $counts")
    // Shuffle order must decorrelate from ingest (id) order: adjacent
    // ids land adjacent in shuffle order only by coincidence.
    val ordById = a.sortBy(_._1).map(_._3)
    val adjacentMonotone = ordById.sliding(2).count(p => p(1) > p(0))
    assert(math.abs(adjacentMonotone - n / 2) < n / 5, s"order correlates: $adjacentMonotone")
  }

  test("writeShuffledShards: shard dirs hold rows in shuffle order") {
    val df = (0L until 500L).toDF("id")
    val path = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    Sampling.writeShuffledShards(df, "id", path, numShards = 4, seed = 1L)
    val back = spark.read.parquet(path)
    assert(back.count() == 500 && back.select("id").distinct().count() == 500)
    // Within each shard FILE the row order is the shuffle order.
    val expect = Sampling.shuffleShards(df, "id", 4, 1L)
    for (sh <- 0 until 4) {
      val got = spark.read.parquet(s"$path/shard=$sh").select("id").as[Long].collect()
      val want = expect.filter(col("shard") === sh)
        .orderBy("shuffle_ord", "id").select("id").as[Long].collect()
      assert(got.sameElements(want), s"shard $sh order mismatch")
    }
  }

  test("domainQuota caps each group at quota, best score first, ties to lowest id") {
    val df = Seq(
      // domain a: 4 docs, quota 2 → keep the two best (30, then the 20-tie broken to id 2)
      (1L, "a", 30.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 10.0),
      // domain b: under quota → kept whole
      (5L, "b", 1.0),
      // domain c: exactly quota
      (6L, "c", 5.0), (7L, "c", 4.0)
    ).toDF("id", "dom", "score")
    val kept = Sampling.domainQuota(df, "dom", "score", "id", quota = 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L, 6L, 7L), kept.toString)
    // deterministic: a re-run selects the identical set
    val again = Sampling.domainQuota(df, "dom", "score", "id", quota = 2)
      .select("id").as[Long].collect().toSet
    assert(again == kept)
    intercept[IllegalArgumentException] {
      Sampling.domainQuota(df, "dom", "score", "id", quota = 0)
    }
  }

  test("dropBottomFraction: exact per-group quantile cut, ties by id, frac 0 keeps all") {
    val rows = (for {
      g <- Seq("a", "b"); i <- 0 until 10
    } yield (g, i.toLong, (i % 5).toLong)).toDF("g", "id", "score")
    // frac 0.3 on n=10 -> drop exactly 3 per group, lowest (score, id).
    val kept = graft.operators.Sampling
      .dropBottomFraction(rows, "g", "score", "id", 0.3)
    assert(kept.count() == 14L)
    // Scores 0,0 (ids 0,5) and the tie at score 1 resolves to id 1.
    val keptA = kept.filter(col("g") === "a").select("id")
      .as[Long].collect().sorted.toSeq
    assert(keptA == Seq(2L, 3L, 4L, 6L, 7L, 8L, 9L), s"got $keptA")
    assert(graft.operators.Sampling
      .dropBottomFraction(rows, "g", "score", "id", 0.0).count() == 20L)
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.dropBottomFraction(rows, "g", "score", "id", 1.0)
    }
  }

  test("domainQuotaSkewed equals the exact quota on a skewed corpus, any salt") {
    // one mega-domain (5000 rows), several small ones, planted score ties
    val rows = (0L until 5000L).map(i => (i, "mega", (i % 97).toDouble)) ++
      (5000L until 5030L).map(i => (i, "small", (i % 7).toDouble)) ++
      Seq((9001L, "tiny", 1.0), (9002L, "tiny", 1.0))
    val df = rows.toDF("id", "dom", "score")
    val exact = Sampling.domainQuota(df, "dom", "score", "id", quota = 10)
      .select("id").as[Long].collect().sorted.toSeq
    for (salt <- Seq(1, 7, 64)) {
      val skewed = Sampling.domainQuotaSkewed(df, "dom", "score", "id",
        quota = 10, salt = salt)
        .select("id").as[Long].collect().sorted.toSeq
      assert(skewed == exact, s"salt=$salt diverged from the exact quota")
    }
  }

  test("quality resample: same per-domain counts as the plan, survivors are each domain's best") {
    // a: 600 rows, b: 300, c: 100; unlisted d must drop entirely.
    val rows = (0L until 600L).map(i => (i, "a", (i % 83).toDouble)) ++
      (600L until 900L).map(i => (i, "b", (i % 59).toDouble)) ++
      (900L until 1000L).map(i => (i, "c", (i % 31).toDouble)) ++
      (1000L until 1050L).map(i => (i, "d", 999.0))
    val df = rows.toDF("id", "dom", "q")
    val shares = Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val kept = Sampling.resampleToMixtureByQuality(df, "id", "dom", "q", shares)

    // Counts per domain equal floor(keep_frac * n_docs) from the plan —
    // the mixture lands exactly where the random resampler would put it.
    val plan = Sampling.mixturePlan(df, "dom", shares)
      .select("dom", "n_docs", "keep_frac").collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(2) * r.getLong(1)).toLong)
      .toMap
    val counts = kept.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("d"), "unlisted domain must drop")
    Seq("a", "b", "c").foreach { d =>
      assert(counts.getOrElse(d, 0L) == plan(d), s"domain $d: ${counts.get(d)} vs plan ${plan(d)}")
    }

    // Survivors are exactly the top-k by (q desc, id asc) per domain.
    val keptIds = kept.select("id").as[Long].collect().toSet
    rows.filter(_._2 != "d").groupBy(_._2).foreach { case (d, rs) =>
      val expect = rs.sortBy(r => (-r._3, r._1)).take(plan(d).toInt).map(_._1).toSet
      val got = rs.map(_._1).filter(keptIds).toSet
      assert(got == expect, s"domain $d kept the wrong rows")
    }
  }
}
