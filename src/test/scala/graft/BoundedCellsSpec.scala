package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Dedup, IvfIndex, Similarity}

/** Scale-proofing of the clustered (cell-blocked) candidate generation:
  * cells over the bucket cap must be RE-CLUSTERED, not silently dropped.
  * The corpora here are engineered so the cap overflows at test scale —
  * the exact failure mode that was invisible at the sf fixtures (where no
  * cell ever exceeded 10k members) but emptied the pair set at 10⁸+
  * vectors under the old fixed-nlist + drop-over-cap defaults. */
class BoundedCellsSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val NumClusters = 8
  private val PerCluster = 30

  /** 8 tight clusters around orthogonal directions: within-cluster cosine
    * ≈ 0.99, cross-cluster ≈ 0.01 — every within-cluster pair is a true
    * pair at threshold 0.8 and nothing else is. Deterministic noise. */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(1234)
    val rows = for {
      c <- 0 until NumClusters
      i <- 0 until PerCluster
    } yield {
      val vec = Array.tabulate(Dim) { d =>
        (if (d == c) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.08f
      }
      ((c * PerCluster + i).toLong, vec)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def truePairs(df: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosine(col("__va"), col("__vb")) >= threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  private def gotPairs(df: DataFrame, threshold: Double, nlist: Int,
      maxBucket: Int): Set[(Long, Long)] =
    Similarity.cellBlockedCosinePairs(df, "embedding", "vec_id", threshold,
      nlist = nlist, probeCells = 2, maxBucket = maxBucket)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("over-cap cells are re-clustered, pair set stays exact") {
    val truth = truePairs(clustered, 0.8)
    // sanity: the corpus is what it claims — all and only intra-cluster pairs
    assert(truth.size == NumClusters * PerCluster * (PerCluster - 1) / 2)
    // nlist=1 forces every vector into ONE cell of 240 ≫ cap 40: the old
    // code dropped the cell and returned zero pairs; recursion must split
    // it back down to the clusters without losing a single pair.
    val got = gotPairs(clustered, 0.8, nlist = 1, maxBucket = 40)
    assert(got == truth,
      s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)} " +
        s"got=${got.size} truth=${truth.size}")
  }

  test("auto-sized nlist (default) stays exact on the clustered corpus") {
    val truth = truePairs(clustered, 0.8)
    // maxBucket below the corpus size keeps this on the CLUSTERED path
    // (default cap would take the small-n all-pairs shortcut).
    val got = Similarity.cellBlockedCosinePairs(
      clustered, "embedding", "vec_id", 0.8, probeCells = 2, maxBucket = 100)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == truth, s"missing=${(truth -- got).take(5)} got=${got.size}")
  }

  test("small-n all-pairs fast path (default caps) is exact") {
    val truth = truePairs(clustered, 0.8)
    val got = Similarity.cellBlockedCosinePairs(
      clustered, "embedding", "vec_id", 0.8) // n=240 ≤ 4096 → all-pairs path
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == truth, s"missing=${(truth -- got).take(5)} got=${got.size}")
  }

  test("unsplittable (all-identical) cell terminates and drops loudly, rest intact") {
    val rnd = new scala.util.Random(99)
    val identical = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(Dim)(d => if (d == 0) 1.0f else 0.0f))
    }
    val separate = (0 until 10).map { i =>
      (100L + i, Array.tabulate(Dim) { d =>
        (if (d == 8) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.08f
      })
    }
    val df = (identical ++ separate).toDF("vec_id", "embedding")
    // cap 40 < 60 identical vectors: k-means cannot separate identical
    // points, so that cell must be dropped (with a warning) after the
    // no-progress guard — but the separated cluster's pairs must survive.
    val got = gotPairs(df, 0.8, nlist = 1, maxBucket = 40)
    val separateTruth = truePairs(df, 0.8)
      .filter { case (a, b) => a >= 100L && b >= 100L }
    assert(got.filter { case (a, b) => a >= 100L && b >= 100L } == separateTruth)
    assert(!got.exists { case (a, b) => a < 60L && b < 60L },
      "identical-cluster pairs should have been dropped (exact-dedup territory)")
  }

  test("semanticDedup keeps min-id per cluster through the split path") {
    // threshold 0.8, cap 40 forces recursion; every cluster collapses to
    // its smallest id exactly as the unsplit path would.
    val kept = Dedup.semanticDedup(clustered, "embedding", "vec_id", 0.8,
      nlist = 1, probeCells = 2, maxBucket = 40)
      .select("vec_id").as[Long].collect().toSet
    val expected = (0 until NumClusters).map(c => (c * PerCluster).toLong).toSet
    assert(kept == expected, s"kept=$kept")
  }

  test("semanticDedup dedups an over-cap coherent cluster via the representative pass") {
    val rnd = new scala.util.Random(4242)
    // one tight cluster of 60 > cap 40 (cannot shrink at threshold 0.8 —
    // pairs are dropped) + a well-separated small cluster of 12
    val big = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(Dim) { d =>
        (if (d == 0) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.05f
      })
    }
    val small = (0 until 12).map { i =>
      (500L + i, Array.tabulate(Dim) { d =>
        (if (d == 8) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.05f
      })
    }
    val df = (big ++ small).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "embedding", "vec_id", 0.8,
      nlist = 1, probeCells = 2, maxBucket = 40)
      .select("vec_id").as[Long].collect().toSet
    // pair enumeration over the big cluster is impossible under the cap;
    // the linear representative pass must still collapse it to min-id 0
    assert(kept == Set(0L, 500L), s"kept=$kept")
  }

  test("autoNlist scales with corpus size and clamps") {
    assert(IvfIndex.autoNlist(100L) == 16)
    assert(IvfIndex.autoNlist(10000L) == 100)
    assert(IvfIndex.autoNlist(1000000L) == 256)
    assert(IvfIndex.autoNlist(100000000000L) == 256)
  }
}
