package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup}

import scala.util.Random

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find ground truth (min-id representative). */
  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // Path-compress to roots, then relabel each root to its component min.
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
  }

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, clique, singleton-free mix matches union-find") {
    val chain = (0L until 12L).sliding(2).map(s => (s(1), s(0))).toSeq // reversed edges
    val clique = for (i <- 20L to 24L; j <- (i + 1) to 24L) yield (i, j)
    val bridgeless = Seq((40L, 41L))
    val edges = chain ++ clique ++ bridgeless ++ Seq((5L, 5L), (3L, 2L)) // self-loop + dup
    val real = edges.filter(e => e._1 != e._2)
    val nodes = real.flatMap(e => Seq(e._1, e._2)).toSet
    assert(ccMap(edges) == unionFind(nodes, real))
  }

  test("empty edge set yields empty result") {
    assert(ccMap(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("long chain converges in few rounds (star contraction, not label propagation)") {
    val chain = (0L until 400L).sliding(2).map(s => (s(0), s(1))).toSeq
    val out = ccMap(chain)
    assert(out.size == 400 && out.values.forall(_ == 0L))
  }

  test("randomized graphs match union-find") {
    val rnd = new Random(4261)
    for (_ <- 1 to 8) {
      val n = 30 + rnd.nextInt(60)
      val m = rnd.nextInt(n * 2)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(ccMap(edges) == unionFind(nodes, edges), s"edges=$edges")
      }
    }
  }

  test("string node ids work (orderable, not numeric)") {
    val edges = Seq(("d", "b"), ("b", "a"), ("x", "y"))
    val out = Components.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a", "b" -> "a", "d" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("clusters: transitive closure labels the corpus, absent rows are singletons") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // 1~2, 2~3 (transitive group), 5~6; 4 untouched.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Components.clusters(docs, "doc_id", pairs)
      .select("doc_id", "cluster", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("leakageSafeSplits: near-dup clusters never straddle a split boundary") {
    val rnd = new Random(5)
    val docs = (1L to 400L).toDF("doc_id")
    // Random pair soup → clusters of varied size.
    val pairs = Seq.fill(150)((rnd.nextInt(400).toLong + 1, rnd.nextInt(400).toLong + 1))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val out = Components.leakageSafeSplits(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
      .select("doc_id", "cluster", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == 400, "every doc assigned")
    val splitsPerCluster = out.groupBy(_._2).values.map(_.map(_._3).distinct.size)
    assert(splitsPerCluster.forall(_ == 1), "a cluster straddles splits")
    val bySplit = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test") && bySplit("train") > bySplit("test"))
  }

  test("clusters composes with minHashLsh pairs: canonical filter is transitive dedup") {
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank " +
      "while morning light spreads across the wide green valley floor"
    val docs = Seq(
      (0L, base), (1L, base), (2L, base.replace("quick", "swift")),
      (3L, "completely different text about database engines and query planners optimizing join order")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id", threshold = 0.5)
    val kept = Components.clusters(docs, "doc_id", pairs)
      .filter(col("is_canonical")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L))
  }

  test("unified closure merges jaccard-only and containment-only links into ONE cluster") {
    // A=0 long doc; B=1 a near-dup of A (jaccard link only — same length,
    // no containment); C=2 an excerpt of A (containment link only — too
    // short for jaccard 0.6 against A); D=3 unrelated. Families run
    // independently: {A,B} and {A,C}. The unified closure must yield
    // {A,B,C} with canonical A — the composition dedup_unified ships.
    val body = (1 to 80).map(j => s"alpha$j beta$j").mkString(" ")
    val docs = Seq(
      (0L, body),
      (1L, body.replace("alpha7", "gamma7")),
      (2L, body.split(" ").take(40).mkString(" ")),
      (3L, (1 to 80).map(j => s"zeta$j eta$j").mkString(" "))
    ).toDF("doc_id", "text")
    val mh = Dedup.minHashLsh(docs, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.6).select("id_a", "id_b")
    val ct = Dedup.containmentPairs(docs, "text", "doc_id",
      maxDf = 100, minFp = 5, minContain = 0.8)
      .select(col("inner_id").as("id_a"), col("outer_id").as("id_b"))
    // preconditions: each family alone finds only its own link shape
    val mhSet = mh.as[(Long, Long)].collect().toSet
    val ctSet = ct.as[(Long, Long)].collect().toSet
    assert(mhSet.contains((0L, 1L)) && !mhSet.exists(p => p._1 == 2L || p._2 == 2L),
      s"jaccard family should link only A-B: $mhSet")
    assert(ctSet.contains((2L, 0L)) || ctSet.contains((2L, 1L)),
      s"containment family should link the excerpt to a container: $ctSet")
    val unified = Components.clusters(docs.select("doc_id"), "doc_id",
      mh.unionByName(ct).distinct())
    val byCluster = unified.select("doc_id", "cluster").as[(Long, Long)]
      .collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0L) == Set(0L, 1L, 2L),
      s"unified closure must merge A,B,C into cluster 0: $byCluster")
    assert(byCluster(3L) == Set(3L))
  }
}
