package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.CapOps

/** Distributed connected components over an undirected edge list — the
  * missing last mile of every near-dup pipeline: pair emitters
  * ([[Dedup.minHashLsh]], [[Dedup.ngramJaccardPairs]], [[Similarity]]
  * cosine pairs) produce EDGES, but a curation run needs CLUSTERS (one
  * canonical doc kept per duplicate group, where duplicate is the
  * transitive closure of pairwise similarity — A~B, B~C ⇒ {A,B,C} is one
  * group even when A and C are not directly similar).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
  * MapReduce and Beyond", SoCC 2014). Each round is two keyed
  * aggregations + joins over the edge set; the edge set converges to a
  * union of stars centered at each component's minimum node in
  * O(log² n) rounds (in practice 2–4 for dedup graphs, whose components
  * are small and dense). Nothing is ever collected to the driver and no
  * per-component state is held anywhere, so the same plan runs on 10⁹
  * edges across 1000 executors: each round shuffles on node id exactly
  * like a groupBy, and `localCheckpoint` caps the lineage so the
  * iteration count never deepens the plan.
  *
  * Compare the naive alternatives this replaces: min-label propagation
  * converges in O(diameter) rounds (a 10⁶-long chain needs 10⁶ rounds);
  * driver-side union-find needs every edge on one machine.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`.
    * Self-loops are ignored, duplicate and reversed edges are welcome.
    * Returns one row per distinct node appearing in `edges`:
    * `(node, component)`, where `component` is the smallest node id
    * reachable (node ids may be any orderable type; both endpoint
    * columns must share it). Nodes with no edges simply don't appear —
    * callers treat absent nodes as singleton components (see
    * [[clusters]]). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    // Canonical undirected form (u < v), self-loops and duplicates out.
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .capLineage()
    val allNodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct().capLineage()

    var round = 0
    var converged = e.isEmpty
    while (!converged && round < maxRounds) {
      // Large-star: every node connects its strictly-larger neighbors to
      // the minimum of its closed neighborhood. Operates on the
      // symmetric (both-directions) view so each node sees its full
      // neighborhood.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = sym.where(col("v") > col("u"))
        .join(lsMin, "u")
        // m ≤ u < v, so (m, v) is already canonical.
        .select(col("m").as("u"), col("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // Small-star: every node connects its not-larger neighbors (and
      // itself) to the minimum among them. In canonical form the
      // not-larger neighbors of h are exactly the `u` of edges (u, h).
      val ssMin = afterLarge.groupBy(col("v").as("h")).agg(min(col("u")).as("m"))
      val afterSmall = afterLarge
        .join(ssMin, afterLarge("v") === ssMin("h"))
        .where(col("u") =!= col("m"))
        .select(col("m").as("u"), afterLarge("u").as("v"))
        .union(ssMin.select(col("m").as("u"), col("h").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .capLineage()
      // Fixpoint ⇔ identical canonical edge set (cheap count gate first,
      // set difference only when counts already agree).
      converged = afterSmall.count() == e.count() &&
        afterSmall.exceptAll(e).isEmpty
      e = afterSmall
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")

    // At the fixpoint the edge set is a union of stars (componentMin, x):
    // a node's component is its minimum in-star neighbor; star centers
    // (and would-be singletons) map to themselves.
    val comp = e.groupBy(col("v").as("node")).agg(min(col("u")).as("component"))
    allNodes.join(comp, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** Leakage-safe train/val/test assignment: [[clusters]] the corpus by
    * its near-dup pairs, then split by CLUSTER id rather than row id —
    * so a near-duplicate (or exact duplicate) of a test document can
    * never sit in train. Splitting by row id quietly leaks: at
    * pretraining scale a few percent of docs have a near-copy, and a
    * hash split scatters each copy-pair across splits with probability
    * 2·p(1-p). Split membership stays deterministic and engine-portable
    * (the same multiplicative-hash bucket [[Sampling.assignSplits]]
    * uses, applied to the cluster representative). */
  def leakageSafeSplits(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      weights: Seq[(String, Double)],
      seed: Long,
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame =
    Sampling.assignSplits(
      clusters(df, idCol, pairs, idACol, idBCol), "cluster", weights, seed)

  /** Keep-best retention over a PRE-COMPUTED cluster assignment — the
    * artifact-reuse variant of the clusters→score→argmax composition:
    * `clustered` is a persisted [[clusters]] output (or any frame with
    * `idCol` + `clusterCol`), `scores` maps `idCol` to `scoreCol`. Marks
    * the highest-scoring doc per cluster (ties → lowest id) with
    * `keep = true`. The window partitions by cluster — near-dup clusters
    * are small, so no partition ever exceeds the largest cluster; the
    * expensive pair emission + transitive closure is NOT re-run. */
  def keepBest(
      clustered: DataFrame,
      scores: DataFrame,
      idCol: String,
      scoreCol: String,
      clusterCol: String = "cluster"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(clusterCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    clustered.join(scores.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), col(clusterCol), col(scoreCol),
        (col("__rn") === 1).as("keep"))
  }

  /** Cluster assignment for a corpus: every row of `df` labeled with the
    * smallest `idCol` reachable through `pairs` (its near-dup cluster
    * representative; rows in no pair are their own singleton cluster)
    * plus an `is_canonical` flag — `filter(col("is_canonical"))` IS
    * transitive-closure dedup. */
  def clusters(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol)
      .withColumnRenamed("node", idCol)
      .withColumnRenamed("component", "cluster")
    df.join(cc, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("is_canonical", col("cluster") === col(idCol))
  }

  /** PageRank over a directed edge list — link-graph centrality as a
    * corpus QUALITY SIGNAL: crawl-scale curation pipelines weight
    * documents by the centrality of their source in the link graph
    * (the CommonCrawl-lineage "harmonic/pagerank" filters), and the
    * same iteration ranks entities in any reference graph.
    *
    * Semantics (the classic random-surfer model, Page et al. 1999):
    * DISTINCT edges (a repeated link counts once), self-loops kept as
    * given; per iteration every node's rank is
    * `(1-d)/N + d·(Σ_in pr(src)/outdeg(src) + dangling/N)` where
    * `dangling` is the total rank sitting on nodes with no out-edges,
    * redistributed uniformly — so the ranks sum to exactly 1 every
    * iteration (spec-pinned), bipartite graphs (all sinks on one side)
    * included.
    *
    * Scale shape: the edge set is joined with the out-degrees ONCE and
    * the result pinned pre-partitioned on `src`, with each SINK node
    * folded in as one synthetic marker edge — so every iteration pays
    * exactly ONE join against the rank frame and ONE map-side-combined
    * aggregation, which delivers the per-destination contributions AND
    * the dangling mass (the marker group) in the same pass; that frame
    * is the iteration's single materialized action, the dangling scalar
    * is a bounded head() over it, and the new rank frame derives flatly
    * from checkpointed parents (no second materialization per round).
    * [[Checkpoints.cap]] caps the lineage so K iterations never deepen
    * the plan — the same discipline as [[connectedComponents]]; nothing
    * per-node ever reaches the driver.
    *
    * Convergence: with `tol > 0` the loop stops once the L1 rank delta
    * `Σ|pr_i − pr_{i−1}|` falls below `tol` (one more bounded scalar
    * per iteration); `tol = 0` (default) runs exactly `iterations`
    * rounds — the reproducible fixed-round contract the oracle unrolls.
    *
    * Returns one row per node: `(node, pr)`. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      damping: Double = 0.85,
      tol: Double = 0.0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    require(tol >= 0, s"tol must be >= 0: $tol")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().capLineage()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().capLineage()
    val n = nodes.count().toDouble
    val outdeg = e.groupBy("src")
      .agg(count(lit(1)).cast("double").as("deg"))
      .withColumnRenamed("src", "onode")
    // Fold the out-degree into the edge list once, PLUS one marker row
    // per sink (deg 1, sink=true): the per-iteration aggregate then
    // yields contributions and dangling mass together. The marker's
    // null dst cannot collide with a real null-id destination — the
    // sink flag is part of the grouping key.
    val dstType = e.schema("dst").dataType
    val linked = e.join(outdeg, col("src") === col("onode"))
      .select(col("src"), col("dst"), col("deg"), lit(false).as("sink"))
      .unionByName(
        nodes.join(outdeg, col("node") === col("onode"), "left_anti")
          .select(col("node").as("src"), lit(null).cast(dstType).as("dst"),
            lit(1.0d).as("deg"), lit(true).as("sink")))
      .repartition(col("src")).capLineage()

    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr")).capLineage()
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      // The round's ONE materialized pass: contributions by destination
      // + the dangling mass under the sink-marker group.
      val contrib = linked.join(pr, col("src") === col("node"))
        .groupBy("sink", "dst").agg(sum(col("pr") / col("deg")).as("contrib"))
        .capLineage()
      val dangling = contrib.filter(col("sink"))
        .agg(coalesce(sum("contrib"), lit(0.0d))).head().getDouble(0)
      val newPr = nodes.join(
          contrib.filter(!col("sink")).withColumnRenamed("dst", "cnode"),
          nodes("node") === col("cnode"), "left")
        .select(nodes("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0d)) + lit(dangling / n))).as("pr"))
      if (tol > 0) {
        val l1 = pr.withColumnRenamed("pr", "prev")
          .join(newPr.withColumnRenamed("node", "nnode"),
            col("node") === col("nnode"))
          .agg(coalesce(sum(abs(col("pr") - col("prev"))), lit(0.0d)))
          .head().getDouble(0)
        converged = l1 < tol
      }
      // newPr derives flatly from checkpointed frames (nodes, contrib):
      // no per-round materialization of the rank frame itself.
      pr = newPr
      i += 1
    }
    pr
  }
}
