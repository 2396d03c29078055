package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** [[Components.pageRank]] — pinned against a dense in-test power
  * iteration with identical semantics (distinct edges, dangling mass
  * redistributed uniformly), plus the invariants that make the result
  * a probability distribution. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Dense reference power iteration over node ids 0..n-1. */
  private def densePr(
      n: Int, edges: Seq[(Int, Int)], iters: Int, d: Double): Array[Double] = {
    val es = edges.distinct
    val out = Array.fill(n)(0)
    es.foreach { case (s, _) => out(s) += 1 }
    var pr = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val dangling = (0 until n).collect { case i if out(i) == 0 => pr(i) }.sum
      val next = Array.fill(n)((1 - d) / n + d * dangling / n)
      es.foreach { case (s, t) => next(t) += d * pr(s) / out(s) }
      pr = next
    }
    pr
  }

  private def sparkPr(
      edges: Seq[(Int, Int)], iters: Int, d: Double = 0.85): Map[Int, Double] =
    Components.pageRank(edges.toDF("s", "t"), "s", "t", iters, d)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  test("matches the dense reference exactly on a graph with cycles, sinks and a self-loop") {
    // 0→1, 0→2, 1→2, 2→0 (cycle), 3→3 (self-loop), 1→4 (4 is a sink).
    val edges = Seq((0, 1), (0, 2), (1, 2), (2, 0), (3, 3), (1, 4), (0, 1))
    val expect = densePr(5, edges, 7, 0.85)
    val got = sparkPr(edges, 7)
    assert(got.keySet == Set(0, 1, 2, 3, 4))
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - expect(node)) < 1e-12, s"node $node: $pr vs ${expect(node)}")
    }
  }

  test("ranks sum to 1 every time, including on a fully-dangling bipartite graph") {
    // All edges point left→right; every right node is a sink.
    val edges = (0 until 20).map(i => (i, 100 + i % 7))
    for (k <- Seq(1, 3, 10)) {
      val total = sparkPr(edges, k).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$k sum=$total")
    }
  }

  test("a star center out-ranks its spokes; duplicate edges don't inflate it") {
    val spokes = (1 to 8).flatMap(i => Seq((i, 0), (i, 0))) // dup on purpose
    val pr = sparkPr(spokes, 5)
    assert((1 to 8).forall(i => pr(0) > pr(i)))
    val prOnce = sparkPr(spokes.distinct, 5)
    assert(math.abs(pr(0) - prOnce(0)) < 1e-12, "distinct-edge semantics")
  }

  test("epsilon early stop: a converged graph stops before the iteration cap with unchanged ranks") {
    // A 4-cycle converges immediately: the uniform start IS the fixed
    // point (every node has in-degree = out-degree = 1), so the first
    // L1 delta is 0 and tol stops the loop after round 1.
    val cycle = Seq((0, 1), (1, 2), (2, 3), (3, 0))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val capped =
      try Components.pageRank(
        cycle.toDF("s", "t"), "s", "t", iterations = 500, tol = 1e-9)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      finally spark.sparkContext.removeSparkListener(listener)
    // 500 un-stopped rounds would be >1000 jobs; the converged cycle
    // must stop after the first L1 check.
    assert(jobs.get() < 60, s"early stop did not fire: ${jobs.get()} jobs")
    val exact = sparkPr(cycle, 5)
    assert(capped.keySet == exact.keySet)
    capped.foreach { case (k, v) => assert(math.abs(v - exact(k)) < 1e-9) }
    // And on a non-trivial graph: early-stopped ranks agree with the
    // fully-iterated ones to within the tolerance.
    val g = Seq((0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 4))
    val stopped = Components.pageRank(
      g.toDF("s", "t"), "s", "t", iterations = 200, tol = 1e-12)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val long = sparkPr(g, 80)
    stopped.foreach { case (k, v) => assert(math.abs(v - long(k)) < 1e-9) }
    assert(math.abs(stopped.values.sum - 1.0) < 1e-9)
  }

  test("invalid parameters raise") {
    intercept[IllegalArgumentException] {
      Components.pageRank(Seq((1, 2)).toDF("s", "t"), "s", "t", 0)
    }
    intercept[IllegalArgumentException] {
      Components.pageRank(Seq((1, 2)).toDF("s", "t"), "s", "t", 3, 1.0)
    }
  }
}
