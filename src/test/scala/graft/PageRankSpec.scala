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

  test("invalid parameters raise") {
    intercept[IllegalArgumentException] {
      Components.pageRank(Seq((1, 2)).toDF("s", "t"), "s", "t", 0)
    }
    intercept[IllegalArgumentException] {
      Components.pageRank(Seq((1, 2)).toDF("s", "t"), "s", "t", 3, 1.0)
    }
  }
}
