package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Distributed token-budget selection ≡ the naive global-cumsum
  * definition (the spec runs at shuffle.partitions=4, so the
  * per-partition offsets genuinely compose across partitions). */
class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private def naive(
      rows: Seq[(Long, Long, Double)], budget: Long): Seq[(Long, Long)] = {
    // (id, tokens, quality) → kept (id, cum) under (quality desc, id asc)
    val ordered = rows.sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    ordered.flatMap { case (id, tok, _) =>
      cum += tok
      if (cum <= budget) Some(id -> cum) else None
    }.sortBy(_._1)
  }

  private def mkRows(seed: Long, n: Int): Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      // coarse qualities force cross-partition ties broken by id
      (i, rnd.nextInt(40).toLong, (rnd.nextInt(5) / 4.0))
    }
  }

  test("matches the naive global cumsum at several budgets") {
    val rows = mkRows(3L, 500)
    val df = rows.toDF("id", "tok", "q")
    for (budget <- Seq(0L, 100L, 2500L, 100000L)) {
      val out = Sampling.budgetSelect(df, "id", "tok", "q", budget)
        .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(out == naive(rows, budget), s"budget=$budget")
    }
  }

  test("zero-token docs ride along at the boundary; nulls count as zero") {
    val rows = Seq[(Long, java.lang.Long, Double)](
      (1L, 10L, 0.9), (2L, null, 0.9), (3L, 0L, 0.8), (4L, 5L, 0.7))
    val df = rows.toDF("id", "tok", "q")
    val out = Sampling.budgetSelect(df, "id", "tok", "q", budget = 10L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // cum: id1→10, id2→10 (null=0), id3→10, id4→15 (over)
    assert(out == Seq((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("empty input and zero budget degenerate cleanly") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("id", "tok", "q")
    assert(Sampling.budgetSelect(empty, "id", "tok", "q", 100L).count() == 0L)
    val df = mkRows(5L, 50).toDF("id", "tok", "q")
    val zero = Sampling.budgetSelect(df, "id", "tok", "q", 0L)
      .select("id").as[Long].collect().toSet
    // only zero-token docs that sort before the first positive-token doc
    assert(zero == naive(mkRows(5L, 50), 0L).map(_._1).toSet)
  }
}
