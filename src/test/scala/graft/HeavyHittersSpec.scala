package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.MgSummary

/** [[HeavyHitters.exactTopK]] — always-exact contract: the fast
  * sketch+recount path and the fallback must both equal the plain
  * full groupBy top-k, and the Misra–Gries slack bound must hold on
  * adversarial streams. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vals: Seq[String], k: Int): Seq[(String, Long)] =
    vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (v, n) => (-n, v) }.take(k)

  test("matches the full groupBy on a Zipfian stream (fast path)") {
    val vals = (1 to 20000).map(i => s"t${(math.pow(i % 997 + 1, 0.5)).toInt}")
    val got = HeavyHitters.exactTopK(vals.toDF("v"), "v", 10, sketchSize = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(vals, 10))
  }

  test("tiny sketch forces the fallback and the result is STILL exact") {
    // Near-uniform distribution: with sketchSize barely over k the
    // k-th count cannot beat the slack, so the gate must reject.
    val vals = (1 to 5000).map(i => s"u${i % 400}")
    val got = HeavyHitters.exactTopK(vals.toDF("v"), "v", 20, sketchSize = 21)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == reference(vals, 20))
  }

  test("fewer distinct values than k, nulls skipped, empty input") {
    val vals = Seq("a", "a", "b", null, "a", null)
    val got = HeavyHitters.exactTopK(vals.toDF("v"), "v", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 1L)))
    assert(HeavyHitters.exactTopK(
      Seq.empty[String].toDF("v"), "v", 5).count() == 0L)
  }

  test("MG slack bound: any absent value's true count <= slack") {
    val rnd = new scala.util.Random(3)
    val stream = Seq.fill(50000)(s"x${rnd.nextInt(3000)}")
    val s = new MgSummary(64)
    stream.foreach(v => s.add(v))
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (v, n) =>
      if (!s.counts.contains(v))
        assert(n <= s.slack, s"absent $v has count $n > slack ${s.slack}")
      else
        assert(s.counts(v) <= n, "MG never overcounts")
    }
    // Merge keeps the bound: split the stream across 8 summaries.
    val merged = stream.grouped(6250).map { chunk =>
      val m = new MgSummary(64); chunk.foreach(m.add(_)); m
    }.reduce((a, b) => a.merge(b))
    truth.foreach { case (v, n) =>
      if (!merged.counts.contains(v)) assert(n <= merged.slack)
    }
  }

  test("invalid parameters raise") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exactTopK(Seq("a").toDF("v"), "v", 0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.exactTopK(Seq("a").toDF("v"), "v", 10, sketchSize = 5)
    }
  }
}
