package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval matches the naive non-equi join, incl. bin boundaries and negatives") {
    val rnd = new Random(991)
    val pts = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble() * 200 - 100))
    // Mix of short, long (multi-bin), boundary-aligned, and degenerate intervals.
    val ivs = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 200 - 100
      val len = rnd.nextInt(4) match {
        case 0 => 0.0                    // degenerate: matches nothing
        case 1 => rnd.nextDouble() * 2   // sub-bin
        case 2 => rnd.nextDouble() * 60  // multi-bin
        case _ => 10.0                   // often boundary-ish
      }
      (i.toLong, lo, lo + len)
    } ++ Seq((97L, -10.0, -10.0 + 10.0), (98L, 0.0, 10.0), (99L, -20.0, 20.0))
    val p = pts.toDF("pid", "v")
    val iv = ivs.toDF("iid", "lo", "hi")
    for (w <- Seq(1.0, 10.0, 500.0)) {
      val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (pid, v) <- pts; (iid, lo, hi) <- ivs if v >= lo && v < hi
      } yield (pid, iid)).sorted
      assert(got == want, s"binWidth=$w")
    }
  }

  test("interval overlap matches naive, each pair exactly once across bin widths") {
    val rnd = new Random(4117)
    val ls = Seq.tabulate(120) { i =>
      val lo = rnd.nextDouble() * 100 - 50; (i.toLong, lo, lo + rnd.nextDouble() * 30)
    }
    val rs = Seq.tabulate(90) { i =>
      val lo = rnd.nextDouble() * 100 - 50; (i.toLong, lo, lo + rnd.nextDouble() * 5)
    }
    val l = ls.toDF("lid", "llo", "lhi")
    val r = rs.toDF("rid", "rlo", "rhi")
    val want = (for {
      (lid, llo, lhi) <- ls; (rid, rlo, rhi) <- rs
      if llo < rhi && rlo < lhi && llo < lhi && rlo < rhi
    } yield (lid, rid)).sorted
    for (w <- Seq(2.0, 15.0, 1000.0)) {
      val got = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", binWidth = w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"binWidth=$w (duplicates or misses)")
    }
  }

  test("plans an equi-join on the bin, not a nested-loop cross product") {
    val p = Seq.tabulate(100)(i => (i.toLong, i.toDouble)).toDF("pid", "v")
    val iv = Seq.tabulate(100)(i => (i.toLong, i * 3.0, i * 3.0 + 10)).toDF("iid", "lo", "hi")
    for (out <- Seq(
        RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", binWidth = 10),
        RangeJoin.intervalOverlap(iv, "lo", "hi",
          p.select(col("pid"), col("v").as("plo"), (col("v") + 1.0).as("phi")),
          "plo", "phi", binWidth = 10))) {
      out.count() // force planning through AQE
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"nested loop in plan:\n$plan")
      assert(plan.contains("Join"), s"expected a join in plan:\n$plan")
    }
  }
}
