package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

import scala.util.Random

class SemanticJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randUnit(rnd: Random, d: Int): Array[Float] = {
    val v = Array.fill(d)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / n)
  }

  test("exact semantic join: best match above floor, NULL below, left rows all kept") {
    val rnd = new Random(31)
    val d = 16
    val anchors = Seq.tabulate(5)(_ => randUnit(rnd, d))
    // Right corpus: two jittered copies of each anchor; left probes:
    // one near-copy per anchor (guaranteed high match) plus one probe
    // orthogonal-ish to everything (below the floor).
    val right = anchors.zipWithIndex.flatMap { case (a, i) =>
      Seq(100L + i, 200L + i).map { id =>
        (id, a.map(x => x + rnd.nextGaussian().toFloat * 0.01f))
      }
    }.toDF("vec_id", "embedding")
    val left = (anchors.zipWithIndex.map { case (a, i) =>
      (i.toLong, a.map(x => x + rnd.nextGaussian().toFloat * 0.01f))
    } :+ (99L, randUnit(rnd, d))).toDF("vec_id", "embedding")

    val out = Similarity.semanticJoin(left, right, "embedding", "vec_id", minCosine = 0.9)
      .select("vec_id", "match_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out.size == 6, "every left row must survive the left join")
    for (i <- 0 until 5)
      assert(out(i.toLong).exists(m => m == 100L + i || m == 200L + i),
        s"probe $i matched ${out(i.toLong)}")
    // The random probe is near-orthogonal to every anchor w.h.p. at the
    // 0.9 floor.
    assert(out(99L).isEmpty, s"unrelated probe matched ${out(99L)}")
  }

  test("exact flavor equals the naive argmax; ann flavor recalls most matches") {
    val rnd = new Random(77)
    val d = 16
    val right = Seq.tabulate(60)(i => (i.toLong, randUnit(rnd, d))).toDF("vec_id", "embedding")
    val left = Seq.tabulate(20)(i => (1000L + i, randUnit(rnd, d))).toDF("vec_id", "embedding")
    val exact = Similarity.semanticJoin(left, right, "embedding", "vec_id", minCosine = -1.0)
      .select("vec_id", "match_id").as[(Long, Long)].collect().toMap
    // Naive ground truth on the driver.
    val rv = right.as[(Long, Array[Float])].collect()
    val lv = left.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x * x.toDouble).sum)
      dot / (na * nb)
    }
    val want = lv.map { case (lid, le) =>
      lid -> rv.map { case (rid, re) => (rid, cos(le, re)) }
        .minBy { case (rid, c) => (-c, rid) }._1
    }.toMap
    assert(exact == want)
    val ann = Similarity.semanticJoin(left, right, "embedding", "vec_id",
      minCosine = -1.0, exact = false, tables = 16, planesPerTable = 4)
      .select("vec_id", "match_id").collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> r.getLong(1) }.toMap
    val agree = want.count { case (l, m) => ann.get(l).contains(m) }
    assert(agree >= 10, s"ANN flavor recalled only $agree/20 exact matches")
  }
}
