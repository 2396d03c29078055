package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Randomized soak for the containment-dedup pipeline: the full Spark
  * implementation — winnow fingerprints, DF boilerplate guard, minFp
  * floor, integer cross-multiplied threshold, shorter→longer
  * orientation — must equal a FROM-SCRATCH naive Scala recomputation on
  * corpora with planted excerpts, exact clones, shared boilerplate, and
  * degenerate tiny/empty docs. Fixed master seed — deterministic. */
class ContainmentPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  // --- naive reference implementation (mirrors TextAnalysis semantics) --

  private val M = 1000000007L
  private val B = 257L
  private val K = 8
  private val W = 16

  private def normalize(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Distinct winnow fingerprints + gram count, same edge rules as
    * `TextAnalysis.winnowFingerprints`: n<k → empty; 0<nh<w → the single
    * global min; else distinct minima of every width-w window. */
  private def naiveFps(text: String): (Long, Set[Long]) = {
    val norm = normalize(text)
    val n = norm.length
    if (n < K) return (0L, Set.empty)
    val hashes = (0 to n - K).map { i =>
      var h = 0L
      (0 until K).foreach { j => h = (h * B + norm.charAt(i + j).toLong) % M }
      h
    }
    val nh = hashes.length
    val fps =
      if (nh < W) Set(hashes.min)
      else (0 to nh - W).map(t => hashes.slice(t, t + W).min).toSet
    (nh.toLong, fps)
  }

  private def naivePairs(
      docs: Seq[(Long, String)], maxDf: Int, minFp: Int,
      pct: Long): Set[(Long, Long, Long, Long)] = {
    val fps = docs.map { case (id, t) => id -> naiveFps(t) }.toMap
    val df = fps.values.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val kept = fps.map { case (id, (ng, s)) =>
      id -> (ng, s.filter(f => df(f) <= maxDf))
    }
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for ((ia, (ga, fa)) <- kept; (ib, (gb, fb)) <- kept
         if ia != ib && fa.size >= minFp) {
      val ov = (fa intersect fb).size.toLong
      val inner = fa.size.toLong
      val oriented = ga < gb || (ga == gb && ia < ib)
      if (ov > 0 && ov * 100L >= inner * pct && oriented)
        out += ((ia, ib, inner, ov))
    }
    out.toSet
  }

  // ------------------------------------------------- corpus construction

  private def word(): String = {
    val len = 3 + rnd.nextInt(6)
    (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def sentence(nWords: Int): String =
    (0 until nWords).map(_ => word()).mkString(" ")

  test("containment pairs equal the naive recomputation on planted corpora") {
    (1 to 3).foreach { wave =>
      val boiler = sentence(8) // shared by many docs — DF-guard fodder
      val base = (0 until 30).map { i =>
        val body = sentence(20 + rnd.nextInt(40))
        val withBoiler = if (i % 3 == 0) s"$boiler $body" else body
        (i.toLong, withBoiler)
      }
      // planted excerpts: interior substring of a random long doc
      val excerpts = (0 until 6).map { j =>
        val (srcId, srcText) = base(rnd.nextInt(base.size))
        val start = rnd.nextInt(math.max(1, srcText.length / 3))
        val len = 60 + rnd.nextInt(80)
        (1000L + j, srcText.slice(start, math.min(srcText.length, start + len)))
      }
      // exact clones + degenerate docs
      val clones = Seq((2000L, base(1)._2), (2001L, base(4)._2))
      val tiny = Seq((3000L, "ab"), (3001L, ""), (3002L, word()))
      val docs = base ++ excerpts ++ clones ++ tiny
      val maxDf = 5 + rnd.nextInt(10)
      val minFp = 3
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", maxDf = maxDf, minFp = minFp, minContain = 0.8)
        .select("inner_id", "outer_id", "inner_fp", "overlap_fp")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = naivePairs(docs, maxDf, minFp, 80L)
      assert(got == want,
        s"wave $wave (maxDf=$maxDf): spark=${got.size} naive=${want.size}; " +
          s"spark-only=${(got -- want).take(5)} naive-only=${(want -- got).take(5)}")
      // sanity: the waves actually exercise the operator (clones and/or
      // excerpts must surface)
      assert(want.nonEmpty, s"wave $wave produced no pairs — planting failed")
    }
  }
}
