package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Versioned
import graft.operators.Versioned.MergeClause
import graft.operators.Versioned.MergeClause._

/** Randomized soak of [[Versioned.mergeClauses]] against an in-memory
  * reference interpreter: random two-group tables, random sources
  * (overlapping + fresh keys), random clause programs from a small
  * condition/assignment algebra — every row of the outcome must equal
  * the reference's first-applicable evaluation, across three seeded
  * waves. This is the adversarial gate for the general-merge rewrite
  * (branch ids, when-chain ordering, drop filtering, per-column CASE,
  * insert anti-join, by-source widening). */
class MergeClausesPropertySpec extends SparkSpec {
  import spark.implicits._

  type R = (Long, String, Long) // (id, v, w)

  /** A generated condition: its Column form and its reference
    * evaluation over (target row, matched source row). Target-only
    * conditions ignore the source. */
  private case class Cond(
      col: Column, tgtOnly: Boolean, eval: (R, Option[R]) => Boolean)

  /** A generated assignment: column name, Column value, reference. */
  private case class Assign(
      name: String, col: Column, eval: (R, Option[R]) => Any)

  private def conds(rnd: scala.util.Random): Cond = rnd.nextInt(4) match {
    case 0 =>
      val k = rnd.nextInt(2000).toLong
      Cond(org.apache.spark.sql.functions.col("TGT.w") < k, tgtOnly = true,
        (t, _) => t._3 < k)
    case 1 =>
      val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
      Cond(org.apache.spark.sql.functions.col("TGT.id") % m === r, tgtOnly = true,
        (t, _) => t._1 % m == r)
    case 2 =>
      val k = rnd.nextInt(50).toLong
      Cond(org.apache.spark.sql.functions.col("SRC.w") > k, tgtOnly = false,
        (_, s) => s.exists(_._3 > k))
    case _ =>
      Cond(org.apache.spark.sql.functions.col("TGT.id") >= 0L, tgtOnly = true,
        (_, _) => true)
  }

  private def assigns(rnd: scala.util.Random, tgtOnly: Boolean): Assign =
    rnd.nextInt(if (tgtOnly) 2 else 4) match {
      case 0 =>
        val k = rnd.nextInt(100).toLong
        Assign("w", lit(k), (_, _) => k)
      case 1 =>
        val s = s"c${rnd.nextInt(5)}"
        Assign("v", lit(s), (_, _) => s)
      case 2 =>
        Assign("w", org.apache.spark.sql.functions.col("TGT.w") +
          org.apache.spark.sql.functions.col("SRC.w"),
          (t, s) => t._3 + s.get._3)
      case _ =>
        Assign("v", concat(org.apache.spark.sql.functions.col("SRC.v"), lit("#")),
          (_, s) => s.get._2 + "#")
    }

  /** Reference interpreter with first-applicable-per-category semantics. */
  private def reference(
      target: Seq[R], source: Seq[R],
      matched: Seq[(Option[Cond], Option[Seq[Assign]])], // None assigns = DELETE
      insert: Option[Option[Cond]],
      bySource: Seq[(Option[Cond], Option[Seq[Assign]])]): Map[Long, (String, Long)] = {
    val srcByKey = source.map(r => r._1 -> r).toMap
    val out = scala.collection.mutable.Map[Long, (String, Long)]()
    target.foreach { t =>
      val s = srcByKey.get(t._1)
      val program = if (s.isDefined) matched else bySource
      program.find { case (c, _) => c.forall(_.eval(t, s)) } match {
        case Some((_, None)) => () // delete
        case Some((_, Some(as))) =>
          var (v, w) = (t._2, t._3)
          as.foreach { a =>
            if (a.name == "v") v = a.eval(t, s).asInstanceOf[String]
            else w = a.eval(t, s).asInstanceOf[Long]
          }
          out(t._1) = (v, w)
        case None => out(t._1) = (t._2, t._3) // unclaimed: carry
      }
    }
    insert.foreach { cond =>
      val tgtKeys = target.map(_._1).toSet
      source.filterNot(r => tgtKeys(r._1))
        .filter(r => cond.forall(_.eval(r, Some(r)))) // insert conds see SRC
        .foreach(r => out(r._1) = (r._2, r._3))
    }
    out.toMap
  }

  test("random clause programs match the reference interpreter (3 seeded waves)") {
    for (seed <- Seq(7, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(120)
      val target: Seq[R] = (0 until n).map(i =>
        (i.toLong, s"t$i", rnd.nextInt(2000).toLong))
      // source: some matched keys, some fresh; unique keys
      val matchedKeys = rnd.shuffle(target.map(_._1)).take(rnd.nextInt(n / 2))
      val freshKeys = (0 until rnd.nextInt(20)).map(i => 100000L + i)
      val source: Seq[R] = (matchedKeys ++ freshKeys).map(k =>
        (k, s"s$k", rnd.nextInt(100).toLong))

      // clause program: 1-2 matched, maybe insert, maybe by-source
      def genAction(tgtOnly: Boolean): Option[Seq[Assign]] =
        if (rnd.nextInt(3) == 0) None // DELETE
        else Some(Seq.fill(1 + rnd.nextInt(2))(assigns(rnd, tgtOnly))
          .groupBy(_.name).map(_._2.head).toSeq) // one assign per column
      val matchedProg = (0 until 1 + rnd.nextInt(2)).map { i =>
        val c = if (i == 0 && rnd.nextBoolean()) Some(conds(rnd)) else
          if (i == 0) Some(conds(rnd)) else None // last clause often catch-all
        (c, genAction(tgtOnly = false))
      }
      val insertProg =
        if (rnd.nextBoolean())
          Some(if (rnd.nextBoolean()) Some(conds(rnd)).filter(_.tgtOnly == false)
          else None)
        else None
      val bySourceProg =
        if (rnd.nextBoolean()) {
          val c = Some(conds(rnd)).filter(_.tgtOnly)
          Seq((c, genAction(tgtOnly = true)))
        } else Seq.empty

      // build the table (two groups split at n/2) and run the operator
      val dir = Files.createTempDirectory(s"graft-mrgp$seed").toString + "/t"
      Versioned.commit(target.filter(_._1 < n / 2).toDF("id", "v", "w"), dir)
      Versioned.append(target.filter(_._1 >= n / 2).toDF("id", "v", "w"), dir)
      val clauses: Seq[MergeClause] =
        matchedProg.map {
          case (c, None) => MatchedDelete(c.map(_.col))
          case (c, Some(as)) =>
            MatchedUpdate(as.map(a => a.name -> a.col), c.map(_.col))
        } ++ insertProg.map(c => NotMatchedInsert(c.map(_.col))).toSeq ++
          bySourceProg.map {
            case (c, None) => NotMatchedBySourceDelete(c.map(_.col))
            case (c, Some(as)) =>
              NotMatchedBySourceUpdate(as.map(a => a.name -> a.col), c.map(_.col))
          }
      Versioned.mergeClauses(spark, dir, source.toDF("id", "v", "w"),
        Seq("id"), clauses)

      val got = Versioned.read(spark, dir).as[R].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = reference(target, source,
        matchedProg.map { case (c, as) => (c, as) },
        insertProg, bySourceProg)
      assert(got == want,
        s"seed=$seed n=$n clauses=${clauses.map(_.getClass.getSimpleName)}: " +
          s"missing=${(want.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- want.keySet).take(5)} " +
          s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) =>
            k -> (v, got(k)) }.take(5)}")
    }
  }

  test("by-source-only programs with DUP-KEYED sources match the reference (3 seeded waves)") {
    // No MATCHED clause → duplicate source keys are legal (the source is
    // only a match flag); the rewrite must not multiply matched rows.
    for (seed <- Seq(11, 29, 53)) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(120)
      val target: Seq[R] = (0 until n).map(i =>
        (i.toLong, s"t$i", rnd.nextInt(2000).toLong))
      val baseKeys = rnd.shuffle(target.map(_._1)).take(1 + rnd.nextInt(n / 2))
      val source: Seq[R] = baseKeys.flatMap { k =>
        (0 until 1 + rnd.nextInt(3)).map(j => (k, s"s$k-$j", rnd.nextInt(100).toLong))
      }
      val bySourceProg = (0 until 1 + rnd.nextInt(2)).map { _ =>
        val c = Some(conds(rnd)).filter(_.tgtOnly)
        (c, if (rnd.nextInt(3) == 0) None
            else Some(Seq(assigns(rnd, tgtOnly = true))))
      }
      val dir = Files.createTempDirectory(s"graft-mrgd$seed").toString + "/t"
      Versioned.commit(target.filter(_._1 < n / 2).toDF("id", "v", "w"), dir)
      Versioned.append(target.filter(_._1 >= n / 2).toDF("id", "v", "w"), dir)
      val clauses: Seq[MergeClause] = bySourceProg.map {
        case (c, None) => NotMatchedBySourceDelete(c.map(_.col))
        case (c, Some(as)) =>
          NotMatchedBySourceUpdate(as.map(a => a.name -> a.col), c.map(_.col))
      }
      Versioned.mergeClauses(spark, dir, source.toDF("id", "v", "w"),
        Seq("id"), clauses)
      val got = Versioned.read(spark, dir).as[R].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val gotSize = Versioned.read(spark, dir).count()
      assert(gotSize == got.size, s"seed=$seed: duplicated target rows " +
        s"(${gotSize} rows, ${got.size} distinct keys)")
      val want = reference(target, source,
        matched = Seq.empty, insert = None, bySource = bySourceProg)
      assert(got == want,
        s"seed=$seed n=$n: missing=${(want.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- want.keySet).take(5)}")
    }
  }
}
