package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Randomized soak of the versioned DML triad: a random interleaving of
  * COW delete/update/merge (plus appends) must leave the table
  * row-identical to a naive in-memory reference model applying the same
  * operations — across every seed, with pruning/carry-over decisions
  * exercised by range-keyed appends. Also checks the manifest row count
  * stays exact and history remains readable after every step. */
class MutationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-mutprop").toString + "/t"

  test("random delete/update/merge interleavings match the reference model") {
    // Three deletion-vector regimes over the SAME interleavings:
    // 0.0 = pure copy-on-write, 1.0 = every delete/update goes
    // merge-on-read (position sidecars + updated-copies groups), 0.5 =
    // per-group mixed. The model must be reached identically in all
    // three — a DV'd row that re-matched, blocked an insert, or
    // resurrected under a later rewrite diverges the content; a wrong
    // DV count diverges the manifest n_rows check.
    for (dvFrac <- Seq("0.0", "0.5", "1.0"); seed <- Seq(1, 7, 23)) {
      spark.conf.set("spark.graft.dv.maxDeleteFraction", dvFrac)
      try mutationSoak(seed, dvFrac)
      finally spark.conf.unset("spark.graft.dv.maxDeleteFraction")
    }
  }

  private def mutationSoak(seed: Int, dvFrac: String): Unit = {
    {
      val rnd = new scala.util.Random(seed)
      val dir = tbl()
      // Reference model: id -> (v, score)
      var model = scala.collection.mutable.Map[Long, (String, Long)]()

      def df(rows: Seq[(Long, String, Long)]) = rows.toDF("id", "v", "score")
      def freshRows(lo: Long, n: Int) =
        (lo until lo + n).map(i => (i, s"r$i", rnd.nextInt(1000).toLong))

      val init = freshRows(0L, 200)
      Versioned.commit(df(init), dir)
      init.foreach { case (i, v, sc) => model(i) = (v, sc) }

      var nextId = 1000L
      for (step <- 1 to 14) {
        rnd.nextInt(5) match {
          case 0 => // append a fresh disjoint range (makes pruning meaningful)
            val rows = freshRows(nextId, 50); nextId += 1000
            Versioned.append(df(rows), dir)
            rows.foreach { case (i, v, sc) => model(i) = (v, sc) }
          case 1 => // delete a random score band
            val lo = rnd.nextInt(900).toLong
            Versioned.delete(spark, dir)(
              col("score") >= lo && col("score") < lo + 150L)
            model = model.filterNot { case (_, (_, sc)) => sc >= lo && sc < lo + 150 }
          case 2 => // update a random id band
            val lo = if (rnd.nextBoolean()) rnd.nextInt(200).toLong
                     else 1000L * (1 + rnd.nextInt(3))
            Versioned.update(spark, dir,
              col("id") >= lo && col("id") < lo + 60L,
              "v" -> concat(col("v"), lit(s"_u$step")),
              "score" -> (col("score") + 10000L))
            model.keys.toSeq.filter(i => i >= lo && i < lo + 60).foreach { i =>
              val (v, sc) = model(i); model(i) = (v + s"_u$step", sc + 10000L)
            }
          case 3 => // merge: replace a sample of existing ids + insert new
            val existing = model.keys.toSeq.sorted
            val hit = rnd.shuffle(existing).take(math.min(20, existing.size))
            val ins = freshRows(nextId, 10); nextId += 1000
            val srcRows = hit.map(i => (i, s"m$step", -1L)) ++ ins
            Versioned.merge(spark, dir, df(srcRows), Seq("id"))
            srcRows.foreach { case (i, v, sc) => model(i) = (v, sc) }
          case 4 => // SQL-shaped clause merge: conditional matched
            // DELETE + matched UPDATE + INSERT — under the DV regimes
            // the matched claims ride position sidecars (mixed claims
            // publish mode 'merge'; pure shapes relabel delete/update)
            import Versioned.MergeClause._
            val existing = model.keys.toSeq.sorted
            val hit = rnd.shuffle(existing).take(math.min(16, existing.size))
            val ins = freshRows(nextId, 5); nextId += 1000
            val srcRows = hit.map(i =>
              (i, s"g$step", if (rnd.nextBoolean()) -1L else 5L)) ++ ins
            Versioned.mergeClauses(spark, dir, df(srcRows), Seq("id"), Seq(
              MatchedDelete(Some(col("SRC.score") < 0L)),
              MatchedUpdate(Seq("v" -> col("SRC.v"),
                "score" -> (col("TGT.score") + 1L))),
              NotMatchedInsert()))
            srcRows.foreach { case (i, v, sc) =>
              if (model.contains(i)) {
                if (sc < 0L) model.remove(i)
                else { val (_, old) = model(i); model(i) = (v, old + 1L) }
              } else model(i) = (v, sc)
            }
        }
        // Invariants after EVERY step: content equals the model, the
        // manifest row count is exact, history still reads.
        val got = Versioned.read(spark, dir)
          .select("id", "v", "score").as[(Long, String, Long)]
          .collect().sorted.toSeq
        val want = model.toSeq.map { case (i, (v, sc)) => (i, v, sc) }.sorted
        assert(got == want, s"seed=$seed dvFrac=$dvFrac step=$step: " +
          s"content diverged (got ${got.size} rows, want ${want.size})")
        val latest = Versioned.latestVersion(spark, dir)
        val manifestRows = Versioned.versions(spark, dir)
          .filter(col("version") === latest).select("n_rows").as[Long].head()
        assert(manifestRows == want.size.toLong,
          s"seed=$seed dvFrac=$dvFrac step=$step: " +
            s"manifest n_rows $manifestRows != ${want.size}")
        // per-group counts must reconcile: sum(file_rows) - sum(dv) = live
        val mLatest = Versioned.parseManifest(spark, dir, latest)
        assert(mLatest.fileRows.keySet == mLatest.files.toSet,
          s"seed=$seed dvFrac=$dvFrac step=$step: file_rows misaligned")
        assert(mLatest.fileRows.values.sum - mLatest.dvs.map(_._3).sum ==
          want.size.toLong,
          s"seed=$seed dvFrac=$dvFrac step=$step: per-group counts diverged")
        assert(Versioned.read(spark, dir, 0L).count() == 200L,
          "genesis version must stay readable")
      }
    }
  }
}
