package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Randomized CDF-REPLAY soak — the change feed's end-to-end contract:
  * over random interleavings of appends, merge-on-read deletes/updates
  * and DV-backed clause merges, applying `tableChanges(0)`'s rows in
  * `_commit_version` order (insert/update_postimage upsert by key,
  * delete removes, update_preimage must MATCH the replayed state) must
  * reconstruct the live table exactly. This adversarially exercises the
  * run consolidation (min-over-appearances attribution, postimage
  * collapse, absorb folds under a tight `maxArtifacts`) against shapes
  * a deterministic spec cannot enumerate: re-mutation of copies groups,
  * runs split by interleaved appends, mixed-kind merges mid-run. */
class CdfReplayPropertySpec extends SparkSpec {
  import spark.implicits._

  private def tbl() = Files.createTempDirectory("graft-cdfprop").toString + "/t"

  test("replaying table_changes(0) in commit order reconstructs the table") {
    for (seed <- Seq(3, 11, 42)) {
      // every delete/update merge-on-read; tight artifact bound so the
      // absorb fold fires repeatedly under the soak; cumulative
      // pressure disabled so no step materializes into a rewrite (the
      // feed refuses across rewrites by contract — not under test here)
      spark.conf.set("spark.graft.dv.maxDeleteFraction", "1.0")
      spark.conf.set("spark.graft.dv.maxCumulativeFraction", "1.0")
      spark.conf.set("spark.graft.dv.maxArtifacts", "2")
      try soak(seed)
      finally {
        spark.conf.unset("spark.graft.dv.maxDeleteFraction")
        spark.conf.unset("spark.graft.dv.maxCumulativeFraction")
        spark.conf.unset("spark.graft.dv.maxArtifacts")
      }
    }
  }

  private def soak(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tbl()
    def df(rows: Seq[(Long, String, Long)]) = rows.toDF("id", "v", "score")
    def freshRows(lo: Long, n: Int) =
      (lo until lo + n).map(i => (i, s"r$i", rnd.nextInt(1000).toLong))
    // step model only tracks LIVE keys so mutations pick real targets;
    // the REPLAY model below is built purely from the feed
    val live = scala.collection.mutable.Set[Long]()
    val init = freshRows(0L, 120)
    Versioned.commit(df(init), dir)
    live ++= init.map(_._1)
    var nextId = 1000L
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // append (splits DV runs, feeds the insert collapse)
          val rows = freshRows(nextId, 30); nextId += 1000
          Versioned.append(df(rows), dir)
          live ++= rows.map(_._1)
        case 1 => // merge-on-read delete of a random live-id sample
          val hit = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(6))
          Versioned.delete(spark, dir)(col("id").isin(hit: _*))
          live --= hit
        case 2 => // merge-on-read update of a random live-id sample
          val hit = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(6))
          if (hit.nonEmpty)
            Versioned.update(spark, dir, col("id").isin(hit: _*),
              "v" -> concat(col("v"), lit(s"_u$step")),
              "score" -> (col("score") + 10000L))
        case 3 => // DV-backed clause merge: delete + update claims + inserts
          import Versioned.MergeClause._
          val hit = rnd.shuffle(live.toSeq).take(math.min(8, live.size))
          val ins = freshRows(nextId, 4); nextId += 1000
          val srcRows = hit.map(i =>
            (i, s"g$step", if (rnd.nextBoolean()) -1L else 5L)) ++ ins
          Versioned.mergeClauses(spark, dir, df(srcRows), Seq("id"), Seq(
            MatchedDelete(Some(col("SRC.score") < 0L)),
            MatchedUpdate(Seq("v" -> col("SRC.v"))),
            NotMatchedInsert()))
          srcRows.foreach { case (i, _, sc) =>
            if (live(i)) { if (sc < 0L) live -= i }
            else live += i
          }
      }
    }
    // ---- the replay ----
    val feed = Versioned.tableChanges(spark, dir, 0L)
      .select("id", "v", "score", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._5)
    val replayed = scala.collection.mutable.Map[Long, (String, Long)]()
    feed.groupBy(_._5).toSeq.sortBy(_._1).foreach { case (v, rows) =>
      // pre-images first: each must MATCH the replayed state (the feed
      // documents per-parent diffs applied in version order)
      rows.filter(_._4 == "update_preimage").foreach { case (id, vv, sc, _, _) =>
        assert(replayed.get(id).contains((vv, sc)),
          s"seed=$seed v$v: update_preimage of $id carries ($vv,$sc) but " +
            s"the replayed state has ${replayed.get(id)}")
      }
      rows.filter(_._4 == "delete").foreach { case (id, vv, sc, _, _) =>
        assert(replayed.get(id).contains((vv, sc)),
          s"seed=$seed v$v: delete of $id carries ($vv,$sc) but the " +
            s"replayed state has ${replayed.get(id)}")
        replayed.remove(id)
      }
      rows.filter(r => r._4 == "insert" || r._4 == "update_postimage")
        .foreach { case (id, vv, sc, _, _) => replayed(id) = (vv, sc) }
    }
    val table = Versioned.read(spark, dir)
      .select("id", "v", "score").as[(Long, String, Long)]
      .collect().map { case (i, vv, sc) => i -> (vv, sc) }.toMap
    assert(replayed.toMap == table,
      s"seed=$seed: replayed feed diverged from the live table " +
        s"(replayed ${replayed.size} rows, table ${table.size})")
    assert(table.keySet == live.toSet,
      s"seed=$seed: soak bookkeeping diverged from the table")
  }
}
