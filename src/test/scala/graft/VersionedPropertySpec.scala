package graft

import java.nio.file.Files

import graft.operators.Versioned

/** Property soak for the versioned-table layer: random sequences of
  * commit / append / compact / vacuum against an in-memory model (fixed
  * seed — deterministic). The invariants a time-travel user relies on:
  *   - read(v) equals the model's snapshot at v, for every live version,
  *     after ANY interleaving of operations;
  *   - vacuum never changes the contents of kept versions;
  *   - compact is content-invisible (a snapshot of the parent's rows);
  *   - changes(a, b) over any all-append window equals the model's
  *     appended-rows difference;
  *   - version numbers are a gap-free ascending sequence as committed.
  */
class VersionedPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  test("random commit/append/compact/vacuum sequences match the in-memory model") {
    (1 to 5).foreach { _ =>
      val dir = Files.createTempDirectory("graft-vprop").toString + "/t"
      // model(v) = the full id multiset visible at version v
      val model = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      // append-run bookkeeping for changes(): mode per version
      val modes = scala.collection.mutable.ArrayBuffer.empty[String]
      var vacuumedBelow = 0L
      var nextId = 0L
      var cursor = 0L // the CDC consumer's only state
      def batch(): Seq[Long] = {
        val ids = (0 until (1 + rnd.nextInt(8))).map(i => nextId + i)
        nextId += ids.size
        ids.map(_.toLong)
      }

      val ops = 5 + rnd.nextInt(5)
      (0 until ops).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 =>
            val b = batch()
            val v = Versioned.commit(b.toDF("id"), dir)
            model += b
            modes += "snapshot"
            assert(v == model.size - 1, s"version must be gap-free: $v")
          case 1 =>
            val b = batch()
            val v = Versioned.append(b.toDF("id"), dir)
            val parent = if (model.isEmpty) Seq.empty else model.last
            model += (parent ++ b)
            modes += "append"
            assert(v == model.size - 1)
          case 2 if model.nonEmpty =>
            val v = Versioned.compact(spark, dir)
            model += model.last // content-invisible
            modes += "optimize"
            assert(v == model.size - 1)
          case 3 if model.size >= 2 && vacuumedBelow < model.size - 1 =>
            val keepFrom = vacuumedBelow + 1 + rnd.nextInt((model.size - 1 - vacuumedBelow).toInt)
            Versioned.vacuum(spark, dir, keepFrom)
            vacuumedBelow = keepFrom
          case _ => () // op not applicable yet: skip
        }
        // Every LIVE version must read back exactly the model snapshot.
        (vacuumedBelow.toInt until model.size).foreach { v =>
          val got = Versioned.read(spark, dir, v)
            .as[Long].collect().sorted.toSeq
          assert(got == model(v).sorted,
            s"version $v drifted from the model after ${model.size} versions")
        }
        // A modeled CDC consumer polls after every op: append windows
        // must hand back exactly the appended delta; a snapshot in the
        // window or a vacuumed-away cursor must resync with the full
        // latest. The consumer state is ONE long (the cursor).
        if (model.nonEmpty) {
          val (df, c2, resync) = Versioned.pollChanges(spark, dir, cursor)
          val got = df.as[Long].collect().sorted.toSeq
          val latest = model.size - 1
          val want =
            if (cursor >= latest) Seq.empty[Long]
            else if (resync) model(latest).sorted
            else model(latest).diff(model(cursor.toInt)).sorted
          assert(got == want,
            s"consumer drifted at cursor=$cursor latest=$latest resync=$resync")
          // resync is mandatory exactly when the window is not all-append
          val windowAppend = cursor >= vacuumedBelow && cursor < latest &&
            ((cursor.toInt + 1) to latest).forall(v => modes(v) == "append")
          if (cursor < latest)
            assert(resync == !windowAppend,
              s"resync=$resync but windowAppend=$windowAppend at cursor=$cursor")
          cursor = c2
        }
        // changes() over every live all-append window equals the model's
        // appended-rows difference (as a multiset).
        (vacuumedBelow.toInt until model.size).foreach { from =>
          var to = from + 1
          while (to < model.size && modes(to) == "append") {
            val got = Versioned.changes(spark, dir, from, to)
              .as[Long].collect().sorted.toSeq
            val want = model(to).diff(model(from)).sorted
            assert(got == want,
              s"changes($from, $to) drifted: got $got want $want")
            to += 1
          }
        }
      }
      // Vacuumed versions are gone, loudly.
      (0 until vacuumedBelow.toInt).foreach { v =>
        intercept[Exception] { Versioned.read(spark, dir, v) }
      }
    }
  }
}
