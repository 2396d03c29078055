package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Versioned
import graft.operators.Versioned.MergeClause._
import graft.sources.GraftDml

/** Cross-surface concurrency soak: SQL DML statements, Scala-API
  * mutations, and appendOnce streaming batches race on ONE table, three
  * seeded waves. Each writer owns a disjoint key range and mirrors its
  * ops in a driver-local model; optimistic concurrency means an op may
  * surface ConcurrentModificationException (retried here, as a real
  * writer would) but may NEVER silently drop or double an effect — the
  * final table must equal the union of the models exactly, row for row.
  * API-vs-API races are covered by VersionedMutationSpec /
  * MergeClausesSpec; this is the seam BETWEEN surfaces (they share the
  * expected-parent publication protocol, which this spec proves). */
class CrossSurfaceSoakSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sql = {
    val s = GraftDml.enabledSession(spark)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run `op`, retrying while the failure chain carries a
    * ConcurrentModificationException (the optimistic-concurrency
    * signal, however wrapped by the SQL execution path). */
  private def retrying(op: => Unit): Unit = {
    var done = false
    while (!done) {
      try { op; done = true }
      catch {
        case e: Throwable =>
          val cme = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .exists(_.isInstanceOf[java.util.ConcurrentModificationException])
          if (!cme) throw e
      }
    }
  }

  test("SQL DML, API mutations and appendOnce batches race without losing or doubling effects") {
    for (seed <- Seq(13, 37, 61)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-soak$seed").toString + "/t"
      Versioned.commit(
        (0L until 500L).map(i => (i, "init", i)).toDF("id", "v", "w"), dir)
      Versioned.append(
        (500L until 1000L).map(i => (i, "init", i)).toDF("id", "v", "w"), dir)

      // each writer's model: id -> (v, w); starts as its slice of the seed
      def slice(lo: Long, hi: Long) = scala.collection.mutable.Map(
        (lo until hi).map(i => i -> ("init", i)): _*)

      // ---- writer A: SQL surface, owns ids [0, 300) + inserts [1500, ...)
      val modelA = slice(0L, 300L)
      val opsA = Seq.fill(5)(rnd.nextInt(3))
      val insTagA = new java.util.concurrent.atomic.AtomicInteger(0)
      val a = new Thread(() => opsA.zipWithIndex.foreach { case (op, k) =>
        val lo = (k * 53L) % 250L
        op match {
          case 0 =>
            retrying(sql.sql(
              s"UPDATE graft.`$dir` SET v = 'sqlU$k' WHERE id >= $lo AND id < ${lo + 40}"))
            modelA.keys.filter(i => i >= lo && i < lo + 40)
              .foreach(i => modelA(i) = ("sqlU" + k, modelA(i)._2))
          case 1 =>
            retrying(sql.sql(
              s"DELETE FROM graft.`$dir` WHERE id >= $lo AND id < ${lo + 15}"))
            (lo until lo + 15).foreach(modelA.remove)
          case 2 =>
            val base = 1500L + insTagA.getAndIncrement() * 10L
            val view = s"soak_src_${seed}_$k"
            locally {
              val ss = sql; import ss.implicits._
              (base until base + 10L).map(i => (i, s"ins$k"))
                .toDF("id", "v").createOrReplaceTempView(view)
            }
            retrying(sql.sql(
              s"""MERGE INTO graft.`$dir` t USING $view s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                 |""".stripMargin))
            (base until base + 10L).foreach(i =>
              modelA(i) = (s"ins$k", -1L)) // -1 marks NULL w below
        }
      })

      // ---- writer B: Scala API, owns ids [300, 600) + inserts [2500, ...)
      val modelB = slice(300L, 600L)
      val opsB = Seq.fill(5)(rnd.nextInt(3))
      val insTagB = new java.util.concurrent.atomic.AtomicInteger(0)
      val b = new Thread(() => opsB.zipWithIndex.foreach { case (op, k) =>
        val lo = 300L + (k * 47L) % 250L
        op match {
          case 0 =>
            retrying(Versioned.update(spark, dir,
              col("id") >= lo && col("id") < lo + 40, "v" -> lit(s"apiU$k")))
            modelB.keys.filter(i => i >= lo && i < lo + 40)
              .foreach(i => modelB(i) = ("apiU" + k, modelB(i)._2))
          case 1 =>
            retrying(Versioned.delete(spark, dir)(
              col("id") >= lo && col("id") < lo + 15))
            (lo until lo + 15).foreach(modelB.remove)
          case 2 =>
            val base = 2500L + insTagB.getAndIncrement() * 10L
            val src = (base until base + 10L).map(i => (i, s"mrg$k", 7L))
              .toDF("id", "v", "w")
            retrying(Versioned.mergeClauses(spark, dir, src, Seq("id"),
              Seq(MatchedUpdate(Seq("v" -> col("SRC.v"))), NotMatchedInsert())))
            (base until base + 10L).foreach(i => modelB(i) = (s"mrg$k", 7L))
        }
      })

      // ---- writer C: appendOnce stream, fresh ids [5000, ...); every
      // other batch is REPLAYED (same batchId) and must commit once.
      val modelC = scala.collection.mutable.Map.empty[Long, (String, Long)]
      val c = new Thread(() => (0 until 4).foreach { batch =>
        val base = 5000L + batch * 20L
        val df = (base until base + 20L).map(i => (i, s"b$batch", i))
          .toDF("id", "v", "w")
        val first = Versioned.appendOnce(df, dir, s"soak$seed", batch.toLong)
        assert(first.isDefined, s"batch $batch must commit")
        if (batch % 2 == 0) {
          val replay = Versioned.appendOnce(df, dir, s"soak$seed", batch.toLong)
          assert(replay.isEmpty, s"replayed batch $batch must be skipped")
        }
        (base until base + 20L).foreach(i => modelC(i) = (s"b$batch", i))
      })

      // surface failures from the writer threads (a swallowed assertion
      // would green-wash the soak)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      Seq(a, b, c).foreach(_.setUncaughtExceptionHandler((_, e) => failures.add(e)))
      a.start(); b.start(); c.start()
      a.join(); b.join(); c.join()
      if (!failures.isEmpty) throw failures.peek()

      // untouched slice [600, 1000) + the three models = the table
      val want: Map[Long, (String, Long)] =
        (600L until 1000L).map(i => i -> ("init", i)).toMap ++
          modelA ++ modelB ++ modelC
      val got = Versioned.read(spark, dir)
        .select(col("id"), col("v"),
          coalesce(col("w"), lit(-1L)).as("w")) // NULL w (partial insert) = -1
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got.size == want.size,
        s"seed=$seed: ${got.size} rows vs ${want.size} expected; " +
          s"missing=${(want.keySet -- got.keySet).take(8)} " +
          s"extra=${(got.keySet -- want.keySet).take(8)}")
      assert(got == want,
        s"seed=$seed drifted: ${want.collect { case (k, v) if got.get(k).exists(_ != v) =>
          k -> (v, got(k)) }.take(8)}")
    }
  }
}
