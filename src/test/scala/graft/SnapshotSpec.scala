package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("a", StringType),
    StructField("b", StringType)))

  private def df(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      schema)

  test("randomized diff matches a naive classification") {
    val rnd = new scala.util.Random(77L)
    def maybeNull(s: String): String = if (rnd.nextInt(8) == 0) null else s
    val base = (0L until 300L).map(i =>
      (i, maybeNull(s"a${rnd.nextInt(20)}"), maybeNull(s"b${rnd.nextInt(20)}")))
    // mutate: ~10% removed, ~15% changed, 40 added
    val removed = base.filter(_ => rnd.nextInt(10) == 0).map(_._1).toSet
    val changed = base.filter(r => !removed(r._1) && rnd.nextInt(7) == 0)
      .map(_._1).toSet
    val kept = base.filterNot(r => removed(r._1)).map { r =>
      if (changed(r._1)) (r._1, maybeNull(s"a${rnd.nextInt(20)}X"), r._3) else r
    }
    val added = (1000L until 1040L).map(i => (i, s"a$i", s"b$i"))
    val neu = kept ++ added

    val out = Snapshot.diff(df(base), df(neu), "id", Seq("a", "b"))
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val baseM = base.map(r => r._1 -> ((r._2, r._3))).toMap
    val neuM = neu.map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = (baseM.keySet ++ neuM.keySet).map { id =>
      id -> ((baseM.get(id), neuM.get(id)) match {
        case (None, Some(_))          => "added"
        case (Some(_), None)          => "removed"
        case (Some(o), Some(n)) if o == n => "unchanged"
        case _                        => "changed"
      })
    }.toMap
    assert(out == expected)
  }

  test("null vs empty string is 'changed', not a sentinel collision") {
    val o = df(Seq((1L, null, "x"), (2L, "", null), (3L, "v", "")))
    val n = df(Seq((1L, "", "x"), (2L, "", null), (3L, "v", null)))
    val out = Snapshot.diff(o, n, "id", Seq("a", "b"))
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("summary materializes all four statuses with zero rows") {
    val o = df(Seq((1L, "a", "b")))
    val n = df(Seq((1L, "a", "b"), (2L, "c", "d")))
    val rows = Snapshot.diffSummary(o, n, "id", Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("added", 1L, 2L), ("removed", 0L, 0L),
      ("changed", 0L, 0L), ("unchanged", 1L, 1L)))
  }

  test("payload never shuffles: join inputs are narrow (id, fp) frames") {
    // The pre-join projection is structural; pin it by checking the
    // optimized plan of the join contains no reference to the payload
    // columns other than inside the md5 projection (i.e. the join keys
    // and output are id/fp only).
    val o = df((0L until 50L).map(i => (i, s"a$i", s"b$i")))
    val n = df((0L until 50L).map(i => (i, s"a$i", s"b$i")))
    val out = Snapshot.diff(o, n, "id", Seq("a", "b"))
    assert(out.columns.toSeq == Seq("id", "status", "old_fp", "new_fp"))
    val plan = out.queryExecution.optimizedPlan.toString
    // the full outer join node's output must not carry columns a/b
    val joinLine = plan.linesIterator.find(_.contains("Join FullOuter")).get
    assert(!joinLine.contains("a#") && !joinLine.contains("b#"), joinLine)
  }
}
