package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Merge, Writes}
import graft.sources.{DataSource, TableRef}

/** Partition-scoped merge: a merge against a partitioned table must
  * rewrite ONLY partitions containing matched / inserted / moved rows —
  * untouched partitions keep the exact same files (names, sizes,
  * modification times), and the merged contents must equal the pure
  * [[Merge.apply]] plan over the pre-merge state. */
class MergePartitionedSpec extends SparkSpec {

  private val ds = DataSource("parquet")

  /** (path, length, modtime) of every data file under a partition dir. */
  private def files(table: String, frag: String): Set[(String, Long, Long)] = {
    val loc = new Path(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .location)
    val dir = new Path(loc, frag)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Set.empty
    else
      fs.listStatus(dir).filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime)).toSet
  }

  private def seed(table: String): Unit = {
    sql(s"DROP TABLE IF EXISTS $table")
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    sql(s"CREATE TABLE $table (k BIGINT, v DOUBLE, note STRING, p STRING) " +
      "USING parquet PARTITIONED BY (p)")
    sql(s"""INSERT INTO $table VALUES
           | (1, 1.0, 'one',   'a'), (2, 2.0, 'two',   'a'),
           | (3, 3.0, 'three', 'b'), (4, 4.0, 'four',  'b'),
           | (5, 5.0, 'five',  'c'), (6, 6.0, 'six',   'c'),
           | (7, 7.0, 'seven', 'd')""".stripMargin)
  }

  private def contents(df: DataFrame): Set[Seq[Any]] =
    df.select("k", "v", "note", "p").collect()
      .map(r => (0 until r.length).map(r.get).toSeq).toSet

  /** The catalog's registered partition list — merge must keep it in sync
    * via targeted ALTER TABLE DDL (no MSCK full-table listing). */
  private def catalogPartitions(table: String): Set[String] =
    sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0)).toSet

  test("update touching one partition leaves every other partition's files byte-identical") {
    val tbl = "merge_part_upd"
    seed(tbl)
    val before = Seq("a", "c", "d").map(p => p -> files(tbl, s"p=$p")).toMap
    val preState = contents(spark.table(tbl))

    // Source hits keys 3 and 4 — both live in p=b; p stays put.
    val source = spark.createDataFrame(Seq((3L, 30.0), (4L, 40.0)))
      .toDF("k", "v")
    val expected = contents(
      Merge(spark.table(tbl), source, Seq("k"), Seq("v")))

    Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v"),
      baseCondition = "1=1", insertWhenNotMatched = false)

    assert(contents(spark.table(tbl)) == expected)
    assert(expected != preState) // the merge actually changed something
    Seq("a", "c", "d").foreach { p =>
      assert(files(tbl, s"p=$p") == before(p),
        s"partition p=$p was rewritten by a merge that never touched it")
    }
    assert(files(tbl, "p=b") != Set.empty)
  }

  test("upsert inserts create their partition; untouched partitions keep their files") {
    val tbl = "merge_part_ins"
    seed(tbl)
    val before = Seq("b", "c", "d").map(p => p -> files(tbl, s"p=$p")).toMap

    // Key 1 updated in-place (stays p=a); key 99 inserted into new p=z.
    // p is an update column so inserts carry a real partition value.
    val source = spark.createDataFrame(Seq(
      (1L, 10.0, "a"), (99L, 99.0, "z"))).toDF("k", "v", "p")
    val expected = contents(
      Merge(spark.table(tbl), source, Seq("k"), Seq("v", "p"),
        insertWhenNotMatched = true))

    Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v", "p"),
      baseCondition = "1=1", insertWhenNotMatched = true)

    assert(contents(spark.table(tbl)) == expected)
    assert(contents(spark.table(tbl).filter(col("p") === "z")) ==
      Set(Seq(99L, 99.0, null, "z")))
    assert(catalogPartitions(tbl) == Set("p=a", "p=b", "p=c", "p=d", "p=z"),
      "inserted partition must be registered in the catalog")
    Seq("b", "c", "d").foreach { p =>
      assert(files(tbl, s"p=$p") == before(p),
        s"partition p=$p was rewritten by a merge that never touched it")
    }
  }

  test("partition-moving update rewrites source and destination partitions; emptied partition is removed") {
    val tbl = "merge_part_move"
    seed(tbl)
    val before = Seq("a", "b").map(p => p -> files(tbl, s"p=$p")).toMap

    // p=d holds only key 7; moving it to p=c empties and removes p=d.
    val source = spark.createDataFrame(Seq((7L, 70.0, "c"))).toDF("k", "v", "p")
    val expected = contents(
      Merge(spark.table(tbl), source, Seq("k"), Seq("v", "p")))

    Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v", "p"),
      baseCondition = "1=1", insertWhenNotMatched = false)

    assert(contents(spark.table(tbl)) == expected)
    assert(files(tbl, "p=d").isEmpty, "emptied partition directory must be removed")
    assert(catalogPartitions(tbl) == Set("p=a", "p=b", "p=c"),
      "emptied partition must be dropped from the catalog")
    assert(spark.table(tbl).filter(col("p") === "d").count() == 0)
    assert(spark.table(tbl).filter(col("k") === 7).select("p").collect()
      .map(_.getString(0)).toSeq == Seq("c"))
    Seq("a", "b").foreach { p =>
      assert(files(tbl, s"p=$p") == before(p),
        s"partition p=$p was rewritten by a merge that never touched it")
    }
  }

  test("no-op merge (empty source) touches nothing") {
    val tbl = "merge_part_noop"
    seed(tbl)
    val before = Seq("a", "b", "c", "d").map(p => p -> files(tbl, s"p=$p")).toMap
    val preState = contents(spark.table(tbl))

    val source = spark.createDataFrame(Seq.empty[(Long, Double)]).toDF("k", "v")
    Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v"),
      baseCondition = "1=1", insertWhenNotMatched = true)

    assert(contents(spark.table(tbl)) == preState)
    Seq("a", "b", "c", "d").foreach { p =>
      assert(files(tbl, s"p=$p") == before(p))
    }
  }
}
