package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.operators.{Merge, Writes}
import graft.sources.{DataSource, TableRef}

/** Property check: the partition-scoped physical merge (`Writes.merge`
  * against a partitioned catalog table) must produce exactly the rows of
  * the pure [[Merge.apply]] plan, over randomized tables and sources —
  * including partition-column updates that MOVE rows between partitions,
  * merges that EMPTY a partition, upserts that CREATE partitions, and
  * null / empty-string partition values (which collapse to the same
  * `__HIVE_DEFAULT_PARTITION__` directory fragment).
  *
  * One semantic normalization: parquet partitioning stores both null and
  * empty-string partition values as the default-partition sentinel and
  * reads them back as null, so expected contents map "" → null on the
  * partition column. That is a storage-layer property of every
  * Hive-layout table, not a merge artifact.
  *
  * Also asserts, every iteration, that the catalog's registered partition
  * list exactly matches the partition directories on disk — the invariant
  * the targeted ALTER TABLE ADD/DROP PARTITION calls maintain.
  */
class MergePartitionedPropertySpec extends SparkSpec {

  private val ds = DataSource("parquet")
  private val rnd = new scala.util.Random(20260812L)
  // null and "" both land in __HIVE_DEFAULT_PARTITION__ — the collapse case.
  private val partPool = Seq("a", "b", "c", "d", null, "")

  private def canon(df: DataFrame): Set[(Long, Double, Any)] =
    df.select("k", "v", "p").collect().map { r =>
      val p = r.get(2) match {
        case "" => null
        case x  => x
      }
      (r.getLong(0), r.getDouble(1), p)
    }.toSet

  private def tableLocation(table: String): Path =
    new Path(spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .location)

  private def liveFragments(table: String): Set[String] = {
    val loc = tableLocation(table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.contains("=")).toSet
  }

  private def catalogFragments(table: String): Set[String] =
    sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0)).toSet

  test("two partition columns (string with null/empty + nullable int): merge ≡ plan, catalog in sync") {
    val qPool = Seq[Any](1, 2, null)
    def canon2(df: DataFrame): Set[(Long, Double, Any, Any)] =
      df.select("k", "v", "p", "q").collect().map { r =>
        val p = r.get(2) match { case "" => null; case x => x }
        (r.getLong(0), r.getDouble(1), p, r.get(3))
      }.toSet
    (1 to 8).foreach { i =>
      val tbl = s"merge_prop_2part_$i"
      sql(s"DROP TABLE IF EXISTS $tbl")
      val tgtKeys = (1 to (4 + rnd.nextInt(10))).map(_ => rnd.nextInt(16).toLong).distinct
      val tgtRows = tgtKeys.map { k =>
        (k, k * 1.0, partPool(rnd.nextInt(partPool.length)),
          qPool(rnd.nextInt(qPool.length)).asInstanceOf[Integer])
      }
      spark.createDataFrame(tgtRows).toDF("k", "v", "p", "q")
        .write.format("parquet").partitionBy("p", "q").saveAsTable(tbl)

      val srcKeys = (1 to (1 + rnd.nextInt(8))).map(_ => rnd.nextInt(20).toLong).distinct
      val srcRows = srcKeys.map { k =>
        (k, k * 100.0, partPool(rnd.nextInt(partPool.length)),
          qPool(rnd.nextInt(qPool.length)).asInstanceOf[Integer])
      }
      val source = spark.createDataFrame(srcRows).toDF("k", "v", "p", "q")
      val upsert = rnd.nextBoolean()

      val expected = canon2(
        Merge(spark.table(tbl), source, Seq("k"), Seq("v", "p", "q"),
          insertWhenNotMatched = upsert))

      Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v", "p", "q"),
        baseCondition = "1=1", insertWhenNotMatched = upsert)

      assert(canon2(spark.table(tbl)) == expected,
        s"iteration $i (upsert=$upsert): 2-level physical merge diverged")
      assert(catalogFragments(tbl) == liveFragments2(tbl),
        s"iteration $i: catalog partition list out of sync")
      sql(s"DROP TABLE $tbl")
    }
  }

  /** Two-level partition fragments (p=…/q=…) on disk. */
  private def liveFragments2(table: String): Set[String] = {
    val loc = tableLocation(table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.contains("=")).flatMap { lvl1 =>
        fs.listStatus(lvl1).filter(_.isDirectory).map(_.getPath.getName)
          .filter(_.contains("="))
          .map(n => s"${lvl1.getName}/$n")
      }.toSet
  }

  test("partition-scoped merge ≡ pure Merge plan over random tables, moves, empties, null/empty partitions") {
    (1 to 12).foreach { i =>
      val tbl = s"merge_prop_part_$i"
      sql(s"DROP TABLE IF EXISTS $tbl")

      val tgtKeys = (1 to (4 + rnd.nextInt(14))).map(_ => rnd.nextInt(20).toLong).distinct
      val tgtRows = tgtKeys.map(k => (k, k * 1.0, partPool(rnd.nextInt(partPool.length))))
      spark.createDataFrame(tgtRows).toDF("k", "v", "p")
        .write.format("parquet").partitionBy("p").saveAsTable(tbl)

      val srcKeys = (1 to (1 + rnd.nextInt(12))).map(_ => rnd.nextInt(26).toLong).distinct
      val srcRows = srcKeys.map(k => (k, k * 100.0, partPool(rnd.nextInt(partPool.length))))
      val source = spark.createDataFrame(srcRows).toDF("k", "v", "p")
      val upsert = rnd.nextBoolean()

      // Expected = the lazy Merge plan over the PRE-merge table, collected
      // before the physical merge mutates the files underneath it.
      val expected = canon(
        Merge(spark.table(tbl), source, Seq("k"), Seq("v", "p"),
          insertWhenNotMatched = upsert))

      Writes.merge(source, TableRef(tbl), ds, Seq("k"), Seq("v", "p"),
        baseCondition = "1=1", insertWhenNotMatched = upsert)

      assert(canon(spark.table(tbl)) == expected,
        s"iteration $i (upsert=$upsert): physical merge diverged from Merge plan")
      assert(catalogFragments(tbl) == liveFragments(tbl),
        s"iteration $i: catalog partition list out of sync with directories")

      sql(s"DROP TABLE $tbl")
    }
  }
}
