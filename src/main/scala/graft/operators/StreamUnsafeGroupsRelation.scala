package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The static side of [[Versioned.changesStream]]'s append-only
  * enforcement: one `__graft_group` row per file group introduced by a
  * stream-unsafe version of the table. A v1 `TableScan` so that
  * `buildScan` — which re-reads the manifest log — runs at every
  * physical planning: Structured Streaming plans each micro-batch
  * afresh, so the stream-static anti-semantics join sees the LIVE
  * exclusion set, not the one at query start (a plain LocalRelation
  * would freeze it). The set is bounded by the table's rewrite count —
  * broadcast-tiny by construction. */
private[graft] final case class StreamUnsafeGroupsRelation(
    spark: SparkSession, tableDir: String) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override def schema: StructType =
    StructType(Seq(StructField("__graft_group", StringType, nullable = false)))

  override def buildScan(): RDD[Row] = {
    val groups = Versioned.streamUnsafeIntroducedGroups(spark, tableDir)
    spark.sparkContext.parallelize(groups.map(Row(_)), 1)
  }
}
