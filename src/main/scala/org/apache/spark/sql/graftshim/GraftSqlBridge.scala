package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft's SQL DML surface needs:
  * turning the analyzer's MERGE-source [[LogicalPlan]] back into a
  * DataFrame. `classic.Dataset.ofRows` is `private[sql]`, so this
  * single-method bridge lives under the `org.apache.spark.sql` package
  * — the same technique every Spark connector with an SQL surface uses
  * (Delta's `org.apache.spark.sql.delta`, Iceberg's catalyst shims).
  * Nothing else in graft escapes the `graft.*` namespace. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
