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

  /** The storage path of catalog table `parts` IF it is a `USING graft`
    * table; None otherwise (including non-existent tables). Used to
    * resolve catalog-name time travel, which Spark only wires up for
    * v2 tables. */
  def graftTablePath(spark: SparkSession, parts: Seq[String]): Option[String] = {
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    val ident = parts match {
      case Seq(t) => org.apache.spark.sql.catalyst.TableIdentifier(t)
      case Seq(db, t) => org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db))
      case _ => return None
    }
    if (!catalog.tableExists(ident)) None
    else {
      val meta = catalog.getTableMetadata(ident)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.getPath))
      else None
    }
  }
}
