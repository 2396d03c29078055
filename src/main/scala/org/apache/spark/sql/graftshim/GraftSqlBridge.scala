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

  /** Drain the listener bus (`private[spark]`): a test counting job
    * events can wait for every posted event DETERMINISTICALLY instead
    * of polling with wall-clock sleeps that flake on a loaded box. */
  def waitListenerBusEmpty(
      sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Catalyst expression behind a Column (debug/bridge use). */
  def exprOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Strip a `TGT.` qualifier from every unresolved attribute in a
    * Column — merge-clause conditions are written against the TGT/SRC
    * aliases, but group pruning and touched-group probes run them
    * against the bare table scan. `ExpressionUtils.expression` returns
    * a LAZY `ColumnNodeExpression` leaf, so the node must be converted
    * to a real catalyst tree before the transform can see the
    * attributes. */
  def stripTgtQualifier(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
    val real = ColumnNodeToExpressionConverter(c.node)
    ExpressionUtils.column(real.transform {
      case UnresolvedAttribute(parts)
          if parts.length > 1 && parts.head.equalsIgnoreCase("TGT") =>
        UnresolvedAttribute(parts.tail)
    })
  }

  /** Replace placeholder attributes with typed literals — the scalar-
    * subquery substitution of the DML commands: the subquery was
    * evaluated against the pre-image to an external value, which
    * `Literal.create` converts through the catalyst converters. */
  def substituteScalars(
      c: org.apache.spark.sql.Column,
      subs: Map[String, (Any, org.apache.spark.sql.types.DataType)])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
    val real = ColumnNodeToExpressionConverter(c.node)
    ExpressionUtils.column(real.transform {
      case UnresolvedAttribute(parts)
          if parts.length == 1 && subs.contains(parts.head) =>
        val (v, dt) = subs(parts.head)
        org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt)
    })
  }

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
          // URIToString, NOT getPath: getPath strips the scheme and
          // authority, so a table on a non-default filesystem
          // (hdfs://nn/x, s3a://bucket/x) would resolve to the bare
          // path on the default FS — reading/mutating the wrong
          // location.
          .orElse(meta.storage.locationUri.map(
            org.apache.spark.sql.catalyst.catalog.CatalogUtils.URIToString))
      else None
    }
  }
}
