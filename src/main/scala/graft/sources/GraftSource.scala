package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * DATASOURCE surface over [[graft.operators.Versioned]] tables, so SQL
  * and DataFrame users consume versioned tables without touching the
  * library API:
  *
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)
  *   df.write.format("graft").mode("append").save(dir)
  *   CREATE TABLE t USING graft OPTIONS (path '...'); INSERT INTO t ...
  *
  * Built on the STABLE public source API (RelationProvider /
  * PrunedFilteredScan / InsertableRelation) rather than DataSourceV2:
  * the v2 path would force a hand-rolled parquet reader (Spark's
  * vectorized reader is internal), while a v1 relation may plan its scan
  * as a regular DataFrame — so the physical scan below IS Spark's own
  * vectorized parquet scan over exactly the manifest's file groups,
  * with `needConversion = false` handing its InternalRows straight
  * through (no external-Row conversion tax).
  *
  * Reads get the full [[Versioned.readWhere]] treatment: pushed filters
  * are translated back to Columns and prune file GROUPS via the
  * manifest's min/max sidecars before the scan is planned — the same
  * skipping economics as the library path. The translation is advisory
  * only ([[GraftRelation.unhandledFilters]] returns every filter, so
  * Spark re-applies them all): a filter the translator can't express
  * simply skips nothing, it can never wrong a result.
  *
  * Writes map SaveModes onto the versioned commit modes: `append` is an
  * [[Versioned.append]] (cost ∝ batch), `overwrite` a full
  * [[Versioned.commit]] snapshot, `errorifexists`/`ignore` behave as
  * documented against table existence. Every write is a new version —
  * time travel and CDC consumers compose for free. */
class GraftSource
    extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource requires a path (load(dir) or OPTIONS (path '...'))"))

  /** `spark.readStream.format("graft")` — the manifest-driven streaming
    * source ([[GraftStreamSource]]): schema comes from the manifest
    * (pass none), offsets are table versions, batches are planned from
    * version ranges — never from file listings. */
  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val cdf = parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
    val s = GraftStreamSource.sourceSchema(
      sqlContext.sparkSession, pathOf(parameters), cdf)
    schema.foreach(u => require(u == s,
      s"graft streaming source: the manifest already carries the table " +
        s"schema (${s.toDDL}); drop the .schema(...) call or pass the " +
        "identical schema"))
    ("graft", s)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftStreamSource(
      sqlContext.sparkSession, pathOf(parameters), parameters,
      metadataPath = Some(metadataPath))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val byVersion = parameters.get("versionAsOf").map(_.toLong)
    val byTime = parameters.get("timestampAsOf").map(parseInstant)
    require(byVersion.isEmpty || byTime.isEmpty,
      "specify at most one of versionAsOf / timestampAsOf")
    val v = byVersion
      .orElse(byTime.map(Versioned.versionAt(spark, dir, _)))
      .getOrElse(-1L)
    GraftRelation(spark, dir, v)
  }

  private def parseInstant(s: String): java.time.Instant =
    GraftDml.parseInstant(s)

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val exists = Versioned.latestVersion(spark, dir) >= 0
    val evolve = parameters.get("evolveSchema").exists(_.equalsIgnoreCase("true"))
    mode match {
      case SaveMode.Append => Versioned.append(data, dir, evolve)
      case SaveMode.Overwrite => Versioned.commit(data, dir)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists at $dir (mode=ErrorIfExists)")
        Versioned.commit(data, dir)
      case SaveMode.Ignore => if (!exists) Versioned.commit(data, dir)
    }
    GraftRelation(spark, dir, -1L)
  }
}

/** One versioned table as a BaseRelation. `version` >= 0 pins that
  * exact version (time travel); `version` < 0 tracks the LIVE latest —
  * resolved at each scan, not at relation creation, because the session
  * catalog CACHES relations (a `CREATE TABLE ... USING graft` handle
  * must observe later INSERTs and appends). Each individual scan still
  * reads one consistent manifest. The schema is taken from the latest
  * version at creation time; each scan verifies the resolved version
  * still matches it and fails explicitly on drift (a cached relation
  * must never silently serve reshaped rows under a stale schema). */
final case class GraftRelation(
    spark: SparkSession,
    tableDir: String,
    version: Long)
    extends BaseRelation
    with PrunedFilteredScan
    with InsertableRelation {

  private def resolvedVersion: Long = {
    val v = if (version >= 0) version else Versioned.latestVersion(spark, tableDir)
    require(v >= 0, s"no versions committed under $tableDir")
    v
  }

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType =
    Versioned.read(spark, tableDir, resolvedVersion).schema

  /** Rows are handed through as InternalRow (the inner parquet scan's
    * own output) — no per-row external-Row conversion. */
  override def needConversion: Boolean = false

  /** Pushdown here is GROUP SKIPPING only — Spark must still apply
    * every filter to the surviving rows. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val rv = resolvedVersion
    // The relation's schema is pinned at creation while version < 0
    // re-resolves the live latest per scan (cached catalog relations
    // must observe later appends). If a concurrent snapshot RESHAPED
    // the table in between, the scan's rows would no longer match the
    // declared schema — silent wrong data; fail explicitly instead.
    val live = Versioned.read(spark, tableDir, rv)
    if (live.schema != schema)
      throw new IllegalStateException(
        s"graft table $tableDir changed schema since this relation was " +
          s"resolved (relation: ${schema.toDDL}; version $rv: " +
          s"${live.schema.toDDL}) — re-resolve the table " +
          "(re-run spark.read / REFRESH TABLE)")
    val preds = filters.toSeq.flatMap(filterToColumn)
    val base =
      if (preds.isEmpty) live
      else Versioned.readWhere(spark, tableDir, rv)(preds: _*)
    // Project in the REQUESTED order (the contract for the returned
    // rows); an empty projection (SELECT count(*)) yields 0-col rows.
    val projected = base.select(requiredColumns.toSeq.map(col): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  /** INSERT INTO (append) / INSERT OVERWRITE (snapshot). */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    if (overwrite) Versioned.commit(data, tableDir)
    else Versioned.append(data, tableDir)

  /** Source filters → Columns, best-effort: anything inexpressible is
    * dropped (skips nothing; Spark re-applies all filters anyway).
    * Top-level / under And, a PARTIAL translation is sound (it is
    * implied by the original, so it may only keep too much). Under Not
    * and Or, partial translations flip from implied to implying — those
    * positions demand the EXACT translation (`lossy = false`). */
  private def filterToColumn(f: Filter): Option[Column] = translate(f, lossy = true)

  private def translate(f: Filter, lossy: Boolean): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) =>
      (translate(l, lossy), translate(r, lossy)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) if lossy => one.orElse(other) // weaker but implied
        case _ => None
      }
    case Or(l, r) =>
      for { a <- translate(l, lossy = false); b <- translate(r, lossy = false) }
        yield a || b
    case Not(child) => translate(child, lossy = false).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case _ => None
  }
}
