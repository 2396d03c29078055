package graft.spec

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Raised for malformed/incomplete job configuration.
  * Mirrors the reference's `JobConfigException` (pyzzle/base_job.py:4-5). */
final class JobConfigException(msg: String) extends RuntimeException(msg)

/** Raised when a merge detects another in-flight merge on the same target.
  * The reference inherited multi-writer isolation from Delta's optimistic
  * transaction log (pyzzle/datasource/delta.py:104-148); the parquet
  * stage-and-swap rewrite is single-writer, so concurrent merges are
  * DETECTED (lock sentinel) and refused rather than silently interleaved. */
final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

/** Target write operation. Dispatch is case-insensitive and `insert` is a
  * strict alias of `append` (reference: etl/parent.py:56-63, delta.py:90). */
sealed trait Operation
object Operation {
  case object Append    extends Operation
  case object Overwrite extends Operation
  case object Update    extends Operation
  case object Upsert    extends Operation
  // Extension beyond the reference's Delta-backed set: write into a
  // graft.operators.Versioned table (time-travel reads, file-sharing
  // appends). Path targets only — a versioned table IS a directory
  // layout, not a catalog entry.
  case object VersionedSnapshot extends Operation
  case object VersionedAppend   extends Operation
  case object VersionedMerge    extends Operation

  def parse(s: String): Operation = s.trim.toLowerCase match {
    case "append" | "insert"   => Append
    case "overwrite"           => Overwrite
    case "update"              => Update
    case "upsert"              => Upsert
    case "versioned_snapshot"  => VersionedSnapshot
    case "versioned_append"    => VersionedAppend
    case "versioned_merge"     => VersionedMerge
    case other => throw new JobConfigException(s"Unexpected operation '$other'")
  }
}

/** `${param}` textual substitution into the raw YAML before parsing
  * (reference: etl/parent.py:30-43). The reference checks the *filepath*
  * for leftover params — a bug; the intended check is on the substituted
  * config text, which is what we do. */
object Params {
  private val ParamRe = "\\$\\{[A-Za-z_][A-Za-z0-9_]*\\}".r

  def substitute(raw: String, params: Map[String, String]): String = {
    val out = params.foldLeft(raw) { case (acc, (k, v)) =>
      acc.replace(s"$${$k}", v)
    }
    val missing =
      ParamRe.findAllIn(out).map(m => m.substring(2, m.length - 1)).toSeq.distinct
    if (missing.nonEmpty)
      throw new JobConfigException(
        "All parameters should be provided. Missing: " + missing.mkString(", "))
    out
  }
}

/** Minimal dynamic-YAML access layer over snakeyaml (on the Spark
  * classpath). Top-level keys are lower-cased like the reference
  * (etl/parent.py:48-49). */
object Yaml {
  type Node = Map[String, Any]

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other                => other
  }

  def parse(text: String): Node = {
    val raw = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](text)
    if (raw == null) throw new JobConfigException("Empty YAML config")
    val m = toScala(raw).asInstanceOf[Map[String, Any]]
    m.map { case (k, v) => k.toLowerCase -> v }
  }

  def str(n: Node, key: String): Option[String] =
    n.get(key).map(_.toString)

  /** YAML booleans arrive as java.lang.Boolean; "true"/"false" strings
    * are accepted too (the shape `${param}` substitution produces). */
  def bool(n: Node, key: String): Option[Boolean] = n.get(key).map {
    case b: Boolean => b
    case s: String if s.equalsIgnoreCase("true") => true
    case s: String if s.equalsIgnoreCase("false") => false
    case other =>
      throw new JobConfigException(s"Config key '$key' must be a boolean, got: $other")
  }

  def node(n: Node, key: String): Option[Node] =
    n.get(key).map {
      case m: Map[_, _] => m.asInstanceOf[Node]
      case other =>
        throw new JobConfigException(s"Config key '$key' must be a mapping, got: $other")
    }

  /** A field that may be written as a single string or a list of strings
    * (pre_sql/post_sql: reference passes a single string straight to
    * spark.sql; we also accept a list for multi-statement hooks). */
  def strList(n: Node, key: String): Seq[String] = n.get(key) match {
    case None            => Nil
    case Some(s: String) => Seq(s)
    case Some(l: Seq[_]) => l.map(_.toString)
    case Some(other) =>
      throw new JobConfigException(s"Config key '$key' must be a string or list, got: $other")
  }
}

/** Source side of an ETL job (reference: etl/parent.py:89-111).
  * `datasource` defaults to "parquet" — the reference's test configs omit it
  * entirely (which KeyErrors as written; intended default = its only
  * implementation). */
final case class SourceSpec(
    datasource: String,
    query: Option[String],
    table: Option[String],
    preSql: Seq[String],
    postSql: Seq[String]) {

  /** Default projection synthesis: table-only source becomes
    * `SELECT * FROM t` (reference: etl/parent.py:108-111). */
  def effectiveQuery: String =
    query.orElse(table.map(t => s"SELECT * FROM $t")).getOrElse(
      throw new JobConfigException("source requires 'query' or 'table'"))
}

/** Target side of an ETL job (reference: etl/parent.py:89-111,
  * update_and_upsert.py:11-27). `schema` (Spark DDL, csv/json path
  * targets only) declares the file schema so reads back through the
  * datasource skip the per-read inference pass and plan-time validation
  * can check configured columns without touching data. */
final case class TargetSpec(
    datasource: String,
    table: Option[String],
    path: Option[String],
    operation: Operation,
    preSql: Seq[String],
    postSql: Seq[String],
    primaryKeyColumns: Seq[String],
    updateColumns: Seq[String],
    whereStatementOnTable: String,
    schema: Option[String] = None,
    evolveSchema: Boolean = false)

final case class JobSpec(version: String, source: SourceSpec, target: TargetSpec) {

  /** Intended semantics of the reference's (disabled, buggy) validator
    * (etl/validate.py; defects catalogued in SURVEY.md §2.6). */
  def validate(): Unit = {
    if (target.table.isEmpty && target.path.isEmpty)
      throw new JobConfigException("target requires 'table' or 'path'")
    if (target.table.nonEmpty && target.path.nonEmpty)
      throw new JobConfigException("target takes 'table' or 'path', not both")
    if (target.schema.nonEmpty && target.path.isEmpty)
      throw new JobConfigException(
        "target 'schema' applies to path targets only (catalog tables " +
          "carry their own schema)")
    if (target.evolveSchema && target.operation != Operation.VersionedAppend)
      throw new JobConfigException(
        "'evolve_schema' applies to versioned_append only (a snapshot " +
          "reshapes freely; non-versioned writes carry no schema contract)")
    source.effectiveQuery // asserts query|table present
    target.operation match {
      case Operation.Update | Operation.Upsert =>
        if (target.primaryKeyColumns.isEmpty)
          throw new JobConfigException(
            s"${target.operation} requires 'primary_key_column'")
        if (target.updateColumns.isEmpty)
          throw new JobConfigException(
            s"${target.operation} requires 'update_column'")
      case Operation.VersionedMerge =>
        // Whole-row replacement: no update_column list (it is SET *).
        if (target.primaryKeyColumns.isEmpty)
          throw new JobConfigException(
            s"${target.operation} requires 'primary_key_column'")
        if (target.updateColumns.nonEmpty)
          throw new JobConfigException(
            "versioned_merge replaces whole rows (UPDATE SET *); " +
              "'update_column' does not apply")
      case _ => ()
    }
  }
}

object JobSpec {
  import Yaml._

  def load(path: String, params: Map[String, String] = Map.empty): JobSpec =
    fromString(Files.readString(Paths.get(path)), params)

  def fromString(raw: String, params: Map[String, String] = Map.empty): JobSpec = {
    val cfg = parse(Params.substitute(raw, params))
    val src = node(cfg, "source").getOrElse(
      throw new JobConfigException("'source' section is required"))
    val tgt = node(cfg, "target").getOrElse(
      throw new JobConfigException("'target' section is required"))
    val op = str(tgt, "operation").getOrElse(
      throw new JobConfigException("The target - operation key is required for a job."))
    val spec = JobSpec(
      version = str(cfg, "version").getOrElse("0"),
      source = SourceSpec(
        datasource = str(src, "datasource").getOrElse("parquet"),
        query = str(src, "query"),
        table = str(src, "table"),
        preSql = strList(src, "pre_sql"),
        postSql = strList(src, "post_sql")),
      target = TargetSpec(
        datasource = str(tgt, "datasource").getOrElse("parquet"),
        table = str(tgt, "table"),
        path = str(tgt, "path"),
        operation = Operation.parse(op),
        preSql = strList(tgt, "pre_sql"),
        postSql = strList(tgt, "post_sql"),
        primaryKeyColumns = strList(tgt, "primary_key_column"),
        updateColumns = strList(tgt, "update_column"),
        whereStatementOnTable = str(tgt, "where_statement_on_table").getOrElse("1=1"),
        schema = str(tgt, "schema"),
        evolveSchema = bool(tgt, "evolve_schema").getOrElse(false)))
    spec.validate()
    spec
  }
}

/** One source of a recon job (reference: recon/recon.py:52-107). Metrics
  * keep declaration order (the reference folds a YAML list of single-entry
  * maps into a dict; aliases must match across sources, expressions may
  * differ — recon.yml:13-16). */
final case class ReconSource(
    name: String,
    datasource: String,
    query: Option[String],
    table: Option[String],
    path: Option[String],
    metrics: Seq[(String, String)],
    schema: Option[String] = None) {
  if (query.isEmpty && table.isEmpty && path.isEmpty)
    throw new JobConfigException(
      "Either 'query', 'table' or 'path' should be provided in each recon's element")
}

/** `compareMode`: "auto" (reference parity — delta/match columns only
  * when EXACTLY two sources, recon.py:149) or "vs_first" (opt-in N-way
  * extension: every non-first source gains `delta_<name>_<metric>` /
  * `match_<name>_<metric>` columns against the FIRST source, answering
  * "which source drifted" for 3+ sources). */
final case class ReconSpec(
    version: String,
    groupBy: Seq[String],
    data: Seq[ReconSource],
    compareMode: String = "auto") {
  if (!Set("auto", "vs_first").contains(compareMode))
    throw new JobConfigException(
      s"compare_mode must be 'auto' or 'vs_first', got '$compareMode'")
}

object ReconSpec {
  import Yaml._

  def load(path: String, params: Map[String, String] = Map.empty): ReconSpec =
    fromString(Files.readString(Paths.get(path)), params)

  def fromString(raw: String, params: Map[String, String] = Map.empty): ReconSpec = {
    val cfg = parse(Params.substitute(raw, params))
    val groupBy = strList(cfg, "group_by")
    if (groupBy.isEmpty)
      throw new JobConfigException("'group_by' section is required for recon")
    val data = cfg.get("data") match {
      case Some(l: Seq[_]) => l.map(_.asInstanceOf[Map[String, Any]])
      case _ => throw new JobConfigException("'data' section (list) is required for recon")
    }
    // Default source names source_0, source_1… (reference: recon.py:63-67)
    val sources = data.zipWithIndex.map { case (d, i) =>
      val metrics = d.get("metrics") match {
        case Some(l: Seq[_]) =>
          l.flatMap {
            case m: Map[_, _] =>
              m.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString }
            case other =>
              throw new JobConfigException(s"metric entries must be maps, got: $other")
          }
        case _ => throw new JobConfigException(s"recon source #$i requires 'metrics'")
      }
      ReconSource(
        name = str(d, "name").getOrElse(s"source_$i"),
        datasource = str(d, "datasource").getOrElse("parquet"),
        query = str(d, "query"),
        table = str(d, "table"),
        path = str(d, "path"),
        metrics = metrics,
        schema = str(d, "schema"))
    }
    ReconSpec(str(cfg, "version").getOrElse("0"), groupBy, sources,
      str(cfg, "compare_mode").getOrElse("auto"))
  }
}
