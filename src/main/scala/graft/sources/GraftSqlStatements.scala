package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.operators.Versioned

/** The MAINTENANCE SQL surface for graft tables — the statements a
  * Delta user types that core Spark cannot even parse, provided the
  * same way Delta provides them (a delegating `ParserInterface`
  * injected through `SparkSessionExtensions`, its `DeltaSqlParser`
  * architecture):
  *
  *   CONVERT TO GRAFT parquet.`/dir`
  *   DESCRIBE HISTORY <tbl>
  *   VACUUM <tbl> [RETAIN <n> VERSIONS | RETAIN <n> HOURS]
  *   OPTIMIZE <tbl> [ZORDER BY (c1, c2, ...)]
  *   RESTORE [TABLE] <tbl> [TO] VERSION AS OF <n>
  *   ALTER TABLE <tbl> ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE <tbl> DROP CONSTRAINT <name>
  *   ALTER TABLE <tbl> RENAME COLUMN <a> TO <b>
  *   ALTER TABLE <tbl> DROP COLUMN <a>
  *
  * `<tbl>` is either ``graft.`/table/dir``` or a `USING graft` catalog
  * table name. Statements that are ALSO valid core-Spark syntax (the
  * two ALTER COLUMN forms) fall through to the delegate whenever the
  * target is not a graft table, so nothing else in the session changes
  * behavior; graft-specific statements on a non-graft table raise a
  * clear error. Everything unmatched goes verbatim to the delegate
  * parser. */
final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlStatements.parse(session, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

private[graft] object GraftSqlStatements {

  // graft.`/path`  |  name | db.name | cat.db.name, each part plain or
  // `backquoted` (a backquoted FIRST part distinguishes `graft`.x — a
  // database literally named graft — from the path form)
  private val Part = "(?:[A-Za-z_][\\w]*|`[^`]+`)"
  private val Tbl =
    s"(?:graft\\s*\\.\\s*`([^`]+)`|($Part(?:\\s*\\.\\s*$Part){0,2}))"
  private val Id = "([A-Za-z_][\\w]*)"

  private def re(pattern: String) =
    ("(?is)^\\s*" + pattern + "\\s*;?\\s*$").r

  private val Convert =
    re("CONVERT\\s+TO\\s+GRAFT\\s+parquet\\s*\\.\\s*`([^`]+)`")
  private val DescribeHistory = re(s"DESCRIBE\\s+HISTORY\\s+$Tbl")
  private val VacuumVersions = re(s"VACUUM\\s+$Tbl\\s+RETAIN\\s+(\\d+)\\s+VERSIONS")
  private val VacuumHours = re(s"VACUUM\\s+$Tbl\\s+RETAIN\\s+(\\d+)\\s+HOURS")
  private val VacuumPlain = re(s"VACUUM\\s+$Tbl")
  private val OptimizeZorder =
    re(s"OPTIMIZE\\s+$Tbl\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)")
  private val OptimizePlain = re(s"OPTIMIZE\\s+$Tbl")
  private val Restore =
    re(s"RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)")
  private val AddConstraint =
    re(s"ALTER\\s+TABLE\\s+$Tbl\\s+ADD\\s+CONSTRAINT\\s+$Id\\s+CHECK\\s*\\((.+)\\)")
  private val DropConstraint =
    re(s"ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+CONSTRAINT\\s+$Id")
  private val RenameColumn =
    re(s"ALTER\\s+TABLE\\s+$Tbl\\s+RENAME\\s+COLUMN\\s+$Id\\s+TO\\s+$Id")
  private val DropColumn =
    re(s"ALTER\\s+TABLE\\s+$Tbl\\s+DROP\\s+COLUMN\\s+$Id")

  /** Some(plan) when the statement is a graft maintenance statement
    * over a graft table; None = let the delegate parser have it. */
  def parse(session: SparkSession, sql: String): Option[LogicalPlan] = {
    // dir(path, name): resolve the matched target to a table dir.
    // graftOnly statements raise on a non-graft target (core Spark
    // cannot parse them anyway); shared-syntax statements return None
    // to fall through.
    def dir(path: String, name: String, graftOnly: Boolean): Option[String] = {
      // graft.`x` is the PATH form only when x looks like a path — the
      // same rule as GraftPathRelationRule.isPathForm, so DML/SELECT and
      // maintenance statements resolve one spelling identically; a
      // non-path x is a table under a database literally named graft.
      val (p2, n2) = Option(path) match {
        case Some(p)
            if GraftPathRelationRule.resolvesAsPath(session, Seq("graft", p)) =>
          (Some(p), name)
        case Some(p) => (None, s"graft.`$p`")
        case None => (None, name)
      }
      p2.orElse {
        // split into identifier parts honoring `backquotes` (a naive
        // dot-split would break a backquoted part containing dots); a
        // leading spark_catalog qualifier resolves in the session catalog
        val partRe = "`([^`]+)`|([A-Za-z_][\\w]*)".r
        val ps0 = partRe.findAllMatchIn(n2)
          .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq
        val ps =
          if (ps0.size == 3 && ps0.head.equalsIgnoreCase("spark_catalog"))
            ps0.tail
          else ps0
        val resolved = org.apache.spark.sql.graftshim.GraftSqlBridge
          .graftTablePath(session, ps)
        if (resolved.isEmpty && graftOnly)
          throw new IllegalArgumentException(
            s"'$n2' is not a graft table (USING graft) — this statement " +
              "only applies to graft tables")
        resolved
      }
    }
    sql match {
      case Convert(path) => Some(GraftConvertCommand(path))
      case DescribeHistory(p, n) =>
        dir(p, n, graftOnly = true).map(GraftDescribeHistoryCommand)
      case VacuumVersions(p, n, k) =>
        dir(p, n, graftOnly = true)
          .map(d => GraftVacuumCommand(d, keepVersions = Some(k.toLong)))
      case VacuumHours(p, n, h) =>
        dir(p, n, graftOnly = true)
          .map(d => GraftVacuumCommand(d, hours = Some(h.toLong)))
      case VacuumPlain(p, n) =>
        dir(p, n, graftOnly = true).map(d => GraftVacuumCommand(d))
      case OptimizeZorder(p, n, cols) =>
        dir(p, n, graftOnly = true).map(d =>
          GraftOptimizeCommand(d, cols.split(",").map(_.trim).toSeq))
      case OptimizePlain(p, n) =>
        dir(p, n, graftOnly = true).map(d => GraftOptimizeCommand(d, Seq.empty))
      case Restore(p, n, v) =>
        dir(p, n, graftOnly = true).map(d => GraftRestoreCommand(d, v.toLong))
      case AddConstraint(p, n, cn, expr) =>
        dir(p, n, graftOnly = true)
          .map(d => GraftAddConstraintCommand(d, cn, expr.trim))
      case DropConstraint(p, n, cn) =>
        dir(p, n, graftOnly = true).map(d => GraftDropConstraintCommand(d, cn))
      case RenameColumn(p, n, a, b) =>
        dir(p, n, graftOnly = false).map(d => GraftRenameColumnCommand(d, a, b))
      case DropColumn(p, n, a) =>
        dir(p, n, graftOnly = false).map(d => GraftDropColumnCommand(d, a))
      case _ => None
    }
  }

  private[sources] def versionOut: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
}

private[graft] final case class GraftConvertCommand(dir: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.convert(spark, dir)))
}

private[graft] final case class GraftDescribeHistoryCommand(tableDir: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = true)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("committed_at", StringType, nullable = true)(),
    AttributeReference("readable", BooleanType, nullable = false)(),
    AttributeReference("dv_rows", LongType, nullable = false)(),
    AttributeReference("dv_files", LongType, nullable = false)(),
    AttributeReference("dv_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Versioned.describeHistory(spark, tableDir).collect().toSeq // one row/version
}

private[graft] final case class GraftVacuumCommand(
    tableDir: String,
    keepVersions: Option[Long] = None,
    hours: Option[Long] = None) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("dropped_versions", LongType, nullable = false)(),
    AttributeReference("deleted_groups", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (dv, dg) = keepVersions match {
      case Some(k) =>
        require(k >= 1, s"RETAIN n VERSIONS needs n >= 1: $k")
        val latest = Versioned.latestVersion(spark, tableDir)
        Versioned.vacuum(spark, tableDir, math.max(0L, latest - k + 1))
      case None =>
        // Delta's default retention: 7 days (168 hours).
        val h = hours.getOrElse(168L)
        Versioned.vacuumOlderThan(spark, tableDir,
          java.time.Instant.now().minus(h, java.time.temporal.ChronoUnit.HOURS))
    }
    Seq(Row(dv, dg))
  }
}

private[graft] final case class GraftOptimizeCommand(
    tableDir: String, zorderBy: Seq[String]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] = {
    val v =
      if (zorderBy.isEmpty) Versioned.compact(spark, tableDir)
      else {
        // size groups the way compact does: ~128 MB targets
        val p = new org.apache.hadoop.fs.Path(tableDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$tableDir/files")).getLength
        val target = 128L << 20
        val n = math.max(1L, (bytes + target - 1) / target).toInt
        Versioned.cluster(spark, tableDir, zorderBy, numGroups = n)
      }
    Seq(Row(v))
  }
}

private[graft] final case class GraftRestoreCommand(
    tableDir: String, version: Long) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.restore(spark, tableDir, version)))
}

private[graft] final case class GraftAddConstraintCommand(
    tableDir: String, name: String, exprSql: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.addConstraint(spark, tableDir, name, exprSql)))
}

private[graft] final case class GraftDropConstraintCommand(
    tableDir: String, name: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.dropConstraint(spark, tableDir, name)))
}

private[graft] final case class GraftRenameColumnCommand(
    tableDir: String, oldName: String, newName: String)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.renameColumn(spark, tableDir, oldName, newName)))
}

private[graft] final case class GraftDropColumnCommand(
    tableDir: String, name: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = GraftSqlStatements.versionOut
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Versioned.dropColumn(spark, tableDir, name)))
}
