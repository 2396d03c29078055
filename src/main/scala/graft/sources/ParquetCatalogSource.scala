package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Where a write lands: a session-catalog table or a bare filesystem path.
  * (reference addresses targets as `db.table` or `delta.`path``;
  * etl/append.py:12-15, delta.py:60). */
sealed trait TargetRef {
  def describe: String
}
final case class TableRef(name: String) extends TargetRef {
  def describe: String = s"table $name"
}
final case class PathRef(path: String) extends TargetRef {
  def describe: String = s"path $path"
}

/** Datasource abstraction (reference: datasource/base_datasource.py:27-61,
  * whose `self.format` drives both reads and writes). The reference's only
  * concrete impl is Delta; ours is parquet over the session catalog, plus
  * CSV/JSON file formats for path-addressed sources and sinks (the
  * ingest/extract endpoints of a pipeline). All query evaluation stays in
  * Spark SQL — the engine never interprets expressions itself. */
trait DataSource {
  def sql(query: String)(implicit spark: SparkSession): DataFrame
  def readTable(name: String)(implicit spark: SparkSession): DataFrame
  def readPath(path: String)(implicit spark: SparkSession): DataFrame
  def read(ref: TargetRef)(implicit spark: SparkSession): DataFrame = ref match {
    case TableRef(t) => readTable(t)
    case PathRef(p)  => readPath(p)
  }
  /** File format used for PATH-addressed reads and writes. Catalog tables
    * carry their own provider and ignore this. */
  def pathFormat: String = "parquet"
  /** Reader/writer options for the path format. */
  def readOptions: Map[String, String] = Map.empty
  def writeOptions: Map[String, String] = Map.empty
}

final class ParquetCatalogSource extends DataSource {
  override def sql(query: String)(implicit spark: SparkSession): DataFrame =
    spark.sql(query)

  override def readTable(name: String)(implicit spark: SparkSession): DataFrame =
    spark.table(name)

  override def readPath(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(path)
}

/** CSV/JSON path sources and sinks. SQL and catalog-table access are
  * format-agnostic (delegated to the session); only path reads/writes
  * differ.
  *
  * Without a declared schema, CSV reads infer it — convenient for small
  * extract/ingest files, but inference is an EXTRA FULL PASS over the
  * data per read: a scheduled job re-pays it every run. Declare
  * `pathSchema` (Spark DDL, e.g. `"a INT, b STRING"` — the YAML spec's
  * `schema:` key feeds it through) and the read plans directly against
  * the declared types with zero inference job, the same
  * read-the-metadata-not-the-data behavior a catalog table gets. */
final class FileFormatSource(
    override val pathFormat: String,
    val pathSchema: Option[String] = None) extends DataSource {

  /** Parsed eagerly so a malformed DDL string fails at CONFIG time with
    * the offending text, not at first read. */
  val declaredSchema: Option[org.apache.spark.sql.types.StructType] =
    pathSchema.map { ddl =>
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"invalid schema DDL '$ddl': ${e.getMessage}")
      }
    }

  override def sql(query: String)(implicit spark: SparkSession): DataFrame =
    spark.sql(query)

  override def readTable(name: String)(implicit spark: SparkSession): DataFrame =
    spark.table(name)

  override def readPath(path: String)(implicit spark: SparkSession): DataFrame =
    declaredSchema match {
      case Some(st) =>
        spark.read.format(pathFormat).schema(st).options(readOptions).load(path)
      case None =>
        spark.read.format(pathFormat).options(readOptions).load(path)
    }

  override def readOptions: Map[String, String] = pathFormat match {
    // inferSchema only when nothing is declared — with a declared schema
    // the option would be ignored anyway, but keeping it out makes the
    // no-inference contract visible in the plan's scan options.
    case "csv" if declaredSchema.isEmpty => Map("header" -> "true", "inferSchema" -> "true")
    case "csv" => Map("header" -> "true")
    case _     => Map.empty
  }

  override def writeOptions: Map[String, String] = pathFormat match {
    case "csv" => Map("header" -> "true")
    case _     => Map.empty
  }
}

object DataSource {
  /** Factory (reference: base_datasource.py:13-24 — rejects anything not
    * registered; ours likewise). `schema` (Spark DDL) applies to the
    * file formats' path reads; parquet/delta are self-describing, so a
    * declared schema there is rejected rather than silently ignored. */
  def apply(name: String, schema: Option[String] = None): DataSource =
    name.toLowerCase match {
      case "parquet" | "delta" =>
        if (schema.nonEmpty)
          throw new IllegalArgumentException(
            s"datasource $name is self-describing; remove the declared schema")
        new ParquetCatalogSource
      case "csv" | "json" => new FileFormatSource(name.toLowerCase, schema)
      case "orc" =>
        // Columnar and self-describing like parquet (schema from file
        // footers, no inference pass), but path-addressed through the
        // same file-format reader/writer as csv/json.
        if (schema.nonEmpty)
          throw new IllegalArgumentException(
            "datasource orc is self-describing; remove the declared schema")
        new FileFormatSource("orc", None)
      case other =>
        throw new IllegalArgumentException(s"Datasource $other not found")
    }
}
