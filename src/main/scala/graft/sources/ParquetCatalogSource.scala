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
  * differ. CSV reads infer the schema — convenient for the small extract/
  * ingest files this addresses, but schema inference is an extra full
  * pass over the data: at scale, register the file behind a catalog table
  * (or convert to parquet via an `overwrite` job) instead of re-inferring
  * per query. */
final class FileFormatSource(override val pathFormat: String) extends DataSource {
  override def sql(query: String)(implicit spark: SparkSession): DataFrame =
    spark.sql(query)

  override def readTable(name: String)(implicit spark: SparkSession): DataFrame =
    spark.table(name)

  override def readPath(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.format(pathFormat).options(readOptions).load(path)

  override def readOptions: Map[String, String] = pathFormat match {
    case "csv" => Map("header" -> "true", "inferSchema" -> "true")
    case _     => Map.empty
  }

  override def writeOptions: Map[String, String] = pathFormat match {
    case "csv" => Map("header" -> "true")
    case _     => Map.empty
  }
}

object DataSource {
  /** Factory (reference: base_datasource.py:13-24 — rejects anything not
    * registered; ours likewise). */
  def apply(name: String): DataSource = name.toLowerCase match {
    case "parquet" | "delta" => new ParquetCatalogSource
    case "csv" | "json"      => new FileFormatSource(name.toLowerCase)
    case other =>
      throw new IllegalArgumentException(s"Datasource $other not found")
  }
}
