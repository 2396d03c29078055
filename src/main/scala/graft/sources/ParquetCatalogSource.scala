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

/** Datasource abstraction (reference: datasource/base_datasource.py:27-61).
  * The reference's only concrete impl is Delta; ours is parquet over the
  * session catalog. All query evaluation stays in Spark SQL — the engine
  * never interprets expressions itself. */
trait DataSource {
  def sql(query: String)(implicit spark: SparkSession): DataFrame
  def readTable(name: String)(implicit spark: SparkSession): DataFrame
  def readPath(path: String)(implicit spark: SparkSession): DataFrame
  def read(ref: TargetRef)(implicit spark: SparkSession): DataFrame = ref match {
    case TableRef(t) => readTable(t)
    case PathRef(p)  => readPath(p)
  }
}

final class ParquetCatalogSource extends DataSource {
  override def sql(query: String)(implicit spark: SparkSession): DataFrame =
    spark.sql(query)

  override def readTable(name: String)(implicit spark: SparkSession): DataFrame =
    spark.table(name)

  override def readPath(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(path)
}

object DataSource {
  /** Factory (reference: base_datasource.py:13-24 — rejects anything but
    * its one format; ours likewise). */
  def apply(name: String): DataSource = name.toLowerCase match {
    case "parquet" | "delta" => new ParquetCatalogSource
    case other =>
      throw new IllegalArgumentException(s"Datasource $other not found")
  }
}
