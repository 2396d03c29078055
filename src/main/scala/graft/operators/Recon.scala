package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, NumericType}
import graft.spec.{ReconSpec, ReconSource}
import graft.sources.DataSource

/** Multi-source reconciliation (data-diff) pipeline
  * (reference: recon/recon.py:83-194):
  *
  *   1. per source: evaluate query/table/path →
  *      `groupBy(group_by).agg(metric_expr AS alias …)` (recon.py:109-126);
  *   2. prefix every metric column with the source name (recon.py:137-142);
  *   3. reduce full-outer equi-join of all aggregates on the group-by keys
  *      (recon.py:144-146) — using-columns join so keys coalesce;
  *   4. with exactly two sources, for every numeric metric present in both:
  *      `delta_<m> = abs(s1_m - s2_m)` and a `match_<m>` column —
  *      float/double metrics compare with relative tolerance 1e-3 against
  *      the SECOND source, everything else with strict equality
  *      (recon.py:149-184).
  *
  * Differences from the reference, deliberate (SURVEY.md §2.6/§7.4):
  *   - tolerance compare is a native Catalyst expression, not a Python UDF
  *     (codegen-able, no executor↔python round trip);
  *   - `b = 0` does not crash: equal values (incl. 0,0) match, `b=0 ≠ a`
  *     mismatches (division yields ±Infinity → false);
  *   - non-numeric metrics are skipped by a dtype guard, not `except: pass`;
  *   - the joined DataFrame is returned, not stashed on the job object.
  *
  * Scale: per-source aggregation is partial+final hash-agg (map-side
  * combine); the N-way join runs over already-aggregated (small) data and
  * broadcast-joins when a side fits under the threshold. Nothing is
  * collected to the driver.
  */
final class ReconJob(val spec: ReconSpec)(implicit spark: SparkSession) {
  import ReconJob._

  private def readSource(s: ReconSource): DataFrame = {
    val ds = DataSource(s.datasource, s.schema)
    s.query.map(ds.sql(_))
      .orElse(s.table.map(ds.readTable(_)))
      .orElse(s.path.map(ds.readPath(_)))
      .getOrElse(throw new IllegalStateException("validated recon source lacks input"))
  }

  /** Steps 1-2: per-source aggregate, projected to groupBy ++ metrics. */
  private[graft] def aggregates: Seq[(String, DataFrame)] = spec.data.map { s =>
    val aggExprs = s.metrics.map { case (alias, e) => expr(e).as(alias) }
    val agg = readSource(s)
      .groupBy(spec.groupBy.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select((spec.groupBy ++ s.metrics.map(_._1)).map(col): _*)
    s.name -> agg
  }

  def run(): DataFrame = {
    val prefixed = aggregates.map { case (name, agg) =>
      val metricCols = agg.columns.filterNot(spec.groupBy.contains)
      (name, agg.withColumnsRenamed(metricCols.map(m => m -> s"${name}_$m").toMap),
        metricCols.toSeq)
    }
    var joined = prefixed.map(_._2).reduce(_.join(_, spec.groupBy, "full"))

    val types = joined.schema.map(f => f.name -> f.dataType).toMap
    spec.compareMode match {
      // Reference parity: delta/match columns only for the exactly-two-
      // source case (reference guard: recon.py:149); tolerance denominator
      // is the SECOND source (recon.py:172).
      case "auto" if spec.data.length == 2 =>
        val Seq((n1, _, m1), (n2, _, m2)) = prefixed.toSeq
        m1.intersect(m2).sorted.foreach { m =>
          val (a, b) = (col(s"${n1}_$m"), col(s"${n2}_$m"))
          (types(s"${n1}_$m"), types(s"${n2}_$m")) match {
            case (t1: NumericType, t2: NumericType) =>
              joined = joined
                .withColumn(s"delta_$m", abs(a - b))
                .withColumn(s"match_$m", matchColumn(a, b, isFloating(t1) || isFloating(t2)))
            case _ => () // non-numeric metric: no delta/match, mirrors intended skip
          }
        }
      // Opt-in N-way extension: every non-first source compared against
      // the FIRST (the declared baseline), one delta/match pair per
      // (source, shared numeric metric) — so a 3+-way recon names WHICH
      // source drifted instead of emitting bare per-source aggregates.
      // Tolerance denominator is the baseline. Purely additive: the
      // joined aggregate columns are identical to auto mode.
      case "vs_first" if spec.data.length >= 2 =>
        val (n1, _, m1) = prefixed.head
        prefixed.tail.foreach { case (ni, _, mi) =>
          m1.intersect(mi).sorted.foreach { m =>
            val (a, b) = (col(s"${n1}_$m"), col(s"${ni}_$m"))
            (types(s"${n1}_$m"), types(s"${ni}_$m")) match {
              case (t1: NumericType, t2: NumericType) =>
                joined = joined
                  .withColumn(s"delta_${ni}_$m", abs(a - b))
                  .withColumn(s"match_${ni}_$m",
                    matchColumn(b, a, isFloating(t1) || isFloating(t2)))
              case _ => ()
            }
          }
        }
      case _ => ()
    }
    joined
  }
}

object ReconJob {
  /** Relative tolerance threshold for floating metrics (recon.py:172-173). */
  val FloatTolerance = 1e-3

  private def isFloating(t: org.apache.spark.sql.types.DataType): Boolean =
    t == FloatType || t == DoubleType

  /** Native replacement for the reference's tolerance UDF. Equal values
    * short-circuit to true (defines the b=0,a=0 edge); otherwise relative
    * error vs the second source under 1e-3. `try_divide` keeps ANSI mode
    * from throwing DIVIDE_BY_ZERO when b=0 (the reference UDF crashed
    * there); its NULL — and NULLs from keys present in only one source —
    * coalesce to a non-match. */
  def matchColumn(a: Column, b: Column, floating: Boolean): Column =
    if (floating)
      when(a === b, lit(true))
        .otherwise(coalesce(abs(try_divide(a - b, b)) < lit(FloatTolerance), lit(false)))
    else a === b

  def fromConfig(path: String, params: Map[String, String] = Map.empty)(
      implicit spark: SparkSession): ReconJob =
    new ReconJob(ReconSpec.load(path, params))

  def fromYaml(yaml: String, params: Map[String, String] = Map.empty)(
      implicit spark: SparkSession): ReconJob =
    new ReconJob(ReconSpec.fromString(yaml, params))
}
