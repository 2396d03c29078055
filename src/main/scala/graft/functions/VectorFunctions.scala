package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` embedding columns.
  *
  * Built from Spark higher-order functions (`zip_with`/`aggregate`) rather
  * than UDFs: HOFs evaluate inside the JVM on unsafe array data with no
  * serialization boundary, keep predicate pushdown/column pruning intact,
  * and keep the door open to swap in a codegen'd Catalyst expression later
  * without changing call sites.
  *
  * All math is done in DOUBLE precision with left-to-right accumulation so
  * results are deterministic and reproducible in the DuckDB oracle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, sequential accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0d, lit(0.0d)).otherwise(d / nn)
  }

  /** L2-normalized copy (array<double>); zero vectors pass through. */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0d, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Dot product of two pre-normalized vectors == cosine. Precomputing
    * `l2Normalize` once per side turns an O(n·m) cosine join into plain
    * dots — the cheap path for brute-force top-k at scale. */
  def dotPreNormalized(a: Column, b: Column): Column = dot(a, b)
}
