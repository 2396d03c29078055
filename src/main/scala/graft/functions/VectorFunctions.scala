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

  // ---------------------------------------------------- native codegen path

  /** Native Catalyst dot product (see `DotProduct`): one expression node
    * compiling to a tight primitive loop — the hot-path choice. Requires
    * `GraftFunctions.register(spark)` (operators register on entry; or set
    * `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def dotNative(a: Column, b: Column): Column =
    call_function(GraftFunctions.DotName, a, b)

  // ------------------------------------------------- fixed-dim codegen path

  /** Dot product unrolled to `dim` element_at multiply-adds: stays inside
    * whole-stage codegen (the HOF `dot` interprets its lambda per element —
    * ~10× slower in the hyperplane-LSH hot loop). When one side is an array
    * literal, constant folding turns its element_at calls into literals.
    * Requires fixed-length vectors (ragged input errs under ANSI mode). */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  // NOTE deliberately no `l2NormalizeUnrolled`: building a normalized
  // array column inlines the norm subtree into every element's division
  // (dim × dot-tree nodes — measured 4× slower than the HOF version).
  // Carry (raw vector, scalar norm) instead and divide the final dot.

  /** Vector length of the first row — for sizing the unrolled expressions.
    * One tiny driver action at plan-build time (schema-level, not data
    * scale dependent). */
  def dimOf(df: org.apache.spark.sql.DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)
}
