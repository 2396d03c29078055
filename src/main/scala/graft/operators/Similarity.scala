package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - `bruteForceTopK` — exact cosine top-k. The query side is expected to
  *     be small (a probe set); it is explicitly `broadcast()`, so the plan
  *     is a broadcast-nested-loop over the corpus: one corpus scan, no
  *     shuffle, embarrassingly parallel. This is the exactness baseline
  *     and the oracle anchor.
  *   - `annTopK` — random-hyperplane LSH: corpus and queries hash into
  *     sign-pattern buckets across several independent tables; only
  *     same-bucket pairs are scored. Equi-join on (table, bucket) — the
  *     scale path: cost ∝ collisions, not |corpus|×|queries|.
  *
  * Both L2-normalize once up front so per-pair work is a single dot.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query row.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    * deterministic tie-break on neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      includeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), l2Normalize(col(vecCol)).as("__cn"))
    val q = queries.select(col(idCol).as("query_id"), l2Normalize(col(vecCol)).as("__qn"))
    val pairs = c.crossJoin(broadcast(q))
    val scored = (if (includeSelf) pairs
                  else pairs.filter(col("neighbor_id") =!= col("query_id")))
      .withColumn("cosine", dot(col("__cn"), col("__qn")))
    topK(scored, k).select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** ANN top-k via random-hyperplane LSH. Same output shape as brute force;
    * recall < 1 by construction (tunable via tables/planes). */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      tables: Int = 8,
      planesPerTable: Int = 10,
      seed: Long = 42L): DataFrame = {
    val c = hyperplaneBuckets(corpus, vecCol, idCol, tables, planesPerTable, seed)
      .select(col("__table"), col("__bucket"), col("__id").as("neighbor_id"), col("__nv").as("__cn"))
    val q = hyperplaneBuckets(queries, vecCol, idCol, tables, planesPerTable, seed)
      .select(col("__table"), col("__bucket"), col("__id").as("query_id"), col("__nv").as("__qn"))
    val scored = c.join(q, Seq("__table", "__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", dot(col("__cn"), col("__qn")))
    topK(scored, k).select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Shared LSH stage: explode each row into `tables` (table, bucket)
    * entries, bucket = integer of hyperplane sign bits. Hyperplane weights
    * are seeded pseudo-random literals — identical across invocations, so
    * corpus and query bucketing always agree. */
  private[operators] def hyperplaneBuckets(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      tables: Int,
      planesPerTable: Int,
      seed: Long): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val rnd = new scala.util.Random(seed)
    // planes(t)(p) = dim gaussian-ish weights
    val planes: Seq[Seq[Seq[Double]]] =
      Seq.fill(tables)(Seq.fill(planesPerTable)(Seq.fill(dim)(rnd.nextGaussian())))

    val nv = l2Normalize(col(vecCol))
    val base = df.select(col(idCol).as("__id"), nv.as("__nv"))

    def bucketFor(t: Int): Column =
      planes(t).zipWithIndex.map { case (w, p) =>
        when(dot(col("__nv"), typedLit(w)) >= 0.0d, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    base.select(
      col("__id"), col("__nv"),
      posexplode(array((0 until tables).map(bucketFor): _*)))
      .withColumnsRenamed(Map("pos" -> "__table", "col" -> "__bucket"))
  }

  /** Window top-k with deterministic ordering (cosine desc, id asc). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
