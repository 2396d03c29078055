package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions}
import graft.functions.VectorFunctions.dotNative

/** IVF (inverted-file) approximate nearest neighbor: the second scale
  * path next to hyperplane LSH (`Similarity.annTopK`).
  *
  *   1. TRAIN: `iters` rounds of k-means on cosine similarity. Centroids
  *      live on the DRIVER (nlist × dim doubles — model metadata, not
  *      data; collecting them is legitimate and tiny). Assignment runs
  *      distributed: nlist `graft_dot` calls per row, argmax via greatest
  *      over (score, cell) structs. Centroid update is a cell×dimension
  *      hash-aggregate (posexplode + avg) — map-side partial, one shuffle
  *      of nlist×dim rows.
  *   2. INDEX: each corpus vector is assigned to its nearest centroid
  *      cell — an equi-joinable integer.
  *   3. PROBE: each query explodes to its `nprobe` nearest cells; an
  *      equi-join on cell yields candidates; exact cosine + window top-k.
  *
  * Cost ∝ |corpus|·nlist (assignment) + collisions — never
  * |corpus|×|queries|. Recall is tunable via nlist/nprobe.
  */
object IvfIndex {

  /** Top-k by cosine for each query via an IVF index trained on the fly.
    * Output shape matches Similarity: (query_id, neighbor_id, cosine,
    * rank). Deterministic for a fixed seed. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2,
      seed: Long = 42L): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    GraftFunctions.register(corpus.sparkSession)
    val centroids = train(corpus, vecCol, idCol, nlist, iters, seed)

    val c = Similarity.normedBase(corpus, vecCol, idCol)
      .withColumn("__cell", nearestCell(col("__vec"), col("__norm"), centroids))
      .withColumnsRenamed(Map("__id" -> "neighbor_id", "__vec" -> "__cv", "__norm" -> "__cn"))
    val q = Similarity.normedBase(queries, vecCol, idCol)
      .withColumn("__cell", explode(topCells(col("__vec"), col("__norm"), centroids, nprobe)))
      .withColumnsRenamed(Map("__id" -> "query_id", "__vec" -> "__qv", "__norm" -> "__qn"))

    val scored = c.join(q, "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        when(col("__cn") * col("__qn") === 0.0d, lit(0.0d))
          .otherwise(dotNative(col("__cv"), col("__qv")) / (col("__cn") * col("__qn"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Persist a trained index as a reusable parquet artifact:
    *
    *   - `dir/centroids`: (cell INT, vec ARRAY<DOUBLE>) — nlist rows of
    *     model metadata.
    *   - `dir/assignments`: (id, vec, norm, cell) partitioned BY CELL, so
    *     a probe that joins on `cell` reads only the probed partitions
    *     (dynamic partition pruning). At 100 TB that is the entire point
    *     of an IVF index: nprobe/nlist of the corpus is scanned per query
    *     batch instead of all of it, and the expensive k-means + per-row
    *     assignment is paid ONCE at build time, not per session.
    *
    * Overwrites any index already at `dir`. */
  def writeIndex(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      dir: String,
      nlist: Int = 16,
      iters: Int = 2,
      seed: Long = 42L): Unit = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    val centroids = train(corpus, vecCol, idCol, nlist, iters, seed)
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "vec")
      .repartition(1) // nlist rows
      .write.mode("overwrite").parquet(s"$dir/centroids")
    Similarity.normedBase(corpus, vecCol, idCol)
      .withColumn("cell", nearestCell(col("__vec"), col("__norm"), centroids))
      .select(col("__id").as("id"), col("__vec").as("vec"),
        col("__norm").as("norm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assignments")
  }

  /** Top-k by cosine for each query against a PERSISTED index (see
    * `writeIndex`). Identical results to `ivfTopK` at the same
    * (nlist, iters, seed, nprobe): assignment was computed by the same
    * code at build time, and probing uses the stored centroids. The
    * assignments scan is pruned to the probed cells via the partition
    * column. */
  def loadTopK(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    GraftFunctions.register(spark)
    val centroids: Seq[Seq[Double]] = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").select("vec")
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(nprobe <= centroids.size, "nprobe must be <= stored nlist")

    val c = spark.read.parquet(s"$dir/assignments")
      .withColumnsRenamed(Map(
        "id" -> "neighbor_id", "vec" -> "__cv", "norm" -> "__cn", "cell" -> "__cell"))
    val q = Similarity.normedBase(queries, vecCol, idCol)
      .withColumn("__cell", explode(topCells(col("__vec"), col("__norm"), centroids, nprobe)))
      .withColumnsRenamed(Map("__id" -> "query_id", "__vec" -> "__qv", "__norm" -> "__qn"))

    val scored = c.join(q, "__cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        when(col("__cn") * col("__qn") === 0.0d, lit(0.0d))
          .otherwise(dotNative(col("__cv"), col("__qv")) / (col("__cn") * col("__qn"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** K-means by cosine; returns driver-side centroids. Seeds are the
    * nlist corpus rows with the smallest xxhash64(id) — deterministic and
    * uniformly spread without a full sort (top-k via limit on an ordered
    * narrow projection). */
  private[operators] def train(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      nlist: Int,
      iters: Int,
      seed: Long): Seq[Seq[Double]] = {
    val base = Similarity.normedBase(corpus, vecCol, idCol)
    var centroids: Seq[Seq[Double]] = base
      .orderBy(xxhash64(col("__id"), lit(seed)))
      .limit(nlist)
      .select(transform(col("__vec"), _.cast("double")).as("v"))
      .collect()
      .map(_.getSeq[Double](0).toSeq).toSeq

    (1 to iters).foreach { _ =>
      val assigned = base.withColumn("__cell",
        nearestCell(col("__vec"), col("__norm"), centroids))
      val updated = assigned
        .select(col("__cell"), posexplode(col("__vec")))
        .groupBy("__cell", "pos").agg(avg(col("col").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // cells that lost all members keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** argmax cell by cosine: nlist native dots against literal centroids,
    * greatest over (score, -cell) structs for a deterministic low-cell
    * tie-break. Norm 0 rows land in cell 0. */
  private def nearestCell(
      vec: Column, norm: Column, centroids: Seq[Seq[Double]]): Column =
    sort_array(cellScores(vec, norm, centroids), asc = false)
      .getItem(0).getField("cell")

  /** The nprobe best cells, best first. */
  private[operators] def topCells(
      vec: Column, norm: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    transform(
      slice(sort_array(cellScores(vec, norm, centroids), asc = false), 1, nprobe),
      _.getField("cell"))

  /** Array of (score, cell) structs; struct ordering compares score first,
    * then cell — cell is negated so ties break toward the LOWER cell id
    * under descending sort. */
  private def cellScores(
      vec: Column, norm: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.zipWithIndex.map { case (cvec, i) =>
      val cnorm = math.sqrt(cvec.map(x => x * x).sum)
      val score =
        if (cnorm == 0.0) lit(0.0d)
        else when(norm === 0.0d, lit(0.0d))
          .otherwise(dotNative(vec, typedLit(cvec)) / (norm * lit(cnorm)))
      struct(score.as("score"), lit(-i).as("negcell"), lit(i).as("cell"))
    }: _*)
}
