package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design, common to every near-dup variant here: candidate pairs
  * come from an LSH-style BLOCKING key (band hash / bit chunk / hyperplane
  * bucket), so the only joins are equi-joins on small keys — never an
  * O(n²) cross join. Each stage is a shuffle keyed by the blocking value;
  * skew is bounded because blocking keys are hashes (uniform). Verification
  * (exact Jaccard / hamming / cosine) runs only on candidate pairs.
  * Nothing ever collects to the driver.
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: keep the lowest-`idCol` row per duplicate group of
    * `keyCols` (deterministic winner). Hash-aggregate based: one shuffle
    * on the dedup key. Equivalent SQL: GROUP BY key → min(id) → semi-join.
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val winners = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
    df.join(winners, keyCols :+ idCol, "left_semi")
  }

  /** Exact text dedup on the md5 fingerprint of normalized text: cheaper
    * shuffle (32-byte key instead of full document text). */
  def exactText(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__fp", fingerprint(col(textCol)))
    exact(keyed, Seq("__fp"), idCol).drop("__fp")
  }

  // ------------------------------------------------------------ minhash LSH

  /** Deterministic universal-hash parameters (seeded, fixed across runs)
    * for the minwise family h_i(x) = (a_i·x + b_i) mod P over the Mersenne
    * field P = 2³¹-1. Operands stay < 2³¹ so the 64-bit product never
    * overflows — important under Spark 4's default ANSI mode, which throws
    * on wraparound instead of wrapping. */
  private[operators] val MersenneP = (1L << 31) - 1
  private def hashParams(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Seq.fill(k)(1L + math.abs(rnd.nextLong()) % (MersenneP - 1))
    val b = Seq.fill(k)(math.abs(rnd.nextLong()) % MersenneP)
    (a, b)
  }

  /** (a·(h mod P) + b) mod P — overflow-free universal hash of a 64-bit
    * shingle hash. */
  private def uhash(h: Column, a: Column, b: Column): Column =
    pmod(a * pmod(h, lit(MersenneP)) + b, lit(MersenneP))

  /** MinHash + LSH banding near-dup candidate/verify pipeline over a text
    * column.
    *
    * Stages (all distributed, one equi-join):
    *   1. shingle each doc (word n-grams), hash shingles to 64-bit ints;
    *   2. k minhashes via universal hashing (a·h+b, 64-bit wraparound);
    *   3. split the k-signature into `bands` bands, hash each band;
    *   4. self-join on (band index, band hash) → candidate pairs;
    *   5. verify exact Jaccard on the shingle-hash sets; keep ≥ threshold.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val (a, b) = hashParams(numHashes, seed)
    val aLit = typedLit(a)
    val bLit = typedLit(b)

    val docs = df.select(
      col(idCol).as("__id"),
      array_distinct(transform(wordShingles(col(textCol), shingleSize), xxhash64(_)))
        .as("__sh"))
      .filter(size(col("__sh")) > 0)
      // signature[i] = min over shingles of (a_i * h + b_i) with sign cleared
      .withColumn("__sig",
        transform(sequence(lit(1), lit(numHashes)), i =>
          array_min(transform(col("__sh"), h =>
            uhash(h, element_at(aLit, i), element_at(bLit, i))))))

    val banded = docs.select(
      col("__id"), col("__sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
        xxhash64(concat_ws(",", transform(
          slice(col("__sig"), bi * rows + 1, lit(rows)), _.cast("string")))))))
      .withColumnsRenamed(Map("pos" -> "__band", "col" -> "__bandhash"))

    val left  = banded.select(col("__band"), col("__bandhash"),
      col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val right = banded.select(col("__band"), col("__bandhash"),
      col("__id").as("id_b"), col("__sh").as("__sh_b"))

    val candidates = left.join(right, Seq("__band", "__bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__sh_a", "__sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Keep one representative per near-dup cluster found by minHashLsh:
    * drops every id that appears as the greater member of a qualifying
    * pair (transitive chains collapse to their smallest id stepwise). */
  def minHashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val losers = minHashLsh(df, textCol, idCol, shingleSize, numHashes, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash of the token stream: per-bit vote of token hashes.
    * Pure HOF pipeline: O(tokens × 64) adds per doc, no shuffle. */
  def simHash(textCol: Column): Column = {
    val toks = tokens(textCol)
    val votes = aggregate(
      toks,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(
            pmod(call_function("shiftrightunsigned", h, i.cast("int")), lit(2L)) =!= 0,
            1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) => struct(v.as("v"), i.as("i"))),
      lit(0L),
      (acc, s) => acc + when(s("v") > 0,
        call_function("shiftleft", lit(1L), s("i").cast("int"))).otherwise(0L))
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) <= maxHamming.
    * Blocking by the pigeonhole principle: split the 64-bit hash into
    * (maxHamming+1) chunks — any pair within the hamming budget agrees on
    * at least one whole chunk, so candidates come from equi-joins on
    * (chunk index, chunk value). Returns (id_a, id_b, hamming). */
  def simHashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    require(64 % chunks == 0, "maxHamming+1 must divide 64")
    val bitsPer = 64 / chunks
    val hashed = df.select(col(idCol).as("__id"), simHash(col(textCol)).as("__sim"))
      .select(col("__id"), col("__sim"),
        posexplode(transform(sequence(lit(0), lit(chunks - 1)), ci =>
          pmod(
            call_function("shiftrightunsigned", col("__sim"), (ci * bitsPer).cast("int")),
            lit(1L << bitsPer)))))
      .withColumnsRenamed(Map("pos" -> "__ci", "col" -> "__cv"))

    val l = hashed.select(col("__ci"), col("__cv"), col("__id").as("id_a"), col("__sim").as("__sim_a"))
    val r = hashed.select(col("__ci"), col("__cv"), col("__id").as("id_b"), col("__sim").as("__sim_b"))
    l.join(r, Seq("__ci", "__cv"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("__sim_a").bitwiseXOR(col("__sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // -------------------------------------------------------- n-gram jaccard

  /** Character n-gram Jaccard near-dup pairs. Candidates via minhash-LSH
    * over the char-shingle hashes (same banding machinery), verified with
    * exact n-gram Jaccard. Catches small edits word-shingles miss. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      threshold: Double = 0.7,
      numHashes: Int = 64,
      bands: Int = 16,
      seed: Long = 7L): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val (a, b) = hashParams(numHashes, seed)
    val (aLit, bLit) = (typedLit(a), typedLit(b))

    val docs = df.select(
      col(idCol).as("__id"),
      array_distinct(transform(charShingles(col(textCol), n), xxhash64(_))).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig",
        transform(sequence(lit(1), lit(numHashes)), i =>
          array_min(transform(col("__sh"), h =>
            uhash(h, element_at(aLit, i), element_at(bLit, i))))))

    val banded = docs.select(
      col("__id"), col("__sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bi =>
        xxhash64(concat_ws(",", transform(
          slice(col("__sig"), bi * rows + 1, lit(rows)), _.cast("string")))))))
      .withColumnsRenamed(Map("pos" -> "__band", "col" -> "__bandhash"))

    val l = banded.select(col("__band"), col("__bandhash"), col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val r = banded.select(col("__band"), col("__bandhash"), col("__id").as("id_b"), col("__sh").as("__sh_b"))
    l.join(r, Seq("__band", "__bandhash"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------------- embedding near-dup

  /** Embedding cosine near-dup pairs via random-hyperplane LSH blocking:
    * `tables` independent hash tables of `planesPerTable` sign bits each;
    * docs sharing a full bucket in ANY table become candidates; verified
    * with exact cosine ≥ threshold. Returns (id_a, id_b, cosine). */
  def embeddingCosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      tables: Int = 8,
      planesPerTable: Int = 12,
      seed: Long = 42L): DataFrame = {
    val buckets = Similarity.hyperplaneBuckets(
      df, vecCol, idCol, tables, planesPerTable, seed)
    val l = buckets.select(col("__table"), col("__bucket"),
      col("__id").as("id_a"), col("__nv").as("__nv_a"))
    val r = buckets.select(col("__table"), col("__bucket"),
      col("__id").as("id_b"), col("__nv").as("__nv_b"))
    l.join(r, Seq("__table", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFunctions.dot(col("__nv_a"), col("__nv_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
