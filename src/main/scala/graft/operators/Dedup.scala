package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design, common to every near-dup variant here: candidate pairs
  * come from an LSH-style BLOCKING key (band hash / bit chunk / hyperplane
  * bucket), so the only joins are equi-joins on small keys — never an
  * O(n²) cross join. Each stage is a shuffle keyed by the blocking value;
  * skew is bounded because blocking keys are hashes (uniform). Verification
  * (exact Jaccard / hamming / cosine) runs only on candidate pairs.
  * Nothing ever collects to the driver.
  *
  * Signature computation (minhash / simhash) is formulated as explode +
  * hash-aggregate with k independent `min`/`sum` aggregate columns: plain
  * integer arithmetic inside whole-stage codegen with map-side partial
  * aggregation, instead of interpreted higher-order-function lambdas
  * (O(k × elements) per row with per-element expression interpretation —
  * measured ~10× slower at sf0.1).
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
      .select((keyCols :+ idCol).map(c => col(c).as(s"__w_$c")): _*)
    // Null-safe key equality (<=>): groupBy treats NULL keys as a group, so
    // the winner row exists — a plain equi-join would silently drop it.
    val cond = keyCols.map(k => df(k) <=> winners(s"__w_$k")).reduce(_ && _) &&
      df(idCol) === winners(s"__w_$idCol")
    df.join(winners, cond, "left_semi")
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
    // & Long.MaxValue, not math.abs: abs(Long.MinValue) is negative and
    // would break the a,b < 2³¹ field invariant.
    def nonNeg(): Long = rnd.nextLong() & Long.MaxValue
    val a = Seq.fill(k)(1L + nonNeg() % (MersenneP - 1))
    val b = Seq.fill(k)(nonNeg() % MersenneP)
    (a, b)
  }

  /** Exploded word-shingle hashes `(__id, __h)`: one row per shingle
    * position, substring/concat + xxhash64 computed inside whole-stage
    * codegen. No shingle array is ever materialized (the interpreted
    * `transform`-built arrays were the measured hot spot). Docs shorter
    * than `n` units yield one whole-text shingle, mirroring
    * `TextFunctions.wordShingles`. Duplicate shingles are kept — minhash
    * over a multiset equals minhash over its set. */
  private def explodedWordShingles(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")) - (n - 1), lit(1)))).as("__i"))
      .select(col("__id"),
        xxhash64(concat_ws(" ", slice(col("__t"), col("__i"), lit(n)))).as("__h"))

  /** Exploded char-shingle hashes, same contract as the word variant. */
  private def explodedCharShingles(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"), normalizeText(col(textCol)).as("__t"))
      .select(col("__id"), col("__t"),
        explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"))
      .select(col("__id"), xxhash64(col("__t").substr(col("__i"), lit(n))).as("__h"))

  /** LSH band candidate pairs over exploded shingle-hash rows `(__id, __h)`.
    *
    * Stages (all distributed, one narrow equi-join):
    *   1. hash-aggregate k minhashes per doc as k `min` columns
    *      (codegen'd, map-side partial min — the shuffle carries only
    *      k longs per doc, never the shingle sets);
    *   2. band hash = xxhash64 over each band's min-columns; explode the
    *      `bands` (band, hash) structs;
    *   3. self-equi-join on (band index, band hash), id_a < id_b, distinct.
    *
    * Only doc ids cross the band join — shingle sets are attached later
    * to the (small) candidate set, so band-collision skew can't amplify
    * wide rows. */
  /** Cap on members per blocking bucket. A bucket of n docs yields n²/2
    * candidate pairs — boilerplate-heavy corpora (license headers,
    * navigation chrome) produce million-doc buckets at scale, and one
    * such bucket stalls the whole join. Buckets above the cap are dropped:
    * their members are near-identical boilerplate better handled by exact
    * dedup first (the standard production mitigation; skew never reaches
    * the join). */
  val DefaultMaxBucket = 10000

  /** Drop blocking buckets with more than `maxBucket` members. `keys` are
    * the bucket columns. One count-aggregate over the (persisted, narrow)
    * bucket table + an equi-join — cheap relative to the n² it prevents. */
  private[graft] def capBuckets(
      buckets: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val ok = buckets.groupBy(keys.map(col): _*).count()
      .filter(col("count") <= maxBucket).drop("count")
    buckets.join(ok, keys)
  }

  private def minhashBandPairs(
      shingleRows: DataFrame,
      numHashes: Int,
      bands: Int,
      seed: Long,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val rows = numHashes / bands
    val (a, b) = hashParams(numHashes, seed)
    // (a·h+b) mod P over the Mersenne field: the per-hash division is NOT
    // the bottleneck — a multiply-shift variant (mul+add+>>>33) measured
    // 2× SLOWER end-to-end because its low-clustered minima collide more
    // across bands and flood the candidate join. Keep the field math.
    val hMod = pmod(col("__h"), lit(MersenneP))
    val minAggs = (0 until numHashes).map { i =>
      min(pmod(lit(a(i)) * hMod + lit(b(i)), lit(MersenneP))).as(s"__m$i")
    }
    val sigs = shingleRows.groupBy("__id").agg(minAggs.head, minAggs.tail: _*)

    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("b"),
        xxhash64((bi * rows until (bi + 1) * rows).map(i => col(s"__m$i")): _*).as("h"))
    }
    // Persist the NARROW band table (3 longs/doc/band): the self-join and
    // the candidate consumers below would otherwise each recompute the
    // whole shingle+signature pipeline (Spark re-executes shared subplans
    // per branch; ReusedExchange doesn't fire across these shapes —
    // measured 2.4× slower without the persists).
    val banded = sigs
      .select(col("__id"), explode(array(bandCols: _*)).as("__bh"))
      .select(col("__id"), col("__bh.b").as("__band"), col("__bh.h").as("__bandhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val capped = capBuckets(banded, Seq("__band", "__bandhash"), maxBucket)
    val l = capped.withColumnRenamed("__id", "id_a")
    val r = capped.withColumnRenamed("__id", "id_b")
    l.join(r, Seq("__band", "__bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact-Jaccard verification of candidate pairs. Shingling is expensive
    * (O(chars) substrings + hashes per doc), so the corpus is first
    * semi-joined down to ids that appear in a candidate pair — shingle
    * SETS (collect_set of the exploded hashes) are built only for that
    * small set (AQE broadcasts the id list), never for the whole corpus. */
  private def verifyJaccard(
      df: DataFrame,
      idCol: String,
      candidates: DataFrame,
      threshold: Double,
      explodedShingles: DataFrame => DataFrame): DataFrame = {
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("__cand_id"))
      .distinct()
    val candDocs = explodedShingles(
      df.join(candIds, df(idCol) === candIds("__cand_id"), "left_semi"))
      .groupBy("__id").agg(collect_set(col("__h")).as("__sh"))
    val shA = candDocs.select(col("__id").as("id_a"), col("__sh").as("__sh_a"))
    val shB = candDocs.select(col("__id").as("id_b"), col("__sh").as("__sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash + LSH banding near-dup pipeline over a text column: word
    * n-gram shingles → k minhashes → band equi-join candidates → exact
    * Jaccard ≥ threshold. Returns (id_a, id_b, jaccard) with id_a < id_b. */
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
    val candidates = minhashBandPairs(
      explodedWordShingles(df, textCol, idCol, shingleSize), numHashes, bands, seed)
    verifyJaccard(df, idCol, candidates, threshold,
      explodedWordShingles(_, textCol, idCol, shingleSize))
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

  /** 64-bit SimHash of the token stream as a single Column (per-bit vote
    * of token hashes). HOF formulation — fine for ad-hoc per-row use; the
    * scale path for whole-corpus dedup is `simHashPairs`, which computes
    * the same hash via explode + codegen'd vote sums. */
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

  /** SimHash signatures `(__id, __sim)` for a whole corpus: explode tokens,
    * hash-aggregate 64 per-bit vote sums (map-side partial, codegen'd),
    * then reassemble the 64-bit hash by OR-ing the winning bits. Tokenless
    * docs keep a null token via explode_outer → all votes 0 → hash 0,
    * matching the HOF `simHash` on empty input. */
  private def simHashSigs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode_outer(tokens(col(textCol))).as("__t"))
    val h = xxhash64(col("__t"))
    val voteAggs = (0 until 64).map { i =>
      sum(when(col("__t").isNull, lit(0L))
        .when(h.bitwiseAND(lit(1L << i)) =!= 0, lit(1L)).otherwise(lit(-1L)))
        .as(s"__v$i")
    }
    val sim = (0 until 64).map { i =>
      when(col(s"__v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    toks.groupBy("__id").agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("__id"), sim.as("__sim"))
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
    val mask = (1L << bitsPer) - 1
    val chunkCols = (0 until chunks).map { ci =>
      struct(lit(ci).as("i"),
        shiftrightunsigned(col("__sim"), ci * bitsPer).bitwiseAND(lit(mask)).as("v"))
    }
    // persisted for the self-join below (see minhashBandPairs)
    val hashed = simHashSigs(df, textCol, idCol)
      .select(col("__id"), col("__sim"), explode(array(chunkCols: _*)).as("__c"))
      .select(col("__id"), col("__sim"),
        col("__c.i").as("__ci"), col("__c.v").as("__cv"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val capped = capBuckets(hashed, Seq("__ci", "__cv"), DefaultMaxBucket)
    val l = capped.select(col("__ci"), col("__cv"), col("__id").as("id_a"), col("__sim").as("__sim_a"))
    val r = capped.select(col("__ci"), col("__cv"), col("__id").as("id_b"), col("__sim").as("__sim_b"))
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
    val candidates = minhashBandPairs(
      explodedCharShingles(df, textCol, idCol, n), numHashes, bands, seed)
    verifyJaccard(df, idCol, candidates, threshold,
      explodedCharShingles(_, textCol, idCol, n))
  }

  /** Probe hook (dev): candidate pairs for the ngram pipeline. */
  private[graft] def ngramJaccardPairsCandidatesProbe(
      df: DataFrame, textCol: String, idCol: String): DataFrame =
    minhashBandPairs(explodedCharShingles(df, textCol, idCol, 5), 64, 16, 7L)

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
      seed: Long = 42L): DataFrame =
    Similarity.cosinePairs(df, vecCol, idCol, threshold, tables, planesPerTable, seed)
}
