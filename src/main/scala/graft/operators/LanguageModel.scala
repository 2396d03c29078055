package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.withNormToks
import graft.operators.Checkpoints.CapOps

/** N-gram language-model document scoring — the perplexity-style quality
  * filter of CCNet (Wenzek et al. 2020) and the Gopher/MassiveText
  * pipeline (Rae et al. 2021): train a cheap LM on a reference corpus,
  * score every candidate document, drop (or bucket) the tail. Unlike a
  * neural LM this is exact count arithmetic, so it runs AS SQL on the
  * cluster that already holds the corpus, and an independent engine can
  * reproduce every score bit-for-bit — which is what makes it oracleable.
  *
  * The model is **Stupid Backoff** (Brants et al. 2007, "Large Language
  * Models in Machine Translation"): no discounting, no normalization —
  * `S(w | a b) = c(a,b,w)/c(a,b)` when the trigram was seen, else
  * `α·S(w | b)`, else `α²·c(w)/N`, with an `α²/N` floor for
  * out-of-vocabulary words (α = 0.4). Brants' point was exactly ours:
  * at web scale the cheap score tracks Kneser-Ney quality while staying
  * a pure count lookup — embarrassingly distributable.
  *
  * Positions are scored with the longest context that EXISTS in the doc:
  * position 0 uses the unigram model directly, position 1 starts from the
  * bigram level (one α per backoff actually taken). No BOS/EOS padding —
  * boundary handling is part of the contract and mirrored by the oracle.
  *
  * Scale shape (100 TB posture):
  *   - Model build is ONE aggregate over the training corpus: contexts
  *     `(w_{i-2}, w_{i-1}, w_i)` (nulls where the doc starts) are counted
  *     once, then the bigram/unigram tables ROLL UP from that frame —
  *     the token stream is never re-scanned per level. The rolled-up
  *     count frames are vocabulary-sized, localCheckpointed so the five
  *     scoring joins don't multiply the build subtree into the plan.
  *   - Scoring is five LEFT equi-joins of the exploded candidate contexts
  *     against count tables (AQE broadcasts small models), one CASE per
  *     token, one keyed aggregate per doc. No windows, no driver data.
  *   - The per-doc sum of log-scores is an ORDERED left fold over
  *     `sort_array(collect_list(struct(pos, ls)))` — float addition is
  *     not associative, and a shuffle-order `sum()` would hash-mismatch a
  *     SQL oracle; the fold pins the exact addition sequence both engines
  *     execute. The array is bounded by doc length (same shape as
  *     winnowing's per-doc arrays).
  *
  * Reference scope note: the reference (`/root/reference`, pyzzle) has no
  * text operators — this extends the engine per the north star.
  */
object LanguageModel {

  /** Backoff multiplier (Brants et al. 2007 §4). */
  val Alpha = 0.4

  /** ln(α) as a Double literal embedded in BOTH the Spark expression and
    * the oracle SQL (via [[lnAlphaSql]]) so neither engine's `ln`
    * implementation is involved for the constant. */
  val LnAlpha: Double = math.log(Alpha)

  /** The same constant as a SQL literal (Double.toString round-trips). */
  def lnAlphaSql: String = LnAlpha.toString

  /** Token-context rows for `df`: one row per token position with
    * `(pos, w, b = w_{pos-1}, a = w_{pos-2})`, nulls where the context
    * would cross the document start. Empty documents surface as a single
    * all-null row (explode_outer) so they stay countable downstream. */
  private def contexts(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // sequence(1, 0) is DESCENDING in Spark — guard the empty-token case.
    val ctxArr = when(size(col("__toks")) === 0,
        expr("CAST(array() AS ARRAY<STRUCT<pos: INT, w: STRING, b: STRING, a: STRING>>)"))
      .otherwise(expr(
        """transform(sequence(1, size(__toks)), i -> named_struct(
          |  'pos', i - 1,
          |  'w', element_at(__toks, i),
          |  'b', CASE WHEN i >= 2 THEN element_at(__toks, i - 1) END,
          |  'a', CASE WHEN i >= 3 THEN element_at(__toks, i - 2) END))""".stripMargin))
    withNormToks(df, textCol)
      .select(col(idCol), explode_outer(ctxArr).as("__c"))
      .select(col(idCol),
        col("__c.pos").as("pos"), col("__c.w").as("w"),
        col("__c.b").as("b"), col("__c.a").as("a"))
  }

  /** Count tables of a Stupid-Backoff model trained on `train`:
    * `(uni(w, c), bi(b, w, c), tri(a, b, w, c), n)` where `n` is the total
    * token count. Counts below `minCount` are pruned at every level
    * (prune-consistent: a surviving trigram's denominator bigram always
    * survives too, since c(a,b) ≥ c(a,b,w)). */
  def train(
      trainDf: DataFrame,
      textCol: String,
      idCol: String,
      minCount: Int = 1): (DataFrame, DataFrame, DataFrame, Long) = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    // One aggregate over the token stream; bigram/unigram tables roll up
    // from the (a, b, w) counts instead of re-scanning the corpus.
    val ctx = contexts(trainDf, textCol, idCol)
      .where(col("w").isNotNull)
      .groupBy("a", "b", "w").agg(count(lit(1)).as("c"))
      .capLineage()
    val tri = ctx.where(col("a").isNotNull && col("c") >= minCount)
      .select("a", "b", "w", "c")
    val bi = ctx.where(col("b").isNotNull)
      .groupBy("b", "w").agg(sum("c").as("c"))
      .where(col("c") >= minCount)
    val uni = ctx.groupBy("w").agg(sum("c").as("c"))
      .where(col("c") >= minCount)
    val n = ctx.agg(coalesce(sum("c"), lit(0L))).first().getLong(0)
    require(n > 0, "training corpus has no tokens")
    (uni.capLineage(), bi.capLineage(), tri.capLineage(), n)
  }

  /** Score `docs` under a model trained on `trainDf`. Output per doc:
    *   - `n_tokens`    — scored token count (0 for empty docs)
    *   - `n_oov`       — tokens absent from the training vocabulary
    *   - `logprob`     — Σ ln S(w_i | context), 6 dp (0.0 for empty docs)
    *   - `avg_logprob` — logprob / n_tokens, 6 dp (NULL for empty docs);
    *     the quality signal — higher = more reference-corpus-like. */
  def stupidBackoffScores(
      trainDf: DataFrame,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minCount: Int = 1): DataFrame = {
    val (uni, bi, tri, n) = train(trainDf, textCol, idCol, minCount)
    val sc = contexts(docs, textCol, idCol)
    val scored = sc
      .join(tri.select(col("a").as("t3a"), col("b").as("t3b"),
        col("w").as("t3w"), col("c").as("c3")),
        sc("a") === col("t3a") && sc("b") === col("t3b") && sc("w") === col("t3w"),
        "left")
      .join(bi.select(col("b").as("d3b"), col("w").as("d3w"), col("c").as("c3d")),
        sc("a") === col("d3b") && sc("b") === col("d3w"), "left")
      .join(bi.select(col("b").as("b2b"), col("w").as("b2w"), col("c").as("c2")),
        sc("b") === col("b2b") && sc("w") === col("b2w"), "left")
      .join(uni.select(col("w").as("u2w"), col("c").as("c2d")),
        sc("b") === col("u2w"), "left")
      .join(uni.select(col("w").as("u1w"), col("c").as("c1")),
        sc("w") === col("u1w"), "left")
    val nD = lit(n.toDouble)
    val la = lit(LnAlpha)
    def lnRatio(num: Column, den: Column): Column =
      log(num.cast("double") / den.cast("double"))
    val ls = when(col("w").isNull, lit(null).cast("double"))
      .when(col("pos") >= 2 && col("c3").isNotNull, lnRatio(col("c3"), col("c3d")))
      .when(col("pos") >= 2 && col("c2").isNotNull, la + lnRatio(col("c2"), col("c2d")))
      .when(col("pos") >= 2 && col("c1").isNotNull, la + la + log(col("c1").cast("double") / nD))
      .when(col("pos") >= 2, la + la + log(lit(1.0) / nD))
      .when(col("pos") === 1 && col("c2").isNotNull, lnRatio(col("c2"), col("c2d")))
      .when(col("pos") === 1 && col("c1").isNotNull, la + log(col("c1").cast("double") / nD))
      .when(col("pos") === 1, la + log(lit(1.0) / nD))
      .when(col("c1").isNotNull, log(col("c1").cast("double") / nD))
      .otherwise(log(lit(1.0) / nD))
    val perDoc = scored
      .withColumn("__ls", ls)
      .groupBy(idCol)
      .agg(
        count(col("w")).as("n_tokens"),
        sum(when(col("w").isNotNull && col("c1").isNull, 1L).otherwise(0L)).as("n_oov"),
        aggregate(
          sort_array(collect_list(
            when(col("w").isNotNull, struct(col("pos"), col("__ls").as("ls"))))),
          lit(0.0d),
          (acc, x) => acc + x.getField("ls")).as("__lp"))
    perDoc.select(
      col(idCol), col("n_tokens"), col("n_oov"),
      round(col("__lp"), 6).as("logprob"),
      when(col("n_tokens") > 0, round(col("__lp") / col("n_tokens"), 6))
        .as("avg_logprob"))
  }
}
