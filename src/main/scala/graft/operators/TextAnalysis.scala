package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Checkpoints.CapOps

/** Per-document text profiling: one narrow projection chain producing the
  * standard pre-training corpus statistics. Single scan, no shuffle, fully
  * codegen-able string expressions — at 100 TB this is I/O-bound, which is
  * the best case. Column pruning pushes down to (idCol, textCol) only.
  *
  * Layered tokenize-once design (each layer is a Project; Catalyst keeps
  * them separate because CollapseProject refuses to duplicate non-cheap
  * aliases used more than once, so everything fuses into ONE codegen stage
  * with each expression evaluated once per row):
  *   1. `__norm` (normalize), `__toks` (split) — the expensive string ops;
  *   2. metric columns — each regex count appears exactly once;
  *   3. derived outputs (lang decision tree, quality arithmetic).
  * The naive per-metric formulation re-ran `regexp_replace`+`split` ~10×
  * per row (measured 11.3 s vs ~1 s at sf0.1 for quality_by_lang), and
  * composing metrics as nested expressions repeated each regex subtree in
  * the tree, costing ~4 s of one-time analysis/codegen per query. */
object TextAnalysis {

  /** Projection adding `__norm` (normalized text) and `__toks` (whitespace
    * tokens) — the shared input of every metric below. */
  def withNormToks(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__norm", normalizeText(col(textCol)))
      .withColumn("__toks", tokensFromNorm(col("__norm")))

  // ---------------------------------------------------------- PII redaction

  /** Email-address pattern. Deliberately restricted to syntax that means
    * the same thing in Java regex (Spark) and RE2 (DuckDB, used by the
    * oracle): character classes, +, bounded repetition — no backrefs, no
    * lookaround. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — matches 999.0.0.1 too; redaction wants
    * recall over pedantry). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails and IPv4 addresses from `textCol`: adds
    * `<textCol>_redacted` plus per-row match counts (`n_emails`,
    * `n_ips`) so a pipeline can both clean and AUDIT — the counts are
    * what you monitor at 100 TB, the redacted text is what you keep.
    * Two regex passes per row in one codegen-able projection; no
    * shuffle. Patterns are Java/RE2-portable so a SQL engine can verify
    * the exact redacted output (the driver oracle does). */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val emailed = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    df.withColumn("n_emails",
        coalesce(size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))), lit(0)))
      .withColumn("n_ips",
        coalesce(size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0))), lit(0)))
      .withColumn(s"${textCol}_redacted",
        regexp_replace(emailed, Ipv4Pattern, "<IP>"))
  }

  /** Projection adding the per-document metric columns (one expensive
    * expression each): `__ntok`, `__zh`, `__hits_{en,de,fr,es}`,
    * `__punct`, `__stop_ratio`, `__mtl`. Input must have __norm/__toks. */
  def withTextMetrics(df: DataFrame, textCol: String): DataFrame = {
    val norm = col("__norm"); val toks = col("__toks")
    df.withColumn("__ntok", size(toks))
      .withColumns(Map(
        "__zh"      -> cjkCount(col(textCol)),
        "__hits_en" -> stopwordHits(norm, StopwordsEn),
        "__hits_de" -> stopwordHits(norm, StopwordsDe),
        "__hits_fr" -> stopwordHits(norm, StopwordsFr),
        "__hits_es" -> stopwordHits(norm, StopwordsEs),
        "__punct"   -> punctRatioFrom(norm),
        "__mtl"     -> meanTokenLengthFrom(norm, toks)))
      .withColumn("__stop_ratio",
        when(col("__ntok") === 0, 0.0d)
          .otherwise(col("__hits_en").cast("double") / col("__ntok")))
  }

  /** Lang + quality from the metric columns (cheap CASE/arithmetic). */
  private[graft] def predLangCol: Column =
    langIdFromHits(col("__zh"), col("__hits_en"), col("__hits_de"),
      col("__hits_fr"), col("__hits_es"))

  private[graft] def qualityCol: Column =
    qualityScoreFromParts(col("__ntok"), col("__punct"),
      col("__stop_ratio"), col("__mtl"))

  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    withTextMetrics(withNormToks(df, textCol), textCol).select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      col("__ntok").as("n_tokens"),
      subwordCountFrom(col("__norm")).as("n_subwords"),
      predLangCol.as("pred_lang"),
      round(col("__punct"), 6).as("punct_ratio"),
      round(col("__stop_ratio"), 6).as("stopword_ratio"),
      round(col("__mtl"), 6).as("mean_token_len"),
      qualityCol.as("quality"),
      md5(col("__norm")).as("fingerprint"))

  /** Corpus-level language distribution from the lang-ID heuristic. */
  def langDistribution(df: DataFrame, textCol: String): DataFrame =
    withTextMetrics(withNormToks(df, textCol), textCol)
      .select(predLangCol.as("pred_lang"))
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"))

  /** Normalized non-empty lines of the raw text: split on newline, then
    * lowercase / collapse whitespace / trim each line (same normalization
    * as `normalizeText`, applied per line). */
  private def normLines(textCol: Column): Column =
    filter(
      transform(split(textCol, "\n"),
        l => trim(regexp_replace(lower(l), "\\s+", " "))),
      l => l =!= "")

  /** C4-style line-rule quality filter (Raffel et al. 2020, §2.2 — the
    * "Colossal Clean Crawled Corpus" cleaning heuristics), as per-line
    * array expressions that ride the scan stage (no shuffle — the same
    * embarrassingly-parallel shape as [[profile]]):
    *
    * a LINE is kept iff it
    *   - ends in a terminal punctuation mark (`.`, `!`, `?`, `"`) after
    *     whitespace normalization,
    *   - has at least `minWordsPerLine` whitespace words, and
    *   - does not contain the word "javascript" (case-insensitive);
    * a DOCUMENT is kept iff it
    *   - retains at least `minLinesPerDoc` lines,
    *   - does not contain "lorem ipsum" (case-insensitive), and
    *   - does not contain a curly brace `{`.
    *
    * Output per document: `n_lines` (non-empty lines), `n_kept_lines`,
    * `kept_chars` (characters surviving the line filter), and the
    * document-level `keep` verdict. Every rule is a deterministic string
    * expression both engines evaluate identically, so the driver oracle
    * recomputes the whole verdict — not just counts. */
  def lineRules(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minWordsPerLine: Int = 5,
      minLinesPerDoc: Int = 3): DataFrame = {
    require(minWordsPerLine > 0 && minLinesPerDoc > 0,
      s"thresholds must be positive: $minWordsPerLine, $minLinesPerDoc")
    val lines = normLines(col(textCol))
    val keptLines = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, " ")) >= minWordsPerLine &&
        !l.contains("javascript"))
    df.select(
        col(idCol),
        size(lines).as("n_lines"),
        size(keptLines).as("n_kept_lines"),
        aggregate(keptLines, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .as("kept_chars"),
        lower(col(textCol)).as("__lc"))
      .withColumn("keep",
        col("n_kept_lines") >= minLinesPerDoc &&
          !col("__lc").contains("lorem ipsum") &&
          !col("__lc").contains("{"))
      .drop("__lc")
  }

  /** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
    * Models", table A1): per document,
    *
    *   - `dup_line_frac`: fraction of line OCCURRENCES that are repeats
    *     of an earlier line (`1 - distinct/total`);
    *   - `dup_line_char_frac`: same, weighted by line characters;
    *   - `top_bigram_char_frac`: characters covered by the most frequent
    *     word 2-gram, over normalized-text characters (tie-break: higher
    *     count, then longer bigram, then lexicographic).
    *
    * The line metrics are pure per-row array expressions — they ride the
    * scan stage, no shuffle. The bigram metric aggregates exploded
    * bigrams keyed on (doc, bigram): map-side combine collapses repeats
    * before the shuffle, so the exchange carries ~distinct bigrams per
    * doc, and a doc's winner is a row_number over its own key group —
    * both linear, both partition-parallel at 100 TB. */
  def repetitionProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = normLines(col(textCol))
    val dist = array_distinct(lines)
    val charsOf = (a: Column) =>
      aggregate(a, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val lineStats = df.select(
        col(idCol), lines.as("__lines"), dist.as("__dist"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__dist")).cast("long").as("__n_distinct"),
        charsOf(col("__lines")).as("__chars_total"),
        charsOf(col("__dist")).as("__chars_distinct"))
      .select(col(idCol), col("n_lines"),
        round(when(col("n_lines") === 0L, 0.0d)
          .otherwise(lit(1.0d) - col("__n_distinct") / col("n_lines")), 6)
          .as("dup_line_frac"),
        round(when(col("__chars_total") === 0L, 0.0d)
          .otherwise(lit(1.0d) - col("__chars_distinct") / col("__chars_total")), 6)
          .as("dup_line_char_frac"))

    val base = withNormToks(df, textCol)
      .select(col(idCol), length(col("__norm")).cast("long").as("__normlen"),
        col("__toks"))
      .filter(size(col("__toks")) >= 2)
    val counted = base
      .select(col(idCol), col("__normlen"), explode(
        transform(sequence(lit(0), size(col("__toks")) - 2),
          i => concat(element_at(col("__toks"), i + 1), lit(" "),
            element_at(col("__toks"), i + 2)))).as("__bigram"))
      .groupBy(col(idCol), col("__normlen"), col("__bigram"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("__c").desc, length(col("__bigram")).desc, col("__bigram").asc)
    val topBigram = counted
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol),
        round(col("__c") * length(col("__bigram")).cast("long") / col("__normlen"), 6)
          .as("__tb"))

    lineStats.join(topBigram, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("dup_line_char_frac"),
        coalesce(col("__tb"), lit(0.0d)).as("top_bigram_char_frac"))
  }

  /** MOSS-style winnowing document fingerprints (Schleimer, Wilkerson &
    * Aiken, SIGMOD'03 "Winnowing: Local Algorithms for Document
    * Fingerprinting"): polynomial rolling hashes of character k-grams
    * over the normalized text, then the DISTINCT set of per-window
    * minima (window = w consecutive gram hashes). Winnowing's guarantee:
    * any substring match of length >= w + k - 1 between two documents
    * contributes at least one shared fingerprint, with ~2/(w+1) of all
    * gram hashes selected.
    *
    * Implementation: the native [[graft.functions.WinnowFps]] expression
    * — one tight JVM loop per row (k-term polynomial gram hash, O(n)
    * monotonic-deque window minimum, sorted-distinct selection) inside
    * the scan stage: NO shuffle, no UDF, deterministic across engines
    * (each gram hash is a pure sum of codepoint · B^j mod M terms, the
    * arithmetic the DuckDB oracles replicate). A doc shorter than k
    * grams fingerprints as the empty set; shorter than one full window,
    * as the single global minimum.
    *
    * Returns one row per doc: (idCol, n_grams, fingerprints ARRAY<LONG>
    * sorted ascending). */
  def winnowFingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 16): DataFrame = {
    require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
      call_function(graft.functions.GraftFunctions.WinnowFpsName,
        normalizeText(col(textCol)), lit(k), lit(w)).as("__wf"))
      .select(col(idCol),
        col("__wf.n_grams").as("n_grams"),
        col("__wf.fingerprints").as("fingerprints"))
  }

  /** The SQL-array formulation the native expression replaced — kept as
    * the VERIFICATION TWIN (bit-equality pinned by TextAnalysisSpec),
    * exactly as [[graft.operators.Dedup.charSigsAggregateProbe]] twins
    * the native minhash signature. Allocates the char array, the k-term
    * rolling-hash lambda, and log₂(w) sparse-table arrays per row —
    * measured the dominant cost of every fingerprint consumer before
    * the native node. */
  private[graft] def winnowFingerprintsSqlProbe(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 16): DataFrame = {
    require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
    val M = 1000000007L
    val B = 257L
    val pows: Seq[Long] = {
      // pows(j) = B^(k-1-j) mod M — highest power first
      val p = Array.fill(k)(1L)
      for (j <- k - 2 to 0 by -1) p(j) = p(j + 1) * B % M
      p.toSeq
    }
    val terms = pows.zipWithIndex.map { case (p, j) =>
      s"ascii(element_at(__chars, CAST(i + $j AS INT))) * ${p}L"
    }.mkString(" + ")
    val hashesExpr =
      s"transform(sequence(1, __n - ${k - 1}), i -> ($terms) % ${M}L)"

    var out = df.select(col(idCol), normalizeText(col(textCol)).as("__norm"))
      .withColumn("__chars", split(col("__norm"), ""))
      .withColumn("__n", length(col("__norm")))
      .withColumn("__hashes",
        when(col("__n") < k, expr("CAST(array() AS ARRAY<BIGINT>)"))
          .otherwise(expr(hashesExpr)))

    // Sliding-window minima via a sparse table (doubling mins): level j
    // holds min over spans of 2^j, built from level j-1 with two O(1)
    // element_at lookups per position — O(n·log w) total, each level its
    // own projection so it is computed once per row. The naive
    // `array_min(slice(__hashes, t, w))` is O(n·w) AND allocates a
    // w-element array copy per position — measured dominant in the
    // winnow profile at sf0.1. Window min of width w = min of the two
    // (possibly overlapping) 2^⌊log2 w⌋ spans covering it.
    val logW = 31 - Integer.numberOfLeadingZeros(w) // floor(log2 w)
    var cur = "__hashes"
    (0 until logW).foreach { j =>
      val span = 1 << j
      val nm = s"__m${j + 1}"
      out = out.withColumn(nm, expr(
        s"if(size($cur) > $span, " +
          s"transform(sequence(1, size($cur) - $span), i -> " +
          s"least(element_at($cur, CAST(i AS INT)), " +
          s"element_at($cur, CAST(i + $span AS INT)))), " +
          "CAST(array() AS ARRAY<BIGINT>))"))
      cur = nm
    }
    val rest = w - (1 << logW)
    val winsExpr =
      if (rest == 0) cur
      else s"transform(sequence(1, size(__hashes) - ${w - 1}), t -> " +
        s"least(element_at($cur, CAST(t AS INT)), " +
        s"element_at($cur, CAST(t + $rest AS INT))))"

    out
      .withColumn("__fps",
        when(size(col("__hashes")) === 0, expr("CAST(array() AS ARRAY<BIGINT>)"))
          .when(size(col("__hashes")) < w, array(array_min(col("__hashes"))))
          .otherwise(array_distinct(expr(winsExpr))))
      .select(col(idCol),
        size(col("__hashes")).cast("long").as("n_grams"),
        array_sort(col("__fps")).as("fingerprints"))
  }

  /** Documents passing a minimum quality bar — the cheap corpus filter
    * applied before expensive dedup/embedding stages. */
  def qualityFilter(df: DataFrame, textCol: String, minQuality: Double): DataFrame = {
    val metricCols = Seq("__norm", "__toks", "__ntok", "__zh", "__hits_en",
      "__hits_de", "__hits_fr", "__hits_es", "__punct", "__mtl", "__stop_ratio")
    withTextMetrics(withNormToks(df, textCol), textCol)
      .filter(qualityCol >= minQuality)
      .drop(metricCols: _*)
  }

  /** Corpus-wide top-`k` word `n`-grams with occurrence AND document
    * frequency — the boilerplate-mining view that justifies every DF
    * guard in the engine (Contamination's `maxTrainDf`, the LSH bucket
    * caps): grams appearing in many documents ARE the license headers
    * and navigation chrome a curation run wants to identify. Strict
    * n-grams: docs shorter than `n` tokens contribute nothing.
    *
    * Scale shape: per-(doc, gram) pre-aggregate (map-side combine
    * collapses within-doc repeats before the shuffle), one keyed
    * shuffle on the gram, then a TakeOrdered top-k — no global sort
    * materialization. Deterministic total order: occurrences desc,
    * gram asc. */
  def topNgrams(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1, k >= 1: $n, $k")
    val grams =
      when(size(col("__toks")) >= n,
        expr(s"transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(__toks, i, $n)))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    withNormToks(df, textCol)
      .select(col(idCol), explode(grams).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy("__g")
      .agg(sum("__c").as("n_occurrences"), count(lit(1)).as("n_docs"))
      .select(col("__g").as("ngram"), col("n_occurrences"), col("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Vocabulary coverage: build the top-`vocabSize` token vocabulary by
    * corpus frequency (ties broken by token, ascending — deterministic
    * and engine-portable), then report per-group token totals,
    * out-of-vocabulary occurrences, and the OOV rate. The tokenizer-prep
    * question every pipeline asks ("how big a vocab until OOV is
    * negligible per language?") as one pass over the corpus:
    * tokenize-once explode, a keyed count for the vocab, and a broadcast
    * anti-lookup for the coverage — the corpus never moves twice. */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val toks = withNormToks(df, textCol)
      .select(col(groupCol), explode(col("__toks")).as("__t"))
    val vocab = toks.groupBy("__t").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__t").asc)
      .limit(vocabSize)
      .select(col("__t"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Top-`k` TF-IDF keywords per document: raw term frequency within the
    * doc × smoothed inverse document frequency `ln((N+1)/(df+1))`, ties
    * broken by term ascending (deterministic and engine-portable — the
    * score is ONE multiply over identically-derived operands, so ranks
    * agree bit-for-bit cross-engine, same discipline as bm25Rank).
    * Complements corpus-level [[vocabCoverage]]/top-token counts with
    * the per-document signal (doc tagging, routing, cluster labeling).
    *
    * Scale shape: ONE corpus scan, literally — tokenize-once
    * `explode_outer` (zero-token docs surface as a null-term row, so
    * the corpus size N is recoverable downstream without a second
    * scan); `tf` is one (doc, term) keyed count, eagerly checkpointed
    * because the N action, the df branch and the score join all read
    * it — lazily the tokenize+aggregate subtree duplicates per branch
    * (measured 4 parquet scans in the executed plan; AQE does not
    * reuse the exchanges). N = distinct docs in the CHECKPOINTED tf
    * (exact: null-term rows keep empty docs counted), an action over
    * doc×term pairs, never the corpus. `df` is then a term-keyed
    * count with map-side partials (never a countDistinct, and never a
    * per-term window — a whole-partition window over a stopword term
    * would put ~every doc in one task); the idf join is keyed on term
    * (vocabulary-sized right side, AQE broadcasts it when small); top-k
    * is one window shuffle keyed by doc with WindowGroupLimit pushing
    * rank<=k map-side. */
  def tfidfKeywords(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = withNormToks(df, textCol)
      .select(col(idCol), explode_outer(col("__toks")).as("term"))
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .capLineage()
    val n = tf.select(countDistinct(col(idCol))).first().getLong(0)
    val real = tf.where(col("term").isNotNull)
    val dfreq = real.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = real.join(dfreq, "term")
      .withColumn("tfidf", col("tf").cast("double") *
        log(lit((n + 1).toDouble) / (col("df").cast("double") + lit(1.0))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank"), col("tfidf"))
  }

  /** Byte-pair-encoding MERGE TRAINING — the core loop of tokenizer
    * training (Sennrich et al. 2016, "Neural Machine Translation of
    * Rare Words with Subword Units"), word-level: the corpus reduces to
    * a `(word, count)` vocabulary, each word starts as its character
    * sequence, and each round merges the adjacent symbol pair with the
    * highest corpus-weighted frequency (ties to the lexicographically
    * smallest pair). Returns one row per round:
    * `(merge_round, pair, merged, n)`.
    *
    * Scale shape — the corpus-sized work (tokenize + word count) is
    * distributed and happens exactly ONCE; the merge loop itself is
    * two-tier:
    *
    *  - DRIVER-LOCAL TAIL (the default whenever the distinct-word
    *    vocabulary fits driver memory, `spark.graft.bpe.localVocabLimit`
    *    rows, default 2M): the `(cnt, symbols)` vocabulary is collected
    *    once and the loop runs in-process with an exact pair→words
    *    inverted index — per-round cost is the AFFECTED WORDS ONLY,
    *    end-to-end, with zero Spark jobs per round. This is Sennrich's
    *    reference trainer verbatim (`learn_bpe.py` is single-node with
    *    exactly this index); a 30k-merge production run is 30k
    *    in-memory sliver updates, not 30k cluster jobs. The corpus can
    *    be 100 TB — the VOCABULARY (distinct word forms after
    *    normalization) is what must fit, and a tokenizer-training vocab
    *    is capped/sampled in practice exactly because every published
    *    trainer is single-node past the counting step.
    *  - DISTRIBUTED INCREMENTAL fallback (vocabulary above the limit):
    *    the `(pair, n)` frame is seeded once and delta-maintained —
    *    each round recounts only words containing the merged pair (old
    *    pairs −cnt, rewritten +cnt), the argmax is a bounded one-row
    *    collect. Per-round aggregate work tracks the affected slice;
    *    the representation rewrite is a narrow vocab-wide map.
    *
    * Both tiers produce BIT-IDENTICAL rounds (ties broken by UTF-8
    * binary order, Spark's own string ordering; BpeSpec pins local ≡
    * distributed ≡ naive recount).
    *
    * The merge is applied with the DOUBLE-SPACE boundary trick so a
    * plain left-to-right literal replace is token-boundary-correct
    * (pattern `' a  b '` can only match whole symbols, and adjacent
    * matches don't share boundary characters) — which also makes each
    * round exactly reproducible in any SQL engine: the DuckDB oracle
    * unrolls the identical rounds (full recount per round — the
    * maintained frame equals the recount by construction, which
    * BpeSpec pins explicitly). */
  def bpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    var repr = withNormToks(df, textCol)
      .select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("r", trim(regexp_replace(col("w"), "(.)", "$1 ")))
      .select("cnt", "r").capLineage()
    val localLimit = spark.conf
      .getOption("spark.graft.bpe.localVocabLimit").map(_.toLong)
      .getOrElse(2000000L)
    val vocabSize = repr.count()
    if (vocabSize <= localLimit) {
      val vocab = repr.select("cnt", "r").as[(Long, String)].collect()
        .map { case (cnt, r) => (cnt, r.split(" ")) }
      return bpeMergesLocal(vocab, rounds).toSeq
        .toDF("merge_round", "pair", "merged", "n")
    }
    // Seeded ONCE; delta-maintained every round thereafter.
    var counts = bpePairCounts(repr).capLineage()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = counts.orderBy(col("n").desc, col("p").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val pair = top(0).getString(0)
        val n = top(0).getLong(1)
        out += ((round, pair, pair.replace(" ", ""), n))
        val (newRepr, delta) = bpeStep(repr, pair)
        counts = counts.unionByName(delta)
          .groupBy("p").agg(sum("n").as("n"))
          .filter(col("n") > 0L).capLineage()
        repr = newRepr.capLineage()
      }
      round += 1
    }
    out.toSeq.toDF("merge_round", "pair", "merged", "n")
  }

  /** The driver-local merge loop (Sennrich's `learn_bpe.py` shape):
    * exact corpus-weighted pair counts plus a pair→word-indices
    * inverted index, so each round touches ONLY the words containing
    * the merged pair. Tie-breaking and merge application replicate the
    * distributed path exactly: argmax = (n desc, pair asc in UTF-8
    * binary order — Spark's UTF8String comparison); the merge rewrites
    * non-overlapping occurrences left to right, the literal-replace
    * semantics of [[bpeStep]]'s double-space trick. */
  private[graft] def bpeMergesLocal(
      vocab: Array[(Long, Array[String])],
      rounds: Int): Array[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map(_._2)
    val cnts: Array[Long] = vocab.map(_._1)
    val pairN = mutable.HashMap.empty[String, Long]
    val index = mutable.HashMap.empty[String, mutable.Set[Int]]
    def pairsOf(syms: Array[String]): Iterator[String] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => syms(i) + " " + syms(i + 1))
    var wi = 0
    while (wi < words.length) {
      val c = cnts(wi)
      pairsOf(words(wi)).foreach { p =>
        pairN.update(p, pairN.getOrElse(p, 0L) + c)
        index.getOrElseUpdate(p, mutable.Set.empty) += wi
      }
      wi += 1
    }
    def utf8Less(x: String, y: String): Boolean = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // argmax over the maintained counts (n desc, pair asc binary)
      var bestP: String = null
      var bestN = 0L
      pairN.foreach { case (p, n) =>
        if (n > 0L &&
          (bestP == null || n > bestN || (n == bestN && utf8Less(p, bestP)))) {
          bestP = p; bestN = n
        }
      }
      if (bestP == null) exhausted = true
      else {
        val merged = bestP.replace(" ", "")
        out += ((round, bestP, merged, bestN))
        val Array(a, b) = bestP.split(" ", 2)
        // rewrite ONLY the words containing the pair; maintain counts
        // and index from each word's old/new pair multisets
        val affected = index.getOrElse(bestP, mutable.Set.empty).toArray
        java.util.Arrays.sort(affected)
        affected.foreach { w =>
          val syms = words(w)
          val c = cnts(w)
          val rewritten = mutable.ArrayBuffer.empty[String]
          var i = 0
          var changed = false
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              rewritten += merged; i += 2; changed = true
            } else { rewritten += syms(i); i += 1 }
          }
          if (changed) {
            val next = rewritten.toArray
            val oldPairs = pairsOf(syms).toSeq
            val newPairs = pairsOf(next).toSeq
            oldPairs.foreach { p =>
              val n2 = pairN(p) - c
              if (n2 == 0L) pairN.remove(p) else pairN.update(p, n2)
            }
            newPairs.foreach { p =>
              pairN.update(p, pairN.getOrElse(p, 0L) + c)
            }
            val oldSet = oldPairs.toSet
            val newSet = newPairs.toSet
            (oldSet -- newSet).foreach { p =>
              index.get(p).foreach { s => s -= w; if (s.isEmpty) index.remove(p) }
            }
            (newSet -- oldSet).foreach { p =>
              index.getOrElseUpdate(p, mutable.Set.empty) += w
            }
            words(w) = next
          }
        }
      }
      round += 1
    }
    out.toArray
  }

  /** BPE ENCODE — apply a TRAINED merge list to tokenize a corpus, the
    * missing half of train→encode→pack: [[bpeMerges]] learns the
    * merges, this materializes per-document token streams and REAL
    * token counts (so packing/chunking can stop leaning on a fixture
    * column). Output: one row per document with ≥1 normalized word —
    * `(idCol, n_bpe_tokens, tok_stream)` where `tok_stream` is the
    * document's final symbols space-joined in word order (each word's
    * symbols are its final BPE representation; md5 it for a compact
    * equality pin).
    *
    * Scale shape — encoding is VOCABULARY-grain, never corpus-grain:
    * the distinct normalized words are encoded ONCE (driver-local under
    * `spark.graft.bpe.localVocabLimit`, the same contract as the
    * trainer; a `mapPartitions` over the distinct-word frame with the
    * broadcast-size merge ranks above it — the per-word merge loop is
    * genuinely imperative, and the vocabulary is the small side), then
    * ONE join hands each word occurrence its token count and final
    * representation (AQE broadcasts the vocabulary when it is small —
    * at web scale the join is vocab-keyed, cost ∝ corpus words). The
    * per-document reassembly is one `collect_list(struct(pos, repr))` +
    * `array_sort` aggregate — order restored deterministically without
    * a window sort.
    *
    * The per-word loop repeatedly merges ALL occurrences of the
    * LOWEST-RANK adjacent pair present — provably identical to applying
    * the merge list in rank order (a merge can only create pairs of
    * HIGHER rank: new pairs contain the new symbol, which training
    * created at that rank), which is the trainer's own representation
    * evolution and the double-space-replace chain the DuckDB oracle
    * unrolls. BpeSpec pins encode ≡ the trainer's final representation
    * on the training corpus. */
  def bpeEncode(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank: Map[String, Int] =
      merges.zipWithIndex.map { case ((a, b), i) => (a + " " + b) -> i }.toMap
    val words = withNormToks(df, textCol)
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__w")))
    val vocab = words.select(col("__w")).distinct()
    val localLimit = spark.conf
      .getOption("spark.graft.bpe.localVocabLimit").map(_.toLong)
      .getOrElse(2000000L)
    val encoded: DataFrame =
      if (vocab.count() <= localLimit) {
        val enc = vocab.as[String].collect().map { w =>
          val r = bpeEncodeWord(w, rank)
          (w, r.mkString(" "), r.length.toLong)
        }
        enc.toSeq.toDF("__w", "__repr", "__ntok")
      } else {
        val rankB = spark.sparkContext.broadcast(rank)
        vocab.as[String].mapPartitions { it =>
          val rk = rankB.value
          it.map { w =>
            val r = bpeEncodeWord(w, rk)
            (w, r.mkString(" "), r.length.toLong)
          }
        }.toDF("__w", "__repr", "__ntok")
      }
    words.join(encoded, "__w")
      .groupBy(col(idCol))
      .agg(
        sum(col("__ntok")).as("n_bpe_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__repr")))),
            x => x.getField("__repr")),
          " ").as("tok_stream"))
  }

  /** One word through the merge ranks: repeatedly merge ALL
    * left-to-right non-overlapping occurrences of the lowest-rank
    * adjacent pair present (see [[bpeEncode]] for the equivalence
    * argument). O(rounds·|word|) worst case, vocabulary-grain. */
  private[graft] def bpeEncodeWord(
      word: String, rank: Map[String, Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse(syms(i) + " " + syms(i + 1), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length &&
              rank.getOrElse(syms(j) + " " + syms(j + 1), Int.MaxValue) == bestRank) {
            out += (syms(j) + syms(j + 1)); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Boundary-correct corpus-weighted pair counts of a `(cnt, r)`
    * symbol-representation frame — the seed count and (negated) delta
    * building block of [[bpeMerges]]. */
  private[graft] def bpePairCounts(repr: DataFrame): DataFrame = repr
    .withColumn("a", split(col("r"), " "))
    // sequence(0, -1) DESCENDS in Spark, so single-symbol words need
    // the explicit empty-array branch.
    .withColumn("p", explode(expr(
      """CASE WHEN size(a) < 2 THEN array()
        |ELSE transform(sequence(0, size(a) - 2),
        |               i -> concat(a[i], ' ', a[i + 1])) END""".stripMargin)))
    .groupBy("p").agg(sum("cnt").as("n"))

  /** One incremental merge round: apply `pair`'s merge to `repr` and
    * return `(rewritten repr, (pair, n) delta)`. The delta is computed
    * from the AFFECTED words only — old symbol pairs weighted `-cnt`,
    * rewritten pairs `+cnt`, one aggregate over the affected slice —
    * so maintained counts + delta ≡ a full recount of the rewritten
    * vocabulary (pinned by BpeSpec), at per-round cost proportional to
    * the words the merge touches. */
  private[graft] def bpeStep(
      repr: DataFrame, pair: String): (DataFrame, DataFrame) = {
    val merged = pair.replace(" ", "")
    val marked = " " + pair.replace(" ", "  ") + " "
    val doubled = concat(lit(" "),
      regexp_replace(col("r"), lit(" "), lit("  ")), lit(" "))
    val hasPair = instr(doubled, marked) > 0
    val rewritten = trim(regexp_replace(
      regexp_replace(doubled,
        lit(java.util.regex.Pattern.quote(marked)),
        lit(java.util.regex.Matcher.quoteReplacement(s" $merged "))),
      lit(" +"), lit(" ")))
    val affected = repr.filter(hasPair)
    val delta = bpePairCounts(
      affected.select((-col("cnt")).as("cnt"), col("r"))
        .unionByName(affected.select(col("cnt"), rewritten.as("r"))))
      .filter(col("n") =!= 0L)
    (repr.withColumn("r", when(hasPair, rewritten).otherwise(col("r"))), delta)
  }
}
