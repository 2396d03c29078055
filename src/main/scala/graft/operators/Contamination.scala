package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.operators.Checkpoints.CapOps

/** Benchmark-contamination detection: find training documents that share
  * word n-grams with an evaluation/benchmark set (the GPT-3-style n-gram
  * overlap check run before training).
  *
  * Shape, built for a 100 TB train side vs a small-ish bench side:
  *   1. each side explodes to DISTINCT (doc, gram) rows — grams are md5'd
  *      so the join key is a fixed 32-byte string, never the text;
  *   2. boilerplate guard: grams appearing in more than `maxTrainDf`
  *      train docs are dropped before the join (license headers and
  *      navigation chrome otherwise create hot keys whose pair blowup is
  *      quadratic — same mitigation as the LSH bucket cap, and standard
  *      practice: ubiquitous n-grams signal boilerplate, not leakage);
  *   3. equi-join on the gram hash, count distinct shared grams per
  *      (bench doc, train doc) pair.
  * Every stage is a keyed shuffle; nothing collects to the driver. The
  * pair table is bounded by true overlap, not corpus size.
  *
  * Docs shorter than `n` tokens contribute their whole text as a single
  * gram (mirroring `TextFunctions.wordShingles`), so short bench items
  * still participate.
  */
object Contamination {

  /** Distinct word-n-gram md5s per doc: `(__id, __g)`. */
  private def docGrams(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")) - (n - 1), lit(1)))).as("__i"))
      .select(col("__id"),
        md5(concat_ws(" ", slice(col("__t"), col("__i"), lit(n)))).as("__g"))
      .distinct()

  /** Contaminated pairs: `(bench_id, train_id, shared_ngrams)` for every
    * bench/train doc pair sharing at least one n-gram that survives the
    * document-frequency guard. */
  def ngramOverlap(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      maxTrainDf: Int = 1000): DataFrame = {
    val tg = docGrams(train, textCol, idCol, n).withColumnRenamed("__id", "train_id")
    val bg = docGrams(bench, textCol, idCol, n).withColumnRenamed("__id", "bench_id")
    val rare = tg.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTrainDf).drop("__df")
    bg.join(tg.join(rare, "__g"), "__g")
      .groupBy("bench_id", "train_id")
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** PASSAGE-level contamination via winnowing fingerprint overlap:
    * where [[ngramOverlap]] needs whole word n-grams to coincide, this
    * catches a copied SPAN — winnowing guarantees any shared substring of
    * ≥ w + k - 1 chars contributes at least one shared fingerprint
    * (Schleimer et al. SIGMOD'03, the MOSS guarantee), so a bench answer
    * pasted mid-paragraph into a train doc surfaces even when everything
    * around it differs. Same scale shape as the n-gram path: both sides
    * reduce to (doc, fingerprint) rows — 8-byte longs, never text — with
    * a train-side document-frequency guard killing boilerplate hot keys
    * before the equi-join; pair volume is bounded by true overlap.
    *
    * Output: (bench_id, train_id, shared_fps, bench_fps, overlap_frac)
    * for pairs sharing ≥ `minShared` fingerprints; `overlap_frac` =
    * shared/bench fingerprint-set fraction (containment of the bench doc
    * in the train doc, the decontamination triage number). */
  def passageOverlap(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 16,
      minShared: Int = 2,
      maxTrainDf: Int = 1000): DataFrame =
    passageOverlapImpl(train, bench, textCol, idCol, k, w, minShared,
      maxTrainDf, bloomPrune = false)

  /** [[passageOverlap]] with a bloom-filter prune of the TRAIN
    * fingerprint stream against the bench fingerprint set, applied at
    * the scan stage — RESULT-IDENTICAL by construction (bloom filters
    * have no false negatives; survivors still face the exact equi-join;
    * the document-frequency guard is unaffected because pruning keeps
    * or drops ALL rows of a given fingerprint, so surviving
    * fingerprints keep their exact train-DF counts). What changes is
    * the work: without the prune, EVERY exploded train fingerprint —
    * corpus-sized, ~dozens per document — shuffles through the DF-guard
    * aggregate and the join build; with it, only fingerprints that
    * might overlap the (small) bench set do. At 100 TB train vs a
    * MB-scale benchmark that converts the decontamination pass's
    * dominant shuffle into a scan-stage filter. The filter itself is
    * one bounded driver row, sized by the bench fingerprint count
    * (see [[BloomPrune]]). */
  def passageOverlapBloom(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 16,
      minShared: Int = 2,
      maxTrainDf: Int = 1000): DataFrame =
    passageOverlapImpl(train, bench, textCol, idCol, k, w, minShared,
      maxTrainDf, bloomPrune = true)

  private def passageOverlapImpl(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      w: Int,
      minShared: Int,
      maxTrainDf: Int,
      bloomPrune: Boolean): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    // Eager localCheckpoint on BOTH winnow branches before explode/join:
    // in this plan shape Catalyst inlines the `split(__norm, "")` char
    // array into the k-term rolling-hash lambda, the tree blows past
    // codegen limits, and Spark falls back to INTERPRETED eval that
    // re-executes split per term per position — O(k·n²) per document
    // (measured r7: 18+ min at sf0.01, 14 MiB task binaries). The
    // checkpoint materializes the narrow (id, fingerprints ARRAY<LONG>)
    // rows — tiny relative to the text — and replaces the subtree with an
    // RDD-scan leaf, same lineage cut as Dedup.minHashLshIncremental.
    val tfRaw = TextAnalysis.winnowFingerprints(train, textCol, idCol, k, w)
      .capLineage()
      .select(col(idCol).as("train_id"), explode(col("fingerprints")).as("__fp"))
    val bf = TextAnalysis.winnowFingerprints(bench, textCol, idCol, k, w)
      .capLineage()
      .select(col(idCol).as("bench_id"), col("fingerprints"))
    val bsizes = bf.select(col("bench_id"),
      size(col("fingerprints")).cast("long").as("bench_fps"))
    val bx = bf.select(col("bench_id"), explode(col("fingerprints")).as("__fp"))
    val tf =
      if (!bloomPrune) tfRaw
      else {
        // Size the filter from the bench side (the side it summarizes);
        // its fingerprints are already materialized by the checkpoint,
        // so the count and the build are cheap single-pass jobs over the
        // SMALL side only.
        val est = math.max(bx.count(), 1L)
        BloomPrune.build(bx, col("__fp"), est) match {
          case Some(bloom) => BloomPrune.prune(tfRaw, col("__fp"), bloom)
          case None        => tfRaw // empty bench: join output empty either way
        }
      }
    val rare = tf.groupBy("__fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTrainDf).drop("__df")
    bx.join(tf.join(rare, "__fp"), "__fp")
      .groupBy("bench_id", "train_id")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .join(bsizes, "bench_id")
      .withColumn("overlap_frac",
        round(col("shared_fps") / col("bench_fps"), 6))
  }

  /** The decontamination ACTION on top of [[passageOverlap]]'s report:
    * strike every train document that shares >= `minShared` winnowing
    * fingerprints with any bench document, returning the cleaned train
    * frame with all its original columns. Scale shape: the flagged-id
    * set is bounded by true overlap (typically orders of magnitude
    * smaller than the corpus) and the strike itself is one left-anti
    * keyed shuffle — at 100 TB the cost is the winnow pass, which is
    * scan-stage arithmetic. */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 16,
      minShared: Int = 2,
      maxTrainDf: Int = 1000): DataFrame = {
    val flagged =
      passageOverlap(train, bench, textCol, idCol, k, w, minShared, maxTrainDf)
        .select(col("train_id").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] over the bloom-pruned overlap
    * ([[passageOverlapBloom]]) — identical cleaned frame, the corpus
    * fingerprint shuffle replaced by a scan-stage probe. */
  def decontaminateBloom(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 16,
      minShared: Int = 2,
      maxTrainDf: Int = 1000): DataFrame = {
    val flagged =
      passageOverlapBloom(train, bench, textCol, idCol, k, w, minShared, maxTrainDf)
        .select(col("train_id").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** The strike action over a PRE-COMPUTED overlap report — the
    * artifact-reuse variant of [[decontaminate]]: `report` is (any frame
    * with) a `train_id` column, typically a persisted [[passageOverlap]]
    * or [[ngramOverlap]] output (see [[Reports.cached]]). The analysis
    * scan is NOT re-run; the strike is one left-anti keyed shuffle
    * against the bounded flagged-id set, so re-applying (or re-applying
    * at a different `minShared` read off the report) costs only the
    * action. `minSharedCol`, when set, re-filters the report on that
    * column ≥ `minShared` before striking. */
  def decontaminateWithReport(
      train: DataFrame,
      report: DataFrame,
      idCol: String,
      minShared: Int = 1,
      minSharedCol: Option[String] = Some("shared_fps")): DataFrame = {
    val filtered = minSharedCol match {
      case Some(c) if report.columns.contains(c) =>
        report.filter(col(c) >= minShared)
      case _ => report
    }
    val flagged = filtered.select(col("train_id").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Per-bench-doc contamination summary: how many train docs it collides
    * with and the max shared-gram count — the triage view an eval owner
    * reads before deciding what to strike. */
  def contaminationReport(
      train: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      maxTrainDf: Int = 1000): DataFrame =
    ngramOverlap(train, bench, textCol, idCol, n, maxTrainDf)
      .groupBy("bench_id")
      .agg(count(lit(1)).as("n_train_docs"),
        max(col("shared_ngrams")).as("max_shared_ngrams"),
        sum(col("shared_ngrams")).as("total_shared_ngrams"))
}
