package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bloom-filter semi-join reduction: build a compact filter over the
  * SMALL side's join keys, broadcast it (as a plan literal), and drop
  * big-side rows whose key cannot possibly match BEFORE they reach any
  * shuffle. Bloom filters have false positives but never false
  * negatives, so a prune followed by the original exact equi-join is
  * RESULT-IDENTICAL to the unpruned plan — the filter only moves work,
  * never semantics.
  *
  * Why this exists next to Catalyst's automatic InjectRuntimeFilter:
  * the optimizer only injects a runtime filter into a single join it
  * can see whole, under size/selectivity heuristics. Pipeline operators
  * here (decontamination, containment, incremental dedup) build the
  * small side in one job and probe it across SEVERAL downstream stages
  * — e.g. `Contamination.passageOverlap` shuffles every exploded train
  * fingerprint through a document-frequency aggregate before the join,
  * which the automatic filter can never protect. Pruning at the scan
  * stage shrinks that aggregate's input to ~the true-overlap set: at a
  * 100 TB train corpus vs a MB-scale benchmark, the fingerprint shuffle
  * drops from corpus-sized to bench-overlap-sized, which is the
  * difference between the decontamination pass being a full extra
  * shuffle of the corpus and being ~free on top of the scan.
  *
  * Implementation is Spark's OWN runtime-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, registered as
  * `graft_bloom_agg` / `graft_might_contain`) — same serialized format,
  * hashing, and codegen'd probe as an optimizer-injected filter. The
  * build collects ONE row (the serialized filter, sized by
  * `estItems` — ~1.2 MB at a million keys) to the driver and embeds it
  * as a literal; that is a bounded metadata collect, the same shape as
  * `DataFrameStatFunctions.bloomFilter`, and the literal ships to
  * executors once with the task closure exactly like a broadcast.
  */
object BloomPrune {

  /** Serialized bloom filter over `key` (must be LongType — hash wider
    * types to a long first, e.g. `xxhash64`). Returns None when `df`
    * has no rows (callers then skip pruning: an empty small side means
    * the join output is empty anyway, but semantics stay caller-owned).
    */
  def build(df: DataFrame, key: Column, estItems: Long): Option[Array[Byte]] = {
    GraftFunctions.register(df.sparkSession)
    val row = df.agg(
      call_function(GraftFunctions.BloomAggName, key, lit(estItems))).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Probe column: true when `key` MIGHT be in the filter (exact
    * matches always are; a tunable-small fraction of non-matches leak
    * through and die in the exact join downstream). Requires
    * `GraftFunctions.register` on the session ([[build]]/[[prune]] do
    * it themselves). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function(GraftFunctions.MightContainName, lit(bloom), key)

  /** `df` minus the rows whose `key` is provably absent from the
    * filter. Pure scan-stage filter — no shuffle, codegen'd probe. */
  def prune(df: DataFrame, key: Column, bloom: Array[Byte]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.filter(mightContain(bloom, key))
  }
}
