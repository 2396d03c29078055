package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join: the hot/cold split (a.k.a. salting's grown-up
  * sibling) for fact⋈dim joins where a handful of keys dominate the fact
  * side — null-ish sentinel keys, celebrity users, default categories. A
  * plain shuffle join puts each key's entire row set into ONE task; one
  * 10^9-row key then stalls the stage no matter how many executors exist.
  *
  * Plan: detect the hot keys from a seeded sample of the fact side
  * (driver holds only the top-k key VALUES — bounded model metadata, not
  * data), then
  *   - hot rows join a broadcast of the dim rows for those keys
  *     (embarrassingly parallel, no shuffle of the hot mass at all);
  *   - cold rows take the normal shuffle join (skew now bounded by the
  *     hotness threshold);
  *   - union the two — result set identical to the plain join.
  *
  * AQE's skew-join handles sort-merge SKEWED PARTITIONS at runtime; this
  * operator is for the cases AQE cannot fix: a single key too large for
  * any split (AQE splits partitions, not keys, on the build side), or
  * pre-AQE plan shapes (broadcast of the hot dim slice avoids the sort
  * entirely). Detection is deterministic for a fixed seed.
  */
object SkewJoin {

  /** Hot key values on `keyCol`: sampled frequency above
    * `hotFraction` of the sampled rows, top `maxHotKeys` by count.
    * Deterministic for a fixed seed. */
  private[graft] def detectHotKeys(
      df: DataFrame,
      keyCol: String,
      sampleFraction: Double,
      hotFraction: Double,
      maxHotKeys: Int,
      seed: Long): Seq[Any] = {
    // one sampled scan; total comes from the (small) per-key counts, so
    // no full count of the fact side is ever taken
    val counts = df.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .persist()
    try {
      val total = math.max(1L,
        Option(counts.agg(sum("__n")).collect()(0).get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L))
      counts.filter(col("__n") >= lit(hotFraction * total))
        .orderBy(desc("__n"), col(keyCol))
        .limit(maxHotKeys)
        .select(keyCol).collect().map(_.get(0)).toSeq
    } finally { counts.unpersist(); () }
  }

  /** Inner equi-join of `fact` and `dim` on `key`, with hot fact keys
    * routed through a broadcast of the matching dim slice. Output columns
    * = fact columns ++ dim columns minus the (single) join key, exactly
    * like `fact.join(dim, key)`. */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      sampleFraction: Double = 0.01,
      hotFraction: Double = 0.01,
      maxHotKeys: Int = 100,
      seed: Long = 42L): DataFrame = {
    // NULL hot keys are dropped from the list, not compared: an inner
    // equi-join never matches NULL anyway, and a NULL inside `isin` would
    // turn non-matching rows' predicate NULL — excluded from BOTH the hot
    // and the cold branch, silently losing rows.
    val hot = detectHotKeys(fact, key, sampleFraction, hotFraction, maxHotKeys, seed)
      .filter(_ != null)
    if (hot.isEmpty) fact.join(dim, key)
    else {
      val isHot = hotKeyFilter(col(key), hot)
      val hotJoin = fact.filter(isHot)
        .join(broadcast(dim.filter(isHot)), key)
      val coldJoin = fact.filter(!isHot).join(dim.filter(!isHot), key)
      hotJoin.unionByName(coldJoin)
    }
  }

  /** Typed IN over the collected native key values (`Literal` handles
    * numeric/decimal/timestamp/date/string): the comparison happens in
    * the key's own type. A string-cast compare is lossy — e.g. a
    * collected timestamp's java toString ("… 00:00:00.0") never equals
    * Spark's cast ("… 00:00:00"), so every hot row silently routed cold
    * and the skew guard stopped guarding. */
  private[graft] def hotKeyFilter(
      key: org.apache.spark.sql.Column, hot: Seq[Any]): org.apache.spark.sql.Column =
    key.isin(hot: _*)
}
