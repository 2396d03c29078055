package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Physical-plan shape assertions — the properties that keep these
  * operators fast at scale, pinned so a refactor can't silently regress
  * them. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5 multi-join: dimension filters reach the parquet scans") {
    val df = SparkEntry.queries("q5_nation_revenue")(spark, sf)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)")
      || p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
  }

  test("q5 multi-join: small dimensions broadcast (no shuffle join at this size)") {
    val p = plan(SparkEntry.queries("q5_nation_revenue")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join at tiny SF:\n$p")
  }

  test("column pruning: q1 scan reads only the needed lineitem columns") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("l_returnflag") && !scan.contains("l_comment"),
      s"scan schema not pruned:\n$scan")
  }

  test("minhash pipeline: no pairwise blow-up, candidates served from cache") {
    val pairs = Dedup.minHashLsh(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.6)
    val p = plan(pairs)
    // exact Jaccard verify must NOT be a cross join — only keyed equi-joins
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise blow-up in plan:\n$p")
    // the narrow candidate table is persisted: downstream branches read the
    // cache instead of recomputing the signature pipeline
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"candidates not served from cache:\n$p")
  }

  test("brute-force knn broadcasts the query side (no shuffle exchange)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val df = graft.operators.Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", 5)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side not broadcast:\n$p")
    // native dot must appear (not the interpreted HOF 'aggregate(')
    assert(p.contains("graft_dot"), s"native dot missing from plan:\n$p")
  }

  test("merge rewrite keeps all three branches as keyed joins") {
    val o = Tables.load(spark, sf, "orders")
    val src = o.select(col("o_orderkey"), (col("o_totalprice") + 1.0d).as("o_totalprice"))
    val p = plan(graft.operators.Merge(o, src, Seq("o_orderkey"), Seq("o_totalprice"),
      insertWhenNotMatched = true))
    assert(!p.contains("CartesianProduct"), s"merge degenerated to cross join:\n$p")
    assert(p.contains("Join"), s"expected joins in merge plan:\n$p")
  }

  test("deterministic sampling is a pure scan-stage filter: zero exchanges") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.25), 0.6, seed = 7L)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"sampling should not shuffle:\n$p")
    assert(p.contains("Filter"), s"expected a filter over the scan:\n$p")
  }

  test("mixture resample: plan side broadcasts, corpus side never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Sampling.resampleToMixture(docs, "doc_id", "lang",
      Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15),
      seed = 13L)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"per-domain thresholds must broadcast:\n$p")
    // the only exchanges allowed are the tiny plan side's aggregate +
    // broadcast; the corpus side must be scan → broadcast-join → filter.
    assert(!p.contains("Exchange rangepartitioning"), s"no sort expected:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1, s"corpus side must not shuffle (got $hashEx hash exchanges):\n$p")
  }

  test("sequence packing shuffles once (hash by shard), no global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), org.apache.spark.sql.functions.lit(100L).as("n_tokens"))
    val df = graft.operators.Packing.packSequences(docs, "doc_id", "n_tokens", 512, 8)
    val p = plan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"global sort would serialize the corpus:\n$p")
  }

  test("contamination join is keyed on the gram hash, never pairwise") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Contamination.ngramOverlap(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", n = 8)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination degenerated to a pairwise join:\n$p")
  }

  test("quality verdict: LM count tables broadcast; no pairwise joins") {
    val p = plan(SparkEntry.queries("quality_verdict")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"LM count-table joins should broadcast at this size:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quality verdict degenerated to a pairwise join:\n$p")
  }

  test("incremental curation: diff + incremental LSH stay keyed, never pairwise") {
    val p = plan(SparkEntry.queries("incremental_curation")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental curation degenerated to a pairwise join:\n$p")
  }

  test("decontaminate strike is a keyed anti-join, never pairwise") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Contamination.decontaminate(
      docs,
      docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), substring(col("text"), 40, 200).as("text")),
      "text", "doc_id", maxTrainDf = 100)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontaminate degenerated to a pairwise join:\n$p")
  }

  test("report-based strike stays a keyed anti-join over the artifact") {
    import graft.operators.{Contamination, Reports}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-planrep").toString
    val report = Reports.cached(spark, s"$sf/documents.parquet", "plan_rep", Some(tmp)) {
      Contamination.passageOverlap(docs,
        docs.filter(col("doc_id") % 20 === 0)
          .select(col("doc_id"), substring(col("text"), 40, 200).as("text")),
        "text", "doc_id", maxTrainDf = 100)
    }
    val p = plan(Contamination.decontaminateWithReport(docs, report, "doc_id", 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"report strike degenerated to a pairwise join:\n$p")
    // The strike plan reads the PERSISTED artifact, not the winnow pipeline.
    val leaves = Contamination.decontaminateWithReport(docs, report, "doc_id", 2)
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("plan_rep"), s"strike must scan the artifact:\n$leaves")
  }

  test("IVF semantic join: band/cell candidates only, never a cross product") {
    import graft.operators.{IvfIndex, Similarity}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft-planivf").toString + "/idx"
    IvfIndex.writeIndex(emb.filter(col("vec_id") % 10 =!= 0), "embedding", "vec_id",
      idx, nlist = 8, iters = 1)
    val joined = Similarity.semanticJoinIvf(spark,
      emb.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding"),
      idx, "embedding", "vec_id", minCosine = 0.3, nprobe = 2)
    val p = plan(joined)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF semantic join degenerated to a pairwise join:\n$p")
  }

  test("versioned diff: narrow fingerprint frames, keyed full-outer join") {
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("graft-planver").toString + "/t"
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    Versioned.commit(docs.limit(200), dir)
    Versioned.commit(docs.limit(150), dir)
    val p = plan(Versioned.diffVersions(spark, dir, 0, 1, "doc_id", Seq("text")))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"versioned diff degenerated to a pairwise join:\n$p")
  }

  test("paragraph dedup: keyed joins only, DF count on the 8-byte hash") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat_ws("\n", col("text"), lit("shared line"), col("text")).as("text"))
    val df = Dedup.paragraphDedup(docs, "text", "doc_id", minDocs = 2)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup degenerated to a pairwise join:\n$p")
    // The struck-set join and the DF aggregate key on xxhash64(norm) — a
    // long column — so the shuffle never carries paragraph text as a key.
    assert(p.contains("xxhash64"), s"hash key missing from plan:\n$p")
  }

  test("keep-best-from-report: argmax consumes the persisted cluster artifact") {
    import graft.operators.{Components, Reports}
    import graft.functions.TextFunctions.qualityScore
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-plankb").toString
    val clustered = Reports.cached(spark, s"$sf/documents.parquet", "plan_kb", Some(tmp)) {
      val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
        numHashes = 32, bands = 16, threshold = 0.6)
      Components.clusters(docs.select("doc_id"), "doc_id", pairs)
    }
    val kb = Components.keepBest(clustered.select("doc_id", "cluster"),
      docs.select(col("doc_id"), qualityScore(col("text")).as("quality")),
      "doc_id", "quality")
    val p = plan(kb)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"keep-best degenerated to a pairwise join:\n$p")
    // The retention pass reads the PERSISTED cluster assignment, not the
    // minhash pipeline: the only leaves are the artifact + documents scans.
    val leaves = kb.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("plan_kb"), s"keep-best must scan the artifact:\n$leaves")
  }

  test("containment pairs: only fingerprint equi-joins, never pairwise") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val df = Dedup.containmentPairs(docs, "text", "doc_id",
      maxDf = 100, minFp = 5, minContain = 0.8)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment degenerated to a pairwise join:\n$p")
  }

  test("domain quota: ONE keyed exchange (the domain partition), no extra sort pass") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars").cast("double").as("q"))
    val df = graft.operators.Sampling.domainQuota(docs, "source", "q", "doc_id", 10)
    val p = plan(df)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"quota must shuffle exactly once on the domain:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no global sort — the rank is per-domain:\n$p")
  }

  test("sketch store: per-group sketch rows aggregate with partial (map-side) combine") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-plan-sk").toString + "/s"
    graft.operators.Sketches.writeTokenSketches(docs, "text", "lang", path)
    val merged = graft.operators.Sketches.mergedDistinct(spark, Seq(path))
    val p = plan(merged)
    // merge input is sketch rows (one per group/store), so the plan is a
    // tiny scan + keyed aggregate — no join, no corpus rescan
    assert(!p.contains("Join"), s"sketch merge must not join:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the sketch-union aggregate:\n$p")
  }
}
