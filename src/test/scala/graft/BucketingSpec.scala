package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4,
      sortKeys = Seq("o_orderkey"))
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4, sortKeys = Seq("o_orderkey"))

    // disable broadcast so the join strategy actually exercises bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // and the result is the plain join's result
      val expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a failed bucketed write leaves the existing table intact (stage-and-swap)") {
    import spark.implicits._
    val tbl = "b_swap_safety"
    val good = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    Bucketing.writeBucketed(good, tbl, Seq("k"), 2)
    assert(spark.table(tbl).count() == 3)

    // A write whose evaluation fails mid-flight: raise_error fires on the
    // second row, after the staged write has already started.
    val bad = spark.range(4).select(
      col("id").as("k"),
      when(col("id") < 1, lit("x"))
        .otherwise(raise_error(lit("injected write failure"))).as("v"))
    intercept[Exception] {
      Bucketing.writeBucketed(bad, tbl, Seq("k"), 2)
    }

    // old table still fully readable and still bucketed
    assert(spark.table(tbl).count() == 3)
    assert(spark.table(tbl).select("v").collect().map(_.getString(0)).toSet ==
      Set("a", "b", "c"))
    val bucketSpec = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(tbl))
      .bucketSpec
    assert(bucketSpec.exists(_.numBuckets == 2))
    // no staging-table debris in the catalog
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith(s"${tbl}__graft_stage")))
    sql(s"DROP TABLE $tbl")
  }

  test("a successful publish sweeps asides orphaned by earlier crashed publishes") {
    import spark.implicits._
    val tbl = "b_sweep"
    // Simulate a previous publish that crashed between swap and drop:
    // an aside table left behind with the displaced contents.
    Seq((1L, "stale")).toDF("k", "v").write.format("parquet")
      .saveAsTable(s"${tbl}__graft_old_deadbeef")
    Bucketing.writeBucketed(Seq((1L, "fresh"), (2L, "fresh")).toDF("k", "v"),
      tbl, Seq("k"), 2)
    assert(spark.table(tbl).count() == 2)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith(s"${tbl}__graft_old")),
      "stale aside must be swept after a successful swap")
    sql(s"DROP TABLE $tbl")
  }

  test("groupBy on the bucket key skips its exchange") {
    val agg = spark.table("b_lineitem")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
  }
}
