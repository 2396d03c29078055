package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packs fill in id order; offsets and pack ids are consistent") {
    // one shard so the packing is a single readable sequence
    val df = Seq((0L, 100L), (1L, 300L), (2L, 200L), (3L, 50L), (4L, 500L))
      .toDF("id", "n_tokens")
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 512, shards = 1)
      .select("id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // cumulative starts: 0, 100, 400, 600, 650 → packs 0,0,0,1,1
    assert(out == Seq(
      (0L, 0L, 0L), (1L, 0L, 100L), (2L, 0L, 400L),
      (3L, 1L, 88L), (4L, 1L, 138L)))
  }

  test("doc longer than the budget occupies the pack where it starts") {
    val df = Seq((0L, 2000L), (1L, 10L)).toDF("id", "n_tokens")
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 512, shards = 1)
      .select("id", "pack_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // doc 0 starts at offset 0 (pack 0) and spills through pack 3;
    // doc 1 starts at cumulative 2000 → pack 3
    assert(out == Seq((0L, 0L), (1L, 3L)))
  }

  test("sharding preserves every row and packs independently per shard") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("n_tokens", lit(100L))
    val out = Packing.packSequences(df, "id", "n_tokens", budget = 250, shards = 8)
    assert(out.count() == 1000)
    // every shard's first doc (by id) starts at offset 0 in pack 0
    val firsts = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("pack_id") =!= 0 || col("pack_offset") =!= 0).count() == 0)
    // deterministic: same input → identical assignment
    val again = Packing.packSequences(df, "id", "n_tokens", budget = 250, shards = 8)
    assert(out.exceptAll(again).isEmpty)
  }
}
