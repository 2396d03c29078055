package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF topK achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.ivfTopK(emb, queries, "embedding", "vec_id", k = 10,
      nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("IVF output is deterministic, ranked, and k-bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val a = IvfIndex.ivfTopK(emb, queries, "embedding", "vec_id", k = 3,
      nlist = 8, nprobe = 2).collect()
    val b = IvfIndex.ivfTopK(emb, queries, "embedding", "vec_id", k = 3,
      nlist = 8, nprobe = 2).collect()
    assert(a.toSeq == b.toSeq)
    val byQuery = a.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
    }
  }
}
