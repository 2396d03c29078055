package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization bounds values to [-127, 127] and preserves cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Quantize.int8(emb, "embedding")
    val stats = q.select(
      array_min(col("embedding_q").cast("array<int>")).as("mn"),
      array_max(col("embedding_q").cast("array<int>")).as("mx"))
      .agg(min("mn"), max("mx")).head()
    assert(stats.getInt(0) >= -127 && stats.getInt(1) <= 127)

    val rt = Quantize.roundTripCosine(emb, "embedding", "vec_id")
    val worst = rt.agg(min("cos_rt")).head().getDouble(0)
    assert(worst >= 0.999, s"int8 round-trip cosine degraded: $worst")
  }

  test("truncate keeps the prefix dims and composes with int8") {
    val df = Seq((1L, Array(0.5f, -0.25f, 0.125f, 1.0f))).toDF("vec_id", "embedding")
    val tr = Quantize.truncate(df, "embedding", 2)
    val v = tr.select("embedding_t").head().getSeq[Float](0)
    assert(v == Seq(0.5f, -0.25f))
    // composition: quantize the truncated column
    val q = Quantize.int8(tr.select(col("vec_id"), col("embedding_t")), "embedding_t")
    assert(q.select("embedding_t_q").head().getSeq[Byte](0).length == 2)
    intercept[IllegalArgumentException](Quantize.truncate(df, "embedding", 0))
  }

  test("dequantize inverts quantize up to scale granularity") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val deq = Quantize.dequantize(Quantize.int8(df, "embedding"), "embedding")
      .select(explode(arrays_zip(col("embedding"), col("embedding_deq"))).as("z"))
      .select(col("z.embedding").cast("double").as("orig"), col("z.embedding_deq").as("back"))
    val maxErr = deq.agg(max(abs(col("orig") - col("back")))).head().getDouble(0)
    // max error is half a quantization step = scale/2 = (1.0/127)/2
    assert(maxErr <= (1.0 / 127) / 2 + 1e-9, s"error too large: $maxErr")
  }
}
