package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot agrees with the HOF dot on float and double arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0, 1.0, 1.0)),
      (Array(-1.5f, 2.5f, -3.5f), Array(2.0, -2.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("native"),
      VectorFunctions.dot(col("a"), col("b")).as("hof"))
    assert(out.filter(abs(col("native") - col("hof")) > 1e-9).isEmpty)
  }

  test("graft_dot matches in both codegen and interpreted evaluation") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val expected = 11.0
    assert(df.select(VectorFunctions.dotNative(col("a"), col("b")))
      .head().getDouble(0) == expected)
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(VectorFunctions.dotNative(col("a"), col("b")))
        .head().getDouble(0) == expected)
    }
  }

  test("graft_dot is NULL-safe and usable from SQL") {
    GraftFunctions.register(spark)
    Seq((Some(Array(1.0, 2.0)), Array(3.0, 4.0)), (None, Array(1.0, 1.0)))
      .toDF("a", "b").createOrReplaceTempView("dot_t")
    val rows = sql("SELECT graft_dot(a, b) AS d FROM dot_t ORDER BY d NULLS FIRST")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("type mismatch is rejected at analysis") {
    GraftFunctions.register(spark)
    Seq(("x", Array(1.0))).toDF("a", "b").createOrReplaceTempView("dot_bad")
    intercept[org.apache.spark.sql.AnalysisException] {
      sql("SELECT graft_dot(a, b) FROM dot_bad").collect()
    }
  }

  private def withSqlConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
