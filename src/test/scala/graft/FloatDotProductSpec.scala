package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.FloatDotProduct

/** Native dot product must be bit-equal to the interpreted
  * aggregate(zip_with) formulation (same accumulation order). */
class FloatDotProductSpec extends AnyFunSuite with SparkTestBase {

  test("bit-equal to interpreted formulation on real embeddings") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val interp = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(
        FloatDotProduct(col("embedding"), col("embedding")).as("fast"),
        interp.as("slow"))
      .where(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0, "native dot product diverged from interpreted")
  }

  test("null propagates, empty arrays give 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (Some(Array[Float]()), Some(Array[Float]())),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val got = df.select(FloatDotProduct(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).getDouble(0) === 0.0)
    assert(got(2).isNullAt(0))
  }
}
