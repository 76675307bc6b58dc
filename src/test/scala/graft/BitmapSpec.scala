package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{BitmapAggregate, BitmapAndCount}

/** Bitmap set aggregate + popcount intersection: must agree with
  * collect_set semantics across partial merges. */
class BitmapSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bitmap agg sets bits across partitions; and-count intersects") {
    val df = Seq(
      ("a", 0), ("a", 63), ("a", 64), ("a", 127), ("a", 63), // dup bit
      ("b", 63), ("b", 64), ("b", 200)
    ).toDF("k", "sid").repartition(5)
    val bm = df.groupBy("k").agg(BitmapAggregate(col("sid"), 256).as("bm"))
    val rows = bm.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a").length === 4) // 256 bits = 4 words
    assert(java.lang.Long.bitCount(rows("a")(0)) === 2) // bits 0,63
    val inter = bm.as("x").join(bm.as("y"), col("x.k") < col("y.k"))
      .select(BitmapAndCount(col("x.bm"), col("y.bm")))
      .head().getInt(0)
    assert(inter === 2) // {63, 64} shared
  }

  test("jaccardPairs bitmap path equals sorted-set semantics") {
    // vocabulary here is tiny -> bitmap path active; assert known pair
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z w q r")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .jaccardPairs(docs, "doc_id", "text", k = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length === 1)
    assert(pairs.head._1 === 1L && pairs.head._2 === 2L)
    assert(math.abs(pairs.head._3 - 5.0 / 7.0) < 1e-12)
  }
}
