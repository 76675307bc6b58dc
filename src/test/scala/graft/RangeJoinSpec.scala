package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed point-in-interval join: must equal the naive inequality
  * join, including intervals spanning many buckets and bucket-boundary
  * points. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("equals naive inequality join across bucket widths") {
    val points = (0L until 200L).map(i => ("k" + (i % 3), i * 7 % 149))
      .toDF("key", "t")
    val intervals = Seq(
      ("k0", 0L, 10L), ("k0", 10L, 12L), ("k0", 50L, 148L),
      ("k1", 5L, 5L), ("k1", 30L, 90L), ("k2", 100L, 300L))
      .toDF("key", "s", "e")
    val naive = points.join(intervals,
      points("key") === intervals("key") &&
        col("t") >= col("s") && col("t") <= col("e"))
      .select(points("key"), col("t"), col("s"), col("e"))
    Seq(1L, 7L, 64L, 1000L).foreach { w =>
      val bucketed = RangeJoin.pointInInterval(points, intervals,
        Seq("key"), "t", "s", "e", bucketUs = w)
        .select("key", "t", "s", "e")
      assert(bucketed.count() === naive.count(), s"width=$w")
      assert(bucketed.exceptAll(naive).count() === 0, s"width=$w extra")
      assert(naive.exceptAll(bucketed).count() === 0, s"width=$w missing")
    }
  }
}
