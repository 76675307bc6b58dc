package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.SortedIntersectCount

/** Custom codegen expression: merge-count of sorted int arrays must
  * agree with size(array_intersect) on set inputs, null-propagate, and
  * work both interpreted and codegen'd. */
class SortedIntersectCountSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (Array(1, 3, 5, 7), Array(3, 4, 5, 9)),     // 2 common
    (Array[Int](), Array(1, 2)),                 // empty side
    (Array(1, 2, 3), Array(1, 2, 3)),            // identical
    (Array(1, 2), Array(5, 6))                   // disjoint
  ).toDF("a", "b")

  test("matches size(array_intersect) on sorted set inputs") {
    val got = rows.select(
      SortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("null input yields null") {
    val withNull = Seq((Some(Array(1, 2)), Option.empty[Array[Int]])).toDF("a", "b")
    val r = withNull.select(SortedIntersectCount(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("survives codegen at scale") {
    val big = spark.range(10000).select(
      sequence(lit(0), (col("id") % 50).cast("int")).cast("array<int>").as("a"),
      sequence(lit(25), lit(75)).cast("array<int>").as("b"))
    val s = big.select(sum(SortedIntersectCount(col("a"), col("b"))).as("s"))
      .head().getLong(0)
    // for id%50 = m, a = [0..m], b = [25..75]: overlap = max(0, m-24)
    val expected = (0 until 10000).map(i => math.max(0, (i % 50) - 24)).sum
    assert(s === expected)
  }
}
