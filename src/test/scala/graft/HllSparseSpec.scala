package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{HllSketch, HllSparseAggregate}

/** Sparse-mode HLL: lossless vs the dense sketch (identical registers
  * ⇒ identical estimate) on both sides of the upgrade threshold and
  * under any partitioning / sparse-dense partial mix; serialized state
  * stays O(distinct) for small groups. */
class HllSparseSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ests(df: org.apache.spark.sql.DataFrame,
      agg: org.apache.spark.sql.Column): Map[String, Double] =
    df.groupBy("g").agg(agg.as("e")).as[(String, Double)].collect().toMap

  test("sparse estimate equals dense bit-for-bit, small and large groups, any partitioning") {
    // g=a: 10 distinct (stays sparse, threshold m/8 = 64)
    // g=b: 5000 distinct (upgrades to dense mid-aggregation)
    val rows = (1 to 10).map(i => ("a", s"u$i")) ++
      (1 to 5000).map(i => ("b", s"v$i"))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "s").repartition(parts)
      val d = ests(df, HllSketch(col("s"), 9))
      val s = ests(df, HllSketch.sparse(col("s"), 9))
      assert(d.keySet === s.keySet)
      d.foreach { case (g, v) =>
        assert(java.lang.Double.doubleToRawLongBits(v) ===
          java.lang.Double.doubleToRawLongBits(s(g)),
          s"sparse != dense for group $g at $parts partitions")
      }
    }
  }

  test("serialized sparse state is O(distinct), not O(m)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = HllSparseAggregate(
      BoundReference(0, StringType, nullable = false), p = 9)
    val buf = (1 to 8).foldLeft(agg.createAggregationBuffer()) { (b, i) =>
      agg.update(b, InternalRow(UTF8String.fromString(s"x$i")))
    }
    val ser = agg.serialize(buf)
    assert(ser.length <= 1 + 4 + 3 * 8, s"sparse ser too big: ${ser.length}")
    // round-trips and upgrades losslessly
    val back = agg.deserialize(ser)
    val big = (1 to 2000).foldLeft(agg.createAggregationBuffer()) { (b, i) =>
      agg.update(b, InternalRow(UTF8String.fromString(s"x$i")))
    }
    assert(big.dense != null, "large buffer should have upgraded")
    val merged = agg.merge(big, back) // dense ← sparse merge path
    assert(agg.serialize(merged).length === 1 + 512)
  }
}
