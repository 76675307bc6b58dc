package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.HllSketch

/** HLL distinct sketch: error within a few standard errors of exact,
  * bit-identical estimates under any partitioning (register max is a
  * pure function of the input set), and duplicate-blindness. */
class HllSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def estimate(vals: Seq[String], parts: Int = 4): Double =
    vals.toDF("s").repartition(parts)
      .agg(HllSketch(col("s"), p = 9).as("e"))
      .select(col("e")).as[Double].head()

  test("estimates stay within 3 standard errors across cardinality regimes") {
    val se = 1.04 / math.sqrt(512.0) // ~4.6% at p=9
    // spans the linear-counting branch (small n) and the raw
    // estimator branch (n >> 2.5m)
    Seq(50, 400, 3000, 20000).foreach { n =>
      val est = estimate((1 to n).map(i => s"item$i"))
      val rel = math.abs(est - n) / n
      assert(rel <= 3 * se, s"n=$n est=$est relerr=$rel")
    }
  }

  test("duplicates do not move the estimate (pure function of the SET)") {
    val base = (1 to 1000).map(i => s"u$i")
    val a = estimate(base)
    val b = estimate(base ++ base ++ base.take(500))
    assert(java.lang.Double.doubleToRawLongBits(a) ===
      java.lang.Double.doubleToRawLongBits(b))
  }

  test("estimates are bit-identical under any partitioning") {
    val vals = (1 to 5000).map(i => s"k${i % 2600}")
    val bits = Seq(1, 13, 32).map(p =>
      java.lang.Double.doubleToRawLongBits(estimate(vals, p)))
    assert(bits.distinct.size === 1, bits.toString)
  }
}
