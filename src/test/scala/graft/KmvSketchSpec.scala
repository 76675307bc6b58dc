package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{CountMin, KmvSketch}

/** KMV sketch: the k smallest distinct hashes are a pure function of
  * the input set (bit-identical under partitioning and duplication),
  * equal to the trivial sorted-distinct-limit derivation, and the
  * distinct estimator stays within a few standard errors. */
class KmvSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val k = 64

  private def sketch(vals: Seq[String], parts: Int = 4): Seq[Long] =
    vals.toDF("s").repartition(parts)
      .agg(KmvSketch(col("s"), k).as("sk"))
      .select(col("sk")).as[Seq[Long]].head()

  test("sketch equals the k smallest distinct hashes, any partitioning, duplicates free") {
    val vals = (1 to 3000).map(i => s"v${i % 1700}")
    val expected = vals.distinct.map(CountMin.hash52)
      .distinct.sorted.take(k)
    assert(sketch(vals, 1) === expected)
    assert(sketch(vals, 13) === expected)
    assert(sketch(vals ++ vals, 32) === expected)
  }

  test("distinct estimate stays within 4 standard errors") {
    val se = 1.0 / math.sqrt(k - 2.0)
    Seq(500, 5000, 40000).foreach { n =>
      val sk = sketch((1 to n).map(i => s"item$i"))
      assert(sk.length === k)
      val est = (k - 1).toDouble * KmvSketch.HashSpace / sk.last
      val rel = math.abs(est - n) / n
      assert(rel <= 4 * se, s"n=$n est=$est relerr=$rel")
    }
  }

  test("sets smaller than k are held exactly") {
    val vals = (1 to 40).map(i => s"x$i")
    val sk = sketch(vals)
    assert(sk.length === vals.length)
    assert(sk === vals.map(CountMin.hash52).sorted)
  }

  test("union-sketch intersection estimate tracks true overlap") {
    // A = 1..2000, B = 1001..3000 -> |A∪B| = 3000, |A∩B| = 1000
    val a = (1 to 2000).map(i => s"u$i")
    val b = (1001 to 3000).map(i => s"u$i")
    val ska = sketch(a); val skb = sketch(b)
    val us = (ska ++ skb).distinct.sorted.take(k)
    val estUnion = (k - 1).toDouble * KmvSketch.HashSpace / us.last
    val nI = us.count(h => ska.contains(h) && skb.contains(h))
    val estInter = nI.toDouble / us.length * estUnion
    assert(math.abs(estUnion - 3000) / 3000 <= 0.5, s"union est $estUnion")
    assert(math.abs(estInter - 1000) / 1000 <= 0.6, s"inter est $estInter")
  }

  test("stored-state rollup over any slicing is bit-identical to the direct sketch (q185)") {
    // split the input into arbitrary grains, sketch each grain, then
    // re-merge states (distinct-union + sort + take-k): any hash in
    // the global k smallest is in its own grain's k smallest, so the
    // rollup must equal the one-shot sketch exactly
    val vals = (1 to 5000).map(i => s"g${i % 2900}")
    val direct = sketch(vals)
    Seq(2, 7, 31).foreach { grains =>
      val perGrain = vals.zipWithIndex.groupBy(_._2 % grains).values
        .map(slice => sketch(slice.map(_._1)))
      val merged = perGrain.flatten.toSeq.distinct.sorted.take(k)
      assert(merged === direct, s"rollup diverged at $grains grains")
    }
  }
}
