package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Exact-heavy-hitter contract (q166's operator): the MG pass must
  * never lose a truly heavy key (superset guarantee under adversarial
  * partition spreading), the threshold is STRICT, and the result
  * equals the brute-force GROUP BY under any partitioning. */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(keys: Seq[String], phiDen: Int, parts: Int) =
    HeavyHitters.exact(keys.toDF("k").repartition(parts), "k", phiDen)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("strict threshold: a key at exactly n/phiDen is excluded") {
    // n = 20, phiDen = 4 → threshold 5: "a" has 5 (excluded), "b" 6
    val keys = Seq.fill(5)("a") ++ Seq.fill(6)("b") ++
      (1 to 9).map(i => s"z$i")
    val got = run(keys, 4, 3)
    assert(got === Map("b" -> 6L), got)
  }

  test("adversarial spread: a heavy key diluted across many partitions still surfaces") {
    // "hot" has 30 of 300 rows (10% > 1/20) but arrives interleaved
    // with 270 distinct cold keys across 10 partitions — each local
    // MG table is under constant churn
    val keys = new scala.util.Random(7).shuffle(
      Seq.fill(30)("hot") ++ (1 to 270).map(i => s"cold$i"))
    val got = run(keys, 20, 10)
    assert(got === Map("hot" -> 30L), got)
  }

  test("equals brute force under any partitioning (random corpus)") {
    val rnd = new scala.util.Random(42)
    // zipf-ish: key j drawn with weight ~ 1/j
    val keys = (1 to 5000).map { _ =>
      val j = math.min(99, (1.0 / (rnd.nextDouble() + 0.01)).toInt)
      s"k$j"
    }
    val brute = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 50 > keys.size).toMap
    assert(run(keys, 50, 1) === brute)
    assert(run(keys, 50, 17) === brute)
    assert(run(keys, 50, 32) === brute)
  }
}
