package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantiles

/** Two-pass exact quantiles (q191): equals the sort-based k-th
  * smallest on adversarial inputs — duplicates straddling ranks,
  * skewed distributions packing bins, constant columns (zero bin
  * width), tiny n — at any bin count and partitioning. */
class QuantilesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val qs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L),
    ("p75", 3L, 4L), ("p90", 9L, 10L), ("p99", 99L, 100L))

  private def sortBased(vs: Seq[Double]): Map[String, (Long, Double)] = {
    val sorted = vs.sorted
    val n = vs.length.toLong
    qs.map { case (l, num, den) =>
      val k = (n * num + den - 1) / den
      l -> (k, sorted((k - 1).toInt))
    }.toMap
  }

  private def twoPass(vs: Seq[Double], bins: Int): Map[String, (Long, Double)] =
    Quantiles.exact(vs.toDF("v").repartition(5), "v", qs, bins)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("matches sort-based selection on a deterministic pseudo-random set") {
    // LCG-derived doubles — deterministic, no Math.random
    val vs = (1 to 2000).map(i =>
      (((i * 2654435761L) % 100003) - 50000).toDouble / 7.0)
    for (bins <- Seq(4, 64, 1024))
      assert(twoPass(vs, bins) === sortBased(vs), s"bins=$bins")
  }

  test("heavy duplicates straddling target ranks") {
    val vs = Seq.fill(500)(1.0) ++ Seq.fill(500)(2.0) ++ Seq.fill(10)(3.0)
    assert(twoPass(vs, 16) === sortBased(vs))
  }

  test("constant column (zero bin width)") {
    val vs = Seq.fill(100)(7.5)
    assert(twoPass(vs, 64) === sortBased(vs))
  }

  test("skewed distribution packing one bin") {
    val vs = (1 to 900).map(_ => 0.001) ++
      (1 to 100).map(i => 1000.0 + i)
    assert(twoPass(vs, 8) === sortBased(vs))
  }

  test("tiny n") {
    val vs = Seq(3.0, 1.0, 2.0)
    assert(twoPass(vs, 1024) === sortBased(vs))
  }

  test("huge offset, tiny span (cancellation-dominated bin math)") {
    // ulp(1e12) ≈ 1.2e-4 — with span 1.0 over 1024 bins the bin width
    // (~1e-3) is only ~8 ulps, so the range bracket's pad term is
    // load-bearing, not just slack
    val vs = (1 to 1000).map(i => 1e12 + (i * 617 % 1000).toDouble / 1000.0)
    assert(twoPass(vs, 1024) === sortBased(vs))
  }
}
