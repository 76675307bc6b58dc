package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Weighted two-pass selection (q225): must equal the brute-force
  * weighted quantile (smallest value whose cumulative weight reaches
  * ⌈W·q⌉), degenerate to the unweighted selection at weight 1, and
  * stay partitioning-independent. */
class WeightedQuantilesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic skewed data with duplicates and uneven weights
  private def rows: Seq[(Double, Long)] = (0 until 2000).map { i =>
    val v = ((i * 37) % 97).toDouble + (if (i % 5 == 0) 0.5 else 0.0)
    val w = 1L + (i * 13) % 7
    (v, w)
  }

  private def bruteForce(qs: Seq[(String, Long, Long)]): Map[String, Double] = {
    val sorted = rows.sortBy(_._1)
    val tw = rows.map(_._2).sum
    qs.map { case (label, num, den) =>
      val k = (tw * num + den - 1) / den
      var cum = 0L
      val v = sorted.iterator.map { case (x, w) => cum += w; (x, cum) }
        .collectFirst { case (x, c) if c >= k => x }.get
      label -> v
    }.toMap
  }

  private val targets =
    Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))

  test("equals brute-force weighted selection, duplicates and all") {
    val df = rows.toDF("v", "w")
    val got = Quantiles.weightedExact(df, "v", "w", targets)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val want = bruteForce(targets)
    targets.foreach { case (l, _, _) =>
      assert(got(l) == want(l), s"$l: got ${got(l)} want ${want(l)}")
    }
  }

  test("weight 1 degenerates to the unweighted two-pass selection") {
    val df = rows.map(_._1).toDF("v").withColumn("w", lit(1L))
    val weighted = Quantiles.weightedExact(df, "v", "w", targets)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val plain = Quantiles.exact(df, "v", targets)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    targets.foreach { case (l, _, _) =>
      assert(weighted(l) == plain(l), s"$l: ${weighted(l)} vs ${plain(l)}")
    }
  }

  test("partitioning-independent: 1 vs 13 partitions, bit-identical") {
    val a = Quantiles.weightedExact(rows.toDF("v", "w").coalesce(1),
      "v", "w", targets).collect().map(r => (r.getString(0), r.getDouble(2)))
    val b = Quantiles.weightedExact(rows.toDF("v", "w").repartition(13),
      "v", "w", targets).collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }
}
