package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Directed containment (q214): must flag a short doc quoted
  * wholesale inside a long one — the case Jaccard structurally
  * misses — and must stay asymmetric (the long doc is NOT contained
  * in the short one). */
class ContainmentSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val quote =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val host = (
    Seq("one two three four five six seven eight nine ten",
      quote,
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
      "eiusmod tempor incididunt ut labore et dolore magna aliqua")
    ).mkString(" ")
  private val noise =
    "purple monkey dishwasher quantum fizz bazz wibble wobble flux"

  private def corpus = Seq(
    (1L, quote), (2L, host), (3L, noise)
  ).toDF("doc_id", "text")

  test("short-in-long containment found; direction and jaccard-miss hold") {
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
      k = 3, tNum = 9, tDen = 10).collect()
    val hit = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(hit.isDefined, s"quote-in-host not flagged: ${pairs.mkString}")
    assert(hit.get.getAs[Double]("containment") == 1.0) // verbatim quote
    // asymmetry: the host is not contained in the quote
    assert(!pairs.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))
    // noise pairs with nothing
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    // Jaccard at the same bar misses the pair (union-diluted)
    val jac = Dedup.jaccardPairs(corpus, "doc_id", "text",
      k = 3, threshold = 0.9).collect()
    assert(jac.isEmpty, s"jaccard unexpectedly flagged: ${jac.mkString}")
  }

  test("threshold is exact rational math: below-bar pair excluded") {
    // doc 1 has 8 trigram shingles, 6 of them shared with doc 2:
    // containment 6/8 = 0.75 — flagged at 3/4, excluded at 4/5
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2"   // 8 shingles
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 y9 y10"  // shares w1..w8 -> 6 trigrams
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val at34 = Dedup.containmentPairs(df, "doc_id", "text", 3, 3, 4)
      .where(col("doc_a") === 1L && col("doc_b") === 2L).collect()
    assert(at34.length == 1 && at34.head.getAs[Long]("inter") == 6L &&
      at34.head.getAs[Long]("n_a") == 8L)
    val at45 = Dedup.containmentPairs(df, "doc_id", "text", 3, 4, 5)
      .where(col("doc_a") === 1L && col("doc_b") === 2L).collect()
    assert(at45.isEmpty, "6/8 must not pass a 4/5 bar")
  }
}
