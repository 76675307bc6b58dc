package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Broder minhash estimator accuracy: for LSH-banded candidate pairs,
  * n_agree/nHashes must track the exact shingle Jaccard — the
  * statistical contract that makes q66 the verification-free scale
  * path for q25's exact pipeline. */
class MinhashEstimateSpec extends AnyFunSuite with SparkTestBase {

  test("estimate tracks exact jaccard on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val est = Dedup.minhashJaccardEstimate(docs, "doc_id", "text",
      k = 2, nHashes = 16, bandSize = 4)
    // exact jaccard for the SAME pairs (threshold 0 keeps all pairs;
    // restrict to estimator candidates via join)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", k = 2,
      threshold = 0.05)
    val joined = est.join(exact, Seq("doc_a", "doc_b"))
      .select(col("est_jaccard"), col("jaccard")).collect()
    assert(joined.nonEmpty, "banded candidates should include true near-dups")
    val errs = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    val mae = errs.sum / errs.length
    // 16 hashes -> stderr ~ sqrt(J(1-J)/16) <= 0.125; mean abs error
    // across pairs should sit well inside it
    assert(mae <= 0.15, f"mean abs error $mae%.3f too high")
    // banding (4 bands x 4 hashes) guarantees candidates at high J:
    // every exact pair with J >= 0.9 must be among the candidates
    val high = exact.where(col("jaccard") >= 0.9)
    val missed = high.join(est, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed === 0, s"$missed high-jaccard pairs missed by banding")
  }

  test("identical documents estimate 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now")
    ).toDF("doc_id", "text")
    val est = Dedup.minhashJaccardEstimate(docs, "doc_id", "text",
      k = 2, nHashes = 16, bandSize = 4).collect()
    val pair = est.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, "identical docs must share all bands")
    assert(pair.get.getDouble(3) === 1.0)
  }
}
