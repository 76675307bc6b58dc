package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Multi-probe LSH (Lv et al.): probing the smallest-margin bit-flip
  * buckets recovers neighbors lost across bucket walls — recall@k must
  * rise strictly vs single-probe at equal k on the real embeddings. */
class MultiProbeSpec extends AnyFunSuite with SparkTestBase {

  private def recallAtK(ann: DataFrame, exact: DataFrame): Double = {
    val hits = ann.select("query_id", "cand_id")
      .intersect(exact.select("query_id", "cand_id")).count()
    hits.toDouble / exact.count()
  }

  test("multi-probe strictly improves recall@k over single-probe") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.where(col("vec_id") < 50)
    val k = 5
    // nBits=8 -> 256 buckets over 500 vectors: walls cost real recall
    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k)
    val single = Similarity.annTopKMultiProbe(queries, emb, "vec_id",
      "embedding", k, nBits = 8, dim = 64, nProbe = 1)
    val multi = Similarity.annTopKMultiProbe(queries, emb, "vec_id",
      "embedding", k, nBits = 8, dim = 64, nProbe = 4)
    val r1 = recallAtK(single, exact)
    val r4 = recallAtK(multi, exact)
    // absolute recall is small by design here (256 buckets over 500
    // near-random vectors, ~2 per bucket); the contract is the strict
    // improvement from probing the 3 nearest-wall neighbor buckets
    assert(r4 > r1, s"multi-probe recall $r4 should beat single-probe $r1")
    info(f"recall@$k: single=$r1%.3f multi(4)=$r4%.3f")
  }

  test("single-probe via annTopKMultiProbe(nProbe=1) equals annTopK") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val a = Similarity.annTopK(queries, emb, "vec_id", "embedding",
      k = 5, nBits = 4, dim = 64)
    val b = Similarity.annTopKMultiProbe(queries, emb, "vec_id", "embedding",
      k = 5, nBits = 4, dim = 64, nProbe = 1)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("every single-probe result pair is also reachable under multi-probe") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
    val single = Similarity.annTopKMultiProbe(queries, emb, "vec_id",
      "embedding", k = 3, nBits = 8, dim = 64, nProbe = 1)
    val multi = Similarity.annTopKMultiProbe(queries, emb, "vec_id",
      "embedding", k = 500, nBits = 8, dim = 64, nProbe = 3)
    // own bucket is always probed -> single-probe candidates survive
    assert(single.select("query_id", "cand_id")
      .exceptAll(multi.select("query_id", "cand_id")).count() === 0)
  }
}
