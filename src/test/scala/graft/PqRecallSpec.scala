package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** PQ ANN accuracy contract (q64's recall-spec pattern for the q118/
  * q119 family): ADC is deliberately lossy — the guarantees pinned
  * here are (1) a recall floor for ADC+re-rank on the real
  * embeddings, (2) re-rank never hurts recall vs pure ADC, and (3)
  * a full-corpus shortlist degenerates to the exact L2 ranking. */
class PqRecallSpec extends AnyFunSuite with SparkTestBase {

  private val k = 5
  private def emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  /** Exact squared-L2 top-k (rank by ||c||^2 - 2 q.c, ties by id) —
    * pqTopKRefined with an all-corpus shortlist re-ranks every
    * candidate exactly, so it IS the exact baseline. */
  private def exactTopK(queries: DataFrame, n: Int): DataFrame =
    Similarity.pqTopKRefined(queries, emb, "vec_id", "embedding",
      k = k, shortlist = n, m = 8, ksub = 16, iters = 2)

  private def recall(ann: DataFrame, exact: DataFrame): Double = {
    val hits = ann.select("query_id", "cand_id")
      .intersect(exact.select("query_id", "cand_id")).count()
    hits.toDouble / exact.count()
  }

  test("ADC + re-rank holds a recall floor against exact L2 on real embeddings") {
    val queries = emb.where(col("vec_id") < 50)
    val exact = exactTopK(queries, 500)
    val adc = Similarity.pqTopK(queries, emb, "vec_id", "embedding",
      k = k, m = 8, ksub = 16, iters = 2)
    val refined = Similarity.pqTopKRefined(queries, emb, "vec_id",
      "embedding", k = k, shortlist = 50, m = 8, ksub = 16, iters = 2)
    val refined200 = Similarity.pqTopKRefined(queries, emb, "vec_id",
      "embedding", k = k, shortlist = 200, m = 8, ksub = 16, iters = 2)
    val rAdc = recall(adc, exact)
    val rRef = recall(refined, exact)
    val rRef200 = recall(refined200, exact)
    info(f"recall@$k: adc=$rAdc%.3f refined(50)=$rRef%.3f refined(200)=$rRef200%.3f")
    // re-ranking a 10x shortlist must not lose recall vs pure ADC
    assert(rRef >= rAdc,
      s"re-rank lost recall: adc=$rAdc refined=$rRef")
    // floors pinned well under measured (0.21 / 0.71 / 0.93 on the
    // seed-42 embeddings — i.i.d. random vectors are PQ's WORST case:
    // no subspace structure for 16 codes to exploit; real embedding
    // manifolds sit far above this) so a codebook/kernel regression
    // fails loudly without flaking on testdata regen
    assert(rAdc >= 0.10, s"adc recall floor broken: $rAdc")
    assert(rRef >= 0.55, s"refined(50) recall floor broken: $rRef")
    assert(rRef200 >= 0.80, s"refined(200) recall floor broken: $rRef200")
    // deeper shortlists must pay off monotonically
    assert(rRef200 >= rRef,
      s"deeper shortlist lost recall: 50->$rRef 200->$rRef200")
  }

  test("a full-corpus shortlist degenerates to the exact L2 ranking") {
    val queries = emb.where(col("vec_id") < 20)
    val all = exactTopK(queries, 500)
    // exact check against a direct window formulation
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"))
    val d2 = (graft.expressions.FloatDotProduct(col("cv"), col("cv")) -
      lit(2.0) * graft.expressions.FloatDotProduct(col("qv"), col("cv"))).as("d2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("cand_id"))
    val direct = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), d2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
    assert(all.select("query_id", "cand_id", "rank").exceptAll(
      direct.select("query_id", "cand_id", "rank")).count() === 0)
    assert(direct.select("query_id", "cand_id", "rank").exceptAll(
      all.select("query_id", "cand_id", "rank")).count() === 0)
  }
}
