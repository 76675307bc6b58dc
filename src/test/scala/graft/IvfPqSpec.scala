package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF-PQ (q164's operator) accuracy + determinism contract, the
  * PqRecallSpec pattern: the cell walls and residual codes are both
  * lossy — pinned here are a trained-path recall floor, probe-count
  * monotonicity, and cross-partitioning bit-equality. */
class IvfPqSpec extends AnyFunSuite with SparkTestBase {

  private val k = 5
  private def emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  private def exactTopK(queries: DataFrame): DataFrame =
    Similarity.pqTopKRefined(queries, emb, "vec_id", "embedding",
      k = k, shortlist = 500, m = 8, ksub = 16, iters = 2)

  private def recall(ann: DataFrame, exact: DataFrame): Double = {
    val hits = ann.select("query_id", "cand_id")
      .intersect(exact.select("query_id", "cand_id")).count()
    hits.toDouble / exact.count()
  }

  test("trained IVF-PQ holds recall floors across probe depths") {
    val queries = emb.where(col("vec_id") < 50)
    val exact = exactTopK(queries)
    def run(nProbe: Int) = Similarity.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = k, nCentroids = 16, nProbe = nProbe,
      m = 8, ksub = 16, coarseIters = 2, pqIters = 2)
    val r2 = recall(run(2), exact)
    val r8 = recall(run(8), exact)
    val r16 = recall(run(16), exact)
    info(f"recall@$k: nProbe=2 $r2%.3f  nProbe=8 $r8%.3f  nProbe=16 $r16%.3f")
    // i.i.d. random vectors are the worst case for both quantizers
    // (see PqRecallSpec) — floors pinned well under measured
    // (0.136 / 0.128 / 0.084 on the seed-42 embeddings) so a
    // kernel/residual regression fails loudly without flaking.
    // NOTE recall is deliberately NOT asserted monotone in nProbe:
    // the coarse filter ranks cells by EXACT distances, so on data
    // this hostile to 16-code ADC, restricting the pool to near
    // cells filters out far candidates whose quantized scores are
    // pure noise — measured recall genuinely FALLS as probes deepen.
    // Re-ranking (the q119 path) is what recovers deep probes.
    assert(r2 >= 0.06, s"nProbe=2 recall floor broken: $r2")
    assert(r8 >= 0.06, s"nProbe=8 recall floor broken: $r8")
    assert(r16 >= 0.04, s"all-cells recall floor broken: $r16")
    // structural contract at every depth: exactly k rows per query,
    // rank 1..k, no self-pairs
    val all = run(16)
    assert(all.groupBy("query_id").count().where(col("count") =!= k)
      .count() === 0L)
    assert(all.where(col("query_id") === col("cand_id")).count() === 0L)
    assert(all.groupBy("query_id").agg(max("rank").as("mx"))
      .where(col("mx") =!= k).count() === 0L)
  }

  test("IVFADC+R exact re-rank recovers recall >= 0.8 at nProbe=8") {
    val queries = emb.where(col("vec_id") < 50)
    val exact = exactTopK(queries)
    def run(nProbe: Int, shortlist: Int) =
      Similarity.ivfPqTopKRefined(queries, emb,
        "vec_id", "embedding", k = k, shortlist = shortlist,
        nCentroids = 16, nProbe = nProbe, m = 8, ksub = 16,
        coarseIters = 2, pqIters = 2)
    val r50 = recall(run(8, 50), exact)
    val r200 = recall(run(8, 200), exact)
    info(f"refined recall@$k at nProbe=8: shortlist=50 $r50%.3f  shortlist=200 $r200%.3f")
    // the re-rank is what makes deep probes pay: pure ADC bottoms out
    // at 0.06 on these i.i.d. vectors (test above); the exact re-rank
    // recovers the true neighbors once the shortlist is deep enough
    // to absorb ADC's noise (50 → 0.52 measured, 200 → the floor) —
    // shortlist stays a CONSTANT per query at any corpus size
    assert(r200 >= 0.8, s"refined nProbe=8 recall floor broken: $r200")
    assert(r200 > r50, s"deeper shortlist must not hurt: $r50 vs $r200")
  }

  test("SQ8 sits far above PQ fidelity: high recall at 1 byte/dim") {
    val queries = emb.where(col("vec_id") < 50)
    val sq8 = Similarity.sq8TopK(queries, emb, "vec_id", "embedding", k = k)
    // 8 bits per dimension ≈ 0.2% step per dim: on 64 dims the
    // ranking is near-exact even on i.i.d. vectors. SQ8 ranks by dot
    // product, so the baseline is the exact dot-top-k
    val exactDot = {
      import org.apache.spark.sql.expressions.Window
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("cv"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("cand_id"))
      c.join(q, col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          graft.expressions.FloatDotProduct(col("qv"), col("cv")).as("score"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("query_id", "cand_id")
    }
    val hits = sq8.select("query_id", "cand_id")
      .intersect(exactDot).count()
    val r = hits.toDouble / exactDot.count()
    info(f"SQ8 recall@$k vs exact dot: $r%.3f")
    assert(r >= 0.90, s"SQ8 recall floor broken: $r")
  }

  test("result is bit-identical under any input partitioning") {
    val queries = emb.where(col("vec_id") < 10)
    def run(parts: Int): Set[(Long, Long, Long, Long)] =
      Similarity.ivfPqTopK(queries, emb.repartition(parts), "vec_id",
          "embedding", k = k, nCentroids = 16, nProbe = 2, m = 8,
          ksub = 16)
        .select(col("query_id"), col("cand_id"), col("adc"), col("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          r.getLong(3)))
        .toSet
    assert(run(1) === run(13))
  }
}
