package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Cosine top-k: exact answers on crafted vectors; LSH variant puts
  * identical vectors in one bucket. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)) // opposite of 0
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by exact cosine") {
    val topk = Similarity.cosineTopK(
        vecs.where($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(topk.map(_.getAs[Long]("cand_id")).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(topk(0).getAs[Double]("cosine") - 0.9 / math.sqrt(0.82)) < 1e-9)
    assert(topk(1).getAs[Double]("cosine") === 0.0)
    assert(topk(2).getAs[Double]("cosine") === -1.0)
  }

  test("cosine near-dup pairs find planted duplicate vectors") {
    val dups = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.001f, 0.0f, 0.0f)), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(dups, "vec_id", "embedding",
        threshold = 0.99, nBits = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("ivf topk recalls exact neighbors on real embeddings") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 3, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    // probing half the cells must recover most exact neighbors
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    // determinism: second run identical
    val ivf2 = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 3, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    assert(ivf === ivf2)
  }

  test("pq adc recalls exact L2 neighbors; trained codebooks cut quantization error") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.where($"vec_id" < 5)
    // exact L2 top-k baseline: d2 = ||c||^2 - 2 q.c (+ const ||q||^2)
    val exact = {
      import org.apache.spark.sql.functions._
      val q = queries.select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = emb.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
      val d2 = graft.expressions.FloatDotProduct(col("cv"), col("cv")) -
        lit(2.0) * graft.expressions.FloatDotProduct(col("qv"), col("cv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy(d2.asc, $"cand_id")
      c.join(broadcast(q), $"query_id" =!= $"cand_id")
        .withColumn("rank", row_number().over(w)).where($"rank" <= 5)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    }
    // pure ADC is deliberately lossy on unstructured vectors — the
    // refined path (ADC shortlist -> exact re-rank) is the accuracy
    // contract: shortlisting the top 10% by codes must recover most
    // exact neighbors
    val pq = Similarity.pqTopKRefined(queries, emb, "vec_id", "embedding",
        k = 5, shortlist = 50, m = 8, ksub = 16, iters = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"refined PQ recall too low: $recall")
    // determinism: second run identical
    val pq2 = Similarity.pqTopKRefined(queries, emb, "vec_id", "embedding",
        k = 5, shortlist = 50, m = 8, ksub = 16, iters = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    assert(pq === pq2)
    // Lloyd training reduces sample quantization error vs the raw seed
    def sampleError(cbs: Array[Array[Array[Float]]]): Double = {
      val sample = emb.orderBy($"vec_id").limit(200)
        .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      val d = cbs.head.head.length
      sample.map { v =>
        cbs.zipWithIndex.map { case (cb, j) =>
          val sub = v.slice(j * d, (j + 1) * d)
          cb.map { c =>
            sub.zip(c).map { case (a, b) => (a.toDouble - b) * (a - b) }.sum
          }.min
        }.sum
      }.sum
    }
    val seed = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 0)
    val trained = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 3)
    assert(sampleError(trained) < sampleError(seed),
      "training did not reduce quantization error")
  }

  test("cosineScreen equals the symmetric near-dup restricted to cross pairs") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    def toSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sym = toSet(Similarity
      .cosineNearDupPairs(emb, "vec_id", "embedding", 0.3, nBits = 4, dim = 64)
      .where(col("id_a") < 400 && col("id_b") >= 400))
    val scr = toSet(Similarity.cosineScreen(
      emb.where(col("vec_id") < 400), emb.where(col("vec_id") >= 400),
      "vec_id", "embedding", 0.3, nBits = 4, dim = 64))
    assert(sym.nonEmpty, "fixture should contain cross-side near-dups")
    assert(scr === sym)
  }

  test("ann lsh co-buckets identical vectors and finds them") {
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val ann = Similarity.annTopK(dup, vecs.union(dup.toDF("vec_id", "embedding")),
      "vec_id", "embedding", k = 2, nBits = 2, dim = 4)
    val cands = ann.collect().map(_.getAs[Long]("cand_id"))
    assert(cands.contains(0L), "identical vector must share the LSH bucket")
  }
}
