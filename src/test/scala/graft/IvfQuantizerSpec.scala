package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The distributed IVF quantizer (`Similarity.quantizeDistributed`) —
  * the ~sqrt(n)-centroids path a 100 TB corpus needs where the bounded
  * driver sample stops being representative. Pins the two properties
  * that make it a usable routing table:
  *  1. bit-identical centroids under ANY partitioning (exact
  *     BigDecimal accumulation — the whole point of the construction);
  *  2. agreement with the driver-path `lloyd` quantizer on the same
  *     sample (approximate: the driver folds doubles in sample order,
  *     the distributed path rounds once on the exact sum), including
  *     end-to-end equal ivfTopK results on the test corpus.
  */
class IvfQuantizerSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  test("centroids are bit-identical across partition layouts") {
    val a = Similarity.quantizeDistributed(
      emb.repartition(3), "vec_id", "embedding", nCentroids = 8)
    val b = Similarity.quantizeDistributed(
      emb.repartition(13), "vec_id", "embedding", nCentroids = 8)
    assert(a.length === 8)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq,
      "exact accumulation must make the quantizer partitioning-independent")
  }

  test("deterministic sampling keeps the quantizer stable and seeded by id") {
    val full = Similarity.quantizeDistributed(
      emb, "vec_id", "embedding", nCentroids = 4, sampleOneIn = 1)
    val sampled = Similarity.quantizeDistributed(
      emb, "vec_id", "embedding", nCentroids = 4, sampleOneIn = 3)
    val sampledAgain = Similarity.quantizeDistributed(
      emb.repartition(7), "vec_id", "embedding", nCentroids = 4, sampleOneIn = 3)
    // the md5(id) sample is a fixed SET: same centroids however laid out
    assert(sampled.map(_.toSeq).toSeq === sampledAgain.map(_.toSeq).toSeq)
    // and a 1-in-3 sample still quantizes the same space (coarse check:
    // every full-path centroid has a sampled centroid nearby)
    full.foreach { c =>
      val d = sampled.map(s =>
        c.zip(s).map { case (x, y) => (x - y).toDouble * (x - y) }.sum).min
      assert(d < 1.0, s"sampled quantizer drifted too far: $d")
    }
  }

  test("matches the driver-path lloyd quantizer on the same sample") {
    val sample = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(2000)
      .collect().map(_.getAs[scala.collection.Seq[Float]](1).toArray)
    val driver = Similarity.lloyd(sample, nCentroids = 8, iters = 5)
    val dist = Similarity.quantizeDistributed(
      emb, "vec_id", "embedding", nCentroids = 8, iters = 5)
    // same seeding, same assignment rule; only the fold differs
    // (ordered double sums vs one rounding of the exact sum) — the
    // centroids must agree to float precision scaled by magnitude
    driver.zip(dist).zipWithIndex.foreach { case ((d, q), j) =>
      d.zip(q).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-4f * math.max(1f, math.abs(x)),
          s"centroid $j drifted: driver=$x distributed=$y")
      }
    }
    // end-to-end: the same ANN answers on the test corpus
    val queries = emb.where(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cand_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDriver = rows(Similarity.ivfTopKWithCentroids(
      queries, emb, "vec_id", "embedding", k = 5, driver, nProbe = 2))
    val viaDist = rows(Similarity.ivfTopKWithCentroids(
      queries, emb, "vec_id", "embedding", k = 5, dist, nProbe = 2))
    assert(viaDriver.nonEmpty)
    assert(viaDriver === viaDist)
  }
}
