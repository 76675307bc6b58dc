package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SemDeDup (cluster-then-prune semantic dedup): exact equality with a
  * driver-side brute-force reference on the real embeddings, the
  * keep-most-central invariant, and tau monotonicity. */
class SemDedupSpec extends AnyFunSuite with SparkTestBase {

  private lazy val vecs: Map[Long, Array[Float]] =
    graft.sources.Tables.load(spark, sf0001, "embeddings")
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toArray).toMap

  private lazy val centroids: Array[Array[Float]] =
    Similarity.quantizeDistributed(
      graft.sources.Tables.load(spark, sf0001, "embeddings"),
      "vec_id", "embedding", nCentroids = 16, iters = 3)

  /** Same double folds as FloatDotProduct: index order, floats widened
    * per element. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Reference: assignment by argmin (||c||²-2v·c, cell), then drop v
    * iff some u in the same cell with (cd, id) < (cd, id) has
    * cos(u,v) >= tau. */
  private def reference(tau: Double): Map[Long, (Int, Double, Boolean)] = {
    val assigned = vecs.map { case (id, v) =>
      val scored = centroids.zipWithIndex.map { case (c, j) =>
        (c.map(x => x.toDouble * x).sum - 2.0 * dot(v, c), j)
      }
      val (cd, cell) = scored.min
      id -> (cell, cd)
    }
    assigned.map { case (id, (cell, cd)) =>
      val nrm = math.sqrt(dot(vecs(id), vecs(id)))
      val droppedBy = assigned.exists { case (uid, (ucell, ucd)) =>
        ucell == cell && (ucd < cd || (ucd == cd && uid < id)) && {
          val un = math.sqrt(dot(vecs(uid), vecs(uid)))
          dot(vecs(uid), vecs(id)) / (un * nrm) >= tau
        }
      }
      id -> (cell, cd, !droppedBy)
    }
  }

  test("matches brute force exactly on real embeddings (tau=0.3)") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.semDedup(emb, "vec_id", "embedding", centroids, 0.3)
    val rows = got.collect()
      .map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getDouble(2), r.getBoolean(3)))
      .toMap
    got.unpersist()
    val want = reference(0.3)
    assert(rows.keySet === want.keySet)
    rows.foreach { case (id, (cell, cd, kept)) =>
      val (wc, wcd, wk) = want(id)
      assert(cell === wc, s"cell mismatch for $id")
      assert(cd === wcd, s"cd not bit-equal for $id: $cd vs $wcd")
      assert(kept === wk, s"kept mismatch for $id")
    }
    val dropped = rows.count(!_._2._3)
    assert(dropped > 0, "tau=0.3 should drop something on this corpus")
  }

  test("the most central vector of every cell is always kept") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.semDedup(emb, "vec_id", "embedding", centroids, 0.3)
    val best = got.collect()
      .groupBy(_.getLong(1))
      .map { case (_, rs) => rs.minBy(r => (r.getDouble(2), r.getLong(0))) }
    got.unpersist()
    best.foreach(r => assert(r.getBoolean(3),
      s"cell ${r.getLong(1)} exemplar ${r.getLong(0)} was dropped"))
  }

  test("raising tau never drops more") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val loose = Similarity.semDedup(emb, "vec_id", "embedding", centroids, 0.3)
    val strict = Similarity.semDedup(emb, "vec_id", "embedding", centroids, 0.45)
    val dLoose = loose.where(!col("kept")).collect().map(_.getLong(0)).toSet
    val dStrict = strict.where(!col("kept")).collect().map(_.getLong(0)).toSet
    loose.unpersist(); strict.unpersist()
    assert(dStrict.subsetOf(dLoose))
    assert(dStrict.size < dLoose.size)
  }
}
