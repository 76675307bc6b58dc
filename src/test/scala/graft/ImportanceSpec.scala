package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Importance

/** DSIR importance weights: target-similar documents must score above
  * target-dissimilar ones, the selection contract holds per shard, and
  * the weights are a pure function of content (partitioning-stable). */
class ImportanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // raw corpus: half "physics-flavored" (target-like), half "cooking";
  // the target sample is pure physics vocabulary
  private val physics = Seq(
    "quantum field theory predicts particle scattering",
    "the electron wave function collapses on measurement",
    "gauge symmetry constrains the particle interactions",
    "entangled states violate the bell inequality")
  private val cooking = Seq(
    "simmer the onions in butter until golden",
    "fold the egg whites into the batter gently",
    "season the roast with rosemary and garlic",
    "whisk the cream until soft peaks form")
  private val raw = (physics.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
    cooking.zipWithIndex.map { case (t, i) => (100L + i, t) }).toDF("doc_id", "text")
  // the target sample IS domain text (DSIR's setting: a handful of
  // Wikipedia-quality docs) — here literal physics phrasing, so the
  // physics half of the raw corpus shares bigram mass with it
  private val target = Seq(
    (1000L, "quantum field theory predicts the electron wave function"),
    (1001L, "gauge symmetry constrains entangled states on measurement"))
    .toDF("doc_id", "text")

  test("target-like documents outscore dissimilar ones") {
    val out = Importance.dsirWeights(raw, target, "doc_id", "text",
      nBuckets = 64, keepOneIn = 2, nShards = 1)
    val w = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.unpersist()
    val physW = physics.indices.map(i => w(i.toLong))
    val cookW = cooking.indices.map(i => w(100L + i))
    // hashed bag-of-bigrams is a noisy per-doc signal (collisions, one
    // low-overlap doc) — the model contract is separation in the MEAN
    val physMean = physW.sum / physW.size
    val cookMean = cookW.sum / cookW.size
    assert(physMean > cookMean + 0.5,
      s"physics docs must outscore cooking docs on average: $physW vs $cookW")
    // and the single best-scored doc is from the target domain
    assert(physW.max > cookW.max, s"top doc not target-like: $physW vs $cookW")
  }

  test("selection keeps the top 1/keepOneIn of each shard by rank") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val out = Importance.dsirWeights(
      docs.where(pmod(col("doc_id"), lit(13L)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(13L)) === 0),
      "doc_id", "text")
    val rows = out.collect()
    out.unpersist()
    rows.groupBy(_.getLong(3)).foreach { case (shard, rs) =>
      val n = rs.length
      assert(rs.forall(_.getLong(5) == n), s"shard_n wrong in shard $shard")
      val sel = rs.filter(_.getBoolean(6)).map(_.getLong(4))
      assert(sel.length === n / 4, s"shard $shard selected ${sel.length} of $n")
      if (sel.nonEmpty) assert(sel.max === sel.length.toLong,
        s"selection must be a rank prefix in shard $shard")
    }
    // and ranks follow (weight desc, doc_id)
    rows.groupBy(_.getLong(3)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      assert(sorted.map(_.getLong(4)).toSeq === (1L to rs.length).toSeq)
    }
  }

  test("ccnet: target-like documents get lower perplexity") {
    val out = Importance.ccnetPerplexity(raw, target, "doc_id", "text",
      nBuckets = 64, nShards = 1)
    val p = out.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val physP = physics.indices.map(i => p(i.toLong))
    val cookP = cooking.indices.map(i => p(100L + i))
    // lower log-perplexity = better fit to the target LM
    assert(physP.sum / physP.size < cookP.sum / cookP.size,
      s"physics docs must have lower mean log_ppl: $physP vs $cookP")
    assert(physP.min < cookP.min, s"best-fit doc not target-like: $physP vs $cookP")
  }

  test("ccnet: terciles are contiguous rank bands with integer-floor sizes") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val out = Importance.ccnetPerplexity(
      docs.where(pmod(col("doc_id"), lit(13L)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(13L)) === 0),
      "doc_id", "text")
    val rows = out.select("shard", "shard_rank", "shard_n", "tercile", "band")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val n = rs.head.getLong(2)
      assert(rs.length.toLong == n, s"shard_n wrong in shard $shard")
      rs.foreach { r =>
        val expected = (r.getLong(1) - 1) * 3 / n + 1
        assert(r.getLong(3) == expected, s"tercile wrong in shard $shard: $r")
        val band = Seq("head", "middle", "tail")(expected.toInt - 1)
        assert(r.getString(4) == band, s"band wrong in shard $shard: $r")
      }
      // contiguity: max rank of tercile t < min rank of tercile t+1
      val byT = rs.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(1)))
      byT.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(byT(a).max < byT(b).min)
        case _ =>
      }
    }
  }

  test("ccnet: scores and bands are stable under repartitioning") {
    val a = Importance.ccnetPerplexity(raw, target, "doc_id", "text",
      nBuckets = 64, nShards = 2)
    val b = Importance.ccnetPerplexity(raw.repartition(7), target.repartition(3),
      "doc_id", "text", nBuckets = 64, nShards = 2)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(8))).toMap
    assert(m(a) === m(b))
  }

  test("weights are stable under repartitioning") {
    val a = Importance.dsirWeights(raw, target, "doc_id", "text",
      nBuckets = 64, nShards = 2)
    val b = Importance.dsirWeights(raw.repartition(7), target.repartition(3),
      "doc_id", "text", nBuckets = 64, nShards = 2)
    val ma = a.collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(6))).toMap
    val mb = b.collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(6))).toMap
    a.unpersist(); b.unpersist()
    assert(ma === mb)
  }
}
