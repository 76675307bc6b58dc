package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.BloomMightContain
import graft.operators.Dedup

/** Sharded Bloom filter — the beyond-single-filter regime: per-shard
  * arrays stay under the cap, membership never false-negatives across
  * shard routing, and the sharded decontamination is bit-equal to the
  * exact broadcast-join operator. */
class BloomShardedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("per-shard arrays respect the cap; no inserted hash is lost across shards") {
    val rnd = new scala.util.Random(42)
    val hashes = Array.fill(20000)(rnd.nextLong())
    val rdd = spark.sparkContext.parallelize(hashes.toSeq, 7)
    // cap tiny so sharding is the only way to keep nominal fpp
    val cap = 1L << 14
    val (df, numHashes) = BloomMightContain.buildShardedDf(
      rdd, hashes.length.toLong, shards = 8, maxBits = cap)
    val shardsMap = df.collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    assert(shardsMap.keySet === (0 until 8).toSet)
    shardsMap.values.foreach(bits =>
      assert(bits.length * 64 <= cap, s"shard over cap: ${bits.length * 64}"))
    hashes.foreach { h =>
      val bits = shardsMap(BloomMightContain.shardOf(h, 8))
      assert(BloomMightContain.contains(bits, numHashes, h),
        s"false negative for $h")
    }
  }

  test("sharded decontamination is bit-equal to the exact operator on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val train = docs.where(pmod(col("doc_id"), lit(97L)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(97L)) === 0)
    val exact = Dedup.decontaminate(train, eval, "doc_id", "text", k = 4)
    val sharded = Dedup.decontaminateBloomSharded(
      train, eval, "doc_id", "text", k = 4, shards = 8)
    assert(sharded.count() === exact.count())
    assert(sharded.except(exact).count() === 0)
    assert(exact.except(sharded).count() === 0)
  }

  test("shards = 1 degenerates to the single-filter routing") {
    val hashes = (1L to 500L).map(_ * 0x9e3779b97f4a7c15L)
    hashes.foreach(h => assert(BloomMightContain.shardOf(h, 1) === 0))
    val rdd = spark.sparkContext.parallelize(hashes, 3)
    val (df, k1) = BloomMightContain.buildShardedDf(rdd, 500L, shards = 1)
    val (bits, k2) = BloomMightContain.buildDistributed(rdd, 500L)
    assert(k1 === k2)
    val row = df.collect().head
    assert(row.getSeq[Long](1).toArray === bits)
  }
}
