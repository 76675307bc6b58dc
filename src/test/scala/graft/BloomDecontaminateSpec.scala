package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.BloomMightContain
import graft.operators.Dedup

/** Bloom-prefiltered decontamination: bit-equal to the broadcast-join
  * operator (false positives die in the exact join), and the filter
  * itself never false-negatives an inserted hash. */
class BloomDecontaminateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bloom never false-negatives; fpp stays near nominal") {
    val rnd = new scala.util.Random(1234)
    val inserted = Array.fill(5000)(rnd.nextLong())
    val (bits, numHashes) =
      BloomMightContain.build(inserted.iterator, inserted.length.toLong)
    inserted.foreach(h =>
      assert(BloomMightContain.contains(bits, numHashes, h),
        s"false negative for $h"))
    val probes = Array.fill(100000)(rnd.nextLong())
      .filterNot(inserted.contains)
    val fp = probes.count(BloomMightContain.contains(bits, numHashes, _))
    // 16 bits/item → nominal fpp ≈ 4e-4; allow an order of magnitude
    assert(fp.toDouble / probes.length < 4e-3, s"fpp too high: $fp")
  }

  test("distributed build is bit-identical to sequential under any partitioning") {
    val rnd = new scala.util.Random(77)
    val hashes = Array.fill(20000)(rnd.nextLong())
    val distinct = hashes.distinct
    val (seqBits, seqK) =
      BloomMightContain.build(distinct.iterator, distinct.length.toLong)
    for (parts <- Seq(1, 3, 32)) {
      // duplicates included, shuffled order — insert is idempotent, OR commutes
      val shuffled = rnd.shuffle((hashes ++ hashes.take(5000)).toSeq)
      val rdd = spark.sparkContext.parallelize(shuffled, parts)
      val (distBits, distK) =
        BloomMightContain.buildDistributed(rdd, distinct.length.toLong)
      assert(distK === seqK)
      assert(java.util.Arrays.equals(distBits, seqBits), s"parts=$parts")
    }
  }

  test("matches the broadcast-join decontamination on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val train = docs.where(pmod(col("doc_id"), lit(97L)) =!= 0)
    val eval = docs.where(pmod(col("doc_id"), lit(97L)) === 0)
    val exact = Dedup.decontaminate(train, eval, "doc_id", "text", k = 4)
    val bloom = Dedup.decontaminateBloom(train, eval, "doc_id", "text", k = 4)
    assert(bloom.count() === exact.count())
    assert(bloom.except(exact).count() === 0)
    assert(exact.except(bloom).count() === 0)
  }

  test("expression survives codegen and interpreted paths identically") {
    val hashes = (1L to 64L).map(_ * 0x9e3779b97f4a7c15L).toArray
    val (bits, numHashes) = BloomMightContain.build(hashes.iterator, 64L)
    val df = hashes.toSeq.toDF("h")
      .select(col("h"), BloomMightContain(col("h"), bits, numHashes).as("in"))
    assert(df.where(!col("in")).count() === 0)
  }
}
