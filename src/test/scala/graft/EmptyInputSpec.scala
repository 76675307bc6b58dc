package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Empty-input edge cases: every operator must return an empty (or
  * correctly-null-extended) result, not throw — the degenerate scans
  * the reference's range-scan path also serves (empty day, unknown
  * series). */
class EmptyInputSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("dedup family on an empty corpus") {
    assert(Dedup.exactGroups(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashBuckets(noDocs, "doc_id", "text", 2, 2, 1).count() === 0)
    assert(Dedup.simhash(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDup(noDocs, "doc_id", "text", 1).count() === 0)
    assert(Dedup.simhash64(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDup64(noDocs, "doc_id", "text", 3).count() === 0)
    assert(Dedup.jaccardPairs(noDocs, "doc_id", "text", 2, 0.5).count() === 0)
    assert(Dedup.minhashJaccardEstimate(noDocs, "doc_id", "text", 2, 16, 4)
      .count() === 0)
  }

  test("ANN on an empty candidate set") {
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Seq((1L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.annTopKMultiProbe(q, noVecs, "vec_id", "embedding",
      k = 5, nBits = 4, dim = 4, nProbe = 3).count() === 0)
    assert(Similarity.cosineTopK(noVecs, q, "vec_id", "embedding", 5)
      .count() === 0)
  }

  test("as-of join with an empty right side null-extends every left row") {
    val left = Seq((1L, "A", ts(10))).toDF("id", "k", "t")
    val right = Seq.empty[(String, Timestamp, Double)].toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      Seq("v" -> "last_v")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("last_v")))
  }

  test("range join with empty sides yields empty") {
    val points = Seq(("A", 5L)).toDF("k", "t")
    val noIntervals = Seq.empty[(String, Long, Long)].toDF("k", "s", "e")
    assert(RangeJoin.pointInInterval(points, noIntervals,
      Seq("k"), "t", "s", "e", 10L).count() === 0)
    val noPoints = Seq.empty[(String, Long)].toDF("k", "t")
    val intervals = Seq(("A", 0L, 10L)).toDF("k", "s", "e")
    assert(RangeJoin.pointInInterval(noPoints, intervals,
      Seq("k"), "t", "s", "e", 10L).count() === 0)
  }

  test("dictionary and skew join with empty inputs") {
    val noNames = Seq.empty[String].toDF("name")
    assert(UidDictionary.build(noNames, "name").count() === 0)
    val big = Seq((1L, "k", 1.0)).toDF("id", "key", "v")
    val noSmall = Seq.empty[(String, Double)].toDF("key", "w")
    assert(SkewJoin.salted(big, noSmall, Seq("key"), col("id"), 4).count() === 0)
  }

  test("ordered merge and series scan of empty streams") {
    val empty = Seq.empty[(Long, Timestamp)].toDF("id", "time")
    assert(OrderedMerge.merge("time", empty, empty).count() === 0)
    assert(OrderedMerge.inversions(empty, "time") === 0)
    val scanned = SeriesScan.scan(empty, Map("id" -> 1L), "time",
      ts(0), ts(100))
    assert(scanned.count() === 0)
  }
}
