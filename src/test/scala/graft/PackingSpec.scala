package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Packing

/** Concat-and-chunk sequence packing: spans tile each shard exactly
  * (contiguous, non-overlapping, zero-based), bins are the integer
  * cuts of those spans, and the whole layout is stable under
  * repartitioning — the property a reproducible training run needs. */
class PackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.load(spark, sf0001, "documents")

  private def pack(df: org.apache.spark.sql.DataFrame) =
    Packing.concatChunk(df, "doc_id", TextFunctions.tokenCount(col("text")),
      seqLen = 128, shards = 4, salt = "p")

  test("spans tile each shard contiguously; bins are the seqLen cuts") {
    val rows = pack(docs)
      .select("doc_id", "n_tokens", "shard", "tok_start", "first_bin", "last_bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._3).foreach { case (shard, members) =>
      val ordered = members.sortBy(_._1)
      // exclusive running sum == previous end, starting at zero
      var expectStart = 0L
      ordered.foreach { case (id, n, _, start, fb, lb) =>
        assert(start === expectStart, s"shard $shard doc $id span not contiguous")
        assert(fb === start / 128 && lb === (start + n - 1) / 128,
          s"shard $shard doc $id bins off")
        assert(n > 0)
        expectStart = start + n
      }
    }
    // a straddling doc exists at this seqLen (sanity that bins matter)
    assert(rows.exists { case (_, _, _, _, fb, lb) => lb > fb })
  }

  test("layout is stable under repartitioning") {
    val a = pack(docs.repartition(2)).collect().map(_.toSeq).toSet
    val b = pack(docs.repartition(11, col("doc_id"))).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
