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

  test("binSlices: slices tile every bin exactly, in order, and cover each doc") {
    val spans = pack(docs)
    val slices = Packing.binSlices(spans, "doc_id", seqLen = 128)
      .select("shard", "bin_id", "doc_id", "bin_off", "doc_off", "len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(slices.nonEmpty)
    // per (shard, bin): slices start at 0, abut, and fill to seqLen
    // (except the shard's last bin, which fills to the shard's total)
    val totals = spans.groupBy("shard").agg(
        sum("n_tokens").as("n"), max("last_bin").as("lb"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    slices.groupBy(s => (s._1, s._2)).foreach { case ((shard, bin), members) =>
      val ordered = members.sortBy(_._4)
      var expect = 0L
      ordered.foreach { case (_, _, _, off, _, len) =>
        assert(off === expect, s"shard $shard bin $bin slices don't abut")
        assert(len > 0)
        expect = off + len
      }
      val (total, lastBin) = totals(shard)
      val want = if (bin == lastBin) total - bin * 128 else 128L
      assert(expect === want, s"shard $shard bin $bin fill $expect != $want")
    }
    // per doc: slices cover [0, n_tokens) contiguously
    val nTok = spans.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    slices.groupBy(_._3).foreach { case (doc, members) =>
      val ordered = members.sortBy(_._5)
      var expect = 0L
      ordered.foreach { case (_, _, _, _, doff, len) =>
        assert(doff === expect, s"doc $doc slices don't cover contiguously")
        expect = doff + len
      }
      assert(expect === nTok(doc))
    }
  }

  test("layout is stable under repartitioning") {
    val a = pack(docs.repartition(2)).collect().map(_.toSeq).toSet
    val b = pack(docs.repartition(11, col("doc_id"))).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
