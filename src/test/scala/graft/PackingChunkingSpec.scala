package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Conservation properties of the corpus→training-layout queries:
  * q153's pack-and-split must tile the concatenated token stream with
  * no gap or overlap, q154's chunker must cover every token with the
  * declared stride/size geometry. Runs the CATALOG entries themselves
  * on sf0.001 (the same frames the oracle gates). */
class PackingChunkingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("q153: windows tile the stream — spans are contiguous, straddle flag consistent") {
    val rows = SparkEntry.queries("q153_sequence_packing")(spark, sf0001)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_start", "seq_end", "straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val L = 512L
    var cum = 0L
    rows.foreach { case (id, n, s0, s1, straddles) =>
      assert(n > 0, s"doc $id")
      assert(s0 === cum / L, s"doc $id start window")
      assert(s1 === (cum + n - 1) / L, s"doc $id end window")
      assert(straddles === (s1 > s0), s"doc $id straddle flag")
      cum += n
    }
    // total windows = ceil(total tokens / L), every index in range hit
    assert(rows.map(_._4).max === (cum - 1) / L)
  }

  test("q154: chunks cover every token with stride-48/size-64 geometry") {
    val chunks = SparkEntry.queries("q154_chunking")(spark, sf0001)
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (doc, cs) =>
      // chunk_idx dense from 0
      assert(cs.map(_._2).toSeq === (0L until cs.length.toLong), s"doc $doc")
      // every chunk but the tail ones is exactly the full window or the
      // clamped remainder at stride positions: token count per chunk =
      // min(64, n - 48*idx), and the last chunk starts within the doc
      val n = 48L * (cs.length - 1) + cs.last._3
      cs.foreach { case (_, idx, ct) =>
        assert(ct === math.min(64L, n - 48L * idx), s"doc $doc chunk $idx")
      }
      assert(cs.last._3 >= 1 && cs.last._3 <= 64)
    }
  }
}
