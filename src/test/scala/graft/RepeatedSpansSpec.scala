package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Repeated-span detection: exact span arithmetic on a corpus with
  * planted boilerplate (cross-doc, within-doc, adjacent-run merging,
  * and the k-1 tail). */
class RepeatedSpansSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("planted boilerplate yields exactly the expected spans (k=3)") {
    // docs 1 and 2 share the 5-token run "one two three four five"
    // (three overlapping 3-grams -> ONE merged span of 5 tokens);
    // doc 3 repeats "x y z" internally (two occurrences of the same
    // 3-gram in one doc both count); doc 4 is clean.
    val corpus = Seq(
      (1L, "a b one two three four five c d"),
      (2L, "p one two three four five q r s"),
      (3L, "x y z m n x y z k"),
      (4L, "u v w uu vv ww uuu vvv www")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1: tokens 3..7 hold the run -> 3-gram positions 3,4,5,
    //   span = [3, 5+2] = [3,7], 3 shingles
    // doc 2: positions 2,3,4 -> span [2,6], 3 shingles
    // doc 3: "x y z" at positions 1 and 6 -> two separate 1-shingle
    //   spans [1,3] and [6,8]
    assert(got === Set(
      (1L, 3L, 7L, 3L),
      (2L, 2L, 6L, 3L),
      (3L, 1L, 3L, 1L),
      (3L, 6L, 8L, 1L)))
  }

  test("islands are maximal: spans cover >= k tokens, shingle gaps >= 2") {
    val k = 4
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val rows = Dedup.repeatedSpans(docs, "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s, e) => assert(e - s + 1 >= k) }
    // distinct islands within a doc must be separated by >= 2 in
    // SHINGLE position space (shingleEnd = end_tok - k + 1) — a gap
    // of 1 would mean the islands merge was missed
    rows.groupBy(_._1).foreach { case (doc, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 - (e1 - k + 1) >= 2, s"doc $doc missed an island merge")
        case _ =>
      }
    }
  }
}
