package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramLm

/** Bigram-LM perplexity scoring (q205's operator): hand-checked
  * probabilities on a tiny corpus, ordinal behavior (repetitive text
  * scores lower nll than unseen-bigram text), and
  * partitioning-independence of the rounded scores. */
class NgramLmSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the cat sat"),
    (4L, "dog dog dog")).toDF("doc_id", "text")

  test("bigram stream prepends the BOS context exactly once per doc") {
    val bg = NgramLm.bigrams(corpus, "doc_id", "text")
      .where($"doc_id" === 1L).orderBy("cur")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(bg.toSet === Set(
      (NgramLm.Bos, "the"), ("the", "cat"), ("cat", "sat")))
  }

  test("scores match hand-computed add-one probabilities") {
    // corpus bigrams: (<S>,the)x3 (<S>,dog) (the,cat)x3 (cat,sat)x2
    // (cat,ran) (dog,dog)x2; V = |{the,dog,cat,sat,ran}| = 5
    assert(NgramLm.vocabSize(corpus, "doc_id", "text") === 5L)
    val got = NgramLm.score(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // doc 1: ln(9/4) + ln(8/4) + ln(8/3), avg over 3
    val d1 = (math.log(9.0 / 4) + math.log(8.0 / 4) + math.log(8.0 / 3)) / 3
    // doc 4: ln(9/2) + 2*ln(7/3), avg over 3
    val d4 = (math.log(9.0 / 2) + 2 * math.log(7.0 / 3)) / 3
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6, s"${got(1L)._2} vs $d1")
    assert(math.abs(got(4L)._2 - d4) < 1e-6, s"${got(4L)._2} vs $d4")
  }

  test("high-frequency text scores lower nll than a rare continuation") {
    val got = NgramLm.score(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 2 ends in the once-seen (cat,ran); docs 1/3 use (cat,sat)x2
    assert(got(2L) > got(1L), s"rare ${got(2L)} !> common ${got(1L)}")
    assert(got(1L) === got(3L), "identical docs must tie exactly")
  }

  test("rounded scores are independent of input partitioning") {
    val one = NgramLm.score(corpus.coalesce(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val many = NgramLm.score(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(one === many)
  }

  test("empty documents drop (no bigrams, no score rows)") {
    val withEmpty = corpus.union(Seq((9L, "")).toDF("doc_id", "text"))
    val ids = NgramLm.score(withEmpty, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 4L))
  }
}
