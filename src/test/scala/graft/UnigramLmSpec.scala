package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

/** Unigram-LM tokenizer (q159/q160): encode round-trip, Viterbi
  * optimality against brute force, and partitioning-independence of
  * the trained vocab. */
class UnigramLmSpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    // richer than the catalog corpus: repeated stems force multi-char
    // pieces to win EM mass; rare words exercise char fallback
    val base = Seq(
      "the market data pipeline streams market trades",
      "the trade stream markets the data",
      "pipelines stream trading data to the market",
      "zzyzx qwfp the the the market market data",
      "internationalization of market data pipelines")
    (base ++ base ++ base).toDF("text")
  }

  test("encode round-trip: concatenated pieces rebuild every word exactly") {
    val s = spark
    import s.implicits._
    val enc = UnigramLm.encodeHistogram(docs, "text")
    val bad = enc
      .where(regexp_replace(col("pieces"), " ", "") =!= col("w"))
      .count()
    assert(bad === 0L, "some word did not round-trip through its pieces")
    // n_pieces agrees with the piece list
    val badN = enc.where(size(split(col("pieces"), " ")).cast("long")
      =!= col("n_pieces")).count()
    assert(badN === 0L)
  }

  test("every emitted piece is in the trained vocab") {
    val s = spark
    import s.implicits._
    val vocab = UnigramLm.trainVocab(docs, "text")
      .select("piece").as[String].collect().toSet
    val pieces = UnigramLm.encodeHistogram(docs, "text")
      .select(explode(split(col("pieces"), " ")).as("p"))
      .as[String].collect()
    assert(pieces.forall(vocab.contains),
      s"pieces outside vocab: ${pieces.filterNot(vocab.contains).distinct.take(5).mkString(",")}")
  }

  test("Viterbi matches brute-force max-likelihood segmentation (tie: longer first piece)") {
    // tiny vocab, hand-checkable
    val logp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -2.0, "ba" -> -5.0,
      "aba" -> -4.5)
    def brute(w: String): Seq[Seq[String]] = {
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(5, w.length)).flatMap { l =>
        val p = w.take(l)
        if (logp.contains(p)) brute(w.drop(l)).map(p +: _) else Seq.empty
      }
    }
    for (w <- Seq("ab", "aba", "abab", "bab", "aabba")) {
      val got = UnigramLm.viterbi(w, logp, 5).toSeq
      val best = brute(w)
        .map(seg => (seg.map(logp).sum, seg))
        .maxBy(_._1)._1
      val gotScore = got.map(logp).sum
      assert(math.abs(gotScore - best) < 1e-12,
        s"$w: viterbi $got (score $gotScore) vs brute best $best")
    }
    // explicit tie-break check: "ab" as one piece (-2.0) beats a+b (-6.0)
    assert(UnigramLm.viterbi("ab", logp, 5).toSeq === Seq("ab"))
  }

  test("trained vocab is a pure function of the corpus (partitioning-independent)") {
    val one = UnigramLm.trainVocab(docs.repartition(1), "text")
      .orderBy("piece").collect().toSeq
    val many = UnigramLm.trainVocab(docs.repartition(7), "text")
      .orderBy("piece").collect().toSeq
    assert(one === many)
  }

  test("words longer than maxWordLen are excluded by the trainer parameter, not silently") {
    val s = spark
    import s.implicits._
    val longWord = "a" * 30
    val d = Seq(s"short words here $longWord").toDF("text")
    val enc = UnigramLm.encodeHistogram(d, "text")
    assert(enc.where(col("w") === longWord).count() === 0L)
    assert(enc.where(col("w") === "short").count() === 1L)
  }
}
