package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.WordPiece

/** WordPiece greedy longest-match: segmentation correctness,
  * coverage (never fails, round-trips), and partitioning-independent
  * vocab + histogram. */
class WordPieceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("greedy longest-match prefers the longest piece and marks continuations") {
    val init = Set("un", "u", "n", "r", "e", "l", "a", "t", "d", "unre")
    val cont = Set("lat", "l", "a", "t", "e", "d", "ed", "n", "r", "u")
    assert(WordPiece.encodeWord("unrelated", init, cont, 5).toSeq ===
      Seq("unre", "##lat", "##ed"))
    // at a fixed position only one piece per length can match, so the
    // longest match is unique; a 1-char fallback always exists
    assert(WordPiece.encodeWord("u", init, cont, 5).toSeq === Seq("u"))
  }

  test("coverage: every corpus word encodes, and pieces concatenate back to the word") {
    val docs = Seq("the quick brown fox", "jumped over the lazy dog",
      "pack my box with five dozen jugs").toDF("text")
    val hist = graft.operators.Bpe.wordHistogram(docs, "text")
      .as[(String, Long)].collect().toMap
    val vocab = WordPiece.trainVocab(docs, "text", maxPieceLen = 4,
      vocabSize = 10)
      .select(col("piece"), col("kind")).as[(String, String)].collect()
    val init = vocab.collect { case (p, "init") => p }.toSet
    val cont = vocab.collect { case (p, "cont") => p }.toSet
    hist.keys.foreach { w =>
      val pieces = WordPiece.encodeWord(w, init, cont, 4)
      assert(pieces.nonEmpty)
      assert(pieces.head.take(2) != "##")
      assert(pieces.tail.forall(_.startsWith("##")))
      assert(pieces.head + pieces.tail.map(_.drop(2)).mkString === w)
    }
  }

  test("token histogram is identical under any partitioning and counts are exact") {
    val docs = Seq.tabulate(40)(i => s"alpha beta gamma delta tok$i alpha beta")
      .toDF("text")
    def run(parts: Int): Map[String, Long] =
      WordPiece.encodeHistogram(docs.repartition(parts), "text")
        .as[(String, Long)].collect().toMap
    val a = run(1); val b = run(7)
    assert(a === b)
    // conservation: segmentation covers every character exactly once,
    // so Σ cnt·len(piece) equals the total word characters in the corpus
    val encodedChars = a.map { case (tok, cnt) =>
      cnt * (if (tok.startsWith("##")) tok.length - 2 else tok.length)
    }.sum
    val corpusChars = graft.operators.Bpe.wordHistogram(docs, "text")
      .select(sum(length(col("w")) * col("freq"))).as[Long].head()
    assert(encodedChars === corpusChars)
  }
}
