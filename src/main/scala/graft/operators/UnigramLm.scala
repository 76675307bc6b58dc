package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram language-model subword tokenizer (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — the SentencePiece /
  * Llama / T5 tokenizer family), completing the trained-tokenizer
  * trio next to BPE ([[Bpe]], q123) and WordPiece ([[WordPiece]],
  * q145).
  *
  * Training is hard-EM (Viterbi-EM): seed the vocabulary with the
  * most frequent substrings, then alternate (E) segment every word
  * by max-likelihood Viterbi under the current piece log-probs and
  * (M) re-estimate piece counts from the segmentations; finish with
  * a frequency prune to `vocabSize` (+ single-char coverage) and one
  * final Viterbi encode under the pruned vocabulary. (Full
  * SentencePiece marginalizes over all segmentations with
  * forward-backward; the hard-EM variant keeps every M-step count an
  * exact long, which is what makes the training replayable by the
  * DuckDB oracle — same trade [[WordPiece]] makes vs likelihood
  * training.)
  *
  * Scale shape (the [[Bpe]] trick): all EM work runs over the
  * Heaps'-law-bounded word HISTOGRAM — one corpus tokenize+count
  * shuffle, then seeding, every EM iteration, and the prune are
  * vocabulary-sized driver folds; the learned (piece, logp) table
  * broadcasts (KBs) and corpus encoding distributes as a
  * per-histogram-word Viterbi scan.
  *
  * Determinism / oracle parity (q159/q160):
  *  - M-step counts are exact longs; seed and prune cuts are ordered
  *    (cnt desc, piece asc) — total orders over [a-z]+ strings.
  *  - log-probs are the ONLY doubles: logp = round(ln(cnt/total), 7)
  *    per hard rule 9 (ln magnitudes ≤ ~20, so 7 dp sits ~1e9 above
  *    ulp noise); Viterbi scores then add identical rounded doubles
  *    in the identical DP order on both engines, so comparisons —
  *    and the chosen path — are bit-identical.
  *  - DP tie-break: higher score, then LONGER piece (at a fixed cell
  *    only one piece per length can match, so (score, len) is total).
  *  - `maxWordLen` is a TRAINER PARAMETER (SentencePiece's max word
  *    length), applied identically on both engines: longer words are
  *    excluded from the histogram — never a silent data-dependent
  *    bound (the q145-ADVICE class).
  */
object UnigramLm {

  /** Immutable training result: pieces with final exact counts and
    * the rounded log-probs the final encode used. */
  final case class Vocab(pieces: Array[(String, Long, Double)])

  private def round7(x: Double): Double =
    BigDecimal.valueOf(x).setScale(7, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  private def logProbs(counts: Seq[(String, Long)])
      : Map[String, Double] = {
    val total = counts.iterator.map(_._2).sum.toDouble
    counts.iterator
      .map { case (p, c) => p -> round7(math.log(c.toDouble / total)) }
      .toMap
  }

  /** Max-likelihood Viterbi segmentation of one word: DP left to
    * right, cell j = best (score, path) over pieces of length
    * 1..maxPieceLen ending at j; ties prefer the LONGER piece. Every
    * single char is in the vocab by construction, so every cell is
    * reachable. */
  private[graft] def viterbi(w: String, logp: Map[String, Double],
      maxPieceLen: Int): Array[String] = {
    val n = w.length
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(0)
    score(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val piece = w.substring(j - l, j)
        logp.get(piece) match {
          case Some(lp) =>
            val s = score(j - l) + lp
            // strict > keeps the earlier (larger-l) winner on ties,
            // so iterate l DESCENDING via the comparison below
            if (s > score(j) || (s == score(j) && l > back(j))) {
              score(j) = s; back(j) = l
            }
          case None => ()
        }
        l += 1
      }
      j += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += w.substring(pos - back(pos), pos); pos -= back(pos) }
    out.reverseIterator.toArray
  }

  /** Exact substring seed counts over the histogram: every substring
    * of length 1..maxPieceLen, weighted by word freq, one count per
    * OCCURRENCE. Returns top `seedSize` by (cnt desc, piece asc)
    * UNION all single chars (coverage). */
  private[graft] def seedCounts(hist: Array[(String, Long)],
      maxPieceLen: Int, seedSize: Int): Array[(String, Long)] = {
    val counts = mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, f) =>
      var pos = 0
      while (pos < w.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, w.length - pos)) {
          val p = w.substring(pos, pos + l)
          counts.update(p, counts.getOrElse(p, 0L) + f)
          l += 1
        }
        pos += 1
      }
    }
    val ordered = counts.toArray.sortBy { case (p, c) => (-c, p) }
    ordered.zipWithIndex
      .filter { case ((p, _), i) => i < seedSize || p.length == 1 }
      .map(_._1)
  }

  /** Driver-side hard-EM over the collected histogram. Returns the
    * PRUNED final vocab with counts and the logp table of the final
    * encode pass. */
  private[graft] def trainLocal(hist: Array[(String, Long)],
      maxPieceLen: Int, seedSize: Int, vocabSize: Int,
      iters: Int): Vocab = {
    var vocab: Array[(String, Long)] =
      seedCounts(hist, maxPieceLen, seedSize)
    var it = 1
    while (it <= iters) {
      val lp = logProbs(vocab.toSeq)
      val usage = mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, f) =>
        viterbi(w, lp, maxPieceLen).foreach { p =>
          usage.update(p, usage.getOrElse(p, 0L) + f)
        }
      }
      // M-step: pieces keep their Viterbi usage; unused multi-char
      // pieces drop out; single chars keep a count floor of 1 so
      // coverage never breaks (exact integers throughout)
      vocab = vocab.flatMap { case (p, _) =>
        val u = usage.getOrElse(p, 0L)
        if (p.length == 1) Some((p, math.max(u, 1L)))
        else if (u > 0L) Some((p, u))
        else None
      }
      it += 1
    }
    // frequency prune to vocabSize (+ single-char coverage), ordered
    // (cnt desc, piece asc)
    val pruned = vocab.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex
      .filter { case ((p, _), i) => i < vocabSize || p.length == 1 }
      .map(_._1)
    val lp = logProbs(pruned.toSeq)
    Vocab(pruned.map { case (p, c) => (p, c, lp(p)) })
  }

  private def histArray(histDf: DataFrame): Array[(String, Long)] = {
    val spark = histDf.sparkSession
    import spark.implicits._
    histDf.select(col("w"), col("freq")).as[(String, Long)].collect()
      .sortBy(_._1)
  }

  private def boundedHist(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    Bpe.wordHistogram(docs, textCol)
      .where(length(col("w")) <= maxWordLen)

  /** Train and emit the pruned vocabulary: (piece, cnt, logp) — cnt
    * the exact final-EM count, logp the rounded log-prob the final
    * encode uses. One corpus shuffle + one vocabulary-sized collect;
    * zero per-iteration jobs. */
  def trainVocab(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 5, seedSize: Int = 300, vocabSize: Int = 200,
      iters: Int = 3, maxWordLen: Int = 24): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = histArray(boundedHist(docs, textCol, maxWordLen))
    trainLocal(hist, maxPieceLen, seedSize, vocabSize, iters)
      .pieces.toSeq.toDF("piece", "cnt", "logp")
  }

  /** Tokenize the histogram with the trained vocab: one row per
    * distinct word — (w, freq, pieces space-joined, n_pieces). The
    * logp table broadcasts; encoding distributes as a per-word
    * Viterbi scan over the histogram. */
  def encodeHistogram(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 5, seedSize: Int = 300, vocabSize: Int = 200,
      iters: Int = 3, maxWordLen: Int = 24): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val histDf = boundedHist(docs, textCol, maxWordLen).localCheckpoint()
    val hist = histArray(histDf)
    val trained = trainLocal(hist, maxPieceLen, seedSize, vocabSize, iters)
    val lp: Map[String, Double] =
      trained.pieces.map { case (p, _, l) => p -> l }.toMap
    val bcLp = spark.sparkContext.broadcast(lp)
    val enc = udf((w: String) => viterbi(w, bcLp.value, maxPieceLen))
    val out = histDf
      .select(col("w"), col("freq"), enc(col("w")).as("ps"))
      .select(col("w"), col("freq"),
        array_join(col("ps"), " ").as("pieces"),
        size(col("ps")).cast("long").as("n_pieces"))
      .localCheckpoint()
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(histDf)
    out
  }
}
