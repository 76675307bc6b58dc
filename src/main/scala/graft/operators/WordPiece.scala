package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-style subword tokenizer (Wu et al., "Google's Neural
  * Machine Translation System", 2016 — the BERT encode algorithm):
  * greedy LONGEST-MATCH-FIRST segmentation of each word against a
  * vocabulary split into word-INITIAL pieces and `##`-marked
  * CONTINUATION pieces.
  *
  * This implementation builds the vocabulary by exact substring
  * frequency (the likelihood-trained variant needs EM; frequency keeps
  * every count an exact long, so DuckDB re-derives the identical vocab
  * and re-encodes the identical segmentation — the oracle story of
  * q145): the top `vocabSize` pieces of length 1..`maxPieceLen` at
  * word-initial positions, the top `vocabSize` at non-initial
  * positions, each UNIONed with every single character seen at that
  * position class so greedy matching always progresses (no UNK/
  * backtracking path — the coverage union makes longest-match total).
  *
  * Scale shape (the [[Bpe]] trick): all counting runs over the
  * Heaps'-law-bounded word HISTOGRAM, not the corpus — one
  * tokenize+count shuffle against 100 TB, then substring counting and
  * encoding are vocabulary-sized. The learned vocab (≤ 2·vocabSize +
  * alphabet pieces, KBs) broadcasts; encoding distributes as a
  * per-histogram-word greedy scan.
  *
  * Determinism: counts are exact longs; the top-`vocabSize` cut is
  * ordered (cnt desc, piece asc) over pure-[a-z] strings (binary
  * order agrees across engines); at a fixed position only ONE piece
  * of a given length can match (pieces are literal substrings), so
  * the longest match is unique and the segmentation is a pure
  * function of (word, vocab). */
object WordPiece {

  /** Learned vocabulary: (piece, kind, cnt), kind ∈ {init, cont} —
    * one row per kept piece, cnt = exact corpus occurrence count of
    * the substring at that position class. */
  def trainVocab(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 5, vocabSize: Int = 160): DataFrame =
    vocabFromHist(Bpe.wordHistogram(docs, textCol), maxPieceLen, vocabSize)

  private def vocabFromHist(hist: DataFrame, maxPieceLen: Int,
      vocabSize: Int): DataFrame = {
    // substrings at initial (pos=1) and non-initial (pos>=2) positions,
    // weighted by word frequency — lengths 1..maxPieceLen
    val lens = (1 to maxPieceLen).map(lit(_))
    val counts = hist
      .select(col("w"), col("freq"), explode(array(lens: _*)).as("l"))
      // guard BEFORE sequence(): Spark's sequence(1, 0) steps DOWN,
      // emitting bogus positions for words shorter than l
      .where(length(col("w")) >= col("l"))
      .select(col("w"), col("freq"), col("l"),
        explode(sequence(lit(1), length(col("w")) - col("l") + 1)).as("pos"))
      .select(expr("substr(w, pos, l)").as("p"),
        when(col("pos") === 1, lit("init")).otherwise(lit("cont")).as("kind"),
        col("freq"))
      .groupBy("p", "kind")
      .agg(sum("freq").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("kind").orderBy(col("cnt").desc, col("p"))
    counts
      .withColumn("rk", row_number().over(w))
      // coverage union: every single character stays regardless of rank
      .where(col("rk") <= vocabSize || length(col("p")) === 1)
      .select(col("p").as("piece"), col("kind"), col("cnt"))
  }

  /** Greedy longest-match segmentation of one word. The vocab maps
    * are position-class keyed; every single character of the word is
    * present in both classes by construction, so the scan always
    * advances. Continuation pieces emit with the `##` marker. */
  private[graft] def encodeWord(w: String, init: Set[String],
      cont: Set[String], maxLen: Int): Array[String] = {
    val out = Array.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val vocab = if (pos == 0) init else cont
      var l = math.min(maxLen, w.length - pos)
      while (l > 1 && !vocab.contains(w.substring(pos, pos + l))) l -= 1
      val piece = w.substring(pos, pos + l)
      out += (if (pos == 0) piece else "##" + piece)
      pos += l
    }
    out.result()
  }

  /** Tokenize the corpus with the learned vocab and emit the final
    * (token, cnt) table — cnt weighted by word frequency (the corpus
    * token histogram a tokenizer consumer sees). One histogram
    * shuffle + one token-count shuffle; the vocab broadcasts. */
  def encodeHistogram(docs: DataFrame, textCol: String,
      maxPieceLen: Int = 5, vocabSize: Int = 160): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val histDf = Bpe.wordHistogram(docs, textCol).localCheckpoint()
    val vocab = vocabFromHist(histDf, maxPieceLen, vocabSize)
      .select(col("piece"), col("kind")).as[(String, String)].collect()
    val init = vocab.collect { case (p, "init") => p }.toSet
    val cont = vocab.collect { case (p, "cont") => p }.toSet
    val bcI = spark.sparkContext.broadcast(init)
    val bcC = spark.sparkContext.broadcast(cont)
    val enc = udf((w: String) =>
      encodeWord(w, bcI.value, bcC.value, maxPieceLen))
    val out = histDf
      .select(col("freq"), explode(enc(col("w"))).as("token"))
      .groupBy("token").agg(sum("freq").as("cnt"))
      .localCheckpoint()
    histDf.unpersist()
    out
  }
}
