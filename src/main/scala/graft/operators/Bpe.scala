package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016 — the GPT-2 training recipe): learn the top-k merge rules from
  * a corpus by repeatedly merging the most frequent adjacent symbol
  * pair.
  *
  * The scale trick is the WORD HISTOGRAM: pair counts over 100 TB of
  * text equal pair counts over the (word, freq) table, which is
  * vocabulary-sized (Heaps' law: ~1e6–1e7 distinct words for 1e11
  * tokens), so after ONE corpus-sized tokenize+count shuffle every
  * merge iteration runs over the small histogram — explode adjacent
  * pairs, two-phase sum, take the 1-row argmax, rewrite symbol
  * strings with an expression fold. Nothing after the first shuffle
  * is corpus-sized.
  *
  * Determinism / oracle parity (q123): counts are exact longs; the
  * argmax tiebreak is (count desc, left asc, right asc); merge
  * application is a GREEDY LEFT-TO-RIGHT fold — expressed as the same
  * string-accumulator `aggregate`/`list_reduce` lambda on both
  * engines, so DuckDB replays training exactly
  * ([[graft.SparkEntry]]'s generated k-block SQL shares these
  * constants). A merged token never re-merges within the same pass
  * (the acc-tail check sees the merged symbol), exactly the reference
  * BPE semantics: in "aaa", merging (a,a) yields "aa"+"a", and only a
  * LATER (aa,a) rule could join them.
  *
  * Symbols never contain [[SEP]] (words are [a-z]+ by construction),
  * so the separator-string accumulator is unambiguous.
  *
  * Reference capability anchor: marketdb has no text pipeline; this
  * extends the training-data operator family (SURVEY.md §2-adjacent,
  * like Dedup/Packing).
  */
object Bpe {

  /** Symbol separator inside symbol strings and the fold accumulator —
    * a control char that cannot appear in a [a-z]+ word (DuckDB twin:
    * chr(1)). */
  val SEP = "\u0001"

  /** (word, freq) histogram over lowercased [a-z]+ words — the one
    * corpus-sized pass. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of one merge (l, r) to a
    * SEP-joined symbol string, as a fold both engines express
    * identically: acc starts empty; append SEP+x, unless the acc tail
    * is SEP+l and x = r, in which case the tail becomes SEP+l+r. */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column = {
    val sepL = SEP + l
    val n = sepL.length
    aggregate(
      split(syms, SEP), lit(""),
      (acc, x) =>
        when(
          acc.substr(lit(-n), lit(n)) === lit(sepL) && (x === lit(r)),
          concat(acc.substr(lit(1), length(acc) - lit(n)), lit(sepL + r)))
          .otherwise(concat(acc, lit(SEP), x)))
      // drop the leading SEP the fold prefixes to the first symbol
      .substr(lit(2), lit(Int.MaxValue))
  }

  /** Train `k` merges; returns (it, left, right, cnt) — one row per
    * learned rule, it = 1-based iteration. The driver holds only the
    * k argmax rows; each iteration localCheckpoints the histogram so
    * the fold lineage does not stack k deep (and the k-th iteration
    * does not recompute folds 1..k-1). */
  def trainMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    var words = wordHistogram(docs, textCol)
      .withColumn("syms", array_join(split(col("w"), ""), SEP))
      .select("freq", "syms")
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (it <- 1 to k) {
      // project the split ONCE, then index it — a lambda that captures
      // the split expression would re-split per element (CLAUDE.md)
      val best = words
        .withColumn("ls", split(col("syms"), SEP))
        .where(size(col("ls")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(ls) - 2), " +
            "j -> struct(ls[j] AS l, ls[j + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(best.nonEmpty, s"corpus exhausted at iteration $it")
      val (l, r, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((it, l, r, cnt))
      words = words
        .withColumn("syms", applyMerge(col("syms"), l, r))
        .localCheckpoint()
    }
    import spark.implicits._
    merges.toSeq.toDF("it", "left", "right", "cnt")
      .withColumn("it", col("it").cast("long"))
  }

  /** Tokenize the corpus with the learned rules: train `k` merges,
    * apply them in order to the word histogram, and emit the final
    * (token, cnt) table — cnt weighted by word frequency, i.e. the
    * corpus token histogram a tokenizer consumer sees. Same
    * per-iteration cost shape as [[trainMerges]] (everything after
    * the histogram shuffle is vocabulary-sized). */
  def encodeHistogram(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = trainMerges(docs, textCol, k)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    val words = wordHistogram(docs, textCol)
      .withColumn("syms", array_join(split(col("w"), ""), SEP))
    val encoded = rules.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("syms", applyMerge(col("syms"), l, r))
    }
    encoded
      .select(col("freq"), explode(split(col("syms"), SEP)).as("token"))
      .groupBy("token").agg(sum("freq").as("cnt"))
  }
}
