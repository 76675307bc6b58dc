package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Broadcast-MODEL inference over the corpus — the quality-classifier
  * shape of a fastText/logistic filter (Joulin et al. 2016's linear
  * model; the filtering role is CCNet/Gopher-adjacent, next to
  * `Importance`): the trained weights travel as PLAN LITERALS (a
  * model is KBs; broadcasting it is free at any corpus size) and
  * scoring is one zero-shuffle codegen projection per document — the
  * 100 TB inference shape, no model server, no UDF.
  *
  * Determinism / oracle parity (q139): every feature is exact
  * arithmetic (integer counts, exact-input double ratios), and the
  * logit is a FIXED-ORDER chain of one multiply per feature and one
  * left-associated sum — the identical double expression on both
  * engines, so the oracle compare is hash-exact with no rounding.
  * The decision (`logit > 0`) never applies a sigmoid: monotone in
  * the logit, and exp() is the one op whose last ulp differs across
  * libms (hard rule 9's lesson — publish the logit, not the
  * probability).
  *
  * Plan shape (guarded): zero exchanges, ONE scan, the token array
  * projected ONCE (a per-feature `tokens(text)` would re-split the
  * text five times per row — the HOF-recomputation trap). The
  * `filter`/`array_distinct` collection functions evaluate
  * interpreted (Spark HOFs don't codegen); when this scan is the hot
  * path, the features swap to `regexp_count`-class codegen
  * expressions — the SHAPE (scan + projection, no exchange) is
  * already the 100 TB one.
  *
  * Features (per document, all from one `tokens` projection):
  *   f1 = n_tokens / 100        (length signal, scaled)
  *   f2 = distinct-token ratio  (repetition signal)
  *   f3 = stopword ratio        (natural-language signal)
  *   f4 = mean token length     (gibberish signal)
  */
object Scoring {

  /** Stopword list shared with the q139 oracle literal. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** weights = (w0 intercept, w1..w4 as documented above). */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double]): DataFrame = {
    require(weights.length == 5, s"need w0..w4: got ${weights.length}")
    val withToks = df.select(col(idCol), col(textCol).as("__text"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val n = size(toks)
    val nD = greatest(n, lit(1)).cast("double")
    val f1 = n.cast("double") / lit(100.0)
    val f2 = size(array_distinct(toks)).cast("double") / nD
    val f3 = size(filter(toks, t => t.isInCollection(stopwords)))
      .cast("double") / nD
    val f4 = length(regexp_replace(col("__text"), " ", "")).cast("double") / nD
    val logit: Column =
      lit(weights(0)) + lit(weights(1)) * f1 + lit(weights(2)) * f2 +
        lit(weights(3)) * f3 + lit(weights(4)) * f4
    withToks.select(col(idCol), logit.as("logit"))
      .withColumn("keep", col("logit") > lit(0.0))
  }
}
