package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level n-gram language-model quality scoring — the CCNet
  * filter: train a smoothed bigram LM on the corpus itself, score
  * every document by its average negative log-likelihood, and let the
  * pipeline drop the high-perplexity tail (boilerplate, gibberish,
  * mis-extracted text score high; fluent prose scores low). This is
  * the *scoring* complement to the [[UnigramLm]] *tokenizer*: that
  * one segments, this one judges.
  *
  * Determinism contract: counts are exact longs; add-one (Laplace)
  * smoothing makes every probability a ratio of integers,
  * p(cur|prev) = (C(prev,cur)+1) / (C(prev)+V), so each per-bigram
  * term ln((C(prev)+V)/(C(prev,cur)+1)) is a libm op on identical
  * integer inputs on both engines (≤1 ulp apart). The per-document
  * SUM of those terms is partition-order-sensitive, so the returned
  * average is rounded (hard rule 9: ~1e-12 accumulated noise for a
  * ~1e3-token doc vs the 5e-7 boundary at 6 dp).
  *
  * 100 TB shape: two counting aggregates over the exploded bigram
  * stream (one shuffle each, both Zipf/Heaps-bounded outputs: the
  * bigram table grows ~O(corpus^0.7), the context table is
  * vocab-sized), then the scoring pass joins the bigram stream back
  * to the two count tables — hash joins shuffled on the count keys;
  * the context table is broadcastable. Corpus size never appears in
  * any state, only on the streams.
  */
object NgramLm {

  /** Beginning-of-document context marker. Cannot collide with a real
    * token: [[TextFunctions.tokens]] lowercases, so no emitted token
    * contains an uppercase 'S'. */
  val Bos = "<S>"

  /** (id, prev, cur) bigram stream of every non-empty document, with
    * `Bos` as the first token's context. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .select(col(idCol), col("t"), posexplode(col("t")).as(Seq("i", "cur")))
      .select(col(idCol),
        when(col("i") === 0, lit(Bos))
          .otherwise(element_at(col("t"), col("i"))).as("prev"),
        col("cur"))

  /** Per-document average negative log-likelihood (nats/bigram) under
    * the corpus's own add-one-smoothed bigram LM.
    * Output: (idCol, n_bigrams, nll) — higher nll = higher perplexity
    * = worse-fitting text. The smoother's V (distinct continuation
    * count) is derived from the same bigram stream, so the SQL twin
    * recomputes an identical value by construction.
    *
    * EAGER, multi-consumer (the jaccardPairs discipline): the bigram
    * stream feeds four consumers (V, both count tables, the probe),
    * so it is persisted for the call, the result is materialized,
    * intermediates are unpersisted on exit, and the RETURNED frame
    * stays persisted — caller-owned, unpersist when done. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      roundDp: Int = 6): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val bg = bigrams(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val vocab = bg.select("cur").distinct().count()
      val cPrev = bg.groupBy("prev").agg(count(lit(1)).as("c_prev"))
      val cBg = bg.groupBy("prev", "cur").agg(count(lit(1)).as("c_bg"))
      val out = bg.join(cBg, Seq("prev", "cur"))
        .join(broadcast(cPrev), Seq("prev"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          round(
            sum(log((col("c_prev") + lit(vocab)).cast("double")
              / (col("c_bg") + lit(1L)).cast("double")))
              / count(lit(1)).cast("double"),
            roundDp).as("nll"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize before the bigram cache goes away
      out
    } finally bg.unpersist()
  }

  /** Distinct continuation-token count (the smoother's V) — exposed
    * for specs; [[score]] derives it internally. */
  def vocabSize(docs: DataFrame, idCol: String, textCol: String): Long =
    bigrams(docs, idCol, textCol).select("cur").distinct().count()
}
