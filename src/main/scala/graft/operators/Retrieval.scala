package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse lexical retrieval over a document corpus — the BM25 ranked
  * search a training-data pipeline runs for query-based corpus
  * curation and more-like-this expansion (Robertson–Spärck Jones
  * probabilistic relevance framework; the idf variant is Lucene's
  * always-positive `ln(1 + (N - df + 0.5)/(df + 0.5))`).
  *
  * 100 TB shape: an inverted-index formulation — the corpus becomes a
  * postings frame `(term, doc, tf)` via one explode + hash aggregate,
  * document frequency rides a window over the SAME lineage (the q67
  * trick: a groupBy-then-join would re-run the tokenize subtree per
  * consumer), corpus-level stats (N, avgdl) stay in the plan as a
  * 1-row broadcast cross join, and the query side — always small next
  * to the corpus — is broadcast into a posting-list equi-join on the
  * term. Nothing dense, nothing cartesian: cost is proportional to
  * the postings of the query's terms, exactly like a search engine.
  */
object Retrieval {

  /** Top-k BM25 matches per query. Output: `(query_id, cand_id,
    * score, rank)`, rank 1..k per query ordered by (score desc,
    * cand_id) — the tiebreak keeps ranking deterministic (hard rule
    * 4); the score is `round(·, 6)` because it is a double sum merged
    * in partition order (hard rule 9).
    *
    * Repeated query terms count once (distinct-term query model);
    * `excludeSelf` drops `query_id == cand_id` BEFORE ranking, for
    * doc-as-query retrieval from the same corpus. Documents with zero
    * tokens never match but still count toward N/avgdl (both engines
    * derive stats from the same full corpus scan).
    */
  def bm25TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    // postings: (cand_id, term, dl, tf); dl rides the groupBy keys
    // (functionally dependent on cand_id) so one lineage carries it
    val postings = corpus
      .select(col(idCol).as("cand_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("cand_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("cand_id", "term", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    // corpus stats in-plan (q67's 1-row broadcast): exact integer
    // count/sum, one division — deterministic across partitionings
    val stats = corpus.agg(
      count(lit(1)).cast("double").as("__n"),
      coalesce(sum(TextFunctions.tokenCount(col(textCol)).cast("long")), lit(0L))
        .cast("double").as("__sumdl"))
    val qTerms = queries.select(col(idCol).as("query_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    bm25Rank(postings, qTerms, stats, k, k1, b, excludeSelf)
  }

  /** The BM25 scoring + ranking tail shared by [[bm25TopK]] (postings
    * derived in-plan) and [[InvertedIndex.bm25TopK]] (postings read
    * from the stored index) — ONE formula, so the stored-index path
    * is bit-identical to the from-scratch one. `postings` carries
    * `(cand_id, term, dl, tf, df)`, `stats` one `(__n, __sumdl)` row,
    * `qTerms` `(query_id, term)` distinct pairs. */
  private[operators] def bm25Rank(postings: DataFrame, qTerms: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double,
      excludeSelf: Boolean): DataFrame = {
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfWeight = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl") / (col("__sumdl") / col("__n"))))
    val matches = postings
      .join(broadcast(qTerms), "term")
      .crossJoin(broadcast(stats))
    val filtered =
      if (excludeSelf) matches.where(col("query_id") =!= col("cand_id"))
      else matches
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    filtered
      .groupBy("query_id", "cand_id")
      .agg(round(sum(idf * tfWeight), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttner, SIGIR 2009):
    * merge ranked lists from heterogeneous retrievers — here typically
    * sparse BM25 and dense cosine ANN, the standard hybrid-search
    * combination — into one ranking by `Σ 1/(c + rank)`, which needs
    * no score calibration across systems.
    *
    * Each input must carry `(query_id, cand_id, rank)` (the shape
    * [[bm25TopK]] and `Similarity.cosineTopK`/ANN emit). A candidate
    * absent from a list contributes 0 for it; `n_lists` counts the
    * lists that retrieved the candidate. The fused score is a sum of
    * at most `lists.size` reciprocals added in FIXED list order —
    * every term is a single IEEE division of exact integers, so the
    * whole score is bit-deterministic with no rounding required (and
    * ties across candidates are real, hence the cand_id tiebreak —
    * hard rule 4).
    *
    * 100 TB shape: inputs are already top-k-per-query frames (≤ q·k
    * rows — the expensive corpus work happened inside the retrievers),
    * so the fusion is a cheap (query_id, cand_id) equi-join chain plus
    * one per-query rank window; nothing here touches the corpus. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty && k >= 1 && c >= 0,
      s"bad config: ${lists.size} lists, k=$k, c=$c")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("query_id"), col("cand_id"),
        (lit(1.0) / (lit(c.toDouble) + col("rank"))).as(s"rrf_$i"))
    }
    val joined = tagged.reduce(
      (a, b) => a.join(b, Seq("query_id", "cand_id"), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(col(s"rrf_$i"), lit(0.0))).reduce(_ + _)
    val nLists = lists.indices
      .map(i => when(col(s"rrf_$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("cand_id"))
    joined
      .withColumn("rrf_score", score)
      .withColumn("n_lists", nLists)
      .withColumn("rrf_rank", row_number().over(w).cast("long"))
      .where(col("rrf_rank") <= k)
      .select("query_id", "cand_id", "rrf_score", "n_lists", "rrf_rank")
  }
}
