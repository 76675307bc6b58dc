package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much it
  * looks like a (small) target-domain sample, using hashed n-gram
  * bag-of-features generative models — the published recipe for
  * picking pretraining data that matches a quality domain.
  *
  * Features are word bigrams hashed into `nBuckets` buckets (the same
  * md5 arithmetic as [[Splits.hashShard]] — engine-portable, so the
  * DuckDB oracle re-derives every bucket). Target and raw bucket
  * distributions are Laplace-smoothed; a document's importance weight
  * is `Σ count(doc, b) · (ln p_target(b) − ln p_raw(b))` — the
  * log-likelihood ratio under the two unigram-over-buckets models.
  *
  * 100 TB shape: the corpus is exploded ONCE into per-(doc, bucket)
  * counts (one hash exchange, partial aggs map-side); the bucket
  * log-ratio table is `nBuckets` rows and always broadcasts; the
  * per-doc weight is a second keyed aggregate; selection is
  * SHARD-PARALLEL (an md5 deal into `nShards` ranking windows — the
  * [[Packing]] trick) because a global top-fraction rank would funnel
  * the corpus through one partition. Within-shard top-1/`keepOneIn`
  * ≈ global top-1/`keepOneIn` at corpus cardinalities, and the deal
  * is a pure function of the id, so the selection is deterministic
  * and engine-reproducible.
  */
object Importance {

  /** Per-document DSIR importance weights + shard-parallel selection.
    * Output: `(doc_id, n_feats, weight, shard, shard_rank, shard_n,
    * selected)`; `weight` is `round(·, 4)` (double sum merged in
    * partition order — hard rule 9; ln differs in the last ulp across
    * engines), ranks are (weight desc, doc_id)-deterministic, and
    * `selected` keeps the top 1/`keepOneIn` of every shard
    * (`rank · keepOneIn <= shard_n` — integer floor semantics).
    * Documents with fewer than two tokens carry no features and are
    * absent from the output (no bigrams on either engine).
    *
    * Eager (CLAUDE.md convention): the per-(doc, bucket) frame has two
    * consumers (raw distribution + per-doc weights), so it is persisted
    * here and the returned frame is materialized before release. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 256, salt: String = "dsir",
      keepOneIn: Int = 4, nShards: Int = 32): DataFrame = {
    require(nBuckets >= 2 && keepOneIn >= 1 && nShards >= 1,
      s"bad config: nBuckets=$nBuckets keepOneIn=$keepOneIn nShards=$nShards")
    val spark = raw.sparkSession
    def buckets(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("s"))
      .select(col("doc_id"), Splits.hashShard(col("s"), salt, nBuckets).as("bucket"))
    val rawCounts = buckets(raw)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tCounts = buckets(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
      val rBuckets = rawCounts.groupBy("bucket").agg(sum("cnt").as("rc"))
      val tTot = tCounts.agg(coalesce(sum("tc"), lit(0L)).cast("double").as("ttot"))
      val rTot = rBuckets.agg(coalesce(sum("rc"), lit(0L)).cast("double").as("rtot"))
      val smooth = lit(nBuckets.toDouble)
      val logratio = spark.range(nBuckets).select(col("id").as("bucket"))
        .join(tCounts, Seq("bucket"), "left")
        .join(rBuckets, Seq("bucket"), "left")
        .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
        .select(col("bucket"),
          (log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("ttot") + smooth)) -
           log((coalesce(col("rc"), lit(0L)) + lit(1.0)) / (col("rtot") + smooth)))
            .as("lr"))
      val perDoc = rawCounts.join(broadcast(logratio), "bucket")
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_feats"),
          round(sum(col("cnt") * col("lr")), 4).as("weight"))
      val rankW = Window.partitionBy("shard")
        .orderBy(col("weight").desc, col("doc_id"))
      perDoc
        .withColumn("shard", Splits.hashShard(col("doc_id"), salt + ":shard", nShards))
        .withColumn("shard_rank", row_number().over(rankW).cast("long"))
        .withColumn("shard_n",
          count(lit(1)).over(Window.partitionBy("shard")).cast("long"))
        .withColumn("selected",
          col("shard_rank") * lit(keepOneIn.toLong) <= col("shard_n"))
        .localCheckpoint() // materialize before releasing the cache
    } finally rawCounts.unpersist()
  }

  /** CCNet-style perplexity filtering (Wenzek et al. 2020,
    * arXiv:1911.00359): score every document by its perplexity under a
    * language model trained on a high-quality target sample, then split
    * the corpus into head / middle / tail terciles — the published
    * recipe for grading web text by LM fit before pretraining.
    *
    * The KenLM 5-gram model of the paper is replaced by the same
    * engine-portable hashed-bigram unigram-over-buckets model as
    * [[dsirWeights]] (Laplace-smoothed target distribution only — CCNet
    * scores against the quality model alone, there is no raw-side
    * model). A document's `nll` is `−Σ count(doc, b) · ln p_target(b)`,
    * rounded at 4 (hard rule 9: double sum merged in partition order);
    * `log_ppl = nll / n_feats` is the length-normalized log-perplexity,
    * deliberately NOT re-rounded: a single IEEE division of identical
    * operands is already bit-deterministic across engines, whereas
    * rounding it would hit exact decimal half-boundaries (nll has 4
    * decimals, n_feats divides powers of 10 often) where the engines'
    * tie-breaking differs.
    *
    * Terciles are SHARD-PARALLEL, like [[dsirWeights]]'s selection: a
    * global `ntile(3)` would funnel the corpus through one ranking
    * partition, and at corpus cardinalities the within-shard tercile
    * boundary converges to the global one. The tercile is explicit
    * integer arithmetic over (rank, shard size) — `(rank−1)·3 div n +
    * 1` — rather than `ntile`, so both engines agree by construction
    * instead of by matching ntile remainder conventions.
    *
    * 100 TB shape: one hash exchange for the per-(doc, bucket) counts
    * (partial aggs map-side), the `nBuckets`-row LM always broadcasts,
    * and the ranking window shuffles per-doc rows once on the shard
    * key. Documents with fewer than two tokens carry no bigrams and
    * are absent from the output (same on both engines). */
  def ccnetPerplexity(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 256, salt: String = "ccnet",
      nShards: Int = 32): DataFrame = {
    require(nBuckets >= 2 && nShards >= 1,
      s"bad config: nBuckets=$nBuckets nShards=$nShards")
    val spark = raw.sparkSession
    def buckets(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("s"))
      .select(col("doc_id"), Splits.hashShard(col("s"), salt, nBuckets).as("bucket"))
    val tCounts = buckets(target).groupBy("bucket").agg(count(lit(1)).as("tc"))
    val tTot = tCounts.agg(coalesce(sum("tc"), lit(0L)).cast("double").as("ttot"))
    val smooth = lit(nBuckets.toDouble)
    val lm = spark.range(nBuckets).select(col("id").as("bucket"))
      .join(tCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .select(col("bucket"),
        log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("ttot") + smooth))
          .as("lnp"))
    val perDoc = buckets(raw)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .join(broadcast(lm), "bucket")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_feats"),
        round(-sum(col("cnt") * col("lnp")), 4).as("nll"))
      .withColumn("log_ppl", col("nll") / col("n_feats"))
    val rankW = Window.partitionBy("shard").orderBy(col("log_ppl"), col("doc_id"))
    perDoc
      .withColumn("shard", Splits.hashShard(col("doc_id"), salt + ":shard", nShards))
      .withColumn("shard_rank", row_number().over(rankW).cast("long"))
      .withColumn("shard_n",
        count(lit(1)).over(Window.partitionBy("shard")).cast("long"))
      .withColumn("tercile",
        expr("(shard_rank - 1) * 3 div shard_n + 1").cast("long"))
      .withColumn("band",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
  }
}
