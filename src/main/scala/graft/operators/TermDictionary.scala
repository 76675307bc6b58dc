package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.streaming.BucketedLog

/** INCREMENTALLY-MAINTAINED TERM DICTIONARY — the autocomplete /
  * prefix-search sibling of [[InvertedIndex]]: a search box needs
  * "terms starting with `sc`, by document frequency" answered in
  * milliseconds, which a hash-bucketed postings store cannot do (a
  * prefix is a RANGE of terms, and hash bucketing scatters ranges
  * across every bucket).
  *
  * The state is one [[BucketedLog]] of `(pfx, term, df, cf)` rows
  * hash-keyed by `pfx` — the term's FIRST CHARACTER — so all terms
  * sharing a first letter co-locate in one bucket and a prefix query
  * is a [[BucketedLog.readFor]] point lookup on that letter:
  * O(one bucket's rows) IO, never O(vocabulary). The exact
  * `startswith` predicate runs as residual (the skipping-index
  * contract: layout buys IO, never answers). Counts are exact longs
  * folded additively per ingest batch (`df` = documents containing
  * the term, `cf` = total occurrences), replay-screened by the
  * `#batch=` watermark like every additive fold here; doc ids must
  * be new per batch (the append-only-corpus contract shared with
  * [[InvertedIndex.ingest]]).
  *
  * 100 TB shape: the dictionary is VOCABULARY-sized (millions of
  * rows for a 100 TB corpus — Heaps' law), itself trivially small;
  * what matters is (a) ingest folds only the batch's distinct terms'
  * buckets, O(batch vocabulary) per commit, and (b) a prefix lookup
  * reads one first-letter bucket, not the dictionary.
  *
  * Reference anchor: the reference resolves human-readable security
  * names through a persistent dictionary table consulted per lookup
  * (`/root/reference/marketdb-core/src/main/scala/com/ergodicity/marketdb/uid/UIDProvider.scala:41-80`);
  * this is the same name-resolution discipline keyed for prefix
  * ranges instead of exact names. */
final case class TermDictionary(path: String, buckets: Int = 32) {

  private def dictLog =
    BucketedLog(s"$path/dict", Seq("pfx"), buckets)

  def init(spark: SparkSession): Unit = {
    import spark.implicits._
    dictLog.init(Seq.empty[(String, String, Long, Long)]
      .toDF("pfx", "term", "df", "cf"))
  }

  /** Fold one ingest batch's term counts into the dictionary —
    * O(batch vocabulary + touched first-letter buckets) per commit.
    * A crash-replayed batch is a no-op by the `#batch=` watermark
    * (the additive fold is NOT idempotent, so the screen is what
    * makes replays safe — the q199 argument). */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
      batchId: Long): Unit = {
    val counts = docs
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("__doc", "term").agg(count(lit(1)).as("__tf"))
      .groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"),
        sum("__tf").cast("long").as("cf"))
      .select(substring(col("term"), 1, 1).as("pfx"), col("term"),
        col("df"), col("cf"))
    dictLog.applyBatch(counts, batchId) { (cur, b) =>
      cur.map(_.unionByName(b)).getOrElse(b)
        .groupBy("pfx", "term")
        .agg(sum("df").cast("long").as("df"),
          sum("cf").cast("long").as("cf"))
    }
  }

  /** Coverage receipt (`#batch=`) — the freshness fence. */
  def coveredBatch(spark: SparkSession): Long =
    dictLog.readManifestFull(spark).fold(-1L)(_._2)

  /** Top-k dictionary terms matching `prefix`, by (df desc, term) —
    * the autocomplete query. Reads ONLY the prefix's first-letter
    * bucket ([[BucketedLog.readFor]] directory prune); the exact
    * `startswith` is the residual. Output `(term, df, cf, rank)`,
    * rank 1..k; all-integer ranking, no float rounding needed. */
  def prefixTopK(spark: SparkSession, prefix: String,
      k: Int): DataFrame = {
    require(prefix.nonEmpty, "prefixTopK: empty prefix")
    require(k >= 1, s"k must be positive: $k")
    import spark.implicits._
    dictLog.readFor(Seq(prefix.substring(0, 1)).toDF("pfx"))
      .where(col("term").startsWith(prefix))
      .select("term", "df", "cf")
      .orderBy(col("df").desc, col("term")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("df").desc, col("term"))).cast("long"))
  }
}
