package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step that turns a document
  * corpus into fixed-token-budget training sequences: documents are
  * laid end-to-end and cut every `seqLen` tokens, so each doc occupies
  * the token span [tok_start, tok_start + n_tokens) and the bins
  * first_bin..last_bin (a doc may straddle a cut — standard
  * pretraining packing).
  *
  * The layout must be DETERMINISTIC (a training run re-derives exactly
  * the same sequences from the same corpus snapshot): documents are
  * dealt to `shards` by the [[Splits]] md5 trick (pure function of the
  * id) and concatenated in doc-id order within each shard — stable
  * under re-runs, partitioning and engines, which is what lets the
  * DuckDB oracle recompute every span.
  *
  * 100 TB shape: packing is embarrassingly parallel ACROSS shards
  * (pick shards ≈ training workers; each shard's stream feeds one
  * loader) — one hash shuffle + per-shard window, no global sort, no
  * single-partition funnel. All arithmetic is integer (token counts,
  * running sums, div) so spans are exact, not float-derived.
  */
object Packing {

  /** Token spans and bin assignments for every non-empty document.
    * Output: (idCol, n_tokens, shard, tok_start, first_bin, last_bin).
    * Empty docs (0 tokens) are dropped — they occupy no span. */
  def concatChunk(df: DataFrame, idCol: String, tokens: Column,
      seqLen: Int, shards: Int, salt: String): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(shards > 0, s"shards must be positive: $shards")
    // running total of all PRECEDING docs in the shard (id order —
    // unique ids make the frame deterministic, hard rule 4)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), tokens.cast("long").as("n_tokens"),
        Splits.hashShard(col(idCol), salt, shards).as("shard"))
      .where(col("n_tokens") > 0)
      .withColumn("tok_start", coalesce(sum("n_tokens").over(w), lit(0L)))
      // integer div (both sides non-negative): truncation == floor,
      // and the oracle's BIGINT // matches exactly
      .withColumn("first_bin", expr(s"tok_start div $seqLen"))
      .withColumn("last_bin", expr(s"(tok_start + n_tokens - 1) div $seqLen"))
  }
}
