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

  /** The CONSUMER-side inverse of [[concatChunk]]: per training bin,
    * the ordered document slices that fill it — what a loader actually
    * reads to materialize sequence `bin_id` of a shard. For each doc
    * span intersecting a bin: `bin_off` is the slice's position inside
    * the bin, `doc_off` the position inside the document, `len` the
    * slice length; slices tile each bin exactly (sum(len) = seqLen for
    * every bin but a shard's last — `PackingSpec` pins it).
    *
    * 100 TB shape: one `explode(sequence(first_bin, last_bin))` per
    * doc — ≈ n_tokens/seqLen + 1 rows, pipelined in codegen after
    * [[concatChunk]]'s single exchange; all arithmetic stays integer
    * and NO new shuffle or window is added (bin_off is derived, not
    * ranked — consumers order by it for free). */
  def binSlices(spans: DataFrame, idCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    spans
      .withColumn("bin_id", explode(sequence(col("first_bin"), col("last_bin"))))
      .withColumn("slice_start",
        greatest(col("bin_id") * seqLen, col("tok_start")))
      .withColumn("slice_end",
        least((col("bin_id") + 1) * seqLen, col("tok_start") + col("n_tokens")))
      .select(col("shard"), col("bin_id"), col(idCol),
        (col("slice_start") - col("bin_id") * seqLen).as("bin_off"),
        (col("slice_start") - col("tok_start")).as("doc_off"),
        (col("slice_end") - col("slice_start")).as("len"))
  }
}
