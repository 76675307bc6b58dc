package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable DETERMINISTIC GLOBAL RANK over a hash key — the primitive
  * behind reproducible training-order shuffles ("epoch ordering"):
  * every row gets its exact 1-based position in the total order of
  * (hexKey, ties), WITHOUT the single-partition funnel of a bare
  * `row_number() OVER (ORDER BY …)` (which Spark executes by moving
  * the whole dataset through ONE task — a non-starter at 100 TB).
  *
  * Content-defined two-level plan (no sampling, no physical-partition
  * ids — membership is a pure function of the data):
  *   1. bucket = leading `nibbles` hex chars of `hexKey` (fixed-width
  *      lowercase hex ⇒ lexical order == numeric order, so bucket
  *      ranges tile the total order);
  *   2. local rank per bucket — ONE hash exchange on bucket, each
  *      window instance holds ~1/16^nibbles of the data;
  *   3. offsets = prefix sum of bucket counts (a ≤16^nibbles-row
  *      aggregate fed by map-side partials; the prefix window runs
  *      over those few rows, then broadcast-joins back).
  * global rank = offset(bucket) + local rank.
  *
  * Caller contract: `hexKey` must be a fixed-width lowercase-hex
  * HASH (md5 here) — uniformity is what makes the buckets balanced
  * by construction (no skew, no salting) and is why this stays a
  * hash-key primitive rather than a general ORDER BY replacement
  * (arbitrary skewed keys would need sampled ranges instead). Ties:
  * md5 collisions are cryptographically improbable, but hard rule 4
  * still wants total order — pass the row id in `ties`.
  *
  * Cost at scale: the corpus crosses exactly ONE exchange; the
  * source is scanned twice (data pass + the counting pass, which
  * map-side-reduces to ≤16^nibbles rows per task before its tiny
  * shuffle). */
object GlobalRank {

  /** Adds `rankCol` (1-based global rank over `hexKey` asc, then
    * `ties` asc) to `df`. `nibbles` ∈ [1,8] sets the bucket fan-out
    * (16^nibbles buckets; 3 ⇒ 4096 — plenty of parallelism headroom
    * while the offsets side stays a few-thousand-row frame). */
  def withRank(df: DataFrame, hexKey: Column, ties: Seq[Column],
      rankCol: String, nibbles: Int = 3): DataFrame = {
    require(nibbles >= 1 && nibbles <= 8, s"nibbles out of range: $nibbles")
    // scratch columns would silently OVERWRITE same-named caller
    // columns via withColumn — fail loudly instead (epochShuffle is
    // immune because it projects first; this is the public surface)
    val clash = df.columns.toSet
      .intersect(Set("__gr_b", "__gr_lr", "__gr_off", rankCol))
    require(clash.isEmpty,
      s"withRank scratch/output columns collide with input: $clash")
    val bucket = conv(substring(hexKey, 1, nibbles), 16, 10).cast("int")
    val keyed = df.withColumn("__gr_b", bucket)
    val local = keyed.withColumn("__gr_lr",
      row_number().over(
        Window.partitionBy(col("__gr_b")).orderBy(hexKey +: ties: _*)))
    // ≤16^nibbles rows: counts per bucket, prefix-summed into start
    // offsets (the only ORDER BY window here runs over bucket-count
    // rows, never data rows)
    val offsets = keyed.groupBy("__gr_b").agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_off",
        coalesce(sum(col("__gr_n")).over(
          Window.orderBy(col("__gr_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__gr_n")
    local.join(broadcast(offsets), Seq("__gr_b"))
      .withColumn(rankCol, col("__gr_off") + col("__gr_lr").cast("long"))
      .drop("__gr_b", "__gr_lr", "__gr_off")
  }

  /** Deterministic EPOCH SHUFFLE: deals every row a fresh md5 order
    * key for `epoch`, globally ranks it (two-level, no funnel), and
    * assigns `batch` = (rank-1) div batchSize and `pos` = (rank-1)
    * mod batchSize — fixed-size training batches any engine can
    * re-derive from (salt, epoch, id) alone. Output: idCol, batch,
    * pos. */
  def epochShuffle(df: DataFrame, idCol: String, salt: String,
      epoch: Int, batchSize: Int, nibbles: Int = 3): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val keyed = df.select(col(idCol),
      md5(concat(lit(s"$salt:$epoch:"), col(idCol).cast("string")))
        .as("__gr_h"))
    withRank(keyed, col("__gr_h"), Seq(col(idCol)), "__gr_rank", nibbles)
      // integer div/mod on longs (both operands non-negative)
      .select(col(idCol),
        expr(s"(__gr_rank - 1) div $batchSize").as("batch"),
        ((col("__gr_rank") - lit(1L)) % lit(batchSize.toLong)).as("pos"))
  }
}
