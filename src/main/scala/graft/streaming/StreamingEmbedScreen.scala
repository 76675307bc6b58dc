package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-dup screening — the batch LSH-bucketed
  * cosine operator (`graft.operators.Similarity.cosineNearDupPairs` /
  * `cosineScreen`, q44/q75) re-expressed as stateful stream
  * processing, completing the streaming dedup family next to
  * [[StreamingNearDup]] (Hamming) and [[StreamingMinHash]] (Jaccard):
  * arriving vectors are checked against every vector seen so far in
  * the same hyperplane-LSH bucket, so near-dups surface within AND
  * across micro-batches — the embedding half of an ingest screen a
  * corpus pipeline runs while data is still arriving.
  *
  * Shape: bucket assignment stays in CODEGEN COLUMN EXPRESSIONS (the
  * same deterministic `Similarity.planeSigns` planes and
  * `FloatDotProduct` the batch operator and the DuckDB oracle use — no
  * UDF is needed to preserve the event-time watermark tag, unlike the
  * text operators whose fingerprints are pure-Scala functions) →
  * `flatMapGroupsWithState` keyed by bucket, running the same
  * [[BucketScreen]] machines as the other two operators with a cosine
  * comparator.
  *
  * Semantics: one bucket per vector (not banded), so each qualifying
  * pair is emitted EXACTLY once; the cosine double is bit-equal to the
  * batch operator's (same index-order dot accumulation, same
  * norm-product-then-divide order — `StreamingEmbedScreenSpec` pins
  * set equality against `cosineNearDupPairs`). State bounds: `stateCap`
  * (FIFO per bucket) and [[pairsEvicting]]'s watermark-driven timeout
  * + hot-bucket age prune, identical mechanics via [[BucketScreen]].
  *
  * Scale: state per bucket is its member vectors over the eviction
  * window — raise `nBits` to shrink buckets exactly as in the batch
  * operator (SCALE.md); memory is arrival rate × window, never stream
  * length.
  */
object StreamingEmbedScreen {

  /** Scratch area for q115's AvailableNow replay (q95's pattern). */
  val scratchBase: String = "/tmp/graft_q115_embed"

  final case class CosinePair(id_a: Long, id_b: Long, cosine: Double)

  /** Cosine comparator fed to [[BucketScreen]]: double accumulation in
    * index order and norm-product-then-divide — the exact op sequence
    * of the batch `FloatDotProduct` formulation, so emitted cosines are
    * bit-equal to `cosineNearDupPairs`'. A zero-norm side yields NaN,
    * which fails the threshold — same outcome as the batch filter. */
  private def cosineCompare(threshold: Double)(
      d0: Long, v0: Seq[Float], doc: Long, v: Seq[Float]): Option[CosinePair] =
    if (d0 == doc) None
    else {
      val n = math.min(v0.length, v.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val a = v0(i).toDouble; val b = v(i).toDouble
        dot += a * b; na += a * a; nb += b * b
        i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos >= threshold)
        Some(CosinePair(math.min(d0, doc), math.max(d0, doc), cos))
      else None
    }

  /** Near-dup pairs over a STREAMING frame of (idCol: long-castable,
    * vecCol: array<float>). Append mode; exactly one emission per
    * qualifying same-bucket pair (see class doc). */
  def pairs(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int, dim: Int,
      stateCap: Int = Int.MaxValue): Dataset[CosinePair] = {
    val spark = embs.sparkSession
    import spark.implicits._
    graft.operators.Similarity
      .lshBucket(embs.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v")), "v", nBits, dim)
      .select(col("id"), col("v"), col("bucket"))
      .as[(Long, Seq[Float], Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Seq[Float], Long)],
            state: GroupState[List[(Long, Seq[Float])]]) => {
          val (seen, out) = BucketScreen.screen(
            rows.map { case (id, v, _) => (id, v) },
            state.getOption.getOrElse(Nil), stateCap, cosineCompare(threshold))
          state.update(seen)
          out.iterator
        })
  }

  /** [[pairs]] with WATERMARK-DRIVEN STATE EVICTION — the
    * [[BucketScreen.evictingStep]] machine (monotone deadline,
    * hot-bucket age prune, null-ts retention, `stateCap` composition)
    * with the cosine comparator; see that scaladoc for the semantics
    * shared with [[StreamingNearDup.pairsEvicting]] and
    * [[StreamingMinHash.pairsEvicting]]. */
  def pairsEvicting(embs: DataFrame, idCol: String, vecCol: String,
      tsCol: String, watermarkDelay: String, evictAfter: java.time.Duration,
      threshold: Double, nBits: Int, dim: Int,
      stateCap: Int = Int.MaxValue): Dataset[CosinePair] = {
    require(evictAfter.toMillis > 0, s"evictAfter must be positive: $evictAfter")
    val spark = embs.sparkSession
    import spark.implicits._
    val evictMs = evictAfter.toMillis
    graft.operators.Similarity
      .lshBucket(
        embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
            col(tsCol).cast("timestamp").as("__ts"))
          .withWatermark("__ts", watermarkDelay),
        "v", nBits, dim)
      .select(col("id"), col("v"), col("__ts"), col("bucket"))
      .as[(Long, Seq[Float], java.sql.Timestamp, Long)]
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[(Long, Seq[Float], java.sql.Timestamp, Long)],
            state: GroupState[(Long, List[(Long, Seq[Float], Long)])]) =>
          BucketScreen.evictingStep(
            rows.map { case (id, v, ts, _) => (id, v, ts) }.toList,
            state, evictMs, stateCap, cosineCompare(threshold)))
  }
}
