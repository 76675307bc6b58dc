package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — frequent tokens over an unbounded
  * document stream, the frequency-analysis twin of batch q74
  * (vocabulary top-k): corpus pipelines use it to spot boilerplate
  * n-grams, hot URLs and template text while data is still arriving.
  *
  * Shape: tokens hash to one of `shards` groups
  * (`flatMapGroupsWithState` keyed by shard), each shard keeps a
  * SPACE-SAVING summary (Metwally et al. '05) of at most `capacity`
  * entries. Because a token lives in exactly ONE shard, a shard sees
  * its tokens' complete stream: per-token guarantees are
  *   true ≤ est ≤ true + err,   err ≤ (shard arrivals) / capacity,
  * and with `capacity` ≥ the shard's distinct tokens, err = 0 — the
  * counts are EXACT (what `StreamingHeavyHittersSpec` pins against a
  * batch groupBy count).
  *
  * Eviction (summary full) replaces the minimum-count entry
  * (ties broken by token, and arrivals are folded in sorted token
  * order, so the summary is deterministic for a given batch split);
  * the evicted count is carried as the new entry's `err`.
  *
  * Emission: after each micro-batch a shard emits only the summary
  * entries whose (est, err) CHANGED in that batch — at most the
  * batch's distinct-token count, never the whole summary (append
  * mode, at-least-once like the other streaming operators' contract).
  * Estimates are monotone nondecreasing while an entry is resident,
  * so downstream keeps max(est) per token and sees exactly the same
  * final values a full re-emission would produce; an evicted entry is
  * simply never re-emitted (no retraction — its last emission already
  * carried its final estimate). State per shard is bounded by
  * `capacity` regardless of stream length — no watermark needed
  * (unlike the pair operators, the summary never grows with history).
  *
  * 100 TB shape: parallelism and state both scale with `shards`
  * (pick ≈ cluster cores); the shuffle carries (shard, token, weight)
  * per DISTINCT token per batch partition (map-side pre-aggregation
  * below), never raw text.
  */
object StreamingHeavyHitters {

  /** Fixed scratch base for q89's oracled AvailableNow replay (`in/`,
    * `out/`, `ckpt/` sub-dirs) — same fixed-path trade as q88. */
  val scratchBase: String = "/tmp/graft_q89_hh"

  final case class TokenCount(shard: Int, token: String, est: Long, err: Long)

  /** One Space-Saving fold step: `w` arrivals of `t`. */
  private def add(m: scala.collection.mutable.Map[String, (Long, Long)],
      t: String, w: Long, capacity: Int): Unit =
    m.get(t) match {
      case Some((c, e)) => m(t) = (c + w, e)
      case None if m.size < capacity => m(t) = (w, 0L)
      case None =>
        val (mt, (mc, _)) = m.minBy { case (k, (c, _)) => (c, k) }
        m.remove(mt)
        m(t) = (mc + w, mc)
    }

  /** Per-token (est, err) summaries over a STREAMING frame's text
    * column. See class doc for guarantees and the emission contract. */
  def tokenCounts(docs: DataFrame, textCol: String,
      shards: Int = 32, capacity: Int = 1024): Dataset[TokenCount] = {
    require(shards > 0 && capacity > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
      .as[String]
      // stateless map-side combiner: the shuffle to the shard groups
      // carries (token, weight) per DISTINCT token per batch
      // partition, never one row per occurrence
      .mapPartitions { it =>
        val w = scala.collection.mutable.Map.empty[String, Long]
        it.foreach(t => w(t) = w.getOrElse(t, 0L) + 1L)
        w.iterator
      }
      .groupByKey { case (tok, _) => math.floorMod(tok.hashCode, shards) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[(String, Long)],
            state: GroupState[Map[String, (Long, Long)]]) => {
          // merge the partition partials, then fold distinct tokens
          // (sorted — eviction order must not depend on arrival order)
          val weights = scala.collection.mutable.Map.empty[String, Long]
          rows.foreach { case (t, w) =>
            weights(t) = weights.getOrElse(t, 0L) + w }
          val prev = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
          m ++= prev
          weights.toSeq.sortBy(_._1).foreach { case (t, w) =>
            add(m, t, w, capacity)
          }
          state.update(m.toMap)
          // changed-only emission: entries identical to last batch carry
          // no new information (downstream keeps max(est)) — output per
          // trigger is bounded by the batch's distinct tokens, not by
          // `capacity` (sink traffic at production trigger rates)
          m.iterator.filter { case (t, ce) => !prev.get(t).contains(ce) }
            .map { case (t, (c, e)) => TokenCount(shard, t, c, e) }
            .toList.iterator
        })
  }
}
