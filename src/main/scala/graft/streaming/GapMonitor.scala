package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series stream monitoring — the reference tracks first/last
  * persisted event time per stream with a 10 s inactivity reset timer
  * to surface ingest gaps (`marketdb-app/.../MarketLoader.scala:70-101`).
  *
  * Spark rebuild: `flatMapGroupsWithState` keyed by series. State is
  * the last seen event time; each micro-batch emits one `Gap` row per
  * adjacent-event gap above `gapMs` (events within the batch are
  * sorted in memory — bounded by micro-batch size). A processing-time
  * timeout drops idle series state, reproducing the reference's
  * inactivity reset without unbounded state growth.
  */
object GapMonitor {

  /** Scratch area for q110's AvailableNow replay (q95's pattern). */
  val scratchBase: String = "/tmp/graft_q110_gaps"

  final case class KeyedEvent(key: String, ts: Timestamp)
  final case class SeriesState(lastTsMs: Long, count: Long)
  final case class Gap(key: String, prevTs: Timestamp, curTs: Timestamp, gapMs: Long)

  /** @param idleTimeoutMs > 0 enables the inactivity reset via
    *   processing-time timeout (long-running streams); 0 disables it —
    *   required for `Trigger.AvailableNow` runs, which never fire
    *   timeouts and would otherwise hold the query open. */
  def monitor(events: DataFrame, keyCol: String, tsCol: String, gapMs: Long,
      idleTimeoutMs: Long = 0L): Dataset[Gap] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts")).as[KeyedEvent]

    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[SeriesState, Gap](
        OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[SeriesState]) =>
          if (state.hasTimedOut) {
            // inactivity reset (MarketLoader.scala:96-101)
            state.remove()
            Iterator.empty
          } else {
            val prevLast = state.getOption.map(_.lastTsMs)
            // events at or before the stored watermark were already
            // considered in a prior batch — re-examining them could
            // re-detect and double-emit the same gap when a batch
            // arrives entirely out of order
            val floor = prevLast.getOrElse(Long.MinValue)
            val sorted = rows.map(_.ts.getTime).filter(_ > floor).toArray.sorted
            if (sorted.isEmpty) Iterator.empty
            else {
              val seq = prevLast.toArray ++ sorted
              val gaps = seq.sliding(2).collect {
                case Array(a, b) if b - a > gapMs =>
                  Gap(key, new Timestamp(a), new Timestamp(b), b - a)
              }.toVector
              val n = state.getOption.map(_.count).getOrElse(0L) + sorted.length
              // watermark is monotone by construction (sorted.last > floor)
              state.update(SeriesState(sorted.last, n))
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
              gaps.iterator
            }
          }
      }
  }
}
