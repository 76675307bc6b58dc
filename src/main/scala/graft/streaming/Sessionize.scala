package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time gap sessionization over Spark's native `session_window`
  * — ONE definition shared by batch (catalog q70, DuckDB-oracled) and
  * Structured Streaming (watermarked append: a session is emitted once
  * the watermark passes its close, exactly-once per session).
  *
  * Reference anchor: the reference sessionizes activity driver-side by
  * replaying a scanner and folding over inactivity gaps (the
  * iteratee-style folds under
  * `marketdb-iteratee/src/main/scala/com/ergodicity/marketdb/iteratee/MarketIteratees.scala:7-21`);
  * here the same semantics are a declarative windowed aggregate the
  * planner distributes: hash-shuffle on the user key, sort-based
  * session merge inside each partition, map-side partial session
  * aggregation before the exchange.
  *
  * Boundary semantics (pinned by `SessionizeSpec` and relied on by
  * q70's oracle twin): events whose `[ts, ts+gap)` windows overlap
  * merge, so a new session starts iff the inter-event gap STRICTLY
  * exceeds `gap`; `sess_end` = last event ts + gap.
  *
  * 100 TB shape: state (streaming) holds only open sessions per user —
  * one (start, end, count) triple each, evicted at watermark; no event
  * buffer. Batch plans a single exchange on the grouping key.
  */
object Sessionize {

  /** Sessions per `userCol` with inactivity gap `gap` (e.g. "30
    * minutes"). For streaming input pass `watermarkDelay` (required by
    * append mode: bounds lateness AND state lifetime); leave it None
    * for batch.
    * Output: (userCol, sess_start, sess_end, n_events). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gap: String, watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay.fold(events)(d => events.withWatermark(tsCol, d))
    src
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("sess"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("sess.start").as("sess_start"),
        col("sess.end").as("sess_end"), col("n_events"))
  }
}
