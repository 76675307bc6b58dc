package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING SCD type-2 / CDC-apply: fold a keyed change stream into
  * type-2 validity intervals through the state store — the dimension-
  * maintenance twin of batch q149, the way [[StreamingComponents]]
  * twins batch clustering.
  *
  * Semantics (identical to q149's batch window build): per key, the
  * tracked attribute opens a new interval at every CHANGE (consecutive
  * repeats collapse); `valid_to` = the next change's event time, null
  * while current. `(ts, event_id)` totally orders each key's history
  * (hard rule 4).
  *
  * Append-mode finality: an interval row may only be emitted once no
  * late event can alter it. Events are BUFFERED in state until the
  * event-time watermark passes their timestamp — anything older than
  * the watermark is dropped at the source (the standard lateness
  * contract), so events strictly below the watermark fold in final
  * `(ts, event_id)` order, and a CLOSED interval (its closing change
  * processed) can never change again. The one still-OPEN interval per
  * key is published (valid_to null) once the watermark passes
  * `horizon` — the CDC "snapshot the current rows at a cutoff" step —
  * via an event-time timeout ([[StreamingAsOf]]'s flush pattern:
  * AvailableNow runs the extra timeout batch before terminating).
  *
  * 100 TB shape: state per key is the open interval + ONLY the events
  * inside the lateness window (watermark-bounded, exactly like the
  * stream-stream joins); each micro-batch touches only keys with
  * arrivals or fired timers. Out-of-order arrival WITHIN the window is
  * fully repaired: a straggler change lands between existing buffered
  * events and splits/collapses intervals before anything is emitted.
  */
object Scd2 {

  /** Scratch base for q161's AvailableNow replay gate. */
  val scratchBase: String = "/tmp/graft_q161_scd2"

  final case class In(key: Long, ts: Timestamp, eventId: Long, attr: String)
  final case class Ev(tsUs: Long, eventId: Long, attr: String)
  final case class Scd2State(pending: Seq[Ev], lastAttr: String,
      openTsUs: Long, hasOpen: Boolean)
  final case class Interval(user_id: Long, event_type: String,
      valid_from: Timestamp, valid_to: Timestamp)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Build type-2 intervals from a change stream.
    *
    * @param delay watermark lateness bound on the ts column (applied
    *   HERE, after the projection — a later select would strip the
    *   watermark tag)
    * @param horizon open intervals are published (valid_to null) once
    *   the watermark passes this instant; pick it above every real
    *   event for a bounded replay */
  def intervals(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, attrCol: String, delay: String,
      horizon: Timestamp): Dataset[Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = horizon.getTime
    val keyed = events.select(
      col(keyCol).cast("long").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(idCol).cast("long").as("eventId"),
      col(attrCol).cast("string").as("attr"))
      .withWatermark("ts", delay)
      .as[In]

    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Interval](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[In], state: GroupState[Scd2State]) =>
          val st = state.getOption.getOrElse(Scd2State(Nil, null, 0L, false))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val merged = (st.pending ++ rows.map(e =>
              Ev(micros(e.ts), e.eventId, e.attr)))
            .sortBy(e => (e.tsUs, e.eventId))
          val flushAll = state.hasTimedOut &&
            state.getCurrentWatermarkMs() >= horizonMs
          // an event strictly below the watermark is FINAL: any later
          // arrival has ts >= watermark, so it can neither precede nor
          // tie-split anything already below it
          val (fin, hold) =
            if (flushAll) (merged, Nil) else merged.partition(_.tsUs < wmUs)
          val out = Vector.newBuilder[Interval]
          var lastAttr = st.lastAttr
          var openTs = st.openTsUs
          var hasOpen = st.hasOpen
          fin.foreach { e =>
            if (!hasOpen) { lastAttr = e.attr; openTs = e.tsUs; hasOpen = true }
            else if (e.attr != lastAttr) {
              out += Interval(key, lastAttr, toTs(openTs), toTs(e.tsUs))
              lastAttr = e.attr; openTs = e.tsUs
            } // same attr: consecutive repeat, collapses
          }
          if (flushAll) {
            if (hasOpen)
              out += Interval(key, lastAttr, toTs(openTs), null)
            state.remove()
          } else {
            state.update(Scd2State(hold, lastAttr, openTs, hasOpen))
            // flush timer: at the horizon, or as soon as the watermark
            // can finalize the oldest held event
            val wake = if (hold.nonEmpty)
              math.min(horizonMs, Math.floorDiv(hold.map(_.tsUs).min, 1000L))
            else horizonMs
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1L, wake))
          }
          out.result().iterator
      }
  }
}
