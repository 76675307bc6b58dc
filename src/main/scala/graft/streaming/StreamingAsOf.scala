package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the streaming twin of
  * `graft.operators.AsOfJoin`, and the live version of the reference's
  * "latest order state as of each trade" fold over the merged
  * heterogeneous stream
  * (`marketdb-iteratee/.../MultipleTimeSeriesEnumeratorTest.scala:262-311`).
  *
  * A keyed `flatMapGroupsWithState` carries the latest reference-side
  * (ts, value) per key across micro-batches: each probe event is
  * emitted with the most recent reference value at or before its
  * event time. Within a batch, events are processed in (ts, side)
  * order — reference rows at equal timestamps are visible to probe
  * rows (ASOF <= semantics, matching the batch operator). State is one
  * small tuple per key — O(#keys), evictable via an optional
  * processing-time idle timeout.
  *
  * Exactness caveat (inherent to streaming as-of): a reference event
  * arriving in a LATER micro-batch than a probe event it should have
  * matched cannot retroactively re-emit the probe row. Results are
  * exact when per-key reference events are not late across batches —
  * bound lateness upstream with a watermark on the source.
  */
object StreamingAsOf {

  /** Fixed scratch base for q125's AvailableNow replay gate — same
    * static-oracle-path trade as `Tables.scratchPartitionedPath`. */
  val scratchBase: String = "/tmp/graft_q125_stream_asof"

  final case class In(key: String, ts: Timestamp, side: String, value: Double)
  /** Reference state carries MICROS — `Timestamp.getTime` alone is
    * millis and silently truncates parquet micros (q125 caught this
    * against the oracle). */
  final case class RefState(tsUs: Long, value: Double)
  final case class Enriched(key: String, ts: Timestamp, value: Double,
      refTs: Timestamp, refValue: java.lang.Double)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** @param probe "probe" side marker in `sideCol` (rows are emitted)
    * @param ref   reference side marker (rows update state)
    * @param idleTimeoutMs > 0 evicts idle keys (long-running streams);
    *   0 for `Trigger.AvailableNow` runs. */
  def enrich(events: DataFrame, keyCol: String, tsCol: String,
      sideCol: String, valueCol: String, probe: String, ref: String,
      idleTimeoutMs: Long = 0L): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(sideCol).cast("string").as("side"),
      col(valueCol).cast("double").as("value")).as[In]

    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[RefState, Enriched](OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[In], state: GroupState[RefState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // ref rows sort before probe rows at equal ts => ASOF <=;
            // equal-ts ref ties order by value so the winner is
            // deterministic regardless of iterator order (hard rule 4)
            val ordered = rows.toArray.sortBy(e =>
              (micros(e.ts), if (e.side == ref) 0 else 1, e.value))
            var cur = state.getOption.orNull
            val out = Vector.newBuilder[Enriched]
            ordered.foreach { e =>
              val us = micros(e.ts)
              if (e.side == ref) {
                // keep the newest reference event; equal-ts ties resolve
                // to the greatest value (matches the sort order above)
                if (cur == null || us > cur.tsUs ||
                    (us == cur.tsUs && e.value >= cur.value))
                  cur = RefState(us, e.value)
              } else if (e.side == probe) {
                // a stored ref newer than this probe (late probe) must
                // not match: ASOF needs ref.ts <= probe.ts
                if (cur != null && cur.tsUs <= us)
                  out += Enriched(key, e.ts, e.value, toTs(cur.tsUs), cur.value)
                else
                  out += Enriched(key, e.ts, e.value, null, null)
              }
            }
            if (cur != null) state.update(cur)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }
}
