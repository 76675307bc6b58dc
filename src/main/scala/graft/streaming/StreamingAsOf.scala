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
  * Two modes:
  *  - [[enrich]] — immediate emit: each probe row is answered in the
  *    micro-batch it arrives in, against reference state seen SO FAR.
  *    Lowest latency, but a reference event arriving in a later batch
  *    than a probe it should have matched cannot retroactively re-emit
  *    the probe row — exact only when refs are never late across
  *    batches.
  *  - [[enrichExact]] — exact under bounded lateness: probe rows are
  *    BUFFERED in state until the event-time watermark passes their
  *    timestamp, so any reference row arriving within the watermark
  *    delay still matches. Emits trail live time by the delay; rows
  *    later than the delay are dropped by the watermark (the standard
  *    streaming contract). This is the mode whose output equals the
  *    batch `AsOfJoin` on the same data whenever lateness is bounded.
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

  /** Per-key buffered row for [[enrichExact]] state. */
  final case class Pend(tsUs: Long, value: Double)
  /** [[enrichExact]] state: un-emitted probes and not-yet-compactable
    * refs (both with ts at/above the last seen watermark), plus the
    * single newest ref BELOW the watermark (`floor*`) — every older
    * ref is unreachable because later-arriving probes are themselves
    * at/above the watermark. State size is O(rows inside the lateness
    * window) per key, not O(history). */
  final case class AsOfState(refs: Seq[Pend], probes: Seq[Pend],
      floorTs: Long, floorVal: Double, hasFloor: Boolean)

  /** Streaming as-of that is EXACT under bounded lateness: equals the
    * batch `AsOfJoin` whenever no row is later than `delay` (rows
    * beyond it are dropped by the watermark, like any Structured
    * Streaming stateful op). Probe rows wait in state until the
    * event-time watermark passes their timestamp — by then every
    * reference row that could match (ref.ts <= probe.ts < watermark)
    * has either arrived or is beyond the lateness contract — then emit
    * against the newest ref at-or-before their event time (ASOF <=,
    * equal-ts ref ties to the greatest value; same rule as [[enrich]]).
    * Keys with buffered probes register an event-time timeout so they
    * flush when the watermark advances even if the key gets no further
    * input. The final probes of a bounded replay need one watermark
    * push past them (a max-ts sentinel row on any key) — AvailableNow
    * then runs the extra timeout batch before terminating. */
  def enrichExact(events: DataFrame, keyCol: String, tsCol: String,
      sideCol: String, valueCol: String, probe: String, ref: String,
      delay: String): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(sideCol).cast("string").as("side"),
      col(valueCol).cast("double").as("value"))
      .withWatermark("ts", delay)
      .as[In]

    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, Enriched](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[In], state: GroupState[AsOfState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(
            AsOfState(Nil, Nil, 0L, 0.0, hasFloor = false))
          val incoming = rows.toArray
          val refs = (st.refs ++ incoming.iterator
              .filter(_.side == ref)
              .map(e => Pend(micros(e.ts), e.value)))
            .sortBy(r => (r.tsUs, r.value))
          val probes = st.probes ++ incoming.iterator
            .filter(_.side == probe)
            .map(e => Pend(micros(e.ts), e.value))
          // a probe strictly below the watermark can gain no new ref:
          // any ref that could match it (ref.ts <= probe.ts) would
          // itself be below the watermark and dropped at the source
          val (emit, hold) = probes.partition(_.tsUs < wmUs)
          var cur: Pend =
            if (st.hasFloor) Pend(st.floorTs, st.floorVal) else null
          var i = 0
          val out = emit.sortBy(p => (p.tsUs, p.value)).map { p =>
            while (i < refs.length && refs(i).tsUs <= p.tsUs) {
              val r = refs(i)
              if (cur == null || r.tsUs > cur.tsUs ||
                  (r.tsUs == cur.tsUs && r.value >= cur.value)) cur = r
              i += 1
            }
            if (cur != null)
              Enriched(key, toTs(p.tsUs), p.value, toTs(cur.tsUs), cur.value)
            else Enriched(key, toTs(p.tsUs), p.value, null, null)
          }
          // compact: fold every ref below the watermark into the floor
          var floor = cur
          while (i < refs.length && refs(i).tsUs < wmUs) {
            val r = refs(i)
            if (floor == null || r.tsUs > floor.tsUs ||
                (r.tsUs == floor.tsUs && r.value >= floor.value)) floor = r
            i += 1
          }
          // refs consumed by emission but still >= wm stay reachable
          // for held probes: recompute the kept refs from the sorted
          // array, not the pointer (a probe above wm may still need a
          // ref the emit loop already walked past)
          val keptRefs = refs.filter(_.tsUs >= wmUs)
          state.update(AsOfState(keptRefs, hold,
            if (floor != null) floor.tsUs else 0L,
            if (floor != null) floor.value else 0.0,
            hasFloor = floor != null))
          if (hold.nonEmpty) {
            val minHoldMs = Math.floorDiv(hold.map(_.tsUs).min, 1000L)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1L, minHoldMs))
          }
          out.iterator
      }
  }
}
