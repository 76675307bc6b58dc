package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The per-bucket screening state machines shared by
  * [[StreamingNearDup]] (Hamming fingerprints) and [[StreamingMinHash]]
  * (MinHash signatures), parameterized on the fingerprint type `F` and
  * the per-pair comparator — ONE implementation of the
  * eviction/deadline/late-row semantics, so a fix (like round 5's
  * hot-bucket age prune) lands in every streaming dedup operator at
  * once instead of being re-applied per copy.
  *
  * `compare(d0, s0, doc, sig)` returns the pair to emit for a
  * (stored, arriving) combination, or None; it owns the self-pair
  * check and the similarity threshold, i.e. everything
  * fingerprint-specific.
  */
private[streaming] object BucketScreen {

  /** Unbounded/FIFO screening step (the NoTimeout operators): compare
    * each arrival against the stored members, then prepend it
    * most-recent-first, trimmed to `stateCap`. */
  def screen[F, P](arrivals: Iterator[(Long, F)], stored: List[(Long, F)],
      stateCap: Int, compare: (Long, F, Long, F) => Option[P])
      : (List[(Long, F)], List[P]) = {
    var seen = stored
    val out = List.newBuilder[P]
    arrivals.foreach { case (doc, sig) =>
      seen.foreach { case (d0, s0) => compare(d0, s0, doc, sig).foreach(out += _) }
      seen = ((doc, sig) :: seen).take(stateCap)
    }
    (seen, out.result())
  }

  /** One bucket invocation of the WATERMARK-DRIVEN EVICTION machine
    * (the EventTimeTimeout operators). Semantics, in one place:
    *
    *  - State carries the bucket's max observed event time so the
    *    timeout deadline is MONOTONE: an out-of-order (late-but-valid)
    *    arrival never moves it backwards and evicts early.
    *  - AGE PRUNE on every invocation: a HOT bucket (data every
    *    trigger) never reaches the idle timeout, so the window bound
    *    is also enforced per member — members more than `evictMs`
    *    behind the bucket's max event time drop before screening, and
    *    an arrival that far behind screens nothing. State is thereby
    *    bounded by arrival rate over the window, not stream length;
    *    pairs whose members sit further apart in event time than the
    *    window are missed — the recency trade, for idle AND hot
    *    buckets.
    *  - A null event time retains for a full window from the bucket's
    *    max; `stateCap` composes (FIFO bound within the window).
    *  - The re-armed deadline must sit strictly past the current
    *    watermark (API requirement; the max() also covers all-null
    *    timestamps). Eviction is deterministic under replay — driven
    *    by data, not wall clock.
    */
  def evictingStep[F, P](
      arrivals: List[(Long, F, java.sql.Timestamp)],
      state: GroupState[(Long, List[(Long, F, Long)])],
      evictMs: Long, stateCap: Int,
      compare: (Long, F, Long, F) => Option[P]): Iterator[P] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val (storedMax, stored) =
        state.getOption.getOrElse((Long.MinValue, List.empty[(Long, F, Long)]))
      var maxTs = storedMax
      arrivals.foreach { case (_, _, ts) =>
        if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
      }
      val cutoff =
        if (maxTs == Long.MinValue) Long.MinValue else maxTs - evictMs
      var seen = stored.filter(_._3 >= cutoff)
      val out = List.newBuilder[P]
      arrivals.foreach { case (doc, sig, ts) =>
        val t = if (ts == null) maxTs else ts.getTime
        if (t >= cutoff) {
          seen.foreach { case (d0, s0, _) =>
            compare(d0, s0, doc, sig).foreach(out += _)
          }
          seen = ((doc, sig, t) :: seen).take(stateCap)
        }
      }
      state.update((maxTs, seen))
      state.setTimeoutTimestamp(
        math.max(maxTs + evictMs, state.getCurrentWatermarkMs() + 1))
      out.result().iterator
    }
  }
}
