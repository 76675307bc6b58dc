package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-way time-ordered merge of multiple series — the reference's core
  * read-path operator: N sorted scanner streams interleaved by
  * min-timestamp head selection into one globally time-ordered stream
  * (`marketdb-iteratee/.../TimeSeriesEnumerator.scala:70-98`, min-head
  * pick at `:86-92`), including heterogeneous trades+orders merges
  * (`MultipleTimeSeriesEnumeratorTest.scala:262-311`).
  *
  * Spark-first: `unionByName(allowMissingColumns)` + a global
  * `orderBy(time)`. Catalyst plans the sort as range partitioning +
  * per-partition sort — at cluster scale that is a k-way merge of
  * pre-sorted runs per range, distributed across executors, which is
  * exactly the reference algorithm generalized. The invariant carried
  * over from the reference test suite
  * (`MultipleTimeSeriesEnumeratorTest.scala:205-210`) is
  * *non-decreasing event time*; tie order between streams is
  * unspecified there and stays unspecified here.
  */
object OrderedMerge {

  /** Merge heterogeneous series into one globally time-ordered stream.
    * Missing columns null-fill (superset schema, SURVEY §1.4). */
  def merge(timeCol: String, streams: DataFrame*): DataFrame = {
    require(streams.nonEmpty, "need at least one stream")
    streams
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .orderBy(col(timeCol))
  }

  /** Merge keeping a discriminator column naming the source stream —
    * mirrors the reference's typed-payload pattern match on the merged
    * stream. */
  def mergeTagged(timeCol: String, tagged: (String, DataFrame)*): DataFrame =
    merge(
      timeCol,
      tagged.map { case (tag, df) => df.withColumn("stream", lit(tag)) }: _*)

  /** Merge via the custom `SortedMergeUnion` operator
    * (`graft.plans`): k-way merge of pre-sorted series without a
    * re-sort when sizes allow, Union+Sort fallback otherwise — the
    * planner decides from stats. Children must share the schema;
    * each is sorted by `timeCol` on the way in (a no-op for sources
    * that already are, thanks to requiredChildOrdering). */
  def mergeSorted(timeCol: String, streams: DataFrame*): DataFrame =
    mergeSortedTied(timeCol, Nil, streams: _*)

  /** `mergeSorted` with explicit tiebreak columns: (timeCol, tieCols)
    * should form a per-child total order, making merge + limit return a
    * deterministic row set (hard rule 4) — the pushed per-child top-n
    * sorts by the full key, so equal timestamps straddling row n can no
    * longer flip the selection. Without tiebreaks, tie order stays
    * unspecified (the reference's semantics). */
  def mergeSortedTied(timeCol: String, tieCols: Seq[String],
      streams: DataFrame*): DataFrame = {
    require(streams.nonEmpty, "need at least one stream")
    val spark = streams.head.sparkSession
    // idempotent strategy + optimizer-rule registration (also available
    // via spark.sql.extensions=graft.GraftExtensions)
    if (!spark.experimental.extraStrategies.contains(graft.plans.SortedMergeUnionStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.SortedMergeUnionStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SortedMergeUnionLimitPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SortedMergeUnionLimitPushdown
    }
    val cols = streams.head.columns.toSeq
    val aligned = streams.map(_.select(cols.map(col): _*))
    import org.apache.spark.sql.graft.Bridge
    Bridge.ofRows(spark,
      graft.plans.SortedMergeUnion(aligned.map(Bridge.analyzed), timeCol,
        tieCols))
  }

  /** Order-invariant check (the reference's `sortedLogger` test fold,
    * `marketdb-loader/src/test/scala/.../ScalazIterateeTests.scala:67-84`):
    * count of adjacent inversions in the frame's CURRENT row order
    * (partitions in index order, rows in partition order); 0 ⇔ the
    * stream is non-decreasing in `timeCol`. Checked per-partition in
    * parallel plus one tiny driver pass over per-partition (first,
    * last) boundaries — a window ordered by `timeCol` itself would
    * re-sort the data and make the check vacuous. Nulls are skipped. */
  def inversions(df: DataFrame, timeCol: String): Long = {
    val parts = df.select(col(timeCol)).rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var inv = 0L
        var first: Comparable[Any] = null
        var prev: Comparable[Any] = null
        it.foreach { row =>
          val v = if (row.isNullAt(0)) null
            else row.get(0).asInstanceOf[Comparable[Any]]
          if (v != null) {
            if (prev != null && prev.compareTo(v) > 0) inv += 1
            if (first == null) first = v
            prev = v
          }
        }
        Iterator.single((idx, inv, first, prev))
      }
      .collect().sortBy(_._1)
    val within = parts.map(_._2).sum
    val nonEmpty = parts.filter(_._3 != null)
    val boundary = nonEmpty.sliding(2).count {
      case Array((_, _, _, prevLast), (_, _, nextFirst, _)) =>
        prevLast.compareTo(nextFirst) > 0
      case _ => false
    }
    within + boundary
  }
}
