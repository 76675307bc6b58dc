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
  def mergeSorted(timeCol: String, streams: DataFrame*): DataFrame = {
    require(streams.nonEmpty, "need at least one stream")
    val spark = streams.head.sparkSession
    // idempotent strategy registration (also available via
    // spark.sql.extensions=graft.GraftExtensions)
    if (!spark.experimental.extraStrategies.contains(graft.plans.SortedMergeUnionStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.SortedMergeUnionStrategy
    }
    val cols = streams.head.columns.toSeq
    val aligned = streams.map(_.select(cols.map(col): _*))
    import org.apache.spark.sql.graft.Bridge
    Bridge.ofRows(spark,
      graft.plans.SortedMergeUnion(aligned.map(Bridge.analyzed), timeCol))
  }

  /** Order-invariant check (the reference's `sortedLogger` test fold,
    * `marketdb-loader/src/test/scala/.../ScalazIterateeTests.scala:67-84`):
    * count of adjacent inversions; 0 ⇔ stream is non-decreasing in
    * `timeCol`. Distributed via a lag window over a single ordering. */
  def inversions(df: DataFrame, timeCol: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(timeCol))
    df.select(col(timeCol))
      .withColumn("prev", lag(col(timeCol), 1).over(w))
      .where(col("prev") > col(timeCol))
      .count()
  }
}
