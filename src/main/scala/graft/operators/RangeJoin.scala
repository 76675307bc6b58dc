package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the other canonical time-series
  * join Spark lacks natively (SURVEY §2.3: the reference's key-range
  * scan is a degenerate one-sided range predicate,
  * `marketdb-core/.../core/MarketDB.scala:79-84`).
  *
  * A naive `a.join(b, cond)` with only inequality conditions plans a
  * nested-loop join — quadratic and undistributable at scale. This
  * operator bucketizes time: intervals explode to every bucket they
  * overlap, points land in exactly one bucket, and the join becomes an
  * equi-join on (keys, bucket) followed by the exact interval filter.
  * EXACT (each point meets every interval it belongs to, exactly once —
  * the interval copy in the point's own bucket), one hash shuffle, and
  * the bucket fan-out is bounded by interval_length / bucketWidth.
  * Pick `bucketUs` near the typical interval length: too small →
  * interval fan-out; too large → many false candidates for the filter.
  */
object RangeJoin {

  /** @param points    side with one event-time column `pointUs`
    *                  (epoch micros, long)
    * @param intervals side with `[startUs, endUs]` inclusive bounds
    *                  (epoch micros, long)
    * @param keys      equi-key columns present on both sides
    * @param bucketUs  bucket width in microseconds
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointUs: String, startUs: String, endUs: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.withColumn("__b",
      floor(col(pointUs) / lit(bucketUs)).cast("long"))
    val i = intervals.withColumn("__b",
      explode(sequence(
        floor(col(startUs) / lit(bucketUs)).cast("long"),
        floor(col(endUs) / lit(bucketUs)).cast("long"))))
    p.join(i, keys :+ "__b")
      .where(col(pointUs) >= col(startUs) && col(pointUs) <= col(endUs))
      .drop("__b")
  }
}
