package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch CDC apply — the lakehouse `MERGE INTO` (Delta/Iceberg
  * upsert): fold a change batch (insert/update/delete rows, each
  * stamped with an event time and a unique change id) into a base
  * snapshot, producing the next snapshot.
  *
  * Semantics (the standard latest-change-wins contract):
  *  - per key, the WINNING change is the maximum by (ts, changeId) —
  *    a total order (hard rule 4), so the result is a pure function
  *    of the two tables;
  *  - winner 'D' → the key disappears (whether or not base had it);
  *  - winner 'U' (or insert) → the key carries the change's payload,
  *    inserting if base lacked it;
  *  - keys with no change pass through from base untouched.
  *
  * Spark-first / 100 TB shape: the change batch pre-reduces to ONE
  * row per key with `max_by` (partial aggregation — map-side combine
  * eats intra-batch churn before the shuffle), then a single
  * full-outer join by key against base — one exchange of each side,
  * no window or sort over base (a full-outer join cannot broadcast,
  * so the base shuffle is inherent; with a BUCKETED base table the
  * join co-locates and even that exchange disappears). The change
  * side after reduction is one row per touched key — tiny.
  *
  * Returns base's schema restricted to (keyCol, payloadCols). */
object MergeInto {

  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, idCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val pay: Seq[Column] = payloadCols.map(col)
    val latest = changes.groupBy(col(keyCol))
      .agg(max_by(struct(col(opCol).as("op") +: pay: _*),
        struct(col(tsCol), col(idCol))).as("ch"))
    val merged = base.join(latest, Seq(keyCol), "full_outer")
    // winner D deletes; winner U/I takes the change payload; no
    // change -> base row (ch is null only for untouched base keys)
    merged
      .where(col("ch").isNull || col("ch.op") =!= "D")
      .select(col(keyCol) +: payloadCols.map { c =>
        when(col("ch").isNotNull, col(s"ch.$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
