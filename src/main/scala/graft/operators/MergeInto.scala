package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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

  // ---- versioned state (sequential CDC apply, any batch order) ----------

  /** Internal columns of a VERSIONED snapshot state: the winning
    * change's (ts, id) per key and a delete tombstone flag. Carrying
    * the version makes sequential apply a RUNNING MAXIMUM: each batch
    * pre-reduces to its per-key max-by-(ts, id) winner, and the merge
    * keeps whichever of {stored version, batch winner} is larger — so
    * after any partition of the change set into batches, in any batch
    * order, the state holds the GLOBAL per-key winner (max of batch
    * maxima = overall max). Deletes persist as tombstone rows carrying
    * their version (not physical removal), otherwise an older 'U'
    * arriving in a later batch would wrongly resurrect the key.
    * [[publish]] filters tombstones out. A replayed batch ties on
    * (ts, id) and loses, so apply is idempotent (at-least-once safe). */
  val VersionTsCol = "__ver_ts"
  val VersionIdCol = "__ver_id"
  val TombstoneCol = "__deleted"

  /** Lift a plain base snapshot into versioned state: base rows carry
    * a NULL version (older than any change — every change beats base,
    * matching the one-shot [[apply]] contract) and no tombstone.
    * `tsType`/`idType` must match the change feed's column types. */
  def initState(base: DataFrame, keyCol: String, payloadCols: Seq[String],
      tsType: DataType, idType: DataType): DataFrame =
    base.select(col(keyCol) +: payloadCols.map(col) ++: Seq(
      lit(null).cast(tsType).as(VersionTsCol),
      lit(null).cast(idType).as(VersionIdCol),
      lit(false).as(TombstoneCol)): _*)

  /** Fold one change batch into versioned state (same shape as
    * [[apply]]: map-side max_by pre-reduction, then ONE full-outer
    * join by key — no window or sort over the state side). A change
    * wins iff the state key is absent, base-era (NULL version), or
    * strictly older by (ts, id); otherwise the stored row (including
    * its tombstone) stands. */
  def applyVersioned(state: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, idCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val pay: Seq[Column] = payloadCols.map(col)
    val latest = changes.groupBy(col(keyCol))
      .agg(max_by(
        struct(col(opCol).as("op") +: pay :+
          col(tsCol).as("ts") :+ col(idCol).as("id"): _*),
        struct(col(tsCol), col(idCol))).as("ch"))
    val merged = state.join(latest, Seq(keyCol), "full_outer")
    val chWins = col("ch").isNotNull && (col(VersionTsCol).isNull ||
      struct(col("ch.ts"), col("ch.id")) >
        struct(col(VersionTsCol), col(VersionIdCol)))
    merged.select(col(keyCol) +:
      payloadCols.map { c =>
        when(chWins, col(s"ch.$c")).otherwise(col(c)).as(c)
      } ++: Seq(
        when(chWins, col("ch.ts")).otherwise(col(VersionTsCol))
          .as(VersionTsCol),
        when(chWins, col("ch.id")).otherwise(col(VersionIdCol))
          .as(VersionIdCol),
        when(chWins, col("ch.op") === "D").otherwise(col(TombstoneCol))
          .as(TombstoneCol)): _*)
  }

  /** The user-facing snapshot: versioned state minus tombstones and
    * internal columns. After sequentially applying every batch,
    * `publish(state) == apply(base, allChanges)` for ANY split of the
    * change set — including out-of-order cross-batch arrival. */
  def publish(state: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame =
    state.where(!col(TombstoneCol))
      .select(col(keyCol) +: payloadCols.map(col): _*)
}
