package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.BucketedLog

/** INGEST EXPECTATIONS — declarative row-level constraints screened
  * at the lakehouse door (the Delta Live Tables `EXPECT ... ON
  * VIOLATION` discipline): every arriving row either passes ALL
  * checks or lands in quarantine tagged with the FIRST violated
  * check's name — violations are data to debug from, never rows to
  * silently drop.
  *
  * Check classes, each with its 100 TB shape:
  *
  *   - [[screen]]: pure row-local predicates (not-null, ranges,
  *     formats) — zero-exchange codegen scans;
  *   - [[dedupInBatch]]: unique-key WITHIN the batch — one window
  *     over batch-sized data, the deterministic `orderCol` picks the
  *     surviving row (hard rule 4);
  *   - [[dedupVsStore]]: unique-key against everything EVER ingested
  *     — the naive form joins the whole store; here the batch's keys
  *     probe the key store through [[BucketedLog.readFor]], a
  *     directory-pruned point lookup costing O(batch-touched
  *     buckets), never O(store). A foreign-key check is the same
  *     probe against a dimension store (or a broadcast join for an
  *     in-memory dim).
  *
  * Precedence is the caller's check order (first hit wins), so a row
  * violating several constraints quarantines deterministically. */
object Expectations {

  val ReasonCol = "__reason"

  /** Tag each row with the first violated row-local check (`null`
    * reason = passes all). `checks` are (name, PASS-predicate). */
  def screen(batch: DataFrame, checks: Seq[(String, Column)]): DataFrame =
    batch.withColumn(ReasonCol,
      coalesce(checks.map { case (n, ok) =>
        when(!coalesce(ok, lit(false)), lit(n)) } :+
        lit(null).cast("string"): _*))

  /** Among still-clean rows, quarantine every duplicate of a key
    * already seen IN THIS BATCH, keeping the first CLEAN row under
    * `orderCol` (unique within a key — hard rule 4). The running
    * count is over clean rows only, so an already-quarantined row
    * sorting first can never evict the surviving clean row. */
  def dedupInBatch(screened: DataFrame, keyCols: Seq[String],
      orderCol: String, reason: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).asc).rowsBetween(Window.unboundedPreceding, 0)
    screened.withColumn("__cum",
        sum(when(col(ReasonCol).isNull, 1).otherwise(0)).over(w))
      .withColumn(ReasonCol,
        when(col(ReasonCol).isNull && col("__cum") > 1, lit(reason))
          .otherwise(col(ReasonCol)))
      .drop("__cum")
  }

  /** Among still-clean rows, quarantine keys ALREADY PRESENT in the
    * key store — a [[BucketedLog.readFor]] point lookup (the store's
    * rows for only the batch's buckets), broadcast into a left join.
    * O(batch + touched buckets) IO, never O(store) — and the
    * BROADCAST side is first semi-joined down to the batch's own
    * keys: `readFor` returns whole buckets by design, and with
    * production-sized buckets (a few hundred MB each) a batch
    * touching many buckets would otherwise broadcast GBs of
    * unrelated keys; after the semi-join the broadcast carries
    * ≤ |batch keys| rows (spec-pinned in `ExpectationsSpec`). */
  def dedupVsStore(screened: DataFrame, store: BucketedLog,
      keyCol: String, reason: String): DataFrame = {
    val present = presentKeys(screened, store, keyCol)
      .withColumn("__seen", lit(1))
    screened.join(broadcast(present), Seq(keyCol), "left")
      .withColumn(ReasonCol,
        when(col(ReasonCol).isNull && col("__seen") === 1, lit(reason))
          .otherwise(col(ReasonCol)))
      .drop("__seen")
  }

  /** The broadcast side of [[dedupVsStore]]: the store's keys that
    * ALSO appear in the batch (semi-join on the bucket-pruned slice)
    * — by construction ≤ the batch's distinct keys, regardless of
    * how full the touched buckets are. */
  private[graft] def presentKeys(screened: DataFrame, store: BucketedLog,
      keyCol: String): DataFrame = {
    val batchKeys = screened.select(col(keyCol)).distinct()
    store.readFor(batchKeys)
      .select(col(keyCol)).distinct()
      .join(batchKeys, Seq(keyCol), "left_semi")
  }

  def accepted(screened: DataFrame): DataFrame =
    screened.where(col(ReasonCol).isNull).drop(ReasonCol)

  def quarantined(screened: DataFrame): DataFrame =
    screened.where(col(ReasonCol).isNotNull)
}
