package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.streaming.BucketedLog

/** Ingest expectations (Expectations object doc): precedence is the
  * check order, within-batch dedup keeps the first CLEAN row (an
  * already-quarantined row sorting first must not evict it), and the
  * vs-store check probes only the batch's buckets. */
class ExpectationsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("screen tags the FIRST violated check; clean rows pass") {
    val rows = Seq(
      (Some(1L), 10L), (None, 20L), (Some(3L), -5L)
    ).toDF("k", "v")
    val sc = Expectations.screen(rows, Seq(
      "null_key" -> col("k").isNotNull,
      "range" -> (col("v") >= 0)))
    val got = sc.collect()
      .map(r => (Option(r.get(0)), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(got === Set(
      (Some(1L), 10L, None),
      (None, 20L, Some("null_key")),
      (Some(3L), -5L, Some("range"))))
  }

  test("dedupInBatch keeps the first CLEAN row, not the first row") {
    // key 7: a RANGE-violating row sorts first (seq 0); the clean row
    // at seq 1 must survive, the clean row at seq 2 is the duplicate
    val rows = Seq(
      (7L, 0, -1L), (7L, 1, 10L), (7L, 2, 11L), (8L, 0, 5L)
    ).toDF("k", "seq", "v")
    val sc = Expectations.dedupInBatch(
      Expectations.screen(rows, Seq("range" -> (col("v") >= 0))),
      Seq("k"), "seq", "dup")
    val reasons = sc.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> Option(r.getString(3)))
      .toMap
    assert(reasons === Map(
      (7L, 0) -> Some("range"), (7L, 1) -> None,
      (7L, 2) -> Some("dup"), (8L, 0) -> None))
  }

  test("dedupVsStore quarantines only keys already landed") {
    val dir = "/tmp/graft_expect_spec_store"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete() }
    rm(new java.io.File(dir))
    val store = BucketedLog(dir, Seq("k"), buckets = 4)
    store.init(Seq(1L, 2L, 3L).toDF("k"))
    val batch = Seq((2L, 10L), (9L, 20L)).toDF("k", "v")
    val sc = Expectations.dedupVsStore(
      Expectations.screen(batch, Nil), store, "k", "replay")
    val got = sc.collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got === Map(2L -> Some("replay"), 9L -> None))
  }

  test("dedupVsStore broadcasts ≤ the batch's keys, however full the buckets") {
    // readFor returns WHOLE buckets: with production-sized buckets a
    // naive broadcast of the slice ships GBs of unrelated keys — the
    // semi-join must cut the broadcast side to the batch's own keys
    val dir = "/tmp/graft_expect_spec_wide"
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete() }
    rm(new java.io.File(dir))
    val store = BucketedLog(dir, Seq("k"), buckets = 2)
    store.init((0L until 5000L).toDF("k")) // ~2500 keys PER bucket
    val batch = Seq((7L, 1L), (9999L, 2L), (7L, 3L)).toDF("k", "v")
    val present = Expectations.presentKeys(
      Expectations.screen(batch, Nil), store, "k")
    val rows = present.collect().map(_.getLong(0)).toSet
    // exactly the already-landed batch keys — never the bucket slice
    assert(rows === Set(7L))
    assert(present.count() <= batch.select("k").distinct().count(),
      "broadcast side must be bounded by the batch's distinct keys")
    // end-to-end behavior unchanged
    val sc = Expectations.dedupVsStore(
      Expectations.screen(batch, Nil), store, "k", "replay")
    val got = sc.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(got === Map((7L, 1L) -> Some("replay"),
      (7L, 3L) -> Some("replay"), (9999L, 2L) -> None))
  }
}
