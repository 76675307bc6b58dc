package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.{MarketEvent, Trade}
import graft.operators.OrderedMerge

/** Reference-parity: k-way ordered merge invariants
  * (`MultipleTimeSeriesEnumeratorTest.scala:174-213` — 10 series × 10
  * events ⇒ 100 rows, globally non-decreasing time; `:262-311` —
  * heterogeneous trades+orders offset by 500 ms ⇒ strict
  * interleaving). */
class OrderedMergeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1330000000000L + ms)

  test("10 series x 10 events merge to 100 rows in non-decreasing time") {
    val streams = (0 until 10).map { s =>
      (0 until 10).map { i =>
        Trade("RTS", s"SEC-$s", s * 100L + i, 100.0 + i, 1, ts(i * 1000L + s * 7), nosystem = false)
      }.toDS.toDF
    }
    val merged = OrderedMerge.merge("time", streams: _*)
    assert(merged.count() === 100)
    assert(OrderedMerge.inversions(merged, "time") === 0)
  }

  test("heterogeneous merge interleaves trades and orders strictly") {
    val trades = (0 until 20).map(i =>
      MarketEvent("trade", "RTS", "RIH", i.toLong, 100.0, 1, ts(i * 1000L))).toDS.toDF
    val orders = (0 until 20).map(i =>
      MarketEvent("order", "RTS", "RIH", 1000L + i, 100.0, 1, ts(i * 1000L + 500))).toDS.toDF
    val merged = OrderedMerge.merge("time", trades, orders)
    val kinds = merged.orderBy("time").select("kind").collect().map(_.getString(0))
    assert(kinds.length === 40)
    assert(kinds.zipWithIndex.forall { case (k, i) =>
      k == (if (i % 2 == 0) "trade" else "order")
    }, "expected strict trade/order interleaving")
  }

  test("mergeTagged carries the stream discriminator") {
    val a = Seq((1L, ts(0))).toDF("id", "time")
    val b = Seq((2L, ts(1))).toDF("id", "time")
    val m = OrderedMerge.mergeTagged("time", "a" -> a, "b" -> b)
    assert(m.select("stream").collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
  }

  test("inversions detects out-of-order streams in physical row order") {
    // id order == (1000ms, 0ms, 2000ms): one adjacent inversion
    val unsorted = Seq((1L, ts(1000)), (2L, ts(0)), (3L, ts(2000)))
      .toDF("id", "time").coalesce(1).orderBy(col("id"))
    assert(OrderedMerge.inversions(unsorted, "time") === 1)
    // sorting by time fixes it
    assert(OrderedMerge.inversions(unsorted.orderBy(col("time")), "time") === 0)
  }

  test("failure in one of k merged streams propagates to the action") {
    // reference: MultipleTimeSeriesEnumeratorTest error-in-one-stream
    val ok = Seq((1L, ts(0))).toDF("id", "time")
    val failing = Seq((2L, ts(1))).toDF("id", "time")
      .withColumn("id", udf((_: Long) =>
        throw new IllegalStateException("stream fault")).apply(col("id")))
    val merged = OrderedMerge.merge("time", ok, failing)
    val e = intercept[Exception](merged.collect())
    assert(e.getMessage != null)
  }

  test("heterogeneous merge null-fills missing columns (superset schema)") {
    val trades = Seq((1L, ts(0), false)).toDF("id", "time", "nosystem")
    val orders = Seq((2L, ts(1), 5)).toDF("id", "time", "status")
    val merged = OrderedMerge.merge("time", trades, orders)
    assert(merged.columns.toSet === Set("id", "time", "nosystem", "status"))
    val rows = merged.orderBy("time").collect()
    assert(!rows(0).isNullAt(rows(0).fieldIndex("nosystem")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("status")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("nosystem")))
    assert(rows(1).getInt(rows(1).fieldIndex("status")) === 5)
  }

  test("inversions catches cross-partition boundary violations") {
    // range-sort by id puts (id 1, t=1000) in an earlier partition than
    // (id 2, t=0): inside each partition order is fine, the boundary isn't
    val df = Seq((1L, ts(1000)), (2L, ts(0)), (3L, ts(2000)), (4L, ts(3000)))
      .toDF("id", "time").repartitionByRange(2, col("id"))
      .sortWithinPartitions("id")
    assert(OrderedMerge.inversions(df, "time") === 1)
  }
}
