package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Order, Trade}

/** Reference API lifecycle (SURVEY §3.1): store → handle → fold.
  * Mirrors the reference's flagship README flow ("Trades count for
  * given interval") and the 10×10 merge + heterogeneous interleave
  * tests. */
class MarketDbApiSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1330000000000L + ms)

  private def mkTrades(n: Int): Seq[Trade] =
    (0 until n).map(i =>
      Trade("RTS", if (i % 2 == 0) "RIH" else "RIM", i.toLong,
        100.0 + i, 1, ts(i * 1000L), nosystem = false))

  test("store dedups by event key and trades() scans one series back") {
    val dir = Files.createTempDirectory("mdb").toString + "/trades"
    // duplicate tradeId 3 with a later correction: latest must win
    val rows = mkTrades(20) :+
      Trade("RTS", "RIM", 3L, 999.0, 1, ts(500000L), nosystem = false)
    MarketDbApi.store(rows.toDS, dir)

    val series = MarketDbApi.trades(spark, dir, "RTS", "RIH",
      ts(0), ts(8000L)) // end-inclusive: ids 0,2,4,6,8
    assert(MarketDbApi.counter(series) === 5)
    val seq = MarketDbApi.sequencer(series)
    assert(seq.map(_.tradeId) === Seq(0L, 2L, 4L, 6L, 8L))

    // idempotent upsert semantics: the corrected trade replaced id 3
    val all = MarketDbApi.trades(spark, dir, "RTS", "RIM", ts(0), ts(600000L))
    val t3 = all.collect().filter(_.tradeId == 3L)
    assert(t3.length === 1 && t3.head.price === 999.0)
  }

  test("scanAll merges trades and orders into one time-ordered stream") {
    implicit val s = spark
    val trades = (0 until 10).map(i =>
      Trade("RTS", "RIH", i.toLong, 100.0, 1, ts(i * 1000L), nosystem = false)).toDS
    val orders = (0 until 10).map(i =>
      Order("RTS", "RIH", 100L + i, ts(i * 1000L + 500), 1, 1.toShort,
        1.toShort, 100.0, 1, 0, None)).toDS
    val merged = MarketDbApi.scanAll(trades, orders)
    assert(merged.count() === 20)
    val kinds = merged.collect().map(_.kind)
    assert(kinds.zipWithIndex.forall { case (k, i) =>
      k == (if (i % 2 == 0) "trade" else "order")
    }, "expected strict trade/order interleaving")
    assert(graft.operators.OrderedMerge.inversions(merged.toDF, "time") === 0)
  }
}
