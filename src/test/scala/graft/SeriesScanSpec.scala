package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Trade
import graft.operators.{BatchedSink, SeriesScan}

/** Series scan interval semantics (end-inclusive, like the reference's
  * 0x00-padded stop key, `core/MarketDB.scala:79-82`) and the batched
  * sink matrix (`TradeDataToKestrelTest.scala:122-212`). */
class SeriesScanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  private def series = (0 until 10).map(i =>
    Trade("RTS", "RIH", i.toLong, 100.0, 1, ts(i), nosystem = false)).toDS.toDF

  test("scan bounds are end-inclusive and key-filtered") {
    val got = SeriesScan.scan(series, Map("market" -> "RTS", "security" -> "RIH"),
      "time", ts(2), ts(5))
    assert(got.count() === 4) // 2,3,4,5 — both bounds inclusive
    val none = SeriesScan.scan(series, Map("security" -> "OTHER"), "time", ts(0), ts(9))
    assert(none.count() === 0)
  }

  test("enumerate yields time order") {
    val e = SeriesScan.enumerate(series.orderBy($"tradeId".desc), "time")
    assert(graft.operators.OrderedMerge.inversions(e, "time") === 0)
  }

  /** Reference matrix: 60 events — batch 1000 ⇒ 1 flush; 40 ⇒ 2;
    * limit 50 ⇒ 50 rows; limit 20 ⇒ 20; batch 1 ⇒ 60 flushes. */
  test("batched sink matrix (single partition parity)") {
    val sixty = (0 until 60).map(i =>
      Trade("RTS", "RIH", i.toLong, 100.0, 1, ts(i), nosystem = false))
      .toDS.coalesce(1)
    def run(batch: Int, limit: Option[Long]) =
      BatchedSink.write(sixty, batch, limit)(_ => ())
    assert(run(1000, None) === BatchedSink.Report(60, 1))
    assert(run(40, None) === BatchedSink.Report(60, 2))
    assert(run(1000, Some(50)).written === 50)
    assert(run(1000, Some(20)).written === 20)
    assert(run(1, None) === BatchedSink.Report(60, 60))
  }
}
