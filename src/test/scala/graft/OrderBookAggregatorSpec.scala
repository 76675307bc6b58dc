package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.OrderBookAggregator
import graft.functions.OrderBookAggregator.Delta

/** Order-book fold: place/cancel deltas net per level; top-of-book
  * from surviving depth; partition-order independent (merge is a
  * level-wise sum). */
class OrderBookAggregatorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val flow = Seq(
    // bids
    Delta(1, 100.0, 10L), Delta(1, 101.0, 5L), Delta(1, 101.0, 3L),
    Delta(1, 102.0, 2L), Delta(1, 102.0, -2L), // best-bid level fully cancelled
    // asks
    Delta(2, 103.0, 7L), Delta(2, 104.0, 9L),
    Delta(2, 103.0, -7L), // best ask cancelled -> 104 becomes best
    Delta(2, 103.5, 4L))

  test("reconstructs top-of-book across partitionings") {
    val ohlc = udaf(OrderBookAggregator.agg)
    (1 to 4).foreach { parts =>
      val df = flow.toDS.repartition(parts)
      val r = df.agg(ohlc(col("dir"), col("price"), col("qtyDelta")).as("b"))
        .select("b.bestBid", "b.bidDepth", "b.bestAsk", "b.askDepth", "b.nLevels")
        .head()
      assert(r.getDouble(0) === 101.0, s"bestBid parts=$parts")
      assert(r.getLong(1) === 8L) // 5 + 3 at 101
      assert(r.getDouble(2) === 103.5)
      assert(r.getLong(3) === 4L)
      assert(r.getLong(4) === 4L) // 100, 101 bids; 103.5, 104 asks
    }
  }

  test("-0.0 and 0.0 collapse into one price level") {
    val ohlc = udaf(OrderBookAggregator.agg)
    val r = Seq(Delta(1, 0.0, 3L), Delta(1, -0.0, 2L)).toDS
      .agg(ohlc(col("dir"), col("price"), col("qtyDelta")).as("b"))
      .select("b.bestBid", "b.bidDepth", "b.nLevels").head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 1L)
  }

  test("empty flow yields an empty book") {
    val ohlc = udaf(OrderBookAggregator.agg)
    val r = Seq.empty[Delta].toDS
      .agg(ohlc(col("dir"), col("price"), col("qtyDelta")).as("b"))
      .select("b.bestBid", "b.bestAsk", "b.nLevels").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getLong(2) === 0L)
  }
}
