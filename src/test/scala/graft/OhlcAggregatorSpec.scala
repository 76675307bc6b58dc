package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.OhlcAggregator

/** Typed Aggregator fold: must agree with the built-in min_by/max_by
  * formulation across partial/merge paths, including (ts, event_id)
  * tie resolution. */
class OhlcAggregatorSpec extends AnyFunSuite with SparkTestBase {

  test("matches built-in OHLC on real data across many partitions") {
    val ev = graft.sources.Tables.load(spark, sf0001, "events")
      .repartition(7) // force non-trivial partial merges
    val ohlc = udaf(OhlcAggregator.agg)
    val custom = ev.groupBy("event_type")
      .agg(ohlc(unix_micros(col("ts").cast("timestamp")), col("event_id"),
        col("value")).as("o"))
      .select(col("event_type"), col("o.open"), col("o.high"), col("o.low"),
        col("o.close"), col("o.volume"), col("o.n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
    val builtin = ev.groupBy("event_type")
      .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max("value").as("high"), min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        sum("value").as("volume"), count("*").as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
    assert(custom.keySet === builtin.keySet)
    custom.foreach { case (k, (o, h, l, c, v, n)) =>
      val (bo, bh, bl, bc, bv, bn) = builtin(k)
      assert(o === bo, s"open $k"); assert(h === bh, s"high $k")
      assert(l === bl, s"low $k"); assert(c === bc, s"close $k")
      assert(math.abs(v - bv) < 1e-6, s"volume $k"); assert(n === bn, s"n $k")
    }
  }

  test("equal timestamps resolve open/close on event id, any partition order") {
    import spark.implicits._
    // four rows, ALL at the same timestamp: open = min id, close = max id
    val rows = Seq(
      (100L, 7L, 3.0), (100L, 2L, 9.0), (100L, 9L, 4.0), (100L, 5L, 1.0))
    val ohlc = udaf(OhlcAggregator.agg)
    (1 to 4).foreach { parts =>
      val df = rows.toDF("ts_us", "event_id", "value").repartition(parts)
      val r = df.agg(ohlc(col("ts_us"), col("event_id"), col("value")).as("o"))
        .select("o.open", "o.close", "o.n").head()
      assert(r.getDouble(0) === 9.0, s"open parts=$parts") // id 2
      assert(r.getDouble(1) === 4.0, s"close parts=$parts") // id 9
      assert(r.getLong(2) === 4L)
    }
  }
}
