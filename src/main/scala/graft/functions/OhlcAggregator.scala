package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass OHLC fold — the typed `Aggregator` rebuild of the
  * reference's user-supplied iteratee folds
  * (`marketdb-iteratee/.../MarketIteratees.scala`; SURVEY §2.10:
  * stateful custom folds → `Aggregator[IN, BUF, OUT]`).
  *
  * One buffer carries (firstTsUs, open, low, high, lastTsUs, close,
  * volume, n); merge is associative/commutative so Spark computes
  * map-side partials and the shuffle moves one 64-byte buffer per
  * group — equivalent cost to a built-in agg, but expressed as a
  * reusable fold like the reference's iteratees. Registered via
  * `functions.udaf` for Column use.
  */
object OhlcAggregator {

  /** (tsMicros, price) input; buffer/output as case classes. */
  final case class In(tsUs: Long, price: Double)
  final case class Buf(
      firstTsUs: Long, open: Double,
      low: Double, high: Double,
      lastTsUs: Long, close: Double,
      volume: Double, n: Long)
  final case class Ohlc(open: Double, high: Double, low: Double,
      close: Double, volume: Double, n: Long)

  val empty: Buf = Buf(Long.MaxValue, 0.0, Double.MaxValue, Double.MinValue,
    Long.MinValue, 0.0, 0.0, 0L)

  val agg: Aggregator[In, Buf, Ohlc] = new Aggregator[In, Buf, Ohlc] {
    override def zero: Buf = empty

    override def reduce(b: Buf, e: In): Buf = Buf(
      firstTsUs = math.min(b.firstTsUs, e.tsUs),
      open = if (e.tsUs < b.firstTsUs) e.price else b.open,
      low = math.min(b.low, e.price),
      high = math.max(b.high, e.price),
      lastTsUs = math.max(b.lastTsUs, e.tsUs),
      close = if (e.tsUs > b.lastTsUs) e.price else b.close,
      volume = b.volume + e.price,
      n = b.n + 1)

    override def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0) b
      else if (b.n == 0) a
      else Buf(
        firstTsUs = math.min(a.firstTsUs, b.firstTsUs),
        open = if (a.firstTsUs <= b.firstTsUs) a.open else b.open,
        low = math.min(a.low, b.low),
        high = math.max(a.high, b.high),
        lastTsUs = math.max(a.lastTsUs, b.lastTsUs),
        close = if (a.lastTsUs >= b.lastTsUs) a.close else b.close,
        volume = a.volume + b.volume,
        n = a.n + b.n)

    override def finish(b: Buf): Ohlc =
      Ohlc(b.open, b.high, b.low, b.close, b.volume, b.n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }
}
