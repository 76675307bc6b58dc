package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model, re-expressed for Spark SQL.
  *
  * Mirrors the reference's payload types
  * (`marketdb-api/src/main/scala/com/ergodicity/marketdb/model/Payload.scala:11-28`):
  * a time series is a set of typed market events keyed by
  * (market, security) with an event time. In the Spark rebuild a series
  * handle is simply a lazy, filtered `Dataset` — partition pruning plus
  * parquet min/max pruning replaces the reference's HBase row-key range
  * (`marketdb-core/.../core/MarketDB.scala:66-85`).
  */
final case class Trade(
    market: String,
    security: String,
    tradeId: Long,
    price: Double,
    amount: Int,
    time: Timestamp,
    nosystem: Boolean)

/** Order event; `deal` is the optional fill (id, price) — reference
  * `Payload.scala:19-28` models it as `Option[(Long, BigDecimal)]`. */
final case class Deal(id: Long, price: Double)
final case class Order(
    market: String,
    security: String,
    orderId: Long,
    time: Timestamp,
    status: Int,
    action: Short,
    dir: Short,
    price: Double,
    amount: Int,
    amountRest: Int,
    deal: Option[Deal])

/** Superset row for heterogeneous (trades + orders) merged streams —
  * the reference merges differently-typed series into one time-ordered
  * stream of `MarketPayload`
  * (`marketdb-iteratee/.../TimeSeriesEnumerator.scala:27-30`, test
  * `MultipleTimeSeriesEnumeratorTest.scala:262-311`). `kind` is the
  * union discriminator. */
final case class MarketEvent(
    kind: String, // "trade" | "order"
    market: String,
    security: String,
    eventId: Long,
    price: Double,
    amount: Int,
    time: Timestamp)

object Schemas {
  /** RTS archive CSV schema — `marketdb-loader/.../loader/TradeData.scala:36-48`:
    * `code;contract;price;amount;dat_time;trade_id;Nosystem`. */
  val rtsTradeCsv: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("contract", StringType),
    StructField("price", StringType),
    StructField("amount", StringType),
    StructField("dat_time", StringType),
    StructField("trade_id", StringType),
    StructField("Nosystem", StringType)))

  /** Timestamp format used by the RTS feed (`TradeData.scala:31`). */
  val rtsTimeFormat = "yyyy-MM-dd HH:mm:ss.SSS"

  val trade: StructType = StructType(Seq(
    StructField("market", StringType, nullable = false),
    StructField("security", StringType, nullable = false),
    StructField("tradeId", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("amount", IntegerType, nullable = false),
    StructField("time", TimestampType, nullable = false),
    StructField("nosystem", BooleanType, nullable = false)))
}
