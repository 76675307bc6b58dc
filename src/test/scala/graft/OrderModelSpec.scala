package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Deal, Order}

/** Order payload round-trip: the nullable deal struct
  * (`Option[(Long, BigDecimal)]` in the reference, `Payload.scala:28`)
  * must survive the Dataset encoder and null-safe SQL access. */
class OrderModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("Option[Deal] encodes as nullable struct and round-trips") {
    val ts = new Timestamp(1700000000000L)
    val orders = Seq(
      Order("RTS", "RIH", 1L, ts, 1, 1, 1, 100.0, 10, 10, None),
      Order("RTS", "RIH", 2L, ts, 2, 1, -1, 101.0, 5, 0, Some(Deal(77L, 100.5))))
      .toDS
    val schema = orders.schema("deal")
    assert(schema.dataType.typeName === "struct")
    assert(schema.nullable)
    // SQL access with null-safety
    val filled = orders.where("deal IS NOT NULL")
      .selectExpr("orderId", "deal.id", "deal.price").collect()
    assert(filled.length === 1)
    assert(filled.head.getLong(1) === 77L)
    // typed round-trip
    val back = orders.collect().sortBy(_.orderId)
    assert(back(0).deal.isEmpty)
    assert(back(1).deal.contains(Deal(77L, 100.5)))
  }
}
