package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics: most recent right row with rightTime <=
  * leftTime per key; equal timestamps match; no prior row ⇒ null. */
class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("matches latest prior, ties inclusive, null when none") {
    val trades = Seq(
      (1L, "A", ts(10)), // before any quote -> null
      (2L, "A", ts(20)), // tie with quote at 20 -> that quote
      (3L, "A", ts(35)), // latest prior is quote at 30
      (4L, "B", ts(25))  // other key
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(20), 101.0),
      ("A", ts(30), 102.0),
      ("B", ts(5), 200.0)
    ).toDF("sym", "qts", "px")

    val joined = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "qts",
        Seq("px" -> "last_px", "qts" -> "last_qts"))
      .orderBy("trade_id")
      .collect()

    assert(joined.length === 4)
    assert(joined(0).isNullAt(joined(0).fieldIndex("last_px")))
    assert(joined(1).getAs[Double]("last_px") === 101.0)
    assert(joined(1).getAs[Timestamp]("last_qts") === ts(20))
    assert(joined(2).getAs[Double]("last_px") === 102.0)
    assert(joined(3).getAs[Double]("last_px") === 200.0)
  }
}
