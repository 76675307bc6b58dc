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

  test("tolerance nulls a stale match; it never falls back to an older row") {
    val trades = Seq(
      (1L, "A", ts(12)), // quote at 10 is 2s old -> within 5s tol
      (2L, "A", ts(40)), // latest quote (30) is 10s old -> nulled,
                         // NOT replaced by the even older quote at 10
      (3L, "A", ts(33))  // quote at 30 is 3s old -> match
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(10), 100.0),
      ("A", ts(30), 103.0)
    ).toDF("sym", "qts", "px")
    val joined = AsOfJoin.asOfWithin(trades, quotes, Seq("sym"), "ts", "qts",
        Seq("px" -> "last_px"), tolUs = 5L * 1000000L)
      .orderBy("trade_id").collect()
    assert(joined(0).getAs[Double]("last_px") === 100.0)
    assert(joined(1).isNullAt(joined(1).fieldIndex("last_px")))
    assert(joined(2).getAs[Double]("last_px") === 103.0)
  }

  test("a matched row's NULL field stays NULL (struct carry, not per-column)") {
    val trades = Seq((1L, "A", ts(40))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(10), Some(100.0), 1L), // older quote with a real px
      ("A", ts(30), None, 2L)         // the as-of match; px genuinely NULL
    ).toDF("sym", "qts", "px", "qid")
    val joined = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "qts",
      Seq("px" -> "last_px", "qts" -> "last_qts"), rightTie = Seq("qid"))
      .collect()
    assert(joined.length === 1)
    // per-column last(ignoreNulls) would wrongly substitute 100.0 here
    assert(joined(0).isNullAt(joined(0).fieldIndex("last_px")))
    assert(joined(0).getAs[Timestamp]("last_qts") === ts(30))
  }

  test("forward mode matches the earliest right row at or after left time") {
    val trades = Seq(
      (1L, "A", ts(10)), // next quote is at 20
      (2L, "A", ts(20)), // tie: quote at 20 matches
      (3L, "A", ts(31)), // no later quote -> null
      (4L, "B", ts(1))   // next quote on B at 5
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(20), 101.0), ("A", ts(30), 102.0), ("B", ts(5), 200.0)
    ).toDF("sym", "qts", "px")
    val joined = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "qts",
        Seq("px" -> "next_px"), forward = true)
      .orderBy("trade_id").collect()
    assert(joined(0).getAs[Double]("next_px") === 101.0)
    assert(joined(1).getAs[Double]("next_px") === 101.0)
    assert(joined(2).isNullAt(joined(2).fieldIndex("next_px")))
    assert(joined(3).getAs[Double]("next_px") === 200.0)
  }

  test("forward ties at equal (key, ts) also resolve to greatest tie value") {
    val trades = Seq((1L, "A", ts(15))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(20), 101.0, 5L), ("A", ts(20), 109.0, 9L), ("A", ts(20), 103.0, 3L)
    ).toDF("sym", "qts", "px", "qid")
    (1 to 3).foreach { parts =>
      val joined = AsOfJoin.asOf(trades, quotes.repartition(parts),
        Seq("sym"), "ts", "qts", Seq("px" -> "next_px"),
        rightTie = Seq("qid"), forward = true).collect()
      assert(joined(0).getAs[Double]("next_px") === 109.0, s"parts=$parts")
    }
  }

  test("right-side ties at equal (key, ts) resolve to greatest tie value") {
    val trades = Seq((1L, "A", ts(25))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(20), 101.0, 5L),
      ("A", ts(20), 109.0, 9L), // same qts; greatest qid must win
      ("A", ts(20), 103.0, 3L)
    ).toDF("sym", "qts", "px", "qid")
    (1 to 3).foreach { parts =>
      val joined = AsOfJoin.asOf(trades, quotes.repartition(parts),
        Seq("sym"), "ts", "qts", Seq("px" -> "last_px"), rightTie = Seq("qid"))
        .collect()
      assert(joined.length === 1)
      assert(joined(0).getAs[Double]("last_px") === 109.0, s"parts=$parts")
    }
  }

  test("nearest mode picks the closer side; exact ties prefer backward; one-sided falls through") {
    val trades = Seq(
      (1L, "A", ts(100)), // back at 90 (d=10), fwd at 105 (d=5)  -> fwd
      (2L, "A", ts(94)),  // back at 90 (d=4),  fwd at 105 (d=11) -> back
      (3L, "A", ts(60)),  // no back,           fwd at 90         -> fwd
      (4L, "A", ts(200)), // back at 105,       no fwd            -> back
      (5L, "B", ts(50))   // no right rows at all                 -> null
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(90), 9.0), ("A", ts(105), 10.5)
    ).toDF("sym", "qts", "px")
    (1 to 3).foreach { parts =>
      val got = AsOfJoin.asOfNearest(trades, quotes.repartition(parts),
          Seq("sym"), "ts", "qts", Seq("px" -> "near_px"))
        .collect().map(r => r.getLong(0) ->
          Option(r.getAs[java.lang.Double]("near_px"))).toMap
      assert(got === Map(1L -> Some(10.5), 2L -> Some(9.0),
        3L -> Some(9.0), 4L -> Some(10.5), 5L -> None), s"parts=$parts")
    }
    // exact tie: back at 95, fwd at 105, left at 100 -> distances 5 == 5,
    // backward preferred
    val tie = AsOfJoin.asOfNearest(
        Seq((1L, "A", ts(100))).toDF("trade_id", "sym", "ts"),
        Seq(("A", ts(95), 1.0), ("A", ts(105), 2.0)).toDF("sym", "qts", "px"),
        Seq("sym"), "ts", "qts", Seq("px" -> "near_px"))
      .collect()
    assert(tie(0).getAs[Double]("near_px") === 1.0)
  }
}
