package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Resample family edge semantics: grid bounds, forward-fill carry,
  * and the lerp degradations (exactly-on-a-point, before-first,
  * after-last, midpoint). */
class ResampleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:30:00"), 10.0),
    (1L, ts("2024-01-01 12:30:00"), 30.0))
    .toDF("k", "ts", "v")

  test("grid spans trunc(min)..max inclusive") {
    val g = Resample.grid(points, "k", "ts", "hour", "1 hour")
      .collect().map(_.getTimestamp(1)).sorted
    assert(g.head === ts("2024-01-01 10:00:00"))
    assert(g.last === ts("2024-01-01 12:00:00")) // last step <= max ts
    assert(g.length === 3)
  }

  test("ffill carries the last value at-or-before; null before first") {
    val got = Resample.ffill(
        Resample.grid(points, "k", "ts", "hour", "1 hour"),
        points, "k", "ts", "v")
      .collect().map(r => r.getTimestamp(1) -> Option(r.get(3))).toMap
    assert(got(ts("2024-01-01 10:00:00")) === None) // before first point
    assert(got(ts("2024-01-01 11:00:00")) === Some(10.0))
    assert(got(ts("2024-01-01 12:00:00")) === Some(10.0))
  }

  test("lerp interpolates midpoints and degrades to neighbors at the edges") {
    val got = Resample.lerp(
        Resample.grid(points, "k", "ts", "hour", "1 hour"),
        points, "k", "ts", "v")
      .collect().map(r => r.getTimestamp(1) -> r.getDouble(4)).toMap
    // 10:00 is before the first point -> next_v
    assert(got(ts("2024-01-01 10:00:00")) === 10.0)
    // 11:00 sits 30 of 120 minutes into [10:30, 12:30] -> 10 + 20*0.25
    assert(got(ts("2024-01-01 11:00:00")) === 15.0)
    assert(got(ts("2024-01-01 12:00:00")) === 25.0)
    // a grid point exactly on an observation returns it
    val onPoint = Resample.lerp(
        Seq((1L, ts("2024-01-01 10:30:00"))).toDF("k", "grid_ts"),
        points, "k", "ts", "v")
      .collect().head.getDouble(4)
    assert(onPoint === 10.0)
    // after the last observation -> prev_v
    val after = Resample.lerp(
        Seq((1L, ts("2024-01-01 23:00:00"))).toDF("k", "grid_ts"),
        points, "k", "ts", "v")
      .collect().head.getDouble(4)
    assert(after === 30.0)
  }
}
