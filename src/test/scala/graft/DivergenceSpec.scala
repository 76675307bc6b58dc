package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Fingerprint

/** Repair targeting (q229's operator): all three statuses, and
  * equal groups stay silent. */
class DivergenceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("labels a_only / b_only / divergent; equal groups silent") {
    val a = Seq((1L, "x"), (1L, "y"), (2L, "p"), (3L, "s"))
      .toDF("g", "v")
    val b = Seq((1L, "x"), (1L, "y"), (2L, "q"), (4L, "t"))
      .toDF("g", "v")
    val out = Fingerprint.divergence(a, b, Seq("g"), Seq(col("v")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(!out.contains(1L), "equal group flagged")
    assert(out(2L) == (("divergent", 1L, 1L)))
    assert(out(3L) == (("a_only", 1L, 0L)))
    assert(out(4L) == (("b_only", 0L, 1L)))
  }

  test("even-multiplicity XOR cancellation caught by count+sum") {
    // two copies of the same row XOR to 0 — the additive sum and the
    // count must still flag the divergence vs a single copy
    val a = Seq((1L, "x"), (1L, "x")).toDF("g", "v")
    val b = Seq((1L, "x")).toDF("g", "v")
    val out = Fingerprint.divergence(a, b, Seq("g"), Seq(col("v")))
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "divergent")
  }
}
