package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

/** PSI drift (q172's operator): zero for identical snapshots,
  * strictly positive per-term (each (p−q)·ln(p/q) ≥ 0), ordinal in
  * shift size, and empty bins survive via smoothing. */
class DriftSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def df(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")

  private def psi(a: Seq[Double], b: Seq[Double]): Double =
    Drift.psi(df(a), df(b), "grp", "v", binWidth = 1.0, nBins = 4)
      .collect().head.getDouble(1)

  test("identical snapshots score exactly zero") {
    val x = Seq(0.5, 1.5, 1.5, 2.5, 3.5)
    assert(psi(x, x) === 0.0)
  }

  test("PSI is nonnegative and grows with the shift") {
    val base = Seq.fill(40)(0.5) ++ Seq.fill(40)(1.5) ++ Seq.fill(20)(2.5)
    val small = Seq.fill(35)(0.5) ++ Seq.fill(45)(1.5) ++ Seq.fill(20)(2.5)
    val large = Seq.fill(5)(0.5) ++ Seq.fill(15)(1.5) ++ Seq.fill(80)(3.5)
    val s = psi(base, small)
    val l = psi(base, large)
    assert(s > 0.0 && l > s, s"expected 0 < $s < $l")
    assert(l > 0.25, s"a wholesale shift should alarm: $l") // action band
  }

  test("bins empty on one side survive via add-one smoothing (finite psi)") {
    val a = Seq.fill(50)(0.5)            // all mass in bin 0
    val b = Seq.fill(50)(3.5)            // all mass in bin 3
    val p = psi(a, b)
    assert(!p.isNaN && !p.isInfinite && p > 1.0, s"got $p")
  }
}
