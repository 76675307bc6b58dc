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

  // ── unigramJsd (q207's operator) ─────────────────────────────────

  private def jsd(pairs: (String, String, Long)*): Map[(String, String), Double] = {
    val counts = pairs.toDF("slice", "w", "c")
    Drift.unigramJsd(counts, "slice", "w", "c")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
  }

  test("JSD of identical distributions is exactly zero") {
    val m = jsd(("a", "x", 3L), ("a", "y", 7L),
      ("b", "x", 3L), ("b", "y", 7L))
    assert(m(("a", "b")) === 0.0)
  }

  test("JSD of disjoint vocabularies is ln 2") {
    val m = jsd(("a", "x", 5L), ("b", "y", 9L))
    assert(m(("a", "b")) === math.rint(math.log(2.0) * 1e6) / 1e6)
  }

  test("JSD matches a direct dense computation and stays in [0, ln2]") {
    // a: x=2 y=2, b: x=1 y=2 z=1 — overlap {x,y}, tail {z}
    val m = jsd(("a", "x", 2L), ("a", "y", 2L),
      ("b", "x", 1L), ("b", "y", 2L), ("b", "z", 1L))
    def term(p: Double, q: Double): Double =
      (if (p > 0) p * math.log(2 * p / (p + q)) else 0.0)
    val want = 0.5 * (term(0.5, 0.25) + term(0.5, 0.5) + term(0.0, 0.25)) +
      0.5 * (term(0.25, 0.5) + term(0.5, 0.5) + term(0.25, 0.0))
    val got = m(("a", "b"))
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
    assert(got >= 0.0 && got <= math.log(2.0) + 1e-9)
  }

  test("JSD emits every unordered pair exactly once") {
    val m = jsd(("a", "x", 1L), ("b", "x", 1L), ("c", "x", 1L),
      ("a", "y", 2L), ("c", "z", 3L))
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
