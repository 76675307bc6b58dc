package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.RollingHashMin

/** Rolling-hash fingerprint: matches a reference implementation,
  * stable under runs, shift-invariant where expected. */
class RollingHashMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** naive reference: min over all k-windows of the polynomial hash */
  private def reference(s: String, k: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val kk = math.min(k, math.max(bytes.length, 1))
    if (bytes.isEmpty) 0L
    else bytes.sliding(kk).map { w =>
      w.foldLeft(BigInt(0))((acc, b) =>
        (acc * 257 + (b & 0xff)) % ((BigInt(1) << 61) - 1))
        .toLong
    }.min
  }

  test("matches the naive big-int reference on sample strings") {
    val samples = Seq("hello rolling hash world", "a", "", "aaaaaaa",
      "the quick brown fox", "ümläut bytes")
    val df = samples.toDF("s")
      .select(col("s"), RollingHashMin(col("s"), lit(8)).as("h"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === reference(r.getString(0), 8), s"for '${r.getString(0)}'")
    }
  }

  test("identical content anywhere in the doc yields overlapping window hashes") {
    // same 16-char core embedded in different shells -> same min can
    // only differ if the min window falls outside the core; use a core
    // engineered to contain the global min by making shells high-byte
    val core = "   abcdefghij   "
    val a = s"zzzz${core}zzzz"
    val b = s"yyyy${core}yyyy"
    val Seq(ha, hb) = Seq(a, b).toDF("s")
      .select(RollingHashMin(col("s"), lit(8))).collect().map(_.getLong(0)).toSeq
    assert(ha === hb, "shared low-byte core must dominate the min")
  }
}
