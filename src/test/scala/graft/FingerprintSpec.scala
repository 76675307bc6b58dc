package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Fingerprint

/** Content fingerprints (q173's operator): invariant under order and
  * partitioning, sensitive to any row change, and the additive sum
  * catches what XOR cancels. */
class FingerprintSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def fp(rows: Seq[(String, Long, String)], parts: Int = 4) =
    Fingerprint.grouped(
        rows.toDF("day", "id", "payload").repartition(parts),
        Seq("day"), Seq(col("id"), col("payload")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  private val base = Seq(
    ("d1", 1L, "x"), ("d1", 2L, "y"), ("d2", 3L, "z"))

  test("identical multisets fingerprint identically under any order/partitioning") {
    assert(fp(base) === fp(base.reverse, parts = 1))
    assert(fp(base) === fp(base, parts = 32))
  }

  test("any single-row change moves the digest; only its group moves") {
    val a = fp(base)
    val b = fp(Seq(("d1", 1L, "x"), ("d1", 2L, "Y"), ("d2", 3L, "z")))
    assert(a("d1") !== b("d1"))
    assert(a("d2") === b("d2"))
  }

  test("a row duplicated twice XOR-cancels but the additive sum catches it") {
    val a = fp(base)
    val dup = fp(base ++ Seq(("d2", 3L, "z"), ("d2", 3L, "z")))
    val (na, xa, sa) = a("d2"); val (nd, xd, sd) = dup("d2")
    assert(xa === xd, "XOR is blind to even multiplicity (by design)")
    assert((na !== nd) && (sa !== sd), "count+sum must catch it")
  }
}
