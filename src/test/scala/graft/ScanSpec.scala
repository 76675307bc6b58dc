package graft

import graft.operators.Scan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase distributed linear-recurrence scan: parity with the
  * sequential fold, exactness of the a=b=1 integer cumsum, and
  * partitioning-independence of both.
  */
class ScanSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val rows: Seq[(Long, Long, Double)] =
    for (k <- 0L until 7L; i <- 0L until 211L)
      yield (k, i, math.rint(rnd.nextDouble() * 10000) / 100.0)

  test("EWMA scan matches the sequential driver fold at every row") {
    val df = rows.toDF("k", "i", "x")
    val got = Scan
      .linearRecurrence(df, "k", Seq(("i", true)), "x", a = 0.2, b = 0.8,
        numPartitions = 13)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var acc = 0.0
      rs.sortBy(_._2).map { case (_, i, x) =>
        acc = 0.2 * x + 0.8 * acc
        (k, i) -> acc
      }
    }
    assert(got.size == expected.size)
    expected.foreach { case (ki, y) =>
      assert(math.abs(got(ki) - y) <= 1e-9 * math.max(1.0, math.abs(y)),
        s"row $ki: got ${got(ki)}, want $y")
    }
  }

  test("a=b=1 integer cumsum is EXACT and partition-count independent") {
    val df = rows.map { case (k, i, x) => (k, i, math.rint(x * 100)) }
      .toDF("k", "i", "x")
    val results = Seq(1, 5, 32).map { n =>
      Scan.linearRecurrence(df, "k", Seq(("i", true)), "x", 1.0, 1.0, n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
        .toMap
    }
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var acc = 0.0
      rs.sortBy(_._2).map { case (_, i, x) =>
        acc += math.rint(x * 100)
        (k, i) -> acc
      }
    }
    results.foreach { got =>
      expected.foreach { case (ki, y) => assert(got(ki) == y, s"row $ki") }
    }
  }

  test("descending order and single global key work") {
    val df = Seq((0L, 3L, 1.0), (0L, 2L, 2.0), (0L, 1L, 4.0))
      .toDF("k", "i", "x")
    // desc order: fold sees x = 1, 2, 4
    val got = Scan
      .linearRecurrence(df, "k", Seq(("i", false)), "x", 1.0, 1.0, 2)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(3))
      .toMap
    assert(got == Map(3L -> 1.0, 2L -> 3.0, 1L -> 7.0))
  }

  test("keys split across partition seams compose the carry in order") {
    // 1 key, strictly increasing x, many partitions: every partition
    // seam exercises the incoming-state correction
    val df = (0L until 100L).map(i => (9L, i, 1.0)).toDF("k", "i", "x")
    val got = Scan
      .linearRecurrence(df, "k", Seq(("i", true)), "x", 1.0, 1.0, 16)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(3))
      .toMap
    (0L until 100L).foreach(i => assert(got(i) == (i + 1).toDouble))
  }
}
