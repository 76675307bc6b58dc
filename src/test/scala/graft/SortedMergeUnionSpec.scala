package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Trade
import graft.operators.OrderedMerge

/** Custom physical operator: SortedMergeUnionExec must produce the
  * same rows as union+orderBy, in globally non-decreasing time, and
  * actually appear in the plan for small inputs (fallback to
  * Union+Sort is stats-driven). */
class SortedMergeUnionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  private def series(sec: String, offset: Int) =
    (0 until 50).map(i =>
      Trade("RTS", sec, offset * 1000L + i, 100.0 + i, 1,
        ts(i * 100L + offset), nosystem = false)).toDS.toDF

  test("merge exec plans for small inputs and preserves order") {
    val a = series("A", 0).sortWithinPartitions("time")
    val b = series("B", 7)
    val c = series("C", 13)
    val merged = OrderedMerge.mergeSorted("time", a, b, c)

    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("SortedMergeUnion "), s"operator missing:\n$plan")

    val rows = merged.collect()
    assert(rows.length === 150)
    val times = rows.map(_.getAs[Timestamp]("time").getTime)
    assert(times.zip(times.tail).forall { case (x, y) => x <= y },
      "output not globally time-ordered")

    // row-set equality with the declarative formulation
    val expected = a.unionByName(b).unionByName(c).orderBy("time")
      .collect().map(_.toString).sorted
    assert(rows.map(_.toString).sorted.toSeq === expected.toSeq)
  }

  test("big inputs fall back to distributed Union+Sort, same rows") {
    System.setProperty("graft.mergeSizeThreshold", "1")
    try {
      val merged = OrderedMerge.mergeSorted("time", series("A", 0), series("B", 7))
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("SortedMergeUnion "),
        s"expected fallback, got merge exec:\n$plan")
      assert(plan.contains("Sort "), s"fallback must sort:\n$plan")
      val rows = merged.collect()
      assert(rows.length === 100)
      val times = rows.map(_.getAs[Timestamp]("time").getTime)
      assert(times.zip(times.tail).forall { case (x, y) => x <= y })
    } finally System.clearProperty("graft.mergeSizeThreshold")
  }

  test("downstream sort on time is eliminated by outputOrdering") {
    val merged = OrderedMerge.mergeSorted("time", series("A", 0), series("B", 7))
    val sortedAgain = merged.orderBy("time")
    val plan = sortedAgain.queryExecution.executedPlan.toString
    // outputOrdering is declared, so the planner must not re-sort
    assert(!plan.split("SortedMergeUnion ").head.contains("Sort "),
      s"unexpected re-sort above the merge:\n$plan")
  }
}
