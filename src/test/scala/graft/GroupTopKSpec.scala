package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

/** Bounded-heap top-k per group (q174's operator): equals the window
  * formulation exactly, emits rank order, never plans a Sort/Window,
  * partition-invariant. */
class GroupTopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 1.0, 4L),
    ("b", 2.0, 5L), ("b", 3.0, 6L),
    ("c", 7.0, 7L))

  private def run(parts: Int) = GroupTopK.topK(
      rows.toDF("g", "v", "id").repartition(parts),
      Seq("g"), struct(col("v"), col("id")), k = 2)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    .toSet

  test("largest-first with full-struct descending tiebreak; short groups keep all rows") {
    val got = run(4)
    assert(got === Set(
      ("a", 1L, 9.0, 3L), ("a", 2L, 9.0, 2L), // tie -> larger id first
      ("b", 1L, 3.0, 6L), ("b", 2L, 2.0, 5L),
      ("c", 1L, 7.0, 7L)), got)
    assert(run(1) === run(32))
  }

  test("smallest variant ascends") {
    val got = GroupTopK.topK(rows.toDF("g", "v", "id"),
        Seq("g"), struct(col("v"), col("id")), k = 1, largest = false)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(got === Set(("a", 1.0), ("b", 2.0), ("c", 7.0)), got)
  }

  test("plans an ObjectHashAggregate heap, never a Sort or Window") {
    val df = GroupTopK.topK(rows.toDF("g", "v", "id"),
      Seq("g"), struct(col("v"), col("id")), k = 2)
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("collect_top_k"), s"no heap aggregate:\n$p")
    assert(!p.contains("Window") && !"\\bSort\\b".r.findFirstIn(p).isDefined,
      s"top-k planned a sort:\n$p")
  }
}
