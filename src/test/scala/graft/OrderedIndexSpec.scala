package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.OrderedIndex

/** Scalable dense-index allocation: must equal the single-partition
  * row_number formulation regardless of input partitioning. */
class OrderedIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("matches row_number semantics across partitionings") {
    val names = Seq("pear", "apple", "mango", "kiwi", "fig", "banana")
    (1 to 4).foreach { parts =>
      val df = names.toDF("name").repartition(parts)
      val got = OrderedIndex.attach(df, Seq(col("name")), "idx", startAt = 1L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = names.sorted.zipWithIndex.map { case (n, i) => n -> (i + 1L) }.toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("empty input yields empty output with the index column") {
    val df = Seq.empty[String].toDF("name")
    val out = OrderedIndex.attach(df, Seq(col("name")), "idx")
    assert(out.columns.toSeq === Seq("name", "idx"))
    assert(out.count() === 0)
  }
}
