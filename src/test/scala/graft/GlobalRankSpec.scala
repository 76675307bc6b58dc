package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.GlobalRank

/** Content-bucketed global rank (q208's operator): equal to the
  * single-window reference at several bucket fan-outs, batch geometry
  * exact, and — the point of the operator — the data never crosses a
  * single-partition exchange (the funnel a bare global row_number
  * introduces). */
class GlobalRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = (0L until 3000L).map(i => (i, s"k${i % 7}"))
    .toDF("id", "grp")

  private def keyed = rows.select($"id",
    md5(concat(lit("x:1:"), $"id".cast("string"))).as("h"))

  private def reference = keyed
    .withColumn("rank", row_number().over(Window.orderBy($"h", $"id")))
    .select("id", "rank")

  test("matches the single-window rank at nibble fan-outs 1, 2, 3") {
    val want = reference.orderBy("id").collect().toSeq
    for (nb <- Seq(1, 2, 3)) {
      val got = GlobalRank.withRank(keyed, $"h", Seq($"id"), "rank", nb)
        .select("id", "rank").orderBy("id").collect().toSeq
      assert(got === want, s"nibbles=$nb diverged")
    }
  }

  test("rank is independent of input partitioning") {
    val a = GlobalRank.withRank(keyed.coalesce(1), $"h", Seq($"id"), "rank")
      .select("id", "rank").orderBy("id").collect().toSeq
    val b = GlobalRank.withRank(keyed.repartition(13), $"h", Seq($"id"), "rank")
      .select("id", "rank").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("epochShuffle: exact batch geometry and epoch independence") {
    val e1 = GlobalRank.epochShuffle(rows, "id", "x", 1, 64)
    val sizes = e1.groupBy("batch").count().orderBy("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.length === 47) // ceil(3000/64)
    assert(sizes.init.forall(_._2 === 64L), "every full batch has 64")
    assert(sizes.last._2 === 3000L % 64)
    // positions within a batch are a permutation of 0..63
    val pos = e1.where($"batch" === 0L).select("pos")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pos === (0L until 64L))
    // a different epoch re-deals the order
    val e2 = GlobalRank.epochShuffle(rows, "id", "x", 2, 64)
    val diff = e1.as("a").join(e2.as("b"), "id")
      .where($"a.batch" =!= $"b.batch" || $"a.pos" =!= $"b.pos").count()
    assert(diff > 0L, "epoch 2 must shuffle differently")
  }

  test("scratch/output column collisions fail loudly instead of corrupting") {
    // withColumn would silently overwrite same-named caller columns
    val withScratch = keyed.withColumn("__gr_b", lit(7))
    intercept[IllegalArgumentException] {
      GlobalRank.withRank(withScratch, $"h", Seq($"id"), "rank")
    }
    val withRankName = keyed.withColumn("rank", lit(1))
    intercept[IllegalArgumentException] {
      GlobalRank.withRank(withRankName, $"h", Seq($"id"), "rank")
    }
  }

  test("plan: the data crosses one bucket exchange, never a funnel") {
    val df = GlobalRank.withRank(keyed, $"h", Seq($"id"), "rank")
    df.queryExecution.executedPlan.execute().count()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the data-side window is partitioned by the content bucket
    assert(p.contains("hashpartitioning(__gr_b"),
      s"expected the bucket exchange:\n$p")
    // the only single-partition exchange is the ≤16^n-row offsets
    // prefix window; the data path never funnels
    assert(p.split("Exchange SinglePartition").length - 1 <= 1,
      s"extra funnel exchanges:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"unexpected sampled range exchange:\n$p")
  }
}
