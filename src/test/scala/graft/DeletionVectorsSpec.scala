package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DeletionVectors

/** Merge-on-read equality deletes (DeletionVectors class doc): the
  * gate (q239) pins the no-rewrite/purge file-level contract on real
  * data; this spec pins the edges — a fully-deleted unit must NOT
  * resurrect at purge (dynamic partition overwrite writes no dir for
  * an empty unit, so the operator deletes it explicitly), deletes
  * are idempotent set folds, and purge on a clean table is a no-op. */
class DeletionVectorsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): DeletionVectors = {
    val base = s"/tmp/graft_dv_spec_$name"
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(base), true)
    val t = (0L until 40L).map(k => (k, (k / 10).toInt, k * 100L))
      .toDF("k", "unit", "v")
    t.write.partitionBy("unit").parquet(s"$base/tbl")
    val dv = DeletionVectors(s"$base/tbl", s"$base/dv", buckets = 4)
    dv.init(t)
    dv
  }

  private def keys(dv: DeletionVectors): Set[Long] =
    dv.read(spark).select("k").collect().map(_.getLong(0)).toSet

  test("merge-on-read equals the filter; purge preserves it bit-exactly") {
    val dv = fresh("a")
    dv.delete(Seq((0, 3L), (0, 7L), (2, 21L)).toDF("unit", "k"), 0L)
    val expect = (0L until 40L).toSet -- Set(3L, 7L, 21L)
    assert(keys(dv) === expect)
    assert(dv.dirtyUnits(spark) === Seq(0, 2))
    assert(dv.purge(spark) === Seq(0, 2))
    assert(keys(dv) === expect)
    assert(dv.dirtyUnits(spark).isEmpty)
    assert(dv.purge(spark) === Nil) // clean table: no-op
  }

  test("a fully-deleted unit never resurrects at purge") {
    val dv = fresh("b")
    dv.delete((10L until 20L).map(k => (1, k)).toDF("unit", "k"), 0L)
    val expect = (0L until 40L).toSet -- (10L until 20L).toSet
    assert(keys(dv) === expect)
    dv.purge(spark)
    assert(keys(dv) === expect, "empty unit's old files must be dropped")
  }

  test("delete batches fold as sets; replays screened by batch id") {
    val dv = fresh("c")
    dv.delete(Seq((0, 1L), (0, 2L)).toDF("unit", "k"), 0L)
    dv.delete(Seq((0, 2L), (0, 4L)).toDF("unit", "k"), 1L) // overlap ok
    dv.delete(Seq((0, 9L)).toDF("unit", "k"), 1L) // replay: no-op
    assert(keys(dv) === (0L until 40L).toSet -- Set(1L, 2L, 4L))
  }

  test("DV side broadcasts under the cap, shuffles above — identical answers") {
    // a delete-heavy stretch between purges (the GDPR burst) can grow
    // the un-purged sidecar past broadcast limits: past the cap the
    // anti-join must drop its hint and shuffle, never die building a
    // broadcast — the screens' both-ways plan-guarded discipline
    val thresholds = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = thresholds.map(k => k -> spark.conf.getOption(k))
    try {
      // silence auto-broadcast so the join kind reflects ONLY the hint
      thresholds.foreach(spark.conf.set(_, "-1"))
      spark.sharedState.cacheManager.clearCache()
      def mk(name: String, cap: Long) = {
        val base = s"/tmp/graft_dv_spec_$name"
        val f = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        f.delete(new org.apache.hadoop.fs.Path(base), true)
        val t = (0L until 40L).map(k => (k, (k / 10).toInt, k * 100L))
          .toDF("k", "unit", "v")
        t.write.partitionBy("unit").parquet(s"$base/tbl")
        val dv = DeletionVectors(s"$base/tbl", s"$base/dv", buckets = 4,
          broadcastMaxRows = cap)
        dv.init(t); dv
      }
      def plan(dv: DeletionVectors): String = {
        val df = dv.read(spark)
        df.queryExecution.executedPlan.execute().count()
        df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
      }
      val expect = (0L until 40L).toSet -- Set(3L, 7L)
      val under = mk("bc", cap = 1000000L)
      under.delete(Seq((0, 3L), (0, 7L)).toDF("unit", "k"), 0L)
      val pUnder = plan(under)
      assert(pUnder.contains("BroadcastHashJoin"),
        s"under the cap the DV anti-join must broadcast:\n$pUnder")
      assert(keys(under) === expect)
      val over = mk("sh", cap = 0L)
      over.delete(Seq((0, 3L), (0, 7L)).toDF("unit", "k"), 0L)
      val pOver = plan(over)
      assert(!pOver.contains("BroadcastHashJoin"),
        s"past the cap the broadcast hint must be dropped:\n$pOver")
      assert(keys(over) === expect)
      // purge works in shuffle mode too, answers bit-identical
      over.purge(spark)
      assert(keys(over) === expect)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
