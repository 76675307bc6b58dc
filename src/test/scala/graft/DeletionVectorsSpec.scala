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
}
