package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.BucketedLog

/** Deep clone (BucketedLog.cloneTo doc): the clone is the snapshot —
  * bit-equal at clone time, fully independent afterward, watermarks
  * reset, schema anchor carried, empty/retracted states legal. */
class BucketedLogCloneSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rm(dir: String): Unit = {
    def r(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(r)); x.delete() }
    r(new java.io.File(dir))
  }

  private def sumMerge(cur: Option[DataFrame], b: DataFrame): DataFrame =
    cur.map(_.unionByName(b)).getOrElse(b)
      .groupBy("k").agg(sum("v").cast("long").as("v"))

  private def state(log: BucketedLog): Map[Long, Long] =
    log.read(spark).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clone == source at clone time; both evolve independently") {
    rm("/tmp/graft_clone_src"); rm("/tmp/graft_clone_dst")
    val src = BucketedLog("/tmp/graft_clone_src", Seq("k"), buckets = 4)
    src.init(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    src.applyBatch(Seq((1L, 1L), (3L, 30L)).toDF("k", "v"), 0L)(sumMerge)
    val snap = state(src)
    val dst = src.cloneTo(spark, "/tmp/graft_clone_dst")
    assert(state(dst) === snap)
    // source moves on; the clone must not see it — and vice versa
    src.applyBatch(Seq((1L, 100L)).toDF("k", "v"), 1L)(sumMerge)
    assert(state(dst) === snap)
    dst.applyBatch(Seq((2L, 5L)).toDF("k", "v"), 0L)(sumMerge)
    assert(state(src) === snap ++ Map(1L -> 111L))
    assert(state(dst) === snap ++ Map(2L -> 25L))
  }

  test("clone resets batch AND txn watermarks (new stream identities)") {
    rm("/tmp/graft_clone_src2"); rm("/tmp/graft_clone_dst2")
    val src = BucketedLog("/tmp/graft_clone_src2", Seq("k"), buckets = 4)
    src.init(Seq((1L, 10L)).toDF("k", "v"))
    src.applyBatch(Seq((1L, 1L)).toDF("k", "v"), 5L)(sumMerge)
    src.applyBatch(Seq((1L, 2L)).toDF("k", "v"), 3L, "wA")(sumMerge)
    val dst = src.cloneTo(spark, "/tmp/graft_clone_dst2")
    // batch ids the SOURCE already consumed are fresh on the clone
    dst.applyBatch(Seq((1L, 7L)).toDF("k", "v"), 0L)(sumMerge)
    dst.applyBatch(Seq((1L, 9L)).toDF("k", "v"), 0L, "wA")(sumMerge)
    assert(state(dst) === Map(1L -> 29L))
    assert(dst.txnWatermark(spark, "wA") === 0L)
    assert(src.txnWatermark(spark, "wA") === 3L)
  }

  test("cloneTo refuses a dst equal to or nested with the source") {
    rm("/tmp/graft_clone_src4")
    val src = BucketedLog("/tmp/graft_clone_src4", Seq("k"), buckets = 4)
    src.init(Seq((1L, 10L)).toDF("k", "v"))
    // the clone starts by CLEARING dst — aliasing the source would
    // read the manifest, delete the store, then fail mid-copy
    Seq("/tmp/graft_clone_src4", "/tmp/graft_clone_src4/inner",
      "/tmp").foreach { dst =>
      intercept[IllegalArgumentException] { src.cloneTo(spark, dst) }
    }
    // the source survived every rejected attempt
    assert(state(src) === Map(1L -> 10L))
  }

  test("a segmented (appendBatch) source clones verbatim, segments intact") {
    rm("/tmp/graft_clone_src5"); rm("/tmp/graft_clone_dst5")
    val src = BucketedLog("/tmp/graft_clone_src5", Seq("k"), buckets = 4,
      compactAfter = 16)
    src.init(Seq.empty[(Long, Long)].toDF("k", "v"))
    Seq(Seq((1L, 10L), (2L, 20L)), Seq((1L, 11L)), Seq((2L, 21L), (3L, 30L)))
      .zipWithIndex.foreach { case (b, i) =>
        src.appendBatch(b.toDF("k", "v"), i.toLong)
      }
    def rows(log: BucketedLog): Seq[(Long, Long)] =
      log.read(spark).collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
    val snap = rows(src)
    assert(snap === Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L),
      (3L, 30L)))
    val dst = src.cloneTo(spark, "/tmp/graft_clone_dst5")
    assert(rows(dst) === snap)
    // independent evolution both ways, appends included
    dst.appendBatch(Seq((9L, 90L)).toDF("k", "v"), 0L)
    assert(rows(src) === snap)
    assert(rows(dst) === (snap :+ (9L, 90L)).sorted)
  }

  test("a fully-retracted source clones to the typed empty store") {
    rm("/tmp/graft_clone_src3"); rm("/tmp/graft_clone_dst3")
    val src = BucketedLog("/tmp/graft_clone_src3", Seq("k"), buckets = 4)
    src.init(Seq((1L, 10L)).toDF("k", "v"))
    src.applyBatch(Seq((1L, -10L)).toDF("k", "v"), 0L) { (cur, b) =>
      sumMerge(cur, b).where(col("v") =!= 0L)
    }
    assert(state(src) === Map.empty)
    val dst = src.cloneTo(spark, "/tmp/graft_clone_dst3")
    assert(state(dst) === Map.empty)
    assert(dst.read(spark).columns.toSeq === Seq("k", "v"))
  }
}
