package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.BucketedLog

/** Manifest checkpointing for retained stores (BucketedLog class
  * doc): once more than `checkpointEvery` manifests accumulate, all
  * but the newest fold into an immutable `_history` segment and leave
  * the top level — discovery listings stay bounded while EVERY
  * historical version remains time-travel readable through the
  * segments. Every read here is cross-checked against a twin store
  * that never checkpoints (checkpointEvery = MaxValue). */
class ManifestCheckpointSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rm(dir: String): Unit = {
    def r(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(r)); x.delete() }
    r(new java.io.File(dir))
  }

  private def sumMerge(cur: Option[DataFrame], b: DataFrame): DataFrame =
    cur.map(_.unionByName(b)).getOrElse(b)
      .groupBy("k").agg(sum("v").cast("long").as("v"))

  private def state(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def topManifests(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.matches("""_MANIFEST\.v\d{19}""")).toSeq

  private def segments(dir: String): Seq[String] =
    Option(new java.io.File(s"$dir/_history").listFiles())
      .fold(Seq.empty[String])(_.map(_.getName).toSeq)
      .filter(_.startsWith("_CHECKPOINT"))

  private def buildPair(nBatches: Int): (BucketedLog, BucketedLog) = {
    val d1 = "/tmp/graft_ckpt_folded"; val d2 = "/tmp/graft_ckpt_flat"
    rm(d1); rm(d2)
    val folded = BucketedLog(d1, Seq("k"), buckets = 4, retain = true,
      checkpointEvery = 4)
    val flat = BucketedLog(d2, Seq("k"), buckets = 4, retain = true,
      checkpointEvery = Int.MaxValue)
    val seed = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    folded.init(seed); flat.init(seed)
    (0 until nBatches).foreach { b =>
      val batch = Seq(((b % 5).toLong, 1L)).toDF("k", "v")
      folded.applyBatch(batch, b.toLong)(sumMerge)
      flat.applyBatch(batch, b.toLong)(sumMerge)
      if (b % 3 == 0) { // crash replay: exactly-once survives the fold
        folded.applyBatch(batch, b.toLong)(sumMerge)
        flat.applyBatch(batch, b.toLong)(sumMerge)
      }
    }
    (folded, flat)
  }

  test("folding keeps the top level bounded; every version stays readable") {
    val n = 14
    val (folded, flat) = buildPair(n)
    assert(topManifests("/tmp/graft_ckpt_folded").size <= 5,
      s"top level must stay ≤ checkpointEvery+1 manifests: " +
        topManifests("/tmp/graft_ckpt_folded"))
    assert(segments("/tmp/graft_ckpt_folded").nonEmpty,
      "expected at least one _history segment")
    assert(topManifests("/tmp/graft_ckpt_flat").size === n + 1)
    // current state identical
    assert(state(folded.read(spark)) === state(flat.read(spark)))
    // EVERY historical version identical — versions below the fold
    // floor answer from the segments
    (0L to (n + 1L)).foreach { ver =>
      assert(state(folded.readAt(spark, ver)) ===
        state(flat.readAt(spark, ver)), s"readAt($ver) diverged")
    }
  }

  test("schema evolution mid-history survives the fold: segment readAt keeps shapes") {
    val dir = "/tmp/graft_ckpt_evo"; rm(dir)
    val log = BucketedLog(dir, Seq("k"), buckets = 4, retain = true,
      checkpointEvery = 3)
    log.init(Seq((1L, 10L)).toDF("k", "v"))
    (0 until 4).foreach { b =>
      log.applyBatch(Seq((1L, 1L)).toDF("k", "v"), b.toLong)(sumMerge)
    }
    log.evolveSchema(spark, Seq("w" -> "long")) // -> version 5
    (4 until 8).foreach { b =>
      log.applyBatch(Seq((1L, 1L, 100L)).toDF("k", "v", "w"), b.toLong) {
        (cur, batch) =>
          cur.map(_.unionByName(batch)).getOrElse(batch)
            .groupBy("k").agg(sum("v").cast("long").as("v"),
              sum("w").cast("long").as("w"))
      }
    }
    // versions 0..~7 folded into segments (checkpointEvery = 3)
    assert(segments(dir).nonEmpty)
    // below the evolution (version ≤ 4): OLD column set, served from
    // a segment; above: new set with w folded from new batches only
    assert(log.readAt(spark, 3L).columns.toSeq === Seq("k", "v"))
    assert(log.readAt(spark, 3L).head().getLong(1) === 13L)
    assert(log.readAt(spark, 5L).columns.toSeq === Seq("k", "v", "w"))
    val fin = log.read(spark).head()
    assert(fin.getLong(1) === 18L && fin.getLong(2) === 400L)
  }

  test("vacuum drops segment blocks below the floor; reads above survive") {
    val n = 14
    val (folded, flat) = buildPair(n)
    val floor = 8L
    folded.vacuum(spark, floor)
    // below the floor: an error, not a silent newer snapshot
    val failed = try { folded.readAt(spark, floor - 1); false }
      catch { case _: RuntimeException => true }
    assert(failed, "readAt below the vacuum floor must error")
    // at and above the floor: unchanged vs the unvacuumed twin
    (floor to (n + 1L)).foreach { ver =>
      assert(state(folded.readAt(spark, ver)) ===
        state(flat.readAt(spark, ver)), s"post-vacuum readAt($ver)")
    }
    assert(state(folded.read(spark)) === state(flat.read(spark)))
    // vacuum again at the newest version: all segments fully below
    // the floor must be deleted outright
    folded.vacuum(spark, n.toLong)
    assert(segments("/tmp/graft_ckpt_folded").isEmpty,
      "segments below the floor must be deleted")
    assert(state(folded.read(spark)) === state(flat.read(spark)))
  }
}
