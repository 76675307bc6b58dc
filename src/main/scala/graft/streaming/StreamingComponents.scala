package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** INCREMENTAL connected components over a stream of near-dup pairs —
  * the clustering step (batch q96) kept continuously up to date as the
  * screening operators (StreamingNearDup / StreamingMinHash /
  * StreamingEmbedScreen) emit new pairs, closing the last batch-only
  * step in the streaming dedup story.
  *
  * Per micro-batch (checkpointed `foreachBatch`, the `IngestPipeline`
  * sink pattern): read the current (node, component) labels table,
  * contract the prior labels' star edges with the batch's new pairs
  * ([[graft.operators.Components.incrementalUpdate]] — cost is
  * |labels| + |batch| edges, never the accumulated pair history), and
  * atomically replace the labels table (the update frame is
  * localCheckpoint-materialized BEFORE the overwrite, so reading and
  * rewriting the same directory is safe).
  *
  * Delivery: at-least-once like every sink in this file — min-label
  * merging is monotone and edge union idempotent, so a replayed batch
  * reproduces the identical labels table (no correction step). A
  * cluster's id can DECREASE as later pairs bridge it to a
  * lower-numbered cluster; readers see labels-as-of-batch, exactly the
  * semantics of re-running batch CC on everything seen so far. */
object StreamingComponents {

  /** Fixed scratch base for q131's AvailableNow replay gate (same
    * static-oracle-path trade as the other replay queries). */
  val scratchBase: String = "/tmp/graft_q131_components"

  /** Resolve the current labels snapshot dir via the `_LATEST`
    * pointer file (absent before the first committed batch). */
  private def latestDir(fs: FileSystem, labelsDir: String): Option[String] = {
    val ptr = new Path(s"$labelsDir/_LATEST")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val b = new Array[Byte](256)
        val n = in.read(b)
        Some(s"$labelsDir/${new String(b, 0, n, "UTF-8").trim}")
      } finally in.close()
    }
  }

  /** Read the current labels table (empty frame before first batch). */
  def readLabels(spark: org.apache.spark.sql.SparkSession,
      labelsDir: String): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    latestDir(fs, labelsDir) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => spark.range(0).select(col("id").as("node"),
        col("id").as("component"))
    }
  }

  /** Start the labels-maintenance sink. `labelsDir` holds VERSIONED
    * (node, component) snapshots plus a `_LATEST` pointer file —
    * each batch writes a fresh `v<batchId>` directory and then swaps
    * the pointer with an atomic rename, so a crash mid-write leaves
    * the prior snapshot intact and the checkpoint's batch replay
    * rebuilds the same new version from it (a plain in-place
    * overwrite would destroy the ONLY copy of the accumulated
    * labeling exactly when the replay needs it). Superseded versions
    * are deleted after the swap. */
  def start(pairs: DataFrame, aCol: String, bCol: String,
      labelsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
          val priorDir = latestDir(fs, labelsDir)
          val prior = priorDir match {
            case Some(dir) => spark.read.parquet(dir)
            case None => spark.range(0).select(col("id").as("node"),
              col("id").as("component"))
          }
          val updated = graft.operators.Components
            .incrementalUpdate(prior, batch, aCol, bCol)
          val newDir = s"$labelsDir/v$batchId"
          updated.write.mode("overwrite").parquet(newDir)
          updated.unpersist()
          val tmp = new Path(s"$labelsDir/_LATEST.tmp")
          val ptr = new Path(s"$labelsDir/_LATEST")
          val outS = fs.create(tmp, true)
          try outS.write(s"v$batchId".getBytes("UTF-8")) finally outS.close()
          fs.delete(ptr, false)
          fs.rename(tmp, ptr)
          priorDir.filter(_ != newDir)
            .foreach(d => fs.delete(new Path(d), true))
          ()
        }
      }
      .start()
}
