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

  /** Start the labels-maintenance sink. `labelsDir` holds the current
    * (node, component) parquet table (created on first batch). */
  def start(pairs: DataFrame, aCol: String, bCol: String,
      labelsDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
          val prior =
            if (fs.exists(new Path(labelsDir))) spark.read.parquet(labelsDir)
            else spark.range(0).select(col("id").as("node"),
              col("id").as("component"))
          val updated = graft.operators.Components
            .incrementalUpdate(prior, batch, aCol, bCol)
          updated.write.mode("overwrite").parquet(labelsDir)
          updated.unpersist()
          ()
        }
      }
      .start()
}
