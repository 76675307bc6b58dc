package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** WEIGHTED SHORTEST PATHS, capped synchronous Bellman–Ford — the
  * min-COST companion to [[Bfs]] (min-HOP): after round i the state
  * holds, per reached node, the exact minimum path cost over all
  * walks of ≤ i edges from any seed. With non-negative integer
  * weights that is the true shortest-path cost once i covers the
  * path length — and for a capped replayable gate, "cheapest within
  * k legs" is itself the product semantics (routing/attribution with
  * bounded legs).
  *
  * Exactness: weights are LONG and each round is
  * `union(previous, relaxed) → groupBy(node).min` — integer min/add,
  * associative + commutative, so the state is a pure function of
  * (edges, seeds, rounds) at any parallelism, and a k-block CTE
  * chain replays each round verbatim (the LabelPropagation oracle
  * pattern).
  *
  * 100 TB shape (the PageRank discipline): parallel edges pre-min to
  * one (src, dst, w) row, the edge list is checkpointed ONCE in
  * SHUFFLED form (hash-partitioned by src), and each round moves
  * only the distance frame through the join + one min-aggregate —
  * rounds = the leg cap, per-round cost O(dist + touched edges),
  * never O(V·E) re-derived from scratch. */
object Sssp {

  def distances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, rounds: Int,
      undirected: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val dir = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w"))
    val both = if (undirected)
      dir.unionByName(dir.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
    else dir
    val e = Bridge.localCheckpointPartitioned(
      both.groupBy("src", "dst").agg(min(col("w")).as("w"))
        .repartition(nPart, col("src")))
    var dist = seeds
      .select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      i += 1
      val relaxed = dist.select(col("node").as("src"), col("dist"))
        .join(e, Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      Bridge.unpersistCheckpoint(dist)
      dist = next
    }
    val out = dist.localCheckpoint()
    Bridge.unpersistCheckpoint(dist)
    Bridge.unpersistCheckpoint(e)
    out
  }
}
