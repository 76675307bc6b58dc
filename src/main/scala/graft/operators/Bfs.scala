package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** MULTI-SOURCE BFS — exact hop distance from the nearest seed, the
  * graph-proximity primitive (contamination blast radius, spam
  * neighborhoods, "within k hops of a flagged account"). Level-
  * synchronous frontier expansion: round i joins the current frontier
  * against the edge list, keeps first-visits, and stamps them with
  * distance i; capped at `maxDist` rounds, so the result is exactly
  * the set of nodes whose true BFS distance is ≤ `maxDist`, labeled
  * with that distance (min over seeds — a node is stamped the FIRST
  * round it is reached, which is the definition of BFS distance).
  *
  * Determinism: pure set algebra — joins, distinct, anti-join — no
  * floats, no ordering sensitivity; the result is a pure function of
  * (edges, seeds, maxDist) at any parallelism.
  *
  * 100 TB shape (the PageRank discipline, `PageRank.scala:120`): the
  * loop-invariant edge list is checkpointed ONCE in SHUFFLED form —
  * hash-partitioned by src via `Bridge.localCheckpointPartitioned`,
  * so each round's frontier⋈edges sees the edge side already
  * distributed and only the frontier (≤ one round's reach) moves.
  * The visited set is re-checkpointed per round (it is the loop
  * accumulator), and checkpoint blocks are freed as soon as
  * superseded. Rounds = maxDist, each O(frontier + touched edges) —
  * never O(V·E). */
object Bfs {

  /** (node, dist) for every node within `maxDist` hops of any seed.
    * `undirected = true` expands edges both ways first. */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxDist: Int,
      undirected: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val dir = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e0 = if (undirected)
      dir.unionByName(dir.select(col("dst").as("src"),
        col("src").as("dst")))
    else dir
    val e = Bridge.localCheckpointPartitioned(
      e0.distinct().repartition(nPart, col("src")))
    // seeds are distance 0 whether or not they touch an edge —
    // matching the recursive-CTE oracle's base case
    var visited = seeds
      .select(col(seeds.columns.head).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var frontier = visited
    var d = 0L
    while (d < maxDist && !frontier.isEmpty) {
      d += 1
      // one round: frontier moves to the edge side's partitioning,
      // reached set dedups, first-visit filter is a LEFT ANTI join
      // against visited (shuffles only reach+visited keys)
      val reached = frontier.select(col("node").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node")).distinct()
      val next = reached.join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint()
      val nextVisited = visited.unionByName(next).localCheckpoint()
      Bridge.unpersistCheckpoint(visited)
      Bridge.unpersistCheckpoint(frontier)
      visited = nextVisited
      frontier = next
    }
    val out = visited.localCheckpoint()
    Bridge.unpersistCheckpoint(visited)
    Bridge.unpersistCheckpoint(frontier)
    Bridge.unpersistCheckpoint(e)
    out
  }
}
