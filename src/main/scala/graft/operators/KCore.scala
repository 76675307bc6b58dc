package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** k-CORE decomposition by iterative peeling (Seidman 1983; the
  * Batagelj–Zaveršnik distributed formulation): repeatedly delete
  * every node whose CURRENT degree is below k until none remains —
  * the surviving subgraph is the k-core, the standard dense-community
  * extractor (near-dup spam farms, template families, bot rings; the
  * 2-core strips all tree-like fringe, keeping only nodes on cycles).
  *
  * The k-core is the UNIQUE maximal subgraph with min-degree ≥ k —
  * the fixpoint does not depend on peel order — and each synchronous
  * round is integer arithmetic only, so the whole trajectory is
  * deterministic and a generated CTE chain replays it (q171). Rounds
  * are capped at `maxRounds`; once the edge count stabilizes the
  * loop exits early (further rounds are idempotent, so the emitted
  * state equals the cap-round state either way — what keeps the
  * fixed-block oracle exact even when Spark stops early).
  *
  * Spark-first shape: one degree aggregate + two semi-joins per
  * round over the shrinking edge list; lineage cut per round
  * (localCheckpoint, blocks freed eagerly) — the [[Components]] /
  * [[PageRank]] iterative-DataFrame discipline. Rounds needed in
  * practice: O(peel depth), small on near-dup graphs; the edge list
  * only shrinks, so per-round cost falls monotonically.
  *
  * Returns (node, core_degree) for k-core members. */
object KCore {

  def run(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val half = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    var e = half
      .unionByName(half.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    var nEdges = e.count()
    var stable = false
    var round = 0
    while (round < maxRounds && !stable) {
      round += 1
      val keep = e.groupBy("u").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("u")
      val next = e
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      val n = next.count()
      stable = n == nEdges
      nEdges = n
      Bridge.unpersistCheckpoint(e)
      e = next
    }
    val out = e.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("core_degree"))
      .localCheckpoint()
    Bridge.unpersistCheckpoint(e)
    out
  }
}
