package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** PageRank by fixed-iteration power method (Page et al., 1999) —
  * entity importance over a directed relation graph (supplier/customer
  * flow, citation, link graphs).
  *
  * Spark-first shape: each round is one join (edge list × current
  * ranks on src) + one dst-keyed mass aggregate + one left join back
  * to the node set; the out-degree is attached to the edge list ONCE
  * before the loop (loop-invariant), and lineage is cut per round
  * with `localCheckpoint` (the iterative-DataFrame discipline of
  * [[Components]] — persisted-only iteration stacks the plan).
  *
  * Determinism contract (what makes it oracle-replayable, q156): the
  * per-node mass sum is an ORDER-SENSITIVE double fold, so every
  * iteration rounds to `roundDp` decimals on both engines — with rank
  * values around 1/n and ulp noise ~1e-18, 12 dp leaves a
  * million-fold margin (hard rule 9) and pins the whole trajectory
  * bit-exactly under any partitioning.
  *
  * Variant notes: fixed `iters` (no convergence test — deterministic
  * work, and rounding makes late iterations idempotent in practice);
  * dangling nodes simply leak mass (no redistribution) — documented,
  * identical on both engines. Returns (node, r), caller-owned
  * localCheckpoint. */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85,
      roundDp: Int = 12): DataFrame =
    runImpl(edges, srcCol, dstCol, iters, damping, roundDp, None)

  /** PERSONALIZED PageRank (random walk with restart): the teleport
    * vector concentrates on `seeds` instead of the uniform
    * distribution — proximity-to-seeds importance, the graph-retrieval
    * / recommendation variant. Seeds must be graph nodes (absent
    * seeds get no mass to give); identical determinism contract. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int = 10, damping: Double = 0.85,
      roundDp: Int = 12): DataFrame =
    runImpl(edges, srcCol, dstCol, iters, damping, roundDp, Some(seeds))

  private def runImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double, roundDp: Int,
      seeds: Option[DataFrame]): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodesPlain = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    // seed flag rides on the node set for the whole loop (the base
    // teleport term re-applies every iteration)
    val nodes = (seeds match {
      case None => nodesPlain.withColumn("is_seed", lit(true))
      case Some(sd) =>
        val s = sd.select(col(sd.columns.head).cast("long").as("node"))
          .distinct()
        nodesPlain.join(s.withColumn("is_seed", lit(true)),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("is_seed"), lit(false)).as("is_seed"))
    }).localCheckpoint()
    // teleport denominator: all nodes for plain PR, seed count for PPR
    val n = nodes.where(col("is_seed")).count().toDouble
    // The edge list is loop-INVARIANT: checkpoint it in its SHUFFLED
    // form (hash-partitioned by src, explicit count so AQE never
    // coalesces it into an un-co-locatable layout), restamping the
    // LogicalRDD with the real partitioning (plain localCheckpoint
    // under AQE records UnknownPartitioning — see Bridge). Every
    // iteration's join on src then sees the edge side as already
    // distributed — only the (far smaller) rank frame moves per round.
    // Without this, both sides re-exchange each of the `iters` rounds
    // (at 100× scale the edge shuffle dominates; at sf0.1 AQE happens
    // to broadcast ranks, masking it).
    val nPart = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val edgesDeg = Bridge.localCheckpointPartitioned(e
      .join(e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")),
        Seq("src"))
      .repartition(nPart, col("src")))
    val base = when(col("is_seed"), lit(1.0 - damping) / lit(n))
      .otherwise(lit(0.0))
    var rank = nodes
      .withColumn("r", round(when(col("is_seed"), lit(1.0) / lit(n))
        .otherwise(lit(0.0)), roundDp))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(rank.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("deg")).as("mass"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          round(base + lit(damping) * coalesce(col("mass"), lit(0.0)),
            roundDp).as("r"))
        .localCheckpoint()
      // Dataset.unpersist is a no-op for checkpoint blocks (no cache
      // manager entry) — free the backing RDD directly, or all `iters`
      // rounds' blocks pile up until the ContextCleaner runs.
      Bridge.unpersistCheckpoint(rank)
      rank = next
    }
    val out = rank.select(col("node"), col("r")).localCheckpoint()
    Bridge.unpersistCheckpoint(rank)
    Bridge.unpersistCheckpoint(e)
    Bridge.unpersistCheckpoint(nodes)
    Bridge.unpersistCheckpoint(edgesDeg)
    out
  }
}
