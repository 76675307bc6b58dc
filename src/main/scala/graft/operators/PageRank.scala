package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** PageRank by power method (Page et al., 1999) — entity importance
  * over a directed relation graph (supplier/customer flow, citation,
  * link graphs). Four variants share one loop: fixed-iteration (q156),
  * personalized / random-walk-with-restart (q157), edge-WEIGHTED
  * (q162 — importance follows flow volume, not link count), and
  * residual-CONVERGED with a fixed cap (q163 — early stop).
  *
  * Spark-first shape: each round is one join (edge list × current
  * ranks on src) + one dst-keyed mass aggregate + one left join back
  * to the node set; the out-weight is attached to the edge list ONCE
  * before the loop (loop-invariant), and lineage is cut per round
  * with `localCheckpoint` (the iterative-DataFrame discipline of
  * [[Components]] — persisted-only iteration stacks the plan).
  *
  * Determinism contract (what makes it oracle-replayable, q156): the
  * per-node mass sum is an ORDER-SENSITIVE double fold, so every
  * iteration rounds to `roundDp` decimals on both engines — with rank
  * values around 1/n and ulp noise ~1e-18, 12 dp leaves a
  * million-fold margin (hard rule 9) and pins the whole trajectory
  * bit-exactly under any partitioning. Weighted variant: edge weights
  * and their per-src totals must be EXACTLY representable doubles
  * (integer-valued, e.g. quantity sums) — integer sums are
  * order-invariant, so `w / wsum` is a pure function of the multiset
  * and the same rounding argument carries. Convergence variant: the
  * residual is the MAX-norm `max |r_i - r_{i-1}|` over nodes — max of
  * per-node doubles is order-INVARIANT (no extra rounding needed), so
  * the stop iteration is deterministic and a static k-block oracle
  * can replay it by picking the first block whose residual clears
  * `eps`.
  *
  * Variant notes: dangling nodes simply leak mass (no
  * redistribution) — documented, identical on both engines. Returns
  * (node, r) — plus `iters_run` for the converged variant —
  * caller-owned localCheckpoint. */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85,
      roundDp: Int = 12): DataFrame =
    runImpl(edges, srcCol, dstCol, iters, damping, roundDp, None, None, None)

  /** PERSONALIZED PageRank (random walk with restart): the teleport
    * vector concentrates on `seeds` instead of the uniform
    * distribution — proximity-to-seeds importance, the graph-retrieval
    * / recommendation variant. Seeds must be graph nodes (absent
    * seeds get no mass to give); identical determinism contract. */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int = 10, damping: Double = 0.85,
      roundDp: Int = 12): DataFrame =
    runImpl(edges, srcCol, dstCol, iters, damping, roundDp, Some(seeds),
      None, None)

  /** WEIGHTED PageRank: a src→dst contribution is proportional to the
    * edge's share of src's total out-weight (`w / Σ_src w`), so rank
    * follows FLOW (trade value, traffic volume), not link count.
    * Parallel edges are pre-summed per (src, dst). Weights must be
    * integer-valued doubles (exactly representable — see determinism
    * contract). */
  def weighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 10, damping: Double = 0.85,
      roundDp: Int = 12): DataFrame =
    runImpl(edges, srcCol, dstCol, iters, damping, roundDp, None,
      Some(weightCol), None)

  /** CONVERGED PageRank: iterate until `max |r_i - r_{i-1}| < eps`
    * (order-invariant max-norm residual — deterministic without extra
    * rounding), capped at `maxIters`; optionally edge-weighted.
    * Returns (node, r, iters_run). */
  def converged(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 15, eps: Double = 1e-9, damping: Double = 0.85,
      roundDp: Int = 12, weightCol: Option[String] = None): DataFrame =
    runImpl(edges, srcCol, dstCol, maxIters, damping, roundDp, None,
      weightCol, Some(eps))

  private def runImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double, roundDp: Int,
      seeds: Option[DataFrame], weightCol: Option[String],
      eps: Option[Double]): DataFrame = {
    // normalize: (src, dst, w) with parallel edges pre-summed; the
    // unweighted path is weight 1.0 (`r * 1.0 / count` is IEEE-equal
    // to the original `r / deg`)
    val e = (weightCol match {
      case Some(w) => edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          col(w).cast("double").as("w"))
        .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      case None => edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .distinct().withColumn("w", lit(1.0))
    }).localCheckpoint()
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
      .join(e.groupBy("src").agg(sum(col("w")).as("wsum")), Seq("src"))
      .repartition(nPart, col("src")))
    val base = when(col("is_seed"), lit(1.0 - damping) / lit(n))
      .otherwise(lit(0.0))
    var rank = nodes
      .withColumn("r", round(when(col("is_seed"), lit(1.0) / lit(n))
        .otherwise(lit(0.0)), roundDp))
      .localCheckpoint()
    var itersRun = 0
    var converged = false
    val it = (1 to iters).iterator
    while (it.hasNext && !converged) {
      itersRun = it.next()
      val contribs = edgesDeg
        .join(rank.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("w") / col("wsum")).as("mass"))
      // join back through `rank` (same rows as `nodes`) so the old r
      // rides along for the residual without a second join
      val next = rank.select(col("node"), col("is_seed"),
          col("r").as("r_prev"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          round(base + lit(damping) * coalesce(col("mass"), lit(0.0)),
            roundDp).as("r"),
          col("r_prev"))
        .localCheckpoint()
      // Dataset.unpersist is a no-op for checkpoint blocks (no cache
      // manager entry) — free the backing RDD directly, or all `iters`
      // rounds' blocks pile up until the ContextCleaner runs.
      Bridge.unpersistCheckpoint(rank)
      eps.foreach { bound =>
        // max-norm over the already-checkpointed frame: one cheap
        // scan, no extra join or shuffle
        val resid = next.agg(max(abs(col("r") - col("r_prev"))))
          .first().getDouble(0)
        converged = resid < bound
      }
      rank = next.drop("r_prev")
    }
    val out = (if (eps.isDefined)
        rank.select(col("node"), col("r"),
          lit(itersRun.toLong).as("iters_run"))
      else rank.select(col("node"), col("r"))).localCheckpoint()
    Bridge.unpersistCheckpoint(rank)
    Bridge.unpersistCheckpoint(e)
    Bridge.unpersistCheckpoint(nodes)
    Bridge.unpersistCheckpoint(edgesDeg)
    out
  }
}
