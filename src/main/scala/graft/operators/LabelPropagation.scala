package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Community detection by SYNCHRONOUS label propagation (Raghavan et
  * al. 2007), made fully deterministic: every node starts as its own
  * label, and each round every node adopts the most frequent label
  * among its neighbors, ties broken by LOWEST label — so the whole
  * trajectory is integer arithmetic with total-order tiebreaks (hard
  * rule 4), replayable by a generated CTE chain (q167) with no
  * rounding contract at all. Fixed round count: synchronous LPA can
  * oscillate on bipartite structures, so a convergence test is not
  * well-defined — a small fixed `iters` is the documented variant
  * (communities stabilize in a handful of rounds on near-dup
  * graphs).
  *
  * Spark-first shape, the [[PageRank]] discipline: edges are
  * symmetrized once and checkpointed in SHUFFLED form (hash by the
  * probe key via [[Bridge.localCheckpointPartitioned]]) so each
  * round's join re-exchanges only the (far smaller) label frame;
  * each round = one join + one (node, label) count + one
  * row_number pick; lineage cut per round with localCheckpoint and
  * the prior round's blocks freed eagerly.
  *
  * Returns (node, lbl) for every non-isolated node (isolated nodes
  * have no neighbor votes — callers label them as themselves, as
  * q167 does for singleton documents). */
object LabelPropagation {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    val nPart = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val half = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val e = Bridge.localCheckpointPartitioned(
      half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
        .distinct()
        .repartition(nPart, col("v")))
    var lab = e.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    val w = Window.partitionBy("u")
      .orderBy(col("c").desc, col("lbl").asc)
    for (_ <- 1 to iters) {
      val votes = e
        .join(lab.select(col("node").as("v"), col("lbl")), Seq("v"))
        .groupBy("u", "lbl").agg(count(lit(1)).as("c"))
      val next = votes
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("u").as("node"), col("lbl"))
        .localCheckpoint()
      Bridge.unpersistCheckpoint(lab)
      lab = next
    }
    val out = lab.localCheckpoint()
    Bridge.unpersistCheckpoint(lab)
    Bridge.unpersistCheckpoint(e)
    out
  }
}
