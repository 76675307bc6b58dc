package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sssp

/** Capped Bellman–Ford (q196): exact min path cost on a known
  * weighted graph, leg-cap semantics (a cheaper longer route only
  * counts once enough rounds cover it), parallel-edge pre-min, and
  * partition-count invariance (integer min/add is order-free). */
class SsspSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  //      10        1       1       1
  //  1 ------ 2, 1 - 3, 3 - 4, 4 - 2   : direct 1→2 costs 10, the
  //  long way round (1-3-4-2) costs 3; plus parallel edge 1-3 cost 5
  private val edges = Seq(
    (1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L),
    (1L, 3L, 5L))
    .toDF("src", "dst", "w")

  private def run(seeds: Seq[Long], rounds: Int): Map[Long, Long] =
    Sssp.distances(edges, "src", "dst", "w", seeds.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("enough rounds finds the cheap long route; parallel edges pre-min") {
    assert(run(Seq(1L), 4) ===
      Map(1L -> 0L, 3L -> 1L, 4L -> 2L, 2L -> 3L))
  }

  test("leg cap keeps the expensive direct route") {
    // one round: only direct edges from the seed
    assert(run(Seq(1L), 1) === Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    // two rounds: 1-3-4 reachable, 2 still direct-only
    assert(run(Seq(1L), 2) ===
      Map(1L -> 0L, 2L -> 10L, 3L -> 1L, 4L -> 2L))
    // three rounds covers 1-3-4-2
    assert(run(Seq(1L), 3) ===
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
  }

  test("multi-source takes the cheapest seed") {
    assert(run(Seq(1L, 2L), 2) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("partition-count invariance") {
    val a = run(Seq(1L), 4)
    val b = Sssp.distances(edges.repartition(7), "src", "dst", "w",
        Seq(1L).toDF("node").repartition(3), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("relax round never re-exchanges the checkpointed edge side") {
    import org.apache.spark.sql.functions._
    // identical discipline to Bfs/PageRank: edges checkpointed
    // hash-partitioned by src; a relax round exchanges the distance
    // frame into the join (1) plus the min-aggregate (1) — never the
    // edge frame
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = org.apache.spark.sql.graft.Bridge.localCheckpointPartitioned(
        (1 to 400).map(i => (i.toLong % 40, i.toLong % 17, (i % 5).toLong))
          .toDF("src", "dst", "w").groupBy("src", "dst")
          .agg(min(col("w")).as("w"))
          .repartition(4, col("src")))
      val dist = (0L until 10L).map(i => (i, 0L)).toDF("node", "dist")
        .localCheckpoint()
      val round = dist.select(col("node").as("src"), col("dist"))
        .join(e, Seq("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("node").agg(min(col("dist")).as("dist"))
      round.queryExecution.executedPlan.execute().count()
      val p = round.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val n = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(n <= 2, s"edge side re-exchanged ($n exchanges):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
