package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bfs

/** Multi-source BFS (q190): exact min-hop distances on a known
  * graph, cap semantics, directed vs undirected expansion, and
  * partition-count invariance (pure set algebra). */
class BfsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  //   1 - 2 - 3 - 4 - 5   chain, plus 10-11 (separate component),
  //   and 6 hanging off 2
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (2L, 6L))
    .toDF("src", "dst")

  private def run(seedIds: Seq[Long], maxDist: Int,
      undirected: Boolean = true): Map[Long, Long] =
    Bfs.distances(edges, "src", "dst", seedIds.toDF("node"), maxDist,
        undirected)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single-source distances on the chain") {
    assert(run(Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 2L))
  }

  test("multi-source takes the min over seeds") {
    assert(run(Seq(1L, 5L), 10) ===
      Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 6L -> 2L))
  }

  test("cap excludes nodes beyond maxDist; unreachable components absent") {
    val got = run(Seq(1L), 2)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 2L))
    assert(!got.contains(10L) && !got.contains(11L))
  }

  test("edgeless seed still gets distance 0") {
    assert(run(Seq(42L), 3) === Map(42L -> 0L))
  }

  test("directed expansion follows edge direction only") {
    assert(run(Seq(3L), 10, undirected = false) ===
      Map(3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("partition-count invariance") {
    val a = run(Seq(1L, 10L), 3)
    val b = Bfs.distances(edges.repartition(7), "src", "dst",
        Seq(1L, 10L).toDF("node").repartition(3), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("round join never re-exchanges the checkpointed edge side") {
    import org.apache.spark.sql.functions._
    // Bfs checkpoints edges hash-partitioned by src (the PageRank
    // discipline) — a round's frontier join exchanges only the
    // frontier (1 exchange) plus the reached-distinct aggregate (1),
    // never the edge frame. Broadcast disabled so the shuffle
    // requirement is exercised at test scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = org.apache.spark.sql.graft.Bridge.localCheckpointPartitioned(
        (1 to 400).map(i => (i.toLong % 40, i.toLong % 17))
          .toDF("src", "dst").distinct()
          .repartition(4, col("src")))
      val frontier = (0L until 10L).toDF("node").localCheckpoint()
      val round = frontier.select(col("node").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node")).distinct()
      round.queryExecution.executedPlan.execute().count()
      val p = round.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val n = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(n <= 2, s"edge side re-exchanged ($n exchanges):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
