package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

/** k-core peeling (q171's operator): cascading deletion reaches the
  * unique fixpoint, the cap is idempotent past it, and the result is
  * partition-invariant. */
class KCoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 10,
      parts: Int = 4): Map[Long, Long] =
    KCore.run(edges.toDF("a", "b").repartition(parts), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // K4 on {1,2,3,4} with a pendant chain 4-5-6-7
  private def clique(ids: Seq[Long]) =
    for (a <- ids; b <- ids if a < b) yield (a, b)
  private val graph = clique(Seq(1L, 2L, 3L, 4L)) ++
    Seq((4L, 5L), (5L, 6L), (6L, 7L))

  test("2-core peels the chain by CASCADE, keeps the clique") {
    // 7 peels (deg 1) → 6 drops to deg 1, peels → 5 peels → 4 keeps
    // clique degree 3. One round removes only 7; the cascade needs 3.
    val got = run(graph, 2)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
  }

  test("a too-small cap emits the deterministic intermediate state") {
    // after exactly 1 round only node 7 is gone: 6 survives at deg 1
    val got = run(graph, 2, rounds = 1)
    assert(got(6L) === 1L && got(5L) === 2L && !got.contains(7L), got)
  }

  test("4-core of K4 is empty; 3-core is exactly K4; partition-invariant") {
    assert(run(graph, 4) === Map.empty)
    val tri = run(graph, 3)
    assert(tri === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), tri)
    assert(run(graph, 2, parts = 1) === run(graph, 2, parts = 32))
  }
}
