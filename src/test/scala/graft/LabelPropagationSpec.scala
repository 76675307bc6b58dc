package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LabelPropagation

/** Synchronous LPA (q167's operator): hand-checked vote rounds,
  * min-label tiebreaks, community-never-crosses-component walls,
  * and bit-identical labels under any partitioning. */
class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 4): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("a", "b").repartition(parts),
        "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a triangle collapses to its minimum label") {
    // round 1: each node sees two distinct neighbor labels -> min
    // tiebreak; node 2 and 3 both adopt 1, node 1 adopts 2; round 2
    // heals node 1 (majority 1). Stable from round 2 on.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(run(tri, 2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(run(tri, 4) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two cliques joined by one bridge edge keep distinct communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L))
    val got = run(edges, 4)
    assert(Set(1L, 2L, 3L).map(got) === Set(1L))
    assert(Set(11L, 12L, 13L).map(got) === Set(10L))
    // the bridge endpoints stay with their own clique's majority
    assert(got(4L) === 1L && got(10L) === 10L, got)
  }

  test("labels are identical under any partitioning (and oscillation is deterministic)") {
    // a path graph oscillates under synchronous updates — the point
    // is not convergence but that every round is a pure function
    val path = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
    val a = run(path, 5, parts = 1)
    assert(a === run(path, 5, parts = 7))
    assert(a === run(path, 5, parts = 32))
  }
}
