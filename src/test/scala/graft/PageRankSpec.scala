package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Fixed-iteration PageRank: hand-checked tiny graph, bit-identical
  * trajectory under any partitioning, dangling-leak variant bound. */
class PageRankSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("two-node cycle converges to the uniform rank") {
    // 1 <-> 2: symmetric, rank must stay 0.5/0.5 every iteration
    val got = PageRank.run(Seq((1L, 2L), (2L, 1L)).toDF("a", "b"),
        "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.5, 2L -> 0.5))
  }

  test("a sink-pointing chain ranks the sink highest; dangling mass leaks (sum < 1)") {
    // 1 -> 3, 2 -> 3: 3 is a dangling sink
    val got = PageRank.run(Seq((1L, 3L), (2L, 3L)).toDF("a", "b"),
        "a", "b", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) > got(1L) && got(1L) === got(2L))
    assert(got.values.sum < 1.0) // documented dangling-leak variant
    // fixpoint hand-check: source ranks settle at (1-d)/n = 0.05, so
    // r(3) = 0.05 + 0.85 * (0.05 + 0.05)
    assert(math.abs(got(3L) - (0.15 / 3 + 0.85 * 0.1)) < 1e-9, got(3L))
  }

  test("personalized: mass concentrates on seeds and their reach; unreachable non-seeds get zero") {
    // 1 -> 2 -> 3, and an isolated pair 8 <-> 9; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (8L, 9L), (9L, 8L)).toDF("a", "b")
    val got = PageRank.personalized(edges, "a", "b",
        seeds = Seq(1L).toDF("node"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.15) // seed fixpoint: (1-d)/|S| with |S| = 1
    assert(math.abs(got(2L) - 0.1275) < 1e-9) // d * r(1)
    assert(got(3L) > 0.0 && got(3L) < got(2L))
    assert(got(8L) === 0.0 && got(9L) === 0.0, "teleport never reaches the island")
  }

  test("weighted: rank follows flow share, not link count") {
    // 1 splits its mass 9:1 between 2 and 3 (unweighted would split
    // 1:1); 2 and 3 are dangling sinks, 1 settles at (1-d)/n
    val edges = Seq((1L, 2L, 9.0), (1L, 3L, 1.0)).toDF("a", "b", "w")
    val got = PageRank.weighted(edges, "a", "b", "w", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(2L) - (0.05 + 0.85 * 0.05 * 0.9)) < 1e-9, got)
    assert(math.abs(got(3L) - (0.05 + 0.85 * 0.05 * 0.1)) < 1e-9, got)
    // parallel edges pre-sum: (1,2,4)+(1,2,5) behaves as (1,2,9)
    val split = Seq((1L, 2L, 4.0), (1L, 2L, 5.0), (1L, 3L, 1.0))
      .toDF("a", "b", "w")
    val got2 = PageRank.weighted(split, "a", "b", "w", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 === got)
  }

  test("converged: early stop fires at the deterministic max-norm threshold, cap respected") {
    // 1 <-> 2 reaches the uniform fixpoint immediately: residual of
    // iteration 1 is 0 < eps, so iters_run = 1
    val cyc = PageRank.converged(Seq((1L, 2L), (2L, 1L)).toDF("a", "b"),
        "a", "b", maxIters = 15, eps = 1e-9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(cyc.forall(_._3 == 1L), cyc.toSeq)
    assert(cyc.map(t => t._1 -> t._2).toMap === Map(1L -> 0.5, 2L -> 0.5))
    // a dangling chain decays geometrically (residual ~ d^k, never 0
    // until the 12-dp floor): a tiny cap must be hit exactly
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val capped = PageRank.converged(chain, "a", "b",
        maxIters = 3, eps = 1e-15)
      .collect().map(_.getLong(2)).distinct
    assert(capped === Array(3L))
    // convergence result == the fixed-iteration run at the stop count
    // (d = 0.3 for a fast but non-trivial decay)
    val conv = PageRank.converged(chain, "a", "b",
        maxIters = 50, eps = 1e-6, damping = 0.3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val k = conv.head._3.toInt
    assert(k > 3 && k < 50, s"expected a non-trivial stop, got $k")
    val fixed = PageRank.run(chain, "a", "b", iters = k, damping = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(conv.map(t => t._1 -> t._2).toMap === fixed)
  }

  test("trajectory is bit-identical under any partitioning (per-iteration rounding)") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    def run(parts: Int): Map[Long, Long] =
      PageRank.run(edges.toDF("a", "b").repartition(parts), "a", "b")
        .collect().map(r => r.getLong(0) ->
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    val a = run(1)
    assert(a === run(7))
    assert(a === run(32))
  }
}
