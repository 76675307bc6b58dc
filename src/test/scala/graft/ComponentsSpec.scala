package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Components

/** Large-star/small-star connected components: equal to a driver-side
  * union-find on seeded random graphs, logarithmic rounds on a long
  * chain (the case that stalls min-label propagation), and stable
  * under repartitioning. */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: component = min node id (find after all unions)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
  }

  /** driverCap = 0 forces the DISTRIBUTED star contraction — the
    * algorithm under test here; the driver fast path is checked by
    * the parity test below. */
  private def run(edges: Seq[(Long, Long)],
      driverCap: Long = 0L): Map[Long, Long] = {
    val df = Components.connectedComponents(
      edges.toDF("a", "b"), "a", "b", driverCap = driverCap)
    val got = df.as[(Long, Long)].collect().toMap
    df.unpersist()
    got
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 200
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) === unionFind(edges), s"trial $trial")
    }
  }

  test("long chain converges (log rounds, not diameter rounds)") {
    // 0-1-2-...-400: one component, min id 0; diameter 400 would
    // stall label propagation but star contraction needs ~log2(400)
    val chain = (0L until 400L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size === 401)
    assert(got.values.toSet === Set(0L))
  }

  test("self-loops, duplicates, singleton edges, reversed dupes") {
    val edges = Seq((7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L), (9L, 8L))
    val got = run(edges)
    // 7 has only a self-loop -> no edge survives -> not labeled
    assert(got === Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("driver fast path equals the distributed fixpoint") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges, driverCap = Long.MaxValue) === run(edges, driverCap = 0L))
  }

  test("stable under repartitioning") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter(e => e._1 != e._2)
    val a = run(edges)
    val dfB = Components.connectedComponents(
      edges.toDF("a", "b").repartition(13, col("b")), "a", "b",
      driverCap = 0L)
    val b = dfB.as[(Long, Long)].collect().toMap
    dfB.unpersist()
    assert(a === b)
  }
}
