package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{DdSketch, DdSketchAggregate}

/** DDSketch quantile aggregate: relative-error guarantee vs the exact
  * order statistic, and bit-identical answers under any partitioning
  * (the fully-mergeable property that makes it oracle-replayable). */
class DdSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val alpha = 0.01
  private val bounds = DdSketch.boundaries(alpha, 1e-3, 1e7)
  private val qs = Array(0.01, 0.25, 0.5, 0.9, 0.99, 0.999)

  private def exactRank(sorted: Array[Double], q: Double): Double = {
    val r = math.max(1L, math.ceil(q * sorted.length).toLong)
    sorted((r - 1).toInt)
  }

  test("estimates are within alpha relative error of the exact rank value") {
    val rnd = new scala.util.Random(42)
    // log-uniform over 8 decades — exercises many buckets
    val vals = Array.fill(10000)(math.exp(
      rnd.nextDouble() * (math.log(1e6) - math.log(1e-2)) + math.log(1e-2)))
    val sorted = vals.sorted
    val est = vals.toSeq.toDF("x")
      .agg(DdSketchAggregate(col("x"), bounds, qs).as("e"))
      .select(col("e")).as[Seq[Double]].head()
    qs.zip(est).foreach { case (q, e) =>
      val ex = exactRank(sorted, q)
      assert(math.abs(e - ex) / ex <= alpha + 1e-12,
        s"q=$q est=$e exact=$ex relerr=${math.abs(e - ex) / ex}")
    }
  }

  test("answers are bit-identical under any partitioning (pure function of the multiset)") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(math.exp(rnd.nextDouble() * 10 - 2))
    def run(parts: Int): Seq[Double] = vals.toDF("x")
      .repartition(parts)
      .agg(DdSketchAggregate(col("x"), bounds, qs).as("e"))
      .select(col("e")).as[Seq[Double]].head()
    val a = run(1); val b = run(13); val c = run(32)
    assert(a.map(java.lang.Double.doubleToRawLongBits) ===
      b.map(java.lang.Double.doubleToRawLongBits))
    assert(a.map(java.lang.Double.doubleToRawLongBits) ===
      c.map(java.lang.Double.doubleToRawLongBits))
  }

  test("three-store layout: negatives mirror, zeros sit between") {
    val vals = Seq(-100.0, -1.0, 0.0, 0.0, 2.0, 50.0, 1000.0)
    val est = vals.toDF("x")
      .agg(DdSketchAggregate(col("x"),
        DdSketch.boundaries(alpha, 0.5, 2000.0),
        Array(0.1, 0.3, 0.5, 0.7, 0.99)).as("e"))
      .select(col("e")).as[Seq[Double]].head()
    // n=7: ranks 1,3,4,5,7 -> -100, 0, 0, 2, 1000 (within alpha)
    assert(math.abs(est(0) + 100.0) / 100.0 <= alpha)
    assert(est(1) === 0.0)
    assert(est(2) === 0.0)
    assert(math.abs(est(3) - 2.0) / 2.0 <= alpha)
    assert(math.abs(est(4) - 1000.0) / 1000.0 <= alpha)
  }

  test("eval-only collapse bounds the answered store; upper quantiles keep the alpha guarantee") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.DoubleType
    val rnd = new scala.util.Random(5)
    val vals = Array.fill(20000)(math.exp(rnd.nextDouble() * 12 - 4))
    val agg = graft.expressions.DdSketchAggregate(
      BoundReference(0, DoubleType, nullable = false),
      bounds, Array(0.9, 0.99), maxBuckets = 64)
    // direct driver-side fold — the buffer internals are the subject
    val buf = vals.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
      agg.update(b, InternalRow(x))
    }
    // pre-eval the partial is the exact histogram, bounded only by the
    // boundary array (the O(log(range)/alpha) DDSketch store)
    assert(buf.pos.size <= bounds.length + 1,
      s"partial exceeded the boundary-array bound: ${buf.pos.size}")
    val preEvalSize = buf.pos.size
    val est = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    // eval collapses a COPY (round-12 advice fix): the stored buffer
    // stays the exact multiset histogram STRUCTURALLY — an eval'd
    // buffer merged again (bounded sketch in a complete-mode
    // streaming snapshot) must not accumulate collapses
    assert(buf.pos.size === preEvalSize,
      s"eval mutated the stored buffer: $preEvalSize -> ${buf.pos.size}")
    // ...and eval is idempotent: answering twice from the same buffer
    // gives bit-identical results
    val est2 = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    assert(est.toSeq === est2.toSeq, "eval is not idempotent")
    val sorted = vals.sorted
    Array(0.9, 0.99).zip(est).foreach { case (q, e) =>
      val ex = exactRank(sorted, q)
      assert(math.abs(e - ex) / ex <= alpha + 1e-12,
        s"upper quantile lost alpha under collapse: q=$q est=$e exact=$ex")
    }
  }

  test("collapsed sketch is a pure function of the multiset for ALL quantiles (q144's property)") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(5000)(math.exp(rnd.nextDouble() * 6))
    val df = vals.toDF("x")
    def ests(d: org.apache.spark.sql.DataFrame, cap: Int): Seq[Double] =
      d.agg(DdSketchAggregate(col("x"),
          DdSketch.boundaries(alpha, 0.5, 2000.0), Array(0.1, 0.5, 0.9, 0.99),
          maxBuckets = cap).as("e"))
        .select(col("e")).as[Seq[Double]].head()
    val unbounded = ests(df, Int.MaxValue)
    // eval-only collapse: one deterministic cut on the exact merged
    // histogram, so even a TIGHT cap (24 — this sample occupies ~300
    // buckets, so p10/p50/p90 all fall below the cut and degrade to
    // its representative) answers identically under every
    // partitioning, INCLUDING the degraded quantiles
    val seq24 = ests(df, 24)
    for (parts <- Seq(1, 3, 32))
      assert(ests(df.repartition(parts), 24) === seq24,
        s"collapse broke multiset-purity at $parts partitions")
    // p99 (~3 occupied buckets above it, inside the cap) still equals
    // the unbounded sketch bit-for-bit
    assert(seq24(3) === unbounded(3),
      s"kept-range quantile diverged from unbounded: $seq24 vs $unbounded")
    // degraded quantiles moved UP to the cut representative, never down
    assert(Seq(0, 1, 2).forall(i => seq24(i) >= unbounded(i)),
      s"degraded quantiles moved down: $seq24 vs $unbounded")
    assert(seq24(0) === seq24(1) && seq24(1) === seq24(2),
      s"below-cut quantiles should share the cut representative: $seq24")
  }

  test("stored-state rollup over any slicing is bit-identical to the direct sketch (q179)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i =>
      ("g" + (i % 3), i % 7, math.exp(rnd.nextDouble() * 10 - 3)))
    val df = rows.toDF("g", "slice", "x")
    def bits(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)).toMap
    val direct = bits(df.groupBy("g")
      .agg(DdSketchAggregate(col("x"), bounds, qs).as("e")))
    val viaTable = bits(df.groupBy("g", "slice")
      .agg(graft.expressions.DdSketchState.state(col("x"), bounds).as("sk"))
      .groupBy("g")
      .agg(graft.expressions.DdSketchState.mergeStates(
        col("sk"), bounds, qs).as("e")))
    assert(viaTable === direct)
  }

  test("boundaries are strictly increasing and bucketOf/rep agree with comparisons") {
    assert(bounds.sliding(2).forall(p => p(0) < p(1)))
    val rnd = new scala.util.Random(3)
    (1 to 200).foreach { _ =>
      val x = math.exp(rnd.nextDouble() * 20 - 6)
      val idx = DdSketch.bucketOf(bounds, x)
      assert(idx === bounds.count(_ <= x))
      val r = DdSketch.rep(bounds, idx)
      if (idx > 0 && idx < bounds.length)
        assert(math.abs(r - x) / x <= alpha + 1e-12)
    }
  }
}
