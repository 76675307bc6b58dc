package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MultiColZoneMapIndex

/** The N-column zone-map index (q236): per-column stats fold over any
  * batching to the one-shot aggregate, conjunction pruning reads a
  * strict subset of either single-column prune when the layout
  * correlates both columns with the unit (a grid layout here — the
  * gate uses real z-order), and the delete-path rebuild re-tightens
  * every column's stats at once. */
class MultiColZoneMapIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // a 4×4 grid layout: unit (a-band, b-band) — both columns correlate
  // with the unit, the precondition for conjunction pruning
  private val N = 6400L
  private def table = spark.range(N).select(
    (col("id") % 80L).as("a"),
    (expr("id div 80") % 80L).as("b"))
    .withColumn("unit",
      (expr("a div 20") * 4L + expr("b div 20")).cast("int"))

  private def freshIdx(dir: String): MultiColZoneMapIndex = {
    val idx = MultiColZoneMapIndex(dir, Seq("a", "b"))
    idx.init(spark, "int", Seq("long", "long"))
    idx
  }

  test("incremental fold over any batching equals the one-shot stats") {
    val idx = freshIdx("/tmp/graft_mczm_a")
    idx.applyBatch(table.where(col("a") % 3 === 0), "unit", 0L)
    idx.applyBatch(table.where(col("a") % 3 === 1), "unit", 1L)
    idx.applyBatch(table.where(col("a") % 3 === 2), "unit", 2L)
    idx.applyBatch(table.where(col("a") % 3 === 2), "unit", 2L) // replay
    val got = idx.read(spark).collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    val want = table.groupBy("unit")
      .agg(count(lit(1)).cast("long").as("rows"),
        min("a").as("mn_a"), max("a").as("mx_a"),
        min("b").as("mn_b"), max("b").as("mx_b"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    assert(got === want)
  }

  test("conjunction pruning reads a strict subset of either single prune") {
    val idx = freshIdx("/tmp/graft_mczm_b")
    idx.applyBatch(table, "unit", 0L)
    val aOnly = idx.matchingUnits(spark, Seq(("a", lit(25L), lit(45L))))
    val bOnly = idx.matchingUnits(spark, Seq(("b", lit(25L), lit(45L))))
    val both = idx.matchingUnits(spark,
      Seq(("a", lit(25L), lit(45L)), ("b", lit(25L), lit(45L))))
    // [25,45] spans a-bands 1–2 → 8 units; conjunction → the 2×2 core
    assert(aOnly.size === 8 && bOnly.size === 8 && both.size === 4,
      s"a=$aOnly b=$bOnly both=$both")
    assert(both.toSet === (aOnly.toSet intersect bOnly.toSet))
    // soundness: every unit holding in-box rows survives
    val truth = table.where(col("a").between(25L, 45L) &&
        col("b").between(25L, 45L))
      .select(col("unit").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(both.toSet))
  }

  test("rebuildUnits re-tightens every column's stats; receipt unchanged") {
    val idx = freshIdx("/tmp/graft_mczm_c")
    idx.applyBatch(table, "unit", 0L)
    val receipt = idx.coveredBatch(spark)
    // delete unit 5's low-a half — both a and b stats may shift
    val alive = table.where(!(col("unit") === 5 && col("a") < 30L))
    idx.rebuildUnits(alive, "unit", Seq(5).toDF("unit"))
    val got = idx.read(spark).collect()
      .map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    val want = alive.groupBy("unit")
      .agg(count(lit(1)).cast("long").as("rows"),
        min("a").as("mn_a"), max("a").as("mx_a"),
        min("b").as("mn_b"), max("b").as("mx_b"))
      .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    assert(got === want)
    assert(got(5)(1) === 30L) // mn_a re-tightened exactly
    assert(idx.coveredBatch(spark) === receipt)
  }
}
