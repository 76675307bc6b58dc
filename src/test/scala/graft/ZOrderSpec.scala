package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout (q169's operator): hand-checked bit interleave,
  * Scala/SQL generator parity, and the actual data-skipping claim —
  * z-bucket zone maps are tighter on the SECOND dimension than a
  * plain first-dimension sort's buckets. */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    // a=0b101 (odd positions), b=0b011 (even) → z = 1_0_1 weaved with
    // 0,1,1 = 100111 = 39; plus identities
    val got = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (7L, 7L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(39L, 0L, 2L, 1L, 63L), got)
  }

  test("the SQL generator emits the same function (spot values)") {
    // evaluate the generated text through Spark SQL on the same rows
    val df = Seq((5L, 3L), (12L, 9L), (65535L, 1L)).toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql(
        s"SELECT ${ZOrder.zValueSqlExpr("a", "b", 16)} AS z FROM zt")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(ZOrder.zValue(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }

  test("z-buckets bound BOTH dimensions; a-sort leaves b unbounded") {
    // a 64x64 grid: sorting by `a` gives buckets whose b-range spans
    // the whole domain; z-order buckets must be materially tighter
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a * 64 + b, a, b)
    val df = grid.toDF("id", "a", "b")
    val zStats = ZOrder.layoutStats(df, "a", "b", "id", 6, 16)
      .select((col("max_b") - col("min_b")).as("span"))
      .agg(avg("span")).first().getDouble(0)
    val aStats = df
      .withColumn("bucket", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("a"), col("id"))))
      .groupBy("bucket").agg((max("b") - min("b")).as("span"))
      .agg(avg("span")).first().getDouble(0)
    assert(aStats === 63.0, s"a-sorted buckets should span b fully: $aStats")
    assert(zStats <= aStats / 2,
      s"z-order should at least halve the b span: z=$zStats a=$aStats")
  }

  test("read path: zone-map pruning plans strictly fewer files for z than a-sort") {
    // 128x128 grid, 64 bucket dirs (256 rows each). The box
    // [32,63]x[32,63] is a Morton-aligned 32x32 quadrant: exactly 4
    // z-buckets hold it, while the a-sorted layout (2 a-values per
    // bucket) needs 16 buckets — the scan's own file listing is the
    // skipping evidence, and the pruned answer must equal the
    // full-scan filter exactly.
    val grid = for (a <- 0L until 128L; b <- 0L until 128L)
      yield (a * 128 + b, a, b)
    val df = grid.toDF("id", "a", "b")
    val zPath = "/tmp/graft_ztest_read_z"
    val aPath = "/tmp/graft_ztest_read_a"
    ZOrder.writeBucketed(df,
      Seq(ZOrder.zValue(col("a"), col("b"), 7), col("id")),
      "a", "b", 64, zPath)
    ZOrder.writeBucketed(df, Seq(col("a"), col("id")), "a", "b", 64, aPath)
    def plannedFiles(d: org.apache.spark.sql.DataFrame): Long =
      d.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles }.sum
    val zScan = ZOrder.readBox(spark, zPath, "a", "b", 32, 63, 32, 63)
    val aScan = ZOrder.readBox(spark, aPath, "a", "b", 32, 63, 32, 63)
    val expected = grid.filter(r => r._2 >= 32 && r._2 <= 63 &&
      r._3 >= 32 && r._3 <= 63).map(_._1).toSet
    assert(zScan.select("id").collect().map(_.getLong(0)).toSet === expected)
    assert(aScan.select("id").collect().map(_.getLong(0)).toSet === expected)
    val (zf, af) = (plannedFiles(zScan), plannedFiles(aScan))
    val (zKeep, zTotal) = ZOrder.pruneBox(spark, zPath, 32, 63, 32, 63)
    assert(zTotal === 64 && zKeep.size.toLong === zf,
      s"driver pruning and scan listing disagree: kept=$zKeep files=$zf")
    assert(zf <= 8, s"z-layout should read the aligned quadrant: $zf files")
    assert(af >= 16, s"a-sort should need all boxes a-rows: $af files")
    assert(zf < af, s"z-layout must beat the single-column sort: $zf vs $af")
    // an out-of-domain box prunes everything and returns zero rows
    val none = ZOrder.readBox(spark, zPath, "a", "b", 500, 600, 0, 127)
    assert(none.count() === 0L)
  }
}
