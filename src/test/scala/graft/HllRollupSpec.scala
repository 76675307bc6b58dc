package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.HllSketch

/** Sketch-table roundtrip (q176's machinery): rolling up stored
  * register vectors over ANY fine-grain split is bit-identical to
  * sketching the raw data directly — associativity + idempotence of
  * register max, through the real binary persist path. */
class HllRollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = (1 to 3000).map(i =>
    ("g" + (i % 3), i % 7, ("u" + (i % 400))))

  test("rollup of per-slice registers == direct sketch, for any slicing") {
    val df = rows.toDF("g", "slice", "u")
    val direct = df.groupBy("g")
      .agg(HllSketch(col("u"), p = 9).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (sliceCol <- Seq(col("slice"), pmod(col("u").substr(2, 10)
        .cast("long"), lit(13)))) {
      val viaTable = df.groupBy(col("g"), sliceCol.as("sl"))
        .agg(HllSketch.registers(col("u"), p = 9).as("sk"))
        .groupBy("g")
        .agg(HllSketch.mergeRegisters(col("sk"), p = 9).as("e"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaTable.view.mapValues(java.lang.Double.doubleToRawLongBits)
        .toMap === direct.view.mapValues(
          java.lang.Double.doubleToRawLongBits).toMap)
    }
  }

  test("registers survive a parquet persist byte-for-byte (duplicate slices are free)") {
    val dir = java.nio.file.Files.createTempDirectory("hllsk").toString + "/t"
    val df = rows.toDF("g", "slice", "u")
    df.groupBy("g", "slice")
      .agg(HllSketch.registers(col("u"), p = 9).as("sk"))
      .write.parquet(dir)
    // merging the stored table TWICE over (idempotent max) changes nothing
    val once = spark.read.parquet(dir)
    val twice = once.unionByName(once)
    def est(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(HllSketch.mergeRegisters(col("sk"), p = 9).as("e"))
      .collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    assert(est(once) === est(twice))
  }

  test("incremental view fold (q195): stored ⊔ partial == one-shot, replay-safe") {
    val df = rows.toDF("g", "slice", "u")
    val direct = df.groupBy("g")
      .agg(HllSketch(col("u"), p = 9).as("e"))
      .collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    // fold slice batches into a running register state — including a
    // REPLAYED batch (idempotent max: at-least-once safe)
    val batches = Seq(0, 1, 2, 3, 4, 5, 6, 3)
    var state: org.apache.spark.sql.DataFrame = null
    batches.foreach { sl =>
      val p = df.where(col("slice") === sl).groupBy("g")
        .agg(HllSketch.registers(col("u"), p = 9).as("sk"))
      state = (if (state == null) p else state.unionByName(p))
        .groupBy("g")
        .agg(HllSketch.mergeRegistersVec(col("sk"), p = 9).as("sk"))
        .localCheckpoint()
    }
    val folded = state.groupBy("g")
      .agg(HllSketch.mergeRegisters(col("sk"), p = 9).as("e"))
      .collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap
    assert(folded === direct)
  }
}
