package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.GapMonitor

/** Gap monitor (reference T4): detects inter-event gaps per series in
  * a streaming query, carrying state across micro-batches. */
class GapMonitorSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("emits gaps above threshold across micro-batches") {
    val root = Files.createTempDirectory("gap").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // batch 1: series A events at 0s,1s, then jump to 20s (gap 19s)
    Seq(("A", ts(0)), ("A", ts(1)), ("A", ts(20)), ("B", ts(0)))
      .toDF("key", "ts").write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val gaps = GapMonitor.monitor(stream, "key", "ts", gapMs = 5000L)
    val out = s"$root/out"

    def run(): Unit = {
      val q = gaps.writeStream
        .format("parquet")
        .option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }
    run()
    val batch1 = spark.read.parquet(out).as[GapMonitor.Gap].collect()
    assert(batch1.map(g => (g.key, g.gapMs)).toSet === Set(("A", 19000L)))

    // batch 2: series B resumes far later — the gap spans micro-batches,
    // detectable only via carried state
    Seq(("B", ts(100))).toDF("key", "ts").write.mode("append").parquet(in)
    run()
    val batch2 = spark.read.parquet(out).as[GapMonitor.Gap].collect()
    assert(batch2.map(g => (g.key, g.gapMs)).toSet ===
      Set(("A", 19000L), ("B", 100000L)))

    // batch 3: an entirely-late batch for A (all events before the stored
    // watermark of 20s) must NOT rewind state or re-emit the 19s gap —
    // and a following batch continues from the 20s watermark, not 3s
    Seq(("A", ts(2)), ("A", ts(3))).toDF("key", "ts")
      .write.mode("append").parquet(in)
    run()
    Seq(("A", ts(40))).toDF("key", "ts").write.mode("append").parquet(in)
    run()
    val batch4 = spark.read.parquet(out).as[GapMonitor.Gap].collect()
    assert(batch4.map(g => (g.key, g.gapMs)).toSet ===
      Set(("A", 19000L), ("B", 100000L), ("A", 20000L)))
  }
}
