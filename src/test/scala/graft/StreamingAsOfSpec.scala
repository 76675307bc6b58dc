package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingAsOf

/** Streaming as-of enrichment: probe events carry the latest
  * reference value at or before their event time, with state crossing
  * micro-batches. */
class StreamingAsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("enriches across micro-batches with ASOF <= semantics") {
    val root = Files.createTempDirectory("sasof").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    // batch 1: quote (ref) at 10 -> trade (probe) at 10 ties, trade at 5 none
    Seq(
      ("A", ts(10), "quote", 100.0),
      ("A", ts(10), "trade", 1.0),
      ("A", ts(5), "trade", 2.0)
    ).toDF("key", "ts", "side", "value").write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val enriched = StreamingAsOf.enrich(stream, "key", "ts", "side", "value",
      probe = "trade", ref = "quote")
    val out = s"$root/out"
    def run(): Unit = {
      val q = enriched.writeStream
        .format("parquet").option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }
    run()
    val b1 = spark.read.parquet(out).as[StreamingAsOf.Enriched].collect()
      .map(e => e.value -> Option(e.refValue).map(_.toDouble)).toMap
    assert(b1 === Map(1.0 -> Some(100.0), 2.0 -> None))

    // batch 2: a newer quote then a trade after it; state carried the
    // 100.0 quote, now replaced by 105.0 before the trade at 30
    Seq(
      ("A", ts(20), "quote", 105.0),
      ("A", ts(30), "trade", 3.0)
    ).toDF("key", "ts", "side", "value").write.mode("append").parquet(in)
    run()
    val b2 = spark.read.parquet(out).as[StreamingAsOf.Enriched].collect()
      .map(e => e.value -> Option(e.refValue).map(_.toDouble)).toMap
    assert(b2(3.0) === Some(105.0))

    // batch 3: trade with NO new quote in its batch -> carried state
    Seq(("A", ts(40), "trade", 4.0)).toDF("key", "ts", "side", "value")
      .write.mode("append").parquet(in)
    run()
    val b3 = spark.read.parquet(out).as[StreamingAsOf.Enriched].collect()
      .map(e => e.value -> Option(e.refValue).map(_.toDouble)).toMap
    assert(b3(4.0) === Some(105.0))

    // batch 4: equal-ts quote ties resolve deterministically to the
    // greatest value, independent of arrival order
    Seq(
      ("A", ts(50), "quote", 101.0),
      ("A", ts(50), "quote", 109.0),
      ("A", ts(50), "quote", 103.0),
      ("A", ts(55), "trade", 5.0)
    ).toDF("key", "ts", "side", "value").write.mode("append").parquet(in)
    run()
    val b4 = spark.read.parquet(out).as[StreamingAsOf.Enriched].collect()
      .map(e => e.value -> Option(e.refValue).map(_.toDouble)).toMap
    assert(b4(5.0) === Some(109.0))
  }

  test("enrichExact matches refs that arrive a batch LATE (bounded lateness)") {
    val root = Files.createTempDirectory("sasofx").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val out = s"$root/out"

    def append(rows: Seq[(String, Timestamp, String, Double)], idx: Int): Unit =
      graft.streaming.IngestPipeline.appendBatch(
        rows.toDF("key", "ts", "side", "value"), in, idx)

    // batch 1: probes whose TRUE match has not arrived yet. Old ref at
    // t=90 is the wrong answer for the probe at t=100 — the right ref
    // (t=95) is withheld to batch 2. Key B's probe never sees another
    // input row for B: it must flush via the event-time timeout.
    append(Seq(
      ("A", ts(90), "quote", 10.0),
      ("A", ts(100), "trade", 1.0),
      ("A", ts(105), "trade", 2.0),
      ("B", ts(101), "trade", 3.0)), 0)
    // batch 2: the LATE ref (event time 95 < probes already seen) plus
    // a fresh ref at 104 — both inside the 10 s lateness bound
    append(Seq(
      ("A", ts(95), "quote", 20.0),
      ("A", ts(104), "quote", 30.0)), 1)

    val schema = spark.read.parquet(in).schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamingAsOf.enrichExact(stream, "key", "ts", "side",
          "value", probe = "trade", ref = "quote", delay = "10 seconds")
        .writeStream
        .format("parquet").option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }
    run()
    // watermark is only 95 s (max event 105 - 10): every probe is
    // still buffered — nothing emitted, nothing mis-emitted
    assert(spark.read.parquet(out).isEmpty)

    // batch 3: flush sentinel pushes the watermark past every probe;
    // the closing timeout batch drains A and (input-less) B
    append(Seq(("Z", ts(200), "flush", 0.0)), 2)
    run()
    val got = spark.read.parquet(out).as[StreamingAsOf.Enriched].collect()
      .map(e => e.value -> Option(e.refValue).map(_.toDouble)).toMap
    // the batch-ASOF answer: probe@100 -> late ref@95 (NOT the stale
    // ref@90 the immediate-emit mode would have used), probe@105 ->
    // ref@104, B's probe -> no ref at all
    assert(got === Map(
      1.0 -> Some(20.0), 2.0 -> Some(30.0), 3.0 -> None))
  }
}
