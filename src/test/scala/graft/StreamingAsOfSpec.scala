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
}
