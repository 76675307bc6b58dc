package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming windowed aggregation (reference T3: per-minute storage
  * buckets → `window($"ts","1 minute")` tumbling aggregates), driven
  * through a real streaming query. */
class StreamingWindowSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Int, s: Int) =
    new Timestamp(1700000000000L / 60000 * 60000 + m * 60000L + s * 1000L)

  test("tumbling 1-minute windows aggregate a stream") {
    val root = Files.createTempDirectory("win").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    Seq(
      ("RIH", ts(0, 1), 10.0), ("RIH", ts(0, 30), 12.0), // minute 0
      ("RIH", ts(1, 5), 20.0),                           // minute 1
      ("SBER", ts(0, 59), 5.0)
    ).toDF("security", "time", "price").write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val bars = stream
      .withWatermark("time", "10 minutes")
      .groupBy(col("security"), window(col("time"), "1 minute").as("w"))
      .agg(count("*").as("n"), sum("price").as("vol"),
        min("price").as("low"), max("price").as("high"))

    val q = bars.writeStream
      .format("memory").queryName("bars")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT security, n, vol, low, high FROM bars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(("RIH", 1L, 20.0), ("RIH", 2L, 22.0), ("SBER", 1L, 5.0)))
  }
}
