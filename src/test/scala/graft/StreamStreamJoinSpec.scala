package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join with watermarks — attributing each
  * purchase to a click by the same user within the preceding 10
  * minutes, both sides live streams (the streaming analog of the
  * as-of join surface). */
class StreamStreamJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("purchases join prior clicks within the interval") {
    val root = Files.createTempDirectory("ssj").toString
    val clicksIn = s"$root/clicks"; val buysIn = s"$root/buys"
    new java.io.File(clicksIn).mkdirs(); new java.io.File(buysIn).mkdirs()

    Seq((1L, ts(0), 100L), (1L, ts(30), 101L), (2L, ts(0), 200L))
      .toDF("user_id", "cts", "click_id")
      .write.mode("append").parquet(clicksIn)
    Seq((1L, ts(5), 900L),  // joins click 100 (5 min later)
        (1L, ts(31), 901L), // joins click 101, NOT 100 (31 min > 10)
        (2L, ts(20), 902L)) // no click within 10 min -> dropped (inner)
      .toDF("user_id", "bts", "buy_id")
      .write.mode("append").parquet(buysIn)

    val clicks = spark.readStream
      .schema(spark.read.parquet(clicksIn).schema).parquet(clicksIn)
      .withWatermark("cts", "1 hour")
    val buys = spark.readStream
      .schema(spark.read.parquet(buysIn).schema).parquet(buysIn)
      .withWatermark("bts", "1 hour")

    val joined = buys.as("b").join(clicks.as("c"),
      expr("""b.user_id = c.user_id AND
              bts >= cts AND bts <= cts + interval 10 minutes"""))
    val out = s"$root/out"
    val q = joined.select("buy_id", "click_id").writeStream
      .format("parquet").option("path", out)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((900L, 100L), (901L, 101L)))
  }
}
