package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.LiveBars

/** Incremental streaming OHLC: state folds across micro-batches; a
  * late event amends the bar (open re-resolves, count grows). */
class LiveBarsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val minute = 1700000000000L - 1700000000000L % 60000L
  private def ts(s: Int) = new Timestamp(minute + s * 1000L)

  test("bars fold across micro-batches and absorb late amendments") {
    val root = Files.createTempDirectory("bars").toString
    val in = s"$root/in"; val out = s"$root/out"
    new java.io.File(in).mkdirs()

    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema).parquet(in)
      val q = LiveBars.bars(stream, "key", "ts", "price")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }

    // batch 1: three ticks in one minute bucket
    Seq(("RIH", ts(5), 101.0), ("RIH", ts(20), 99.0), ("RIH", ts(40), 103.0))
      .toDF("key", "ts", "price").write.mode("append").parquet(in)
    run()

    // batch 2: late tick EARLIER in the same bucket -> open amends
    Seq(("RIH", ts(1), 100.0)).toDF("key", "ts", "price")
      .write.mode("append").parquet(in)
    run()

    val bars = spark.read.parquet(out).as[LiveBars.Bar].collect()
    // keep the final amendment: max n per (key, bucket)
    val fin = bars.groupBy(b => (b.key, b.bucket)).map(_._2.maxBy(_.n)).toSeq
    assert(fin.length === 1)
    val b = fin.head
    assert(b.n === 4)
    assert(b.open === 100.0, "late earlier tick must amend the open")
    assert(b.high === 103.0 && b.low === 99.0 && b.close === 103.0)
  }
}
