package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming dedup with watermark (reference T2: the HBase
  * qualifier-overwrite idempotency window, bounded here with
  * dropDuplicatesWithinWatermark so state cannot grow without bound —
  * the divergence documented in SURVEY §7). */
class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    val root = Files.createTempDirectory("sdedup").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    Seq(
      (1L, ts(1), 10.0), (2L, ts(2), 20.0),
      (1L, ts(3), 99.0), // dup id within watermark -> dropped
      (3L, ts(4), 30.0)
    ).toDF("event_id", "ts", "value").write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val out = s"$root/out"
    val q = stream.writeStream
      .format("parquet").option("path", out)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(out).orderBy("event_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
  }
}
