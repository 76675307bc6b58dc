package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Scd2

/** Streaming SCD-2 (q161's operator): cross-batch interval repair —
  * a straggler CHANGE arriving a batch late (inside the lateness
  * window) splits an open interval before anything is emitted;
  * consecutive repeats collapse; open intervals publish exactly once
  * at the horizon. */
class Scd2Spec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("straggler change splits the interval; repeats collapse; horizon publishes the open row") {
    val root = Files.createTempDirectory("scd2").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val out = s"$root/out"

    def write(rows: (Long, Timestamp, Long, String)*): Unit =
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .write.mode("append").parquet(in)

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = Scd2.intervals(stream, "user_id", "ts", "event_id",
          "event_type", "10 seconds", ts(100))
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.awaitTermination()
    }

    // batch 1: A at 10, B at 30 — looks like A[10,30) B[30,...)
    write((1L, ts(10), 1L, "A"), (1L, ts(30), 3L, "B"))
    run()
    // nothing final yet (watermark only reaches 20)
    assert(spark.read.parquet(out).count() === 0L)

    // batch 2: STRAGGLER change C at 20 (inside the 10 s lateness
    // window) — must land BETWEEN the buffered events and split A/B
    // (strictly above the 20 s watermark: a row AT the watermark is
    // dropped by the source-side late filter, correctly)
    write((1L, ts(25), 2L, "C"))
    run()

    // batch 3: B again at 50 — a consecutive repeat, collapses
    write((1L, ts(50), 5L, "B"))
    run()

    // batch 4: far sentinel on another key pushes the watermark past
    // the horizon — key 1's open interval publishes
    write((2L, ts(200), 9L, "Z"))
    run()

    val rows = spark.read.parquet(out)
      .where($"user_id" === 1L)
      .collect()
      .map(r => (r.getString(1),
        r.getTimestamp(2),
        Option(r.getTimestamp(3))))
      .sortBy(_._2.getTime)
      .toSeq
    assert(rows === Seq(
      ("A", ts(10), Some(ts(25))),
      ("C", ts(25), Some(ts(30))),
      ("B", ts(30), None)),
      s"got $rows")
    // exactly once: no duplicate interval rows across the four runs
    assert(spark.read.parquet(out).where($"user_id" === 1L).count() === 3L)
  }
}
