package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize

/** Gap sessionization via native session_window: boundary semantics
  * (pinned — q70's DuckDB twin depends on them), batch parity with the
  * q36 lag/cumsum formulation on real data, and streaming replay
  * parity including a session that spans micro-batches. */
class SessionizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("events exactly gap apart merge; strictly beyond gap split") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")), // exactly 30 min: merges
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:30:01"))  // 30 min + 1 s: splits
    ).toDF("user_id", "ts")
    val got = Sessionize.sessions(df, "user_id", "ts", "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 2L),
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 1L),
      (2L, ts("2024-01-01 00:30:01"), ts("2024-01-01 01:00:01"), 1L)))
  }

  test("batch session_window equals the lag/cumsum sessionizer on real events") {
    val viaWindow = SparkEntry.queries("q70_session_window")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
      .toSet
    // q36's formulation: same strict-gap boundary; end = last ts + gap
    val viaLag = SparkEntry.queries("q36_sessionize")(spark, sf0001)
      .select(col("user_id"), col("start_ts"),
        (col("end_ts") + expr("INTERVAL 30 MINUTES")).as("sess_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
      .toSet
    assert(viaWindow.nonEmpty)
    assert(viaWindow === viaLag)
  }

  test("streaming sessions match batch, including one spanning micro-batches") {
    val root = Files.createTempDirectory("sess").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val batch1 = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 00:05:00")))
    val batch2 = Seq(
      (1L, ts("2024-01-01 00:20:00")), // continues batch-1 session
      (1L, ts("2024-01-01 01:00:00")), // 40-min gap: new session
      (999L, ts("2024-01-11 00:00:00"))) // sentinel: drives watermark
    batch1.toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)
    batch2.toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = Sessionize.sessions(stream, "user_id", "ts", "30 minutes",
        watermarkDelay = Some("10 minutes"))
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .where(col("user_id") =!= 999L) // sentinel session may still be open
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val batchRef = Sessionize.sessions(
        (batch1 ++ batch2).toDF("user_id", "ts")
          .where(col("user_id") =!= 999L),
        "user_id", "ts", "30 minutes")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(batchRef.exists { case (u, s0, _, n) =>
      u == 1L && s0 == ts("2024-01-01 00:00:00") && n == 3L
    }, s"expected the cross-batch session in the batch reference: $batchRef")
    assert(got === batchRef)
  }

  test("out-of-order arrivals merge; sessions emit exactly once at watermark close") {
    val root = Files.createTempDirectory("sessooo").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // watermark delay 1 h, gap 30 min; user 999 is the watermark driver.
    // batch 1: u1 @01:00 (wm after: 01:00)
    // batch 2: u1 @01:10 — OUT OF ORDER (arrives after the 02:00
    //   sentinel, event time before it; > wm so late-but-valid) and
    //   must MERGE into the open [01:00, 01:30+gap) session.
    //   Sentinel 03:00 pushes wm to 02:00 > close 01:40 -> the session
    //   is emittable from the next trigger on.
    // batch 3: u1 @00:30 — genuinely LATE (< wm 02:00): dropped, must
    //   not reopen or re-emit. Sentinel 04:00 forces the final trigger.
    Seq((1L, ts("2024-01-01 01:00:00")), (999L, ts("2024-01-01 02:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)
    Seq((1L, ts("2024-01-01 01:10:00")), (999L, ts("2024-01-01 03:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)
    Seq((1L, ts("2024-01-01 00:30:00")), (999L, ts("2024-01-01 04:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val perBatch = scala.collection.concurrent.TrieMap
      .empty[Long, Array[(Long, Timestamp, Timestamp, Long)]]
    val q = Sessionize.sessions(stream, "user_id", "ts", "30 minutes",
        watermarkDelay = Some("1 hour"))
      .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        perBatch(id) = batch.collect().map(r =>
          (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      }
      .start()
    q.awaitTermination()

    val u1 = perBatch.toSeq.sortBy(_._1)
      .flatMap { case (id, rows) => rows.filter(_._1 == 1L).map(id -> _) }
    // exactly-once: one emission total, already merged with the
    // out-of-order event (n=2, end = 01:10 + gap), and the late 00:30
    // row never reopens a session or produces a second emission
    assert(u1.map(_._2) === Seq(
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:40:00"), 2L)),
      s"per-batch u1 emissions: $u1")
    assert(u1.head._1 >= 2L,
      s"session must emit only after the out-of-order merge (batch ${u1.head._1})")
  }
}
