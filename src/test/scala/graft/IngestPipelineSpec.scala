package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Trade
import graft.streaming.IngestPipeline

/** Streaming ingest end-to-end (SURVEY §2.9): file micro-batch source
  * → idempotent partitioned append → compaction yields exactly one
  * row per event id even when input batches repeat events (the
  * reference's HBase overwrite idempotency, T2). */
class IngestPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("ingest dedups within batch and compacts across batches") {
    val root = Files.createTempDirectory("ingest").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()

    val batch1 = Seq(
      Trade("RTS", "RIH", 1L, 100.0, 1, ts(1), nosystem = false),
      Trade("RTS", "RIH", 2L, 101.0, 1, ts(2), nosystem = false),
      Trade("RTS", "RIH", 2L, 999.0, 1, ts(3), nosystem = false) // in-batch dup id
    )
    batch1.toDS.write.mode("append").parquet(in)

    val schema = batch1.toDS.schema
    val q1 = IngestPipeline.startIngest(
      IngestPipeline.fileSource(spark, schema, in), out, ckpt, "tradeId", "time")
    q1.awaitTermination()

    // replay: same event 2 arrives again in a later file (late/dup delivery)
    Seq(Trade("RTS", "RIH", 2L, 555.0, 1, ts(9), nosystem = false),
        Trade("RTS", "RIH", 3L, 102.0, 1, ts(4), nosystem = false))
      .toDS.write.mode("append").parquet(in)
    val q2 = IngestPipeline.startIngest(
      IngestPipeline.fileSource(spark, schema, in), out, ckpt, "tradeId", "time")
    q2.awaitTermination()

    val raw = spark.read.parquet(out)
    // append-only table may hold multiple versions of id 2...
    assert(raw.count() >= 3)
    // ...but compaction is exactly-one-per-id, earliest wins
    val compacted = IngestPipeline.compact(spark, out, "tradeId", Seq("time"))
    val got = compacted.orderBy("tradeId").collect()
    assert(got.map(_.getAs[Long]("tradeId")).toSeq === Seq(1L, 2L, 3L))
    assert(got(1).getAs[Double]("price") === 101.0, "earliest version of id 2 must win")
  }
}
