package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Trade
import graft.streaming.IngestPipeline

/** The same ingest pipeline as `IngestPipelineSpec`, driven end-to-end
  * over a REAL network source: Structured Streaming's socket source on
  * 127.0.0.1 (the reference's Kestrel queue consumer shape,
  * `marketdb-app/.../MarketLoader.scala:27-56`). The pipeline itself is
  * unchanged — same parse→quarantine→idempotent-append→compact chain —
  * which is the source-agnosticism claim under test.
  *
  * Assertions are batch-boundary independent on purpose: the socket
  * source splits lines into micro-batches nondeterministically, and the
  * compaction invariant (exactly one row per id, earliest time wins)
  * must hold under EVERY split — in-batch dedup and cross-batch
  * compaction compose to the same survivor.
  */
class SocketIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def line(id: Long, price: Double, sec: Int): String =
    s"RTS,RIH,$id,$price,1,${1700000000000L + sec * 1000L},false"

  private def awaitIds(out: String, expect: Set[Long], deadlineMs: Long = 60000): Unit = {
    val start = System.currentTimeMillis()
    while (System.currentTimeMillis() - start < deadlineMs) {
      val got = try {
        spark.read.parquet(out).select("tradeId").as[Long].collect().toSet
      } catch { case _: Exception => Set.empty[Long] } // dir not written yet
      if (expect.subsetOf(got)) return
      Thread.sleep(200)
    }
    fail(s"timed out waiting for ids $expect in $out")
  }

  test("socket source feeds the same idempotent ingest pipeline") {
    val root = Files.createTempDirectory("socketingest").toString
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val server = new ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    try {
      val schema = Seq.empty[Trade].toDS.schema
      val parsed = IngestPipeline.parseCsvEvents(
        IngestPipeline.socketLines(spark, "127.0.0.1", server.getLocalPort),
        schema, "tradeId", "time")
      val q = IngestPipeline.startIngest(parsed, out, ckpt, "tradeId", "time",
        trigger = Trigger.ProcessingTime(0))
      // the source connects during query start; accept blocks until then
      val conn = server.accept()
      val w = new PrintWriter(conn.getOutputStream, true)
      try {
        // wave 1: two events + an in-flight duplicate of id 2 + one
        // malformed line (quarantined by the null-id parse guard)
        w.println(line(1L, 100.0, 1))
        w.println(line(2L, 101.0, 2))
        w.println(line(2L, 999.0, 3))
        w.println("garbage,not,a,trade")
        awaitIds(out, Set(1L, 2L))
        // wave 2: queue redelivery of id 2 (late, higher ts) + new id 3
        w.println(line(2L, 555.0, 9))
        w.println(line(3L, 102.0, 4))
        awaitIds(out, Set(1L, 2L, 3L))
      } finally { q.stop(); w.close(); conn.close() }

      val raw = spark.read.parquet(out)
      assert(raw.columns.contains("__date"), "append layout must stay date-partitioned")
      assert(raw.count() >= 3) // append-only: may hold several versions of id 2
      assert(raw.where(col("tradeId").isNull).count() === 0,
        "malformed wire line must be quarantined before the sink")
      // compaction invariant — identical to IngestPipelineSpec's:
      // exactly one row per id, earliest time wins whatever the batching
      val got = IngestPipeline.compact(spark, out, "tradeId", Seq("time"))
        .orderBy("tradeId").collect()
      assert(got.map(_.getAs[Long]("tradeId")).toSeq === Seq(1L, 2L, 3L))
      assert(got(1).getAs[Double]("price") === 101.0, "earliest version of id 2 must win")
    } finally server.close()
  }
}
