package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Streaming SimHash near-dup: the stateful banded-bucket stream must
  * find exactly the pairs the batch banded join finds — including
  * pairs whose two documents arrive in DIFFERENT micro-batches (the
  * case a per-batch join cannot cover). */
class StreamingNearDupSpec extends AnyFunSuite with SparkTestBase {

  test("pure-Scala fingerprint equals the expression pipeline") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 100)
    val fromExpr = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromExpr.nonEmpty)
    docs.select("doc_id", "text").collect().foreach { r =>
      // docs with no tokens produce no expression row — nothing to check
      fromExpr.get(r.getLong(0)).foreach { sig =>
        assert(StreamingNearDup.simhash64(r.getString(1)) === sig,
          s"fingerprint mismatch for doc ${r.getLong(0)}")
      }
    }
  }

  test("signature projection is expression-only — no UDF bridge in the streaming plan") {
    val root = Files.createTempDirectory("sndplan").toString
    val in = s"$root/in"
    val spark0 = spark; import spark0.implicits._
    Seq((1L, "alpha beta", new java.sql.Timestamp(1000L)))
      .toDF("doc_id", "text", "ts").write.parquet(in)
    val stream = spark.readStream.schema(spark.read.parquet(in).schema).parquet(in)
    val ds = graft.streaming.StreamingNearDup.pairsEvicting(stream,
      "doc_id", "text", "ts", "10 seconds", java.time.Duration.ofHours(1))
    val plan = ds.queryExecution.analyzed.toString
    assert(!plan.contains("UDF"), s"UDF bridge in streaming plan:\n$plan")
    assert(plan.toLowerCase.contains("simhash64text"),
      s"codegen fingerprint expression missing:\n$plan")
  }

  test("stateCap bounds bucket state: recency window drops only distant pairs") {
    val root = Files.createTempDirectory("sneardupcap").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    import org.apache.spark.sql.{SaveMode}
    val spark0 = spark; import spark0.implicits._
    // three identical docs arriving in three micro-batches
    Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    Seq((2L, "alpha beta gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    Seq((3L, "alpha beta gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingNearDup.pairs(stream, "doc_id", "text",
        maxHamming = 3, stateCap = 1)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out).select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap=1 keeps only the latest signature per bucket: the two
    // arrival-consecutive pairs survive and the (first, third) pair is
    // beyond the recency window. File-source batch order follows
    // modification time (arrival order unspecified under ties), so
    // assert the order-robust shape: exactly one of the three possible
    // pairs was evicted.
    assert(got.subsetOf(Set((1L, 2L), (2L, 3L), (1L, 3L))), got.toString)
    assert(got.size === 2, s"expected exactly one evicted pair, got $got")
  }

  test("event-time timeout evicts idle bucket state; within-window pairs still surface") {
    val root = Files.createTempDirectory("sneardupevict").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    import org.apache.spark.sql.SaveMode
    val spark0 = spark; import spark0.implicits._
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    // five micro-batches with EXPLICIT file mtimes so the file source
    // processes them in event-time order (mod-time ties would make
    // batch order unspecified):
    //   b1 doc1 @10s   b2 doc2 @30s (pair 1-2, within 60s window)
    //   b3 noise @2000s (advances watermark past doc1/doc2's deadline)
    //   b4 noise @2001s (timeout FIRES: stale buckets dropped — an
    //                    arrival re-arms, so eviction needs a trigger
    //                    in which the bucket is idle)
    //   b5 doc3 @2002s  (identical text, but state is gone: NO pair)
    val batches = Seq(
      Seq((1L, "alpha beta gamma", ts(10000L))),
      Seq((2L, "alpha beta gamma", ts(30000L))),
      Seq((90L, "zz yy xx ww", ts(2000000L))),
      Seq((91L, "qq rr ss tt", ts(2001000L))),
      Seq((3L, "alpha beta gamma", ts(2002000L))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val dir = new java.io.File(in)
      val before = dir.listFiles().map(_.getName).toSet
      rows.toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode(SaveMode.Append).parquet(in)
      dir.listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !before(f.getName))
        .foreach(f => assert(f.setLastModified(1000000L + i * 60000L)))
    }

    val schema = spark.read.parquet(in).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    def runToSet(pairs: org.apache.spark.sql.Dataset[StreamingNearDup.NearDupPair],
        tag: String): Set[(Long, Long)] = {
      val out = s"$root/out_$tag"
      val q = pairs.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.awaitTermination()
      spark.read.parquet(out).select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // control: without eviction the same input yields all three pairs
    val unbounded = runToSet(
      StreamingNearDup.pairs(stream, "doc_id", "text", maxHamming = 3), "nt")
    assert(unbounded === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // evicting: the cross-batch within-window pair survives; doc3's
    // pairs are gone BECAUSE the bucket state was evicted (same text,
    // same buckets — the control above proves the pairs exist)
    val evicted = runToSet(
      StreamingNearDup.pairsEvicting(stream, "doc_id", "text", "ts",
        watermarkDelay = "0 seconds",
        evictAfter = java.time.Duration.ofSeconds(60), maxHamming = 3), "ev")
    assert(evicted === Set((1L, 2L)))
  }

  test("hot bucket: per-member age pruning enforces the window without an idle trigger") {
    val root = Files.createTempDirectory("sneardhot").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    import org.apache.spark.sql.SaveMode
    val spark0 = spark; import spark0.implicits._
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    // every batch hits the SAME bucket (identical text), so the idle
    // timeout never fires — the window bound must come from the
    // per-member prune: doc1@10s ~ doc2@50s pair (40s < 60s window);
    // doc3@200s is 150s past doc2, so both members are pruned on its
    // arrival and it pairs with NOTHING
    val batches = Seq(
      Seq((1L, "alpha beta gamma", ts(10000L))),
      Seq((2L, "alpha beta gamma", ts(50000L))),
      Seq((3L, "alpha beta gamma", ts(200000L))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val dir = new java.io.File(in)
      val before = dir.listFiles().map(_.getName).toSet
      rows.toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode(SaveMode.Append).parquet(in)
      dir.listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !before(f.getName))
        .foreach(f => assert(f.setLastModified(1000000L + i * 60000L)))
    }
    val schema = spark.read.parquet(in).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    def runToSet(tag: String, evict: Boolean): Set[(Long, Long)] = {
      val ds = if (evict)
        StreamingNearDup.pairsEvicting(stream, "doc_id", "text", "ts",
          watermarkDelay = "0 seconds",
          evictAfter = java.time.Duration.ofSeconds(60), maxHamming = 3)
      else StreamingNearDup.pairs(stream, "doc_id", "text", maxHamming = 3)
      val out = s"$root/out_$tag"
      val q = ds.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.awaitTermination()
      spark.read.parquet(out).select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(runToSet("nt", evict = false) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(runToSet("ev", evict = true) === Set((1L, 2L)))
  }

  test("pairsEvicting with a window wider than the stream equals pairs() on real docs") {
    // parity property: eviction must be the ONLY semantic difference —
    // with an eviction window wider than the fixture's event-time span,
    // the evicting operator reduces to the unbounded one
    val root = Files.createTempDirectory("sneardupevpar").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 120)
      // synthetic event time: one doc per second, so the stream spans
      // ~2 minutes << the 1-day eviction window. Offset past epoch 0:
      // a row whose event time ties the INITIAL watermark (0) is
      // dropped as late — standard watermark semantics, not eviction
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("doc_id") + 1000L).as("ts"))
    docs.where(col("doc_id") < 60).coalesce(1).write.mode("append").parquet(in)
    docs.where(col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingNearDup.pairsEvicting(stream, "doc_id", "text", "ts",
        watermarkDelay = "0 seconds",
        evictAfter = java.time.Duration.ofDays(1), maxHamming = 3)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("null and all-space text screen nothing (batch parity) instead of crashing") {
    val root = Files.createTempDirectory("sneardupnull").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val spark0 = spark; import spark0.implicits._
    Seq(
      (1L, "alpha beta gamma", new java.sql.Timestamp(1000000L)),
      (2L, null: String, new java.sql.Timestamp(1001000L)),
      (3L, "   ", new java.sql.Timestamp(1002000L)),
      (4L, "alpha beta gamma", new java.sql.Timestamp(1003000L)))
      .toDF("doc_id", "text", "ts")
      .coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    def run(ds: org.apache.spark.sql.Dataset[StreamingNearDup.NearDupPair],
        tag: String): Set[(Long, Long)] = {
      val out = s"$root/out_$tag"
      val q = ds.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.awaitTermination()
      spark.read.parquet(out).select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // both entry points: the flatMap path (pairs) and the UDF path
    // (pairsEvicting) must drop token-less docs like the batch
    // operators do — not NPE, and not fingerprint an empty token bag
    assert(run(StreamingNearDup.pairs(stream, "doc_id", "text"), "nt")
      === Set((1L, 4L)))
    assert(run(StreamingNearDup.pairsEvicting(stream, "doc_id", "text", "ts",
      "0 seconds", java.time.Duration.ofDays(1)), "ev") === Set((1L, 4L)))
  }

  test("stateful streaming pairs match the batch banded join across micro-batches") {
    val root = Files.createTempDirectory("sneardup").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 120)
      .select(col("doc_id"), col("text"))
    // two single-file writes -> two micro-batches under maxFilesPerTrigger=1
    docs.where(col("doc_id") < 60).coalesce(1).write.mode("append").parquet(in)
    docs.where(col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingNearDup.pairs(stream, "doc_id", "text", maxHamming = 3)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
      .distinct() // at-least-once per agreeing band -> dedup
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture should contain near-dups")
    assert(got === want)
    // cross-batch coverage: at least one pair spans the two halves
    assert(want.exists { case (a, b, _) => a < 60 && b >= 60 },
      "fixture should contain a cross-batch pair")
  }
}
