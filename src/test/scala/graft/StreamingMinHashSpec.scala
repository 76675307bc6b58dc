package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.StreamingMinHash

/** Streaming MinHash near-dup: the stateful banded-bucket stream must
  * produce exactly the candidate pairs (with exact agreement counts)
  * that the batch Broder estimator produces — including pairs whose
  * documents arrive in different micro-batches. */
class StreamingMinHashSpec extends AnyFunSuite with SparkTestBase {

  test("pure-Scala signature equals the expression pipeline on real documents") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 100)
    val fromExpr = Dedup.minhashSignatures(docs, "doc_id", "text", k = 2, nHashes = 16)
      .collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getString(i + 1)))
      .toMap
    assert(fromExpr.nonEmpty)
    docs.select("doc_id", "text").collect().foreach { r =>
      val scala = StreamingMinHash.signature(r.getString(1), k = 2, nHashes = 16)
      fromExpr.get(r.getLong(0)) match {
        case Some(expected) =>
          assert(scala != null, s"doc ${r.getLong(0)} lost its signature")
          assert(scala.toSeq === expected, s"signature mismatch doc ${r.getLong(0)}")
        case None =>
          // no shingles -> no aggregate row; pure function agrees
          assert(scala == null, s"doc ${r.getLong(0)} gained a signature")
      }
    }
  }

  test("signature projection is expression-only — no UDF bridge in the streaming plan") {
    val root = Files.createTempDirectory("smhplan").toString
    val in = s"$root/in"
    val spark0 = spark; import spark0.implicits._
    Seq((1L, "alpha beta gamma", new java.sql.Timestamp(1000L)))
      .toDF("doc_id", "text", "ts").write.parquet(in)
    val stream = spark.readStream.schema(spark.read.parquet(in).schema).parquet(in)
    val ds = graft.streaming.StreamingMinHash.pairsEvicting(stream,
      "doc_id", "text", "ts", "10 seconds", java.time.Duration.ofHours(1))
    val plan = ds.queryExecution.analyzed.toString
    assert(!plan.contains("UDF"), s"UDF bridge in streaming plan:\n$plan")
    assert(plan.toLowerCase.contains("minhashsignaturetext"),
      s"codegen signature expression missing:\n$plan")
  }

  test("streaming candidates match the batch estimator across micro-batches") {
    val root = Files.createTempDirectory("sminhash").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 120)
      .select(col("doc_id"), col("text"))
    docs.where(col("doc_id") < 60).coalesce(1).write.mode("append").parquet(in)
    docs.where(col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingMinHash.pairs(stream, "doc_id", "text",
        k = 2, nHashes = 16, bandSize = 4)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .select(col("doc_a"), col("doc_b"), col("n_agree").cast("long"))
      .distinct() // at-least-once per agreeing band
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.minhashJaccardEstimate(docs, "doc_id", "text",
        k = 2, nHashes = 16, bandSize = 4)
      .select(col("doc_a"), col("doc_b"), col("n_agree"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture should contain banded candidates")
    assert(got === want)
    assert(want.exists { case (a, b, _) => a < 60 && b >= 60 },
      "fixture should contain a cross-batch pair")
  }

  test("minAgree filters to high-estimate pairs; stateCap bounds bucket state") {
    val root = Files.createTempDirectory("sminhashcap").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val spark0 = spark; import spark0.implicits._
    // three identical docs across three micro-batches + a null text
    Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    Seq((2L, "alpha beta gamma delta"), (9L, null: String))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    Seq((3L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingMinHash.pairs(stream, "doc_id", "text",
        k = 2, nHashes = 16, bandSize = 4, minAgree = 16, stateCap = 1)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .select("doc_a", "doc_b", "n_agree").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // identical docs agree on all 16 components; cap=1 keeps only the
    // latest signature per bucket so exactly one of the three pairs is
    // beyond the recency window (batch order under mtime ties is
    // unspecified -> assert the order-robust shape)
    assert(got.forall(_._3 == 16), got.toString)
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.subsetOf(Set((1L, 2L), (2L, 3L), (1L, 3L))), got.toString)
    assert(pairs.size === 2, s"expected exactly one evicted pair, got $got")
  }

  test("event-time timeout evicts idle bucket state; within-window pairs still surface") {
    val root = Files.createTempDirectory("sminhashevict").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    import org.apache.spark.sql.SaveMode
    val spark0 = spark; import spark0.implicits._
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    // same five-batch script as StreamingNearDupSpec's eviction test
    // (explicit mtimes pin event-time batch order):
    //   b1 doc1 @10s   b2 doc2 @30s (pair 1-2, within 60s window)
    //   b3/b4 noise past the deadline (arrival re-arms, so eviction
    //   needs a trigger in which the stale bucket is idle)
    //   b5 doc3 @2002s (identical text, state gone: NO pair)
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
    def runToSet(pairs: org.apache.spark.sql.Dataset[StreamingMinHash.EstimatedPair],
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
      StreamingMinHash.pairs(stream, "doc_id", "text",
        k = 2, nHashes = 16, bandSize = 4), "nt")
    assert(unbounded === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // evicting: the cross-batch within-window pair survives; doc3's
    // pairs are gone BECAUSE the bucket state was evicted (the control
    // proves the pairs exist for this input)
    val evicted = runToSet(
      StreamingMinHash.pairsEvicting(stream, "doc_id", "text", "ts",
        watermarkDelay = "0 seconds",
        evictAfter = java.time.Duration.ofSeconds(60),
        k = 2, nHashes = 16, bandSize = 4), "ev")
    assert(evicted === Set((1L, 2L)))
  }

  test("hot bucket: per-member age pruning enforces the window without an idle trigger") {
    val root = Files.createTempDirectory("sminhashhot").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    import org.apache.spark.sql.SaveMode
    val spark0 = spark; import spark0.implicits._
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    // same script as StreamingNearDupSpec's hot-bucket test: identical
    // text keeps the bucket hot every trigger; only the within-window
    // pair may survive under eviction
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
        StreamingMinHash.pairsEvicting(stream, "doc_id", "text", "ts",
          watermarkDelay = "0 seconds",
          evictAfter = java.time.Duration.ofSeconds(60),
          k = 2, nHashes = 16, bandSize = 4)
      else StreamingMinHash.pairs(stream.select("doc_id", "text"),
        "doc_id", "text", k = 2, nHashes = 16, bandSize = 4)
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
    // with the eviction window wider than the fixture's event-time
    // span, the evicting operator reduces to the unbounded one
    val root = Files.createTempDirectory("sminhashevpar").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 120)
      // synthetic event time: one doc per second (~2 min span << 1-day
      // window), offset past epoch 0 so no row ties the initial
      // watermark (a tie would be dropped as late — watermark
      // semantics, not eviction)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("doc_id") + 1000L).as("ts"))
    docs.where(col("doc_id") < 60).coalesce(1).write.mode("append").parquet(in)
    docs.where(col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    def runToSet(pairs: org.apache.spark.sql.Dataset[StreamingMinHash.EstimatedPair],
        tag: String): Set[(Long, Long, Long)] = {
      val out = s"$root/out_$tag"
      val q = pairs.writeStream.format("parquet").option("path", out)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt_$tag").start()
      q.awaitTermination()
      spark.read.parquet(out)
        .select(col("doc_a"), col("doc_b"), col("n_agree").cast("long"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val plain = runToSet(StreamingMinHash.pairs(
      stream.select("doc_id", "text"), "doc_id", "text",
      k = 2, nHashes = 16, bandSize = 4), "plain")
    val evict = runToSet(StreamingMinHash.pairsEvicting(
      stream, "doc_id", "text", "ts", watermarkDelay = "0 seconds",
      evictAfter = java.time.Duration.ofDays(1),
      k = 2, nHashes = 16, bandSize = 4), "evict")
    assert(plain.nonEmpty, "fixture should contain candidate pairs")
    assert(evict === plain)
  }
}
