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
}
