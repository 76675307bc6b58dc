package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Similarity
import graft.streaming.StreamingEmbedScreen

/** Streaming embedding near-dup: the stateful LSH-bucket stream must
  * produce exactly the pairs (with bit-equal cosines) that the batch
  * `cosineNearDupPairs` produces — including pairs whose vectors
  * arrive in different micro-batches — and the eviction window must
  * bound what an arrival can pair with. */
class StreamingEmbedScreenSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streaming pairs equal the batch operator across micro-batches, cosine bit-equal") {
    val root = Files.createTempDirectory("sembed").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    emb.where(col("vec_id") < 250).coalesce(1).write.mode("append").parquet(in)
    emb.where(col("vec_id") >= 250).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingEmbedScreen.pairs(stream, "vec_id", "embedding",
        threshold = 0.3, nBits = 4, dim = 64)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3, nBits = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty)
    // one bucket per vector -> exactly-once, so no dedup before compare
    assert(got === want)
    assert(want.exists { case (a, b, _) => a < 250 && b >= 250 },
      "expected at least one pair spanning the micro-batch boundary")
  }

  test("eviction window bounds pairing: old members prune before screening") {
    val root = Files.createTempDirectory("sembedev").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    def ts(s: String) = Timestamp.valueOf(s)
    // identical vectors -> same bucket, cosine 1.0; v1 falls out of the
    // 1 h window before v2/v3 arrive, so only (2,3) may pair
    val vec = Array.tabulate(8)(i => (i + 1).toFloat)
    Seq((1L, vec, ts("2024-01-01 00:00:00")))
      .toDF("vec_id", "embedding", "ts").coalesce(1).write.mode("append").parquet(in)
    Seq((2L, vec, ts("2024-01-01 02:00:00")), (3L, vec, ts("2024-01-01 02:10:00")))
      .toDF("vec_id", "embedding", "ts").coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = StreamingEmbedScreen.pairsEvicting(stream, "vec_id", "embedding",
        "ts", watermarkDelay = "10 minutes",
        evictAfter = java.time.Duration.ofHours(1),
        threshold = 0.9, nBits = 4, dim = 8)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt").start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 3L)),
      s"v1 must be age-pruned before v2/v3 screen: $got")
  }
}
