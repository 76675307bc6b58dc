package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingHeavyHitters

/** Shard-partitioned Space-Saving heavy hitters: exactness with ample
  * capacity (vs a batch groupBy count), and the est/err bounds under
  * eviction pressure. */
class StreamingHeavyHittersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(in: String, out: String, ckpt: String,
      shards: Int, capacity: Int): Map[String, (Long, Long)] = {
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingHeavyHitters.tokenCounts(stream, "text", shards, capacity)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    // snapshots are monotone: the final summary row per token is the
    // one with the largest estimate
    spark.read.parquet(out)
      .groupBy("token").agg(max_by(struct(col("est"), col("err")), col("est")).as("s"))
      .select(col("token"), col("s.est"), col("s.err"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("ample capacity: streaming counts are exact across micro-batches") {
    val root = Files.createTempDirectory("shh").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 120).select("doc_id", "text")
    docs.where(col("doc_id") < 60).coalesce(1).write.mode("append").parquet(in)
    docs.where(col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(in)

    val got = run(in, s"$root/out", s"$root/ckpt", shards = 8, capacity = 4096)
    val want = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty)
    assert(got.view.mapValues(_._1).toMap === want)
    assert(got.values.forall(_._2 == 0L), "no eviction -> err must be 0")
  }

  test("tight capacity: est bounds hold and the hot token survives eviction") {
    val root = Files.createTempDirectory("shhtight").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // skewed stream: "hot" x30 across two batches + 20 singleton tails
    val tail = (0 until 20).map(i => f"t$i%02d")
    Seq(Seq.fill(15)("hot").mkString(" "), tail.take(10).mkString(" "))
      .toDF("text").coalesce(1).write.mode("append").parquet(in)
    Seq(Seq.fill(15)("hot").mkString(" "), tail.drop(10).mkString(" "))
      .toDF("text").coalesce(1).write.mode("append").parquet(in)

    val got = run(in, s"$root/out", s"$root/ckpt", shards = 1, capacity = 4)
    val truth = (tail.map(_ -> 1L) :+ ("hot" -> 30L)).toMap
    assert(got.size <= 4 + 4, "emissions beyond summary capacity per snapshot")
    got.foreach { case (tok, (est, err)) =>
      val t = truth(tok)
      assert(est >= t, s"$tok: space-saving may only overestimate ($est < $t)")
      assert(est - err <= t, s"$tok: err bound violated (est=$est err=$err true=$t)")
    }
    assert(got.contains("hot"), s"hot token evicted: $got")
    assert(got("hot")._1 >= 30L)
  }

  test("emission is bounded by the batch's distinct tokens, results unchanged") {
    val root = Files.createTempDirectory("shhemit").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    // batch 1 populates a wide summary; batch 2 arrives with ONE token —
    // a full re-emission would replay the whole summary, changed-only
    // emission must produce at most one row
    val wide = (0 until 50).map(i => f"w$i%02d").mkString(" ")
    Seq(wide).toDF("text").coalesce(1).write.mode("append").parquet(in)
    Seq("w07").toDF("text").coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val perBatch = scala.collection.concurrent.TrieMap.empty[Long, Array[(String, Long, Long)]]
    val q = StreamingHeavyHitters.tokenCounts(stream, "text", shards = 1, capacity = 4096)
      .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingHeavyHitters.TokenCount], id: Long) =>
        perBatch(id) = batch.collect().map(tc => (tc.token, tc.est, tc.err))
      }
      .start()
    q.awaitTermination()

    val sizes = perBatch.toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes === Seq(50, 1),
      s"per-batch emissions must track distinct arrivals, got $sizes")
    assert(perBatch.maxBy(_._1)._2.toSeq === Seq(("w07", 2L, 0L)))
    // downstream max(est) per token equals the exact batch counts
    val finalEst = perBatch.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = ("w07" -> 2L) +: (0 until 50).filter(_ != 7).map(i => f"w$i%02d" -> 1L)
    assert(finalEst === want.toMap)
  }
}
