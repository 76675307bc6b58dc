package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.IngestPipeline

/** Ingest-time decontamination: the per-micro-batch stream must flag
  * exactly the pairs the batch operator flags over the union of all
  * batches — each doc's shingles arrive together, so batch boundaries
  * cannot change the answer. */
class StreamingDecontaminateSpec extends AnyFunSuite with SparkTestBase {

  test("streaming pairs equal the batch operator over all micro-batches") {
    val root = Files.createTempDirectory("sdecontam").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val evalSet = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
    train.where(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(in)
    train.where(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in)

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val out = s"$root/out"
    val q = IngestPipeline.startDecontaminate(stream, evalSet,
      "doc_id", "text", k = 4, out, s"$root/ckpt")
    q.awaitTermination()

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.decontaminate(train, evalSet, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }
}
