package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The persisted IVF index (q210): stored postings must answer
  * identically to the in-memory IVF path over the same centroids, and
  * the lookup's partitioned scan must actually PRUNE to the probed
  * cells (dynamic partition pruning on `cell`) — the property that
  * makes build-once/query-many serving read ~nProbe/nCentroids of a
  * 100 TB index instead of all of it. */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic synthetic corpus: 200 vectors, dim 8
  private def emb = (0 until 200).map { id =>
    (id.toLong, Array.tabulate(8)(i => (((id * 31 + i * 7) % 17) - 8) / 4.0f))
  }.toDF("vec_id", "embedding")

  test("stored postings answer == in-memory IVF over the same centroids") {
    val dir = Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", dir,
      nCentroids = 8, sampleSize = 64, iters = 2)

    val fromIndex = Similarity.ivfIndexTopK(spark,
        emb.where(col("vec_id") < 5), "vec_id", "embedding", dir,
        k = 3, nProbe = 2)
      .orderBy("query_id", "rank").collect()

    val centroids = spark.read.parquet(s"$dir/cent").orderBy("cell")
      .collect().map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    val live = Similarity.ivfTopKWithCentroids(
        emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 3, centroids, nProbe = 2)
      .orderBy("query_id", "rank").collect()

    assert(fromIndex.length === live.length)
    fromIndex.zip(live).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(a.getDouble(2) === b.getDouble(2)) // bit-exact cosine
      assert(a.getLong(3) === b.getLong(3))
    }
  }

  test("replayed batch overwrites its own directory (no duplicate postings)") {
    val dir = Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.ivfCentWrite(emb, "vec_id", "embedding", dir,
      nCentroids = 8, sampleSize = 64, iters = 2)
    Similarity.ivfIndexAppend(emb.where(col("vec_id") < 100),
      "vec_id", "embedding", dir, batchId = 0L)
    Similarity.ivfIndexAppend(emb.where(col("vec_id") >= 100),
      "vec_id", "embedding", dir, batchId = 1L)
    assert(spark.read.parquet(s"$dir/post").count() === 200L)
    // at-least-once delivery: batch 1 replays after a crash — the
    // rewrite must land in its own __bid dir, not append a duplicate
    Similarity.ivfIndexAppend(emb.where(col("vec_id") >= 100),
      "vec_id", "embedding", dir, batchId = 1L)
    assert(spark.read.parquet(s"$dir/post").count() === 200L)
  }

  test("lookup scan dynamically prunes to the probed cell partitions") {
    val dir = Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.ivfIndexWrite(emb, "vec_id", "embedding", dir,
      nCentroids = 8, sampleSize = 64, iters = 2)
    // postings live one __bid level down (idempotent per-batch dirs)
    val nCells = new java.io.File(s"$dir/post/__bid=0").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(nCells > 2, s"degenerate layout: $nCells cells")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Similarity.ivfIndexTopK(spark,
        emb.where(col("vec_id") === 0L), "vec_id", "embedding", dir,
        k = 3, nProbe = 2)
      val plan = q.queryExecution.executedPlan
      assert(plan.toString.contains("PartitionFilters"),
        "no partition filters on the postings scan")
      plan.execute().count()
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scanned = plan.collectLeaves().collectFirst {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("/post")) =>
          f.metrics("numFiles").value
      }.getOrElse(-1L)
      // one query probing 2 of >2 cells must read fewer partitions
      // than exist (each cell directory holds >= 1 file)
      assert(scanned > 0 && scanned < nCells,
        s"expected pruned read: 0 < $scanned < $nCells files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
