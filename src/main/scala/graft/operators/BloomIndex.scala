package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{BloomAggregate, BloomMightContainCol}

/** FILE-LEVEL BLOOM INDEX — secondary-index point lookups over a
  * parquet table: one fixed-size Bloom bitset per DATA FILE, built in
  * a single scan, probed at planning time so an equality lookup reads
  * ONLY the files that might contain the key. This is q183's
  * zone-map/Z-order read-path discipline for the predicate class
  * range stats cannot prune — point lookups on a high-cardinality
  * key scattered across files (every file's [min, max] spans the
  * probe, yet almost no file actually holds it).
  *
  * Correctness is unconditional: Bloom false positives only ADD
  * files to the read set, and the residual exact predicate runs over
  * whatever is read — the index buys IO skipping, never answers.
  *
  * 100 TB shape: the build is one scan with O(words) state per file
  * (`groupBy(input_file_name())` — partial aggregation, the shuffle
  * moves one KB-scale bitset per file); the index table is
  * O(files × KB) — the planner-side probe joins it against the
  * (tiny, broadcast) probe-key set and collects only matching FILE
  * PATHS to the driver, never data rows. At a million files the
  * probe is a one-stage scan of a few GB of bitsets — the same
  * cost class as a metastore listing. Rebuild is per-file, so
  * appending files appends index rows (no global rebuild). */
object BloomIndex {

  /** One (file, bloom_bits) row per data file of `table`, over
    * `keyCol`'s xxhash64 (the probe side hashes identically). */
  def build(table: DataFrame, keyCol: String, words: Int = 1024,
      numHashes: Int = 7): DataFrame =
    table.groupBy(input_file_name().as("file"))
      .agg(BloomAggregate(xxhash64(col(keyCol)), words, numHashes)
        .as("bloom_bits"))

  /** Files that might contain ANY probe key: broadcast the (tiny)
    * probe hashes against the index and keep files with ≥1 possible
    * hit. Distributed — only matching paths reach the driver. */
  def matchingFiles(index: DataFrame, probes: DataFrame,
      probeKeyCol: String, numHashes: Int = 7): Seq[String] =
    index.join(broadcast(
        probes.select(xxhash64(col(probeKeyCol)).as("__h")).distinct()))
      .where(BloomMightContainCol(col("__h"), col("bloom_bits"), numHashes))
      .select("file").distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** Point-lookup read path: scan ONLY the index-matched files, then
    * apply the exact residual predicate (semi join against the probe
    * set — false positives die here). Returns the matching rows. */
  def lookup(spark: SparkSession, index: DataFrame, probes: DataFrame,
      keyCol: String, numHashes: Int = 7): DataFrame = {
    val files = matchingFiles(index, probes, keyCol, numHashes)
    require(files.nonEmpty, "no file can contain any probe key")
    spark.read.parquet(files: _*)
      .join(broadcast(probes.select(col(keyCol)).distinct()), Seq(keyCol),
        "left_semi")
  }
}
