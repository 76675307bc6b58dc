package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomIndex

/** File-level Bloom index (q192): the lookup reads STRICTLY fewer
  * files than the table holds (the skipping that is the operator's
  * whole point), never misses a true match (no false negatives by
  * construction), and the residual predicate kills false positives. */
class BloomIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dir = "/tmp/graft_bloomidx_spec"

  private def writeTable(): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // 4000 keys scattered over 16 files by an unrelated column, so
    // every file's [min, max] key range spans any probe (zone maps
    // would prune nothing)
    (1L to 4000L).map(k => (k, k % 97)).toDF("k", "grp")
      .repartition(16, col("grp"))
      .write.parquet(dir)
  }

  test("point lookups read few files, return exactly the probed rows") {
    writeTable()
    val table = spark.read.parquet(dir)
    val totalFiles = table.select(input_file_name()).distinct().count()
    assert(totalFiles === 16L)
    val index = BloomIndex.build(table, "k")
    val probes = Seq(17L, 1017L, 3999L).toDF("k")
    val files = BloomIndex.matchingFiles(index, probes, "k")
    assert(files.nonEmpty && files.size < 16,
      s"expected real skipping, matched ${files.size}/16 files")
    val got = BloomIndex.lookup(spark, index, probes, "k")
      .select("k").as[Long].collect().sorted.toSeq
    assert(got === Seq(17L, 1017L, 3999L))
  }

  test("probing an absent key matches no true file rows") {
    val table = spark.read.parquet(dir)
    val index = BloomIndex.build(table, "k")
    val probes = Seq(999999L).toDF("k")
    val files = BloomIndex.matchingFiles(index, probes, "k")
    // fp files may match; the residual semi join must return nothing
    if (files.nonEmpty)
      assert(BloomIndex.lookup(spark, index, probes, "k").isEmpty)
  }

  test("rebuilt index is bit-identical (OR-merge is order-free)") {
    val a = BloomIndex.build(spark.read.parquet(dir), "k").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val c = BloomIndex.build(
        spark.read.parquet(dir).coalesce(3), "k").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a === c)
  }
}
