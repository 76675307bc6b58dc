package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Trade
import graft.operators.SeriesScan
import graft.sources.TimeSeriesTable

/** Partitioned layout: scans with series+interval predicates must hit
  * partition pruning (PartitionFilters) and parquet pushdown
  * (PushedFilters) — the rebuild of the reference's row-key range
  * behavior, asserted on the actual physical plan. */
class TimeSeriesTableSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, s: Int) =
    Timestamp.from(java.time.Instant.parse(f"2024-01-$day%02dT00:00:${s % 60}%02dZ"))

  test("write partitions by market/date and scan prunes both") {
    val dir = Files.createTempDirectory("tst").toString + "/trades"
    val trades = for {
      m <- Seq("RTS", "FORTS"); d <- 1 to 5; i <- 0 until 10
    } yield Trade(m, s"SEC-${i % 3}", (m.hashCode.toLong << 16) + d * 100 + i,
      100.0 + i, 1, ts(d, i), nosystem = false)
    TimeSeriesTable.write(trades.toDS.toDF, dir, "market", "time", "security")

    // layout check: market=<m>/date=<d> directories
    val p = new java.io.File(s"$dir/market=RTS/date=2024-01-02")
    assert(p.isDirectory, s"expected partition dir $p")

    val table = TimeSeriesTable.read(spark, dir)
    val scanned = SeriesScan.scan(table,
      Map("market" -> "RTS", "security" -> "SEC-1"), "time",
      ts(2, 0), ts(3, 59))
    assert(scanned.count() === 6) // days 2,3 x securities i=1,4,7 -> 3 per day

    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition filters in plan")
    assert(plan.contains("market"), "market predicate missing from scan")
    assert(plan.contains("PushedFilters"), "no pushed filters in plan")
    assert(plan.contains("isnotnull(security"), "security filter not pushed")

    // the pruned scan must actually read fewer files: execute the
    // physical plan directly (AQE off so the scan node is inspectable)
    // and read its numFiles metric
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        val plan = df.queryExecution.executedPlan
        plan.execute().count()
        plan.collectLeaves().collectFirst {
          case f: FileSourceScanExec => f.metrics("numFiles").value
        }.getOrElse(-1L)
      }
      val allFiles = filesRead(table.select("market"))
      val prunedFiles = filesRead(
        SeriesScan.scan(TimeSeriesTable.read(spark, dir),
          Map("market" -> "RTS", "security" -> "SEC-1"), "time",
          ts(2, 0), ts(3, 59)))
      assert(prunedFiles > 0 && prunedFiles < allFiles,
        s"expected pruning: 0 < $prunedFiles < $allFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("filesPerDate > 1 salts into multiple files per partition, data intact") {
    val dir = Files.createTempDirectory("tst").toString + "/salted"
    val trades = for {
      d <- 1 to 2; sec <- 0 until 8; i <- 0 until 5
    } yield Trade("RTS", s"SEC-$sec", (d * 1000 + sec * 10 + i).toLong,
      100.0 + i, 1, ts(d, i), nosystem = false)
    // at toy scale AQE correctly coalesces the tiny salted shuffle back
    // into one task (no small files); disable coalescing to observe the
    // salt fan-out that large partitions would get
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try TimeSeriesTable.write(trades.toDS.toDF, dir, "market", "time",
      "security", filesPerDate = 3)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    val partDir = new java.io.File(s"$dir/market=RTS/date=2024-01-01")
    val files = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1 && files <= 3, s"expected 2-3 salted files, got $files")

    // no __bucket column leaks; every row comes back
    val back = TimeSeriesTable.read(spark, dir)
    assert(!back.columns.contains("__bucket"))
    assert(back.count() === trades.size)
    assert(back.select("tradeId").distinct().count() === trades.size)
  }
}
