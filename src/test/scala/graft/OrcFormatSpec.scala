package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Trade

/** Source-format breadth: the partitioned time-series layout works
  * identically over ORC (Spark's other bundled columnar format) —
  * round-trip fidelity and predicate pushdown into the ORC reader. */
class OrcFormatSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) =
    Timestamp.from(java.time.Instant.parse(f"2024-01-01T00:00:${s % 60}%02dZ"))

  test("ORC round-trip with partitioning and filter pushdown") {
    val dir = Files.createTempDirectory("orc").toString + "/trades"
    val trades = (0 until 100).map(i =>
      Trade(if (i % 2 == 0) "RTS" else "FORTS", s"SEC-${i % 5}", i.toLong,
        100.0 + i, 1, ts(i), nosystem = false))
    trades.toDS.toDF
      .withColumn("date", to_date(col("time")))
      .repartition(col("market"))
      .write.mode("overwrite").partitionBy("market").orc(dir)

    val back = spark.read.orc(dir)
    assert(back.count() === 100)
    val scanned = back.where(col("market") === "RTS" && col("security") === "SEC-2")
    scanned.queryExecution.executedPlan.execute().count()
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition pruning:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("security"),
      s"security predicate not pushed to ORC:\n$plan")
    assert(scanned.count() ===
      trades.count(t => t.market == "RTS" && t.security == "SEC-2"))
  }
}
