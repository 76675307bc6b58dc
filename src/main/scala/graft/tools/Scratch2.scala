package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: time one catalog query N times at a given SF + print plan. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[t] pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (args.contains("--explain"))
      println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
