package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc investigation sandbox (rewritten per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q03_join_agg")(spark, "/root/testdata/sf0.1")
    df.queryExecution.executedPlan.execute().count()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println(plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet") ||
      l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
