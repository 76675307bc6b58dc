package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over the whole query catalog: for each query,
  * report the properties that matter at 100 TB — parquet filter
  * pushdown, projection pruning (ReadSchema width), join strategies,
  * shuffle (Exchange) count, whole-stage codegen coverage.
  * Run: `sbt "runMain graft.tools.ExplainAudit [sfDir]"`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // execute this exact (adaptive) plan so the final runtime plan —
        // codegen stages, reused exchanges, AQE join swaps — is visible
        df.queryExecution.executedPlan.execute().count()
        // keep only the AQE final plan (the string repeats the initial
        // plan below it); codegen stages appear as "*(n)" prefixes
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        def count(p: String) = p.r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z]".r.findAllIn(plan).length
        val bhj = count("BroadcastHashJoin")
        val smj = count("SortMergeJoin")
        val shj = count("ShuffledHashJoin")
        val reused = count("ReusedExchange")
        val exch = count("Exchange") - reused
        val wsc = ("\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet.size)
        val scans = count("Scan parquet")
        val readSchemas = "ReadSchema: struct<([^>]*)>".r
          .findAllMatchIn(plan)
          .map(_.group(1).count(_ == ':')).toSeq
        println(f"[audit] $name%-22s scans=$scans pushed=$pushed cols=${readSchemas.mkString("/")}%-12s bhj=$bhj smj=$smj shj=$shj exchange=$exch reused=$reused codegen=$wsc")
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
