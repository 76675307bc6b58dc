package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of catalog queries to files (the
  * plans/r17 evidence the optimization rounds commit). Args:
  * `<outDir> <sfDir> <queryPrefix>...`. The query fn runs its full
  * gate (side effects included) so the returned frame's plan is the
  * one the bench times. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = args(1)
    val prefixes = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(s, dir)
          val plan = org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted") match {
            case m => df.queryExecution.explainString(m)
          }
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try w.print(plan) finally w.close()
          println(s"[explain] wrote $name")
        } catch { case e: Throwable =>
          println(s"[explain] $name ERROR ${e.getMessage}")
        }
      }
    s.stop()
  }
}
