package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB time attribution for one catalog query — run the query
  * once and print every Spark job's wall time with its call site, so
  * a commit-machinery gate's cost splits into its constituent driver
  * actions (the guide-§1 empirical loop for multi-job operators,
  * where one SQL-tab plan cannot show where a 20 s gate goes).
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobProfile
  * q256 /root/testdata/sf0.1"`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse(sys.error("usage: JobProfile <queryPrefix> [sfDir]"))
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    // executionId -> the graft frame of the ACTION's call site (from
    // the SQL-execution start event), so AQE materialization sub-jobs
    // attribute to the driver action that owns them
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case st: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          val frame = Option(st.details).toSeq
            .flatMap(_.linesIterator.map(_.trim))
            .find(l => l.startsWith("graft.") && !l.contains("JobProfile"))
            .getOrElse(st.description.linesIterator.nextOption.getOrElse("?"))
          execDesc.put(st.executionId, frame)
        case _ => ()
      }
    })
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // first graft frame in the stage submission stack — attributes
        // the job to the operator method that triggered the action.
        // AQE materialization sub-jobs carry no graft frame in their
        // stage details; fall back to the ACTION's callSite property
        // (shared by all of an execution's sub-jobs), so iterative
        // operators attribute per driver action instead of "?".
        val site = e.stageInfos.headOption.map(_.details)
          .flatMap(_.linesIterator.map(_.trim)
            .find(l => l.startsWith("graft.") &&
              !l.contains("JobProfile")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))
              .map(id => Option(execDesc.get(id.toLong))
                .getOrElse(s"exec-$id"))))
          .getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, site) =>
          rows.add((e.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })
    val (name, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(qname))
      .getOrElse(sys.error(s"no query matches $qname"))
    // warm pass (JIT/codegen) at the smallest SF, like Bench
    try fn(s, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => }
    rows.clear()
    val t0 = System.nanoTime()
    fn(s, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq
    println(f"[prof] $name total ${total}%.2f s, jobs ${all.size}, job-sum ${all.map(_._2).sum}%.2f s")
    all.groupBy(_._3).toSeq
      .map { case (site, js) => (js.map(_._2).sum, js.size, site) }
      .sortBy(-_._1)
      .foreach { case (sum, n, site) =>
        println(f"[prof]   ${sum}%7.2f s  n=$n%-4d $site")
      }
    s.stop()
  }
}
