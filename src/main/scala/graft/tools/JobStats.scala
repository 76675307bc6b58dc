package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** NOISE-ROBUST A/B metrics for catalog queries: Spark JOB count,
  * stage count, task count and summed task run/CPU time per query run.
  * Wall-clock on this box swings 2× run-to-run (SCALE.md bench-noise
  * history), but job/stage/task COUNTS are deterministic for a fixed
  * plan, and summed task time excludes driver/scheduler idle — so
  * structural optimizations (fewer jobs per commit, fewer footer
  * reads) show up cleanly even when wall does not.
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobStats
  * /root/testdata/sf0.1 q247 q250 ..."`. */
object JobStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    require(prefixes.nonEmpty, "usage: JobStats <sfDir> <queryPrefix>...")
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
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val runMs = new AtomicLong; val cpuNs = new AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(e.taskMetrics).foreach { m =>
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })
    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    // warm pass like Bench
    picked.foreach { case (_, fn) =>
      try fn(s, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    picked.foreach { case (name, fn) =>
      s.catalog.clearCache()
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0); cpuNs.set(0)
      val t0 = System.nanoTime()
      fn(s, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobstats] $name%-28s wall=${wall}%7.2f jobs=${jobs.get}%-4d " +
        f"stages=${stages.get}%-4d tasks=${tasks.get}%-6d " +
        f"taskRun=${runMs.get / 1e3}%8.2f s taskCpu=${cpuNs.get / 1e9}%8.2f s")
    }
    s.stop()
  }
}
