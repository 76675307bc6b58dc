package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the InvertedIndex gate family (q256-shaped):
  * splits a gate's wall time into init / per-ingest / per-delete /
  * serve / purge so the commit-machinery cost separates from the
  * query-plan cost (the Q234Profile discipline applied to the search
  * stack). Run: `SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.tools.IndexProfile /root/testdata/sf0.1"`. */
object IndexProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[idxprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    s.range(1000000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { pass =>
      println(s"[idxprof] ---- pass $pass ----")
      val base = "/tmp/graft_idxprofile"
      val fs = org.apache.hadoop.fs.FileSystem
        .get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val docs = phase("load docs")(
        graft.sources.Tables.load(s, dir, "documents").localCheckpoint())
      val idx = graft.operators.InvertedIndex(base, withForward = true)
      phase("init")(idx.init(s))
      (0 until 2).foreach { b =>
        phase(s"ingest $b")(
          idx.ingest(docs.where(pmod(col("doc_id"), lit(2L)) === b),
            "doc_id", "text", b.toLong))
      }
      val doomed = docs.where(pmod(col("doc_id"), lit(6L)) === 0)
        .select("doc_id")
      phase("deleteByIds 0")(idx.deleteByIds(doomed, "doc_id", 0L))
      phase("deleteByIds 0 replay")(idx.deleteByIds(doomed, "doc_id", 0L))
      phase("deleteByIds 1 repeat")(idx.deleteByIds(doomed, "doc_id", 1L))
      val queries = docs.where(pmod(col("doc_id"), lit(101L)) === 0 &&
        pmod(col("doc_id"), lit(6L)) =!= 0).localCheckpoint()
      def answer() = idx.bm25TopK(queries, "doc_id", "text", k = 5,
        excludeSelf = true)
      phase("answer 1")(answer().orderBy("query_id", "rank").collect())
      phase("purge")(idx.purgeDeletes(s))
      phase("answer 2")(answer().orderBy("query_id", "rank").collect())
      phase("deleteByIds 2 post")(idx.deleteByIds(doomed, "doc_id", 2L))
      phase("answer 3")(answer().orderBy("query_id", "rank").collect())
      phase("answer 4 (returned)")(answer().count())
    }
    s.stop()
  }
}
