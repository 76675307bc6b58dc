package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the bucketed-log write shape: times the postings
  * batch write (tokenize+explode+groupBy+partitionBy parquet) as-is
  * (AQE-coalesced, typically 1 task writing all 64 bucket files
  * sequentially) vs hash-repartitioned by bucket before the write
  * (bucket-parallel file creation). Decides whether per-file create
  * cost or compute dominates a commit at bench scale. */
object WriteProbe {
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
    val docs = graft.sources.Tables.load(s, dir, "documents")
      .localCheckpoint()
    val postings = docs
      .select(col("doc_id").as("cand_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("cand_id"), size(col("toks")).cast("double").as("dl"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy("term", "cand_id", "dl")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tf", size(col("positions")).cast("long"))
      .select("term", "cand_id", "dl", "tf", "positions")
    val bkt = pmod(xxhash64(col("term")), lit(64L))
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[wprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 3).foreach { pass =>
      println(s"[wprobe] ---- pass $pass ----")
      t("asis (coalesced write)") {
        postings.withColumn("__bkt", bkt)
          .write.mode("overwrite").partitionBy("__bkt")
          .parquet("/tmp/graft_wprobe_a")
      }
      t("repart by __bkt") {
        postings.withColumn("__bkt", bkt)
          .repartition(col("__bkt"))
          .write.mode("overwrite").partitionBy("__bkt")
          .parquet("/tmp/graft_wprobe_b")
      }
      t("repart(cpus, __bkt)") {
        postings.withColumn("__bkt", bkt)
          .repartition(cpus.toInt, col("__bkt"))
          .write.mode("overwrite").partitionBy("__bkt")
          .parquet("/tmp/graft_wprobe_c")
      }
      t("count only (no write)") {
        postings.withColumn("__bkt", bkt).write.format("noop")
          .mode("overwrite").save()
      }
    }
    s.stop()
  }
}
