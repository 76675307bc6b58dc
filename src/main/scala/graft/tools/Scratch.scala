package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val filtered = filter(split(lower(col("text")), " "), t => t =!= "")
    val trimmed = split(trim(lower(col("text"))), " +")
    // warm
    docs.select(explode(trimmed)).count()
    time("filter-lambda tokens x3") {
      (1 to 3).map(_ => docs.select(explode(filtered)).count()).last
    }
    time("trim-split tokens x3") {
      (1 to 3).map(_ => docs.select(explode(trimmed)).count()).last
    }
    time("equal?")(docs.where(not(filtered === trimmed)).count())
    time("minhash path current x3") {
      (1 to 3).map(_ =>
        graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 2, 2).count()).last
    }
    spark.stop()
  }
}
