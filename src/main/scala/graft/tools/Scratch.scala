package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

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
    val t = 0.8
    def ceilT(c: org.apache.spark.sql.Column) = ceil(c - lit(1e-9))
    val sh = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(shingles(col("text"), 2))).as("sh"))
    time("sh")(sh.count())
    val freq = sh.groupBy("sh").agg(count("*").as("df"))
    val dict = freq.select(col("sh"),
      (row_number().over(Window.orderBy(col("df"), col("sh"))) - 1).as("sid"))
    val shId = sh.join(broadcast(dict), "sh").select(col("doc"), col("sid"))
    time("shId")(shId.count())
    val sets = shId.groupBy("doc")
      .agg(sort_array(collect_list("sid")).as("set"))
      .withColumn("n", size(col("set")))
    time("sets")(sets.count())
    val prefixLen = (col("n") - ceilT(col("n") * lit(t)) + lit(1)).cast("int")
    val prefix = sets
      .select(col("doc"), col("n"),
        posexplode(slice(col("set"), lit(1), prefixLen)).as(Seq("pos0", "sid")))
      .withColumn("pos", col("pos0") + 1)
    time("prefix")(prefix.count())
    val alpha = ceilT((col("a.n") + col("b.n")) * lit(t / (1.0 + t)))
    val candsRaw = prefix.as("a").join(prefix.as("b"),
      col("a.sid") === col("b.sid") && col("a.doc") < col("b.doc") &&
        col("a.n") >= ceilT(col("b.n") * lit(t)) &&
        col("b.n") >= ceilT(col("a.n") * lit(t)) &&
        lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= alpha)
    time("candsRaw")(candsRaw.count())
    val cands = candsRaw.select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    time("cands distinct")(cands.count())
    time("verify")(
      cands.join(sets.as("sa"), col("doc_a") === col("sa.doc"))
        .join(sets.as("sb"), col("doc_b") === col("sb.doc"))
        .withColumn("inter", size(array_intersect(col("sa.set"), col("sb.set"))))
        .where(col("inter") > 0).count())
    time("jaccard full")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.8).count())
    spark.stop()
  }
}
