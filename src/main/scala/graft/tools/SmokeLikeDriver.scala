package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces the driver's t1 smoke: a bare session (no graft configs)
  * calling `SparkEntry.entry` — guards the runtime-set nanos-timestamp
  * conf path in `Tables.load`. */
object SmokeLikeDriver {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n first=${df.head()}")
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
