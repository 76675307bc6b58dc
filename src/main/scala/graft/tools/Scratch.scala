package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc investigation sandbox (rewritten per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // session_window boundary: two events exactly `gap` apart — one
    // session (merge at equality) or two (strict overlap)?
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")), // exactly 30m later
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:29:59"))  // inside the gap
    ).toDF("user_id", "ts")
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sess"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sess.start"), col("sess.end"), col("n"))
      .orderBy("user_id", "start")
    sess.show(false)
    println("user1 sessions = " + sess.where(col("user_id") === 1).count())
    spark.stop()
  }
}
