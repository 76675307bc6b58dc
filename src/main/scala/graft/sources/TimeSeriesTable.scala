package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned time-series table layout — the 100 TB answer to the
  * reference's row-key design.
  *
  * The reference's HBase row key `marketId ++ securityId ++ year ++
  * dayOfYear ++ minuteOfDay` (`marketdb-core/.../model/Trade.scala:22-30`)
  * exists to make a series+interval scan touch only the relevant byte
  * range. The Spark-native equivalent:
  *
  *  - directory partitioning `market=<m>/date=<d>` → partition pruning
  *    eliminates whole directories for series+interval predicates
  *    before any I/O (the `PartitionFilters` entry in `.explain`);
  *  - within each file, rows sorted by (security, time) →
  *    parquet row-group min/max statistics prune pages for the
  *    security/time predicates (`PushedFilters`);
  *  - one file per (partition, bucket) via `repartition` keeps file
  *    count bounded at 1000-executor scale (no small-files explosion);
  *  - statistics-friendly: timestamps and dictionary-encoded strings,
  *    so min/max and dictionary filters both engage.
  */
object TimeSeriesTable {

  /** Write `df` as a partitioned, sorted time-series table. */
  def write(df: DataFrame, path: String, marketCol: String, timeCol: String,
      securityCol: String, filesPerDate: Int = 1): Unit =
    df.withColumn("date", to_date(col(timeCol)))
      .repartition(filesPerDate, col(marketCol), col("date"))
      .sortWithinPartitions(col(marketCol), col("date"), col(securityCol), col(timeCol))
      .write
      .mode("overwrite")
      .partitionBy(marketCol, "date")
      .parquet(path)

  /** Open the table; series/time predicates applied on top of this
    * prune partitions (see SeriesScan.scan). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
