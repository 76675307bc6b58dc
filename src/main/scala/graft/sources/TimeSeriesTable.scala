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

  /** Write `df` as a partitioned, sorted time-series table.
    *
    * `repartition` hashes on the partition columns (plus a salt bucket
    * when `filesPerDate > 1`), so write parallelism scales with the
    * number of (market, date) partitions — one task per partition per
    * bucket, each emitting one file. A numeric-only `repartition(n,
    * cols)` would cap TOTAL parallelism at n, funnelling the whole
    * table through n tasks regardless of partition count. */
  def write(df: DataFrame, path: String, marketCol: String, timeCol: String,
      securityCol: String, filesPerDate: Int = 1): Unit = {
    require(filesPerDate > 0, "filesPerDate must be positive")
    val dated = df.withColumn("date", to_date(col(timeCol)))
    val (bucketed, partCols) =
      if (filesPerDate == 1) (dated, Seq(col(marketCol), col("date")))
      else (dated.withColumn("__bucket",
        pmod(hash(col(securityCol)), lit(filesPerDate))),
        Seq(col(marketCol), col("date"), col("__bucket")))
    bucketed
      .repartition(partCols: _*)
      .sortWithinPartitions(col(marketCol), col("date"), col(securityCol), col(timeCol))
      .drop("__bucket")
      .write
      .mode("overwrite")
      .partitionBy(marketCol, "date")
      .parquet(path)
  }

  /** Open the table; series/time predicates applied on top of this
    * prune partitions (see SeriesScan.scan). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
