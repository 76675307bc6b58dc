package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) layout clustering — the multi-dimensional
  * data-skipping layout (what Delta/Iceberg `OPTIMIZE ZORDER BY`
  * computes): interleaving the bits of two key columns gives a
  * 1-dimensional sort key whose contiguous ranges are small
  * RECTANGLES in (a, b) space, so files written in z-order carry
  * tight min/max zone maps on BOTH columns and a scan filtered on
  * either column prunes most files — a plain sort by `a` gives
  * per-file `b` ranges as wide as the domain.
  *
  * The z value is pure integer bit arithmetic (16 bits per
  * dimension), identical on any engine — q169's oracle re-derives it
  * from the same Scala-generated expression text
  * ([[zValueSqlExpr]]), the oracle-parity-constants convention.
  *
  * 100 TB shape: the PRODUCTION path is
  * `df.repartitionByRange(n, zCol).sortWithinPartitions(zCol)` +
  * write — range boundaries come from Spark's reservoir sampling
  * (scale-correct but not run-to-run deterministic, so the GATE
  * instead buckets by ntile over the exact z total order, which is
  * a pure function of the data). [[layoutStats]] returns the
  * per-bucket zone map — (bucket, rows, min/max of each dimension)
  * — the evidence that contiguous z-ranges stay rectangular. */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (odd positions) and `b`
    * (even positions). Long-safe for bits <= 31. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      (shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        + shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
        .cast("long")
    }.reduce(_ + _)
  }

  /** The SAME interleave as [[zValue]], as DuckDB SQL text over
    * column expressions `a` and `b` — one generator, two engines. */
  def zValueSqlExpr(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString("(", " + ", ")")

  // ---- the READ path: zone-map file pruning -----------------------------

  /** Write `df` into one directory per equal-depth slice of
    * `orderCols`' total order (`__zb=<k>/`, one file each), plus a
    * `_zonemap` stats table holding every bucket's (min, max) of BOTH
    * dimensions — the Delta/Iceberg stats-in-transaction-log shape,
    * which is where multi-dimensional skipping actually happens at
    * 100 TB: the driver prunes FILES from metadata before any scan is
    * planned. `orderCols` must end in a unique tiebreak so the slicing
    * is a pure function of the data (the gate path; production swaps
    * `repartitionByRange` in for the ntile, as [[layoutStats]]
    * documents). Pass z-order columns for a rectangle layout or a
    * single-column sort to build the comparison layout. */
  def writeBucketed(df: DataFrame, orderCols: Seq[Column], aCol: String,
      bCol: String, nBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    df.withColumn("__zb",
        ntile(nBuckets).over(Window.orderBy(orderCols: _*)).cast("int"))
      .repartition(col("__zb"))
      .write.mode("overwrite").partitionBy("__zb").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("__zb"))
      .agg(min(col(aCol).cast("long")).as("min_a"),
        max(col(aCol).cast("long")).as("max_a"),
        min(col(bCol).cast("long")).as("min_b"),
        max(col(bCol).cast("long")).as("max_b"))
      .write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** Bucket ids whose zone-map rectangle INTERSECTS the box — the
    * driver-side pruning decision (O(nBuckets) metadata, zero data
    * read). */
  def pruneBox(spark: org.apache.spark.sql.SparkSession, path: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): (Seq[Int], Int) = {
    val zm = spark.read.parquet(s"$path/_zonemap").collect()
    val keep = zm.filter { r =>
      r.getAs[Long]("min_a") <= aHi && r.getAs[Long]("max_a") >= aLo &&
      r.getAs[Long]("min_b") <= bHi && r.getAs[Long]("max_b") >= bLo
    }.map(_.getAs[Int]("__zb")).toSeq.sorted
    (keep, zm.length)
  }

  /** Zone-map-pruned 2-D box scan: plan the scan over ONLY the
    * surviving bucket directories (the scan's `numFiles` metric IS
    * the pruning evidence), then apply the exact residual filter —
    * zone pruning is sound but coarse, exactly like production data
    * skipping. */
  def readBox(spark: org.apache.spark.sql.SparkSession, path: String,
      aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val (keep, _) = pruneBox(spark, path, aLo, aHi, bLo, bHi)
    val residual = col(aCol).cast("long").between(aLo, aHi) &&
      col(bCol).cast("long").between(bLo, bHi)
    if (keep.isEmpty)
      spark.read.parquet(path).where(lit(false))
    else
      spark.read.parquet(keep.map(k => s"$path/__zb=$k"): _*)
        .where(residual)
  }

  /** Per-z-bucket zone maps: bucket rows by `nBuckets` equal-depth
    * slices of the exact (z, tie) total order and report each
    * bucket's row count and min/max of both dimensions. */
  def layoutStats(df: DataFrame, aCol: String, bCol: String,
      tieCol: String, bits: Int, nBuckets: Int): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits)
    df.withColumn("z", z)
      .withColumn("bucket", ntile(nBuckets).over(
        Window.orderBy(col("z"), col(tieCol))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"))
  }
}
