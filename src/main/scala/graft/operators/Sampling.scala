package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus curation — the
  * "rebalance the training mix" step (per-language / per-domain
  * quotas), built entirely from integer arithmetic and md5 ranks so
  * the drawn set is a pure function of the data (the q102 md5-deal
  * trick: hash-rank rows, take a prefix — no RNG, no
  * partitioning sensitivity, SQL-replayable).
  *
  * - [[stratified]]: EXACT total-size sample with largest-remainder
  *   (Hamilton) apportionment: stratum g gets
  *   floor(targetN·n_g/N) plus one of the `targetN − Σfloor`
  *   leftovers, awarded by largest remainder (ties → stratum key) —
  *   the allocation sums to exactly `targetN` and is the standard
  *   unbiased integer apportionment.
  * - [[balanced]]: min(k, n_g) rows per stratum — the
  *   equal-representation mix.
  *
  * 100 TB shape: counting is one partial aggregate; the allocation
  * table is O(strata) and computed in-plan (single-partition window
  * over the strata frame — strata cardinality, not corpus size,
  * bounds it); selection is one rank window per stratum (one
  * shuffle). The rank sort is the exact-quota cost — the O(1)
  * alternative (select h below a quota-derived threshold) avoids the
  * sort but only hits the quota in expectation. */
object Sampling {

  private def hashed(df: DataFrame, strataCol: String, idCol: String) =
    df.select(col(strataCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"))
      .withColumn("h", md5(col("id").cast("string")))

  private def take(ranked: DataFrame, alloc: DataFrame): DataFrame =
    ranked.join(alloc, Seq("stratum"))
      .where(col("rn") <= col("quota"))
      .select(col("id"), col("stratum"))

  private def ranked(h: DataFrame): DataFrame =
    h.withColumn("rn", row_number().over(
      Window.partitionBy("stratum").orderBy(col("h"), col("id"))))

  /** Exactly `targetN` rows (when the table has at least that many),
    * apportioned across strata by largest remainder. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      targetN: Long): DataFrame = {
    val h = hashed(df, strataCol, idCol)
    val cnt = h.groupBy("stratum").agg(count(lit(1)).as("n"))
    val all = Window.partitionBy() // O(strata) rows — see scaladoc
    val quo = cnt
      .withColumn("tn", sum(col("n")).over(all))
      .withColumn("prod", lit(targetN) * col("n"))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and
      // floor-of-double breaks exactness past 2^53
      .withColumn("fl", expr("prod div tn"))
      .withColumn("rem", col("prod") % col("tn"))
    val alloc = quo
      .withColumn("leftover", lit(targetN) - sum(col("fl")).over(all))
      .withColumn("rk", row_number().over(
        all.orderBy(col("rem").desc, col("stratum"))))
      .select(col("stratum"),
        (col("fl") + when(col("rk") <= col("leftover"), lit(1L))
          .otherwise(lit(0L))).as("quota"))
    take(ranked(h), alloc)
  }

  /** min(k, n_g) rows per stratum — equal representation. */
  def balanced(df: DataFrame, strataCol: String, idCol: String,
      k: Long): DataFrame = {
    val h = hashed(df, strataCol, idCol)
    take(ranked(h),
      h.select("stratum").distinct().withColumn("quota", lit(k)))
  }
}
