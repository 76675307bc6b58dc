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

  /** Largest-remainder apportionment of `targetN` over INTEGER
    * per-stratum weights `w` (integer so every sum/remainder is
    * exact — a double weight sum would be order-sensitive in its
    * last ulp and could flip a remainder rank). */
  private def apportion(weights: DataFrame, targetN: Long): DataFrame = {
    val all = Window.partitionBy() // O(strata) rows — see scaladoc
    val quo = weights
      .withColumn("tw", sum(col("w")).over(all))
      .withColumn("prod", lit(targetN) * col("w"))
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and
      // floor-of-double breaks exactness past 2^53
      .withColumn("fl", expr("prod div tw"))
      .withColumn("rem", col("prod") % col("tw"))
    quo
      .withColumn("leftover", lit(targetN) - sum(col("fl")).over(all))
      .withColumn("rk", row_number().over(
        all.orderBy(col("rem").desc, col("stratum"))))
      .select(col("stratum"),
        (col("fl") + when(col("rk") <= col("leftover"), lit(1L))
          .otherwise(lit(0L))).as("quota"))
  }

  /** Exactly `targetN` rows (when the table has at least that many),
    * apportioned across strata by largest remainder. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      targetN: Long): DataFrame = {
    val h = hashed(df, strataCol, idCol)
    val cnt = h.groupBy("stratum").agg(count(lit(1)).as("n"))
    take(ranked(h), apportion(cnt.select(col("stratum"),
      col("n").as("w")), targetN))
  }

  /** TEMPERATURE-scaled mix (the α-rebalanced domain recipe:
    * stratum share ∝ n^α, α < 1 upweights small domains — α = 0.5
    * is the classic sqrt rebalance): quotas apportioned by largest
    * remainder over weights `floor(n^α · 1000)`. The ×1000
    * quantization keeps weights INTEGER (exact apportionment
    * arithmetic — see [[apportion]]) at 0.1% relative resolution,
    * far below sampling noise; `n^0.5` itself is IEEE-exact sqrt on
    * both engines. Caps at the stratum size like any draw. */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
      targetN: Long, alpha: Double = 0.5): DataFrame = {
    val h = hashed(df, strataCol, idCol)
    val w0 = if (alpha == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), lit(alpha))
    val weights = h.groupBy("stratum").agg(count(lit(1)).as("n"))
      .select(col("stratum"),
        floor(w0 * lit(1000.0)).cast("long").as("w"))
    take(ranked(h), apportion(weights, targetN))
  }

  /** min(k, n_g) rows per stratum — equal representation. */
  def balanced(df: DataFrame, strataCol: String, idCol: String,
      k: Long): DataFrame = {
    val h = hashed(df, strataCol, idCol)
    take(ranked(h),
      h.select("stratum").distinct().withColumn("quota", lit(k)))
  }

  // ---- draws from bounded streaming state (q186) ------------------------

  private def rankedFromState(state: DataFrame): DataFrame =
    state.select(col("stratum"),
        posexplode(col("top")).as(Seq("pos", "row")))
      .select(col("stratum"), (col("pos") + 1).cast("long").as("rn"),
        col("row.id").as("id"))

  /** [[stratified]] re-derived from BOUNDED per-stratum streaming
    * state: rows (stratum, n, top) where `n` is the stratum's total
    * count and `top` its ASCENDING (md5, id) prefix heap (the
    * CollectTopK aggregate). Because any row in a stratum's final
    * k-prefix is in the k-prefix of every arrival subset (the
    * k-smallest-of-union property), a heap of capacity ≥ any
    * possible quota (targetN suffices — no stratum's apportionment
    * exceeds the total draw) makes this EQUAL to the batch draw on
    * the full table, with state O(strata × targetN) regardless of
    * corpus size. */
  def stratifiedFromState(state: DataFrame, targetN: Long): DataFrame =
    take(rankedFromState(state),
      apportion(state.select(col("stratum"), col("n").as("w")), targetN))

  /** [[balanced]] from the same state (k must fit the heap). */
  def balancedFromState(state: DataFrame, k: Long): DataFrame =
    take(rankedFromState(state),
      state.select("stratum").withColumn("quota", lit(k)))
}
