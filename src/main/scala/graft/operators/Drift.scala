package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two dataset snapshots — the
  * POPULATION STABILITY INDEX (the standard model/data-contract
  * drift score): bucket a metric into fixed bins, compare the two
  * snapshots' bin shares, PSI = Σ (p_i − q_i)·ln(p_i/q_i) ≥ 0.
  * Conventional reading: < 0.1 stable, 0.1–0.25 moderate shift,
  * > 0.25 action. The pipeline use: alarm when a new corpus
  * snapshot's quality/length/score distribution walks away from the
  * training baseline.
  *
  * Determinism contract: bins are FIXED-width literals (no learned
  * boundaries), counts are exact longs, shares use add-one (Laplace)
  * smoothing — (cnt+1)/(n+bins) — so empty bins are well-defined
  * without dropping terms; the only libm op is `ln`, whose ≤1-ulp
  * engine differences are absorbed by rounding the SUM to `roundDp`
  * (hard rule 9: term noise ~1e-16 vs a 5e-7 boundary at 6 dp).
  *
  * 100 TB shape: one count aggregate per snapshot (bins × groups
  * rows out), the bin grid is built by a tiny cross join (groups ×
  * nBins literals), and the PSI fold is over nBins rows per group —
  * corpus size only ever appears inside the two counting scans. */
object Drift {

  /** Per-group PSI of `valueCol` between snapshots `a` and `b`.
    * Returns (group, psi, n_a, n_b). */
  def psi(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, binWidth: Double, nBins: Int,
      roundDp: Int = 6): DataFrame = {
    require(nBins >= 2 && binWidth > 0, s"bad bins: $nBins x $binWidth")
    val spark = a.sparkSession
    import spark.implicits._
    // NULL metric values are excluded EXPLICITLY (and identically in
    // the SQL oracle): Spark's greatest() skips nulls (a NULL value
    // would land in bin 0) while DuckDB's propagates NULL (the row
    // would fall into a NULL bin the grid join drops) — filtering
    // keeps both engines on the same population instead of leaning on
    // engine-specific NULL semantics.
    def binned(df: DataFrame, cntName: String) = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        least(lit(nBins - 1), greatest(lit(0),
          floor(col(valueCol).cast("double") / lit(binWidth)).cast("int")))
          .as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as(cntName))
    val ca = binned(a, "cnt_a")
    val cb = binned(b, "cnt_b")
    // complete (group, bin) grid so empty bins keep their smoothed
    // share instead of silently dropping the term
    val grid = ca.select("grp").unionByName(cb.select("grp")).distinct()
      .crossJoin((0 until nBins).toDF("bin"))
    val joined = grid
      .join(ca, Seq("grp", "bin"), "left")
      .join(cb, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val tot = joined.groupBy("grp")
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    val p = (col("cnt_a") + lit(1)).cast("double") /
      (col("n_a") + lit(nBins)).cast("double")
    val q = (col("cnt_b") + lit(1)).cast("double") /
      (col("n_b") + lit(nBins)).cast("double")
    joined.join(tot, Seq("grp"))
      .select(col("grp"), col("n_a"), col("n_b"),
        ((p - q) * log(p / q)).as("term"))
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(round(sum(col("term")), roundDp).as("psi"))
      .select(col("grp"), col("psi"), col("n_a"), col("n_b"))
  }
}
