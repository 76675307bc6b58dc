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

  /** Pairwise JENSEN–SHANNON DIVERGENCE between the unigram
    * distributions of dataset slices (languages, domains, snapshots)
    * — the mixture-design view PSI can't give: JSD is symmetric,
    * bounded by ln 2, and is what you thumb when choosing mixing
    * weights or detecting that one slice's vocabulary walked away
    * from another's.
    *
    * `counts` is a (sliceCol, word, c) frame of exact long unigram
    * counts (one shuffle to build from a corpus; vocab-bounded by
    * Heaps' law). For each slice pair a<b, with p(w)=c_a(w)/N_a and
    * q(w)=c_b(w)/N_b:
    *
    *   JSD = ½ Σ_w p ln(2p/(p+q)) + ½ Σ_w q ln(2q/(p+q))
    *
    * Words in ONE slice only contribute ½·p·ln2 (resp. q) — rather
    * than outer-joining per pair, those tails fold into closed form:
    * Σ_{w∉b} p(w) = 1 − (Σ_{w∈both} c_a(w))/N_a, an INTEGER sum and
    * one division. So an inner self-join on word suffices, and the
    * only order-sensitive float work is the two in-vocab term sums,
    * absorbed by rounding (hard rule 9: term magnitude ≤1e-3, vocab
    * ~1e4 → noise ≪ the 5e-7 boundary at 6 dp).
    *
    * Output: (slice_a, slice_b, jsd, n_a, n_b), one row per unordered
    * pair. Shape at 100 TB: the self-join shuffles vocab-bounded
    * count tables (never the corpus); pair terms aggregate to
    * |slices|² rows. */
  def unigramJsd(counts: DataFrame, sliceCol: String, wordCol: String,
      cntCol: String, roundDp: Int = 6): DataFrame = {
    val tot = counts.groupBy(col(sliceCol).as("slice"))
      .agg(sum(col(cntCol)).as("n"))
    // the pair universe comes from the totals cross join (|slices|²
    // rows) — NOT from the word join, which would silently drop a
    // pair with no shared vocabulary (whose JSD is exactly ln 2)
    val pairs = tot.select(col("slice").as("slice_a"), col("n").as("n_a"))
      .crossJoin(tot.select(col("slice").as("slice_b"), col("n").as("n_b")))
      .where(col("slice_a") < col("slice_b"))
    val a = counts.select(col(sliceCol).as("slice_a"),
      col(wordCol).as("w"), col(cntCol).as("ca"))
      .join(broadcast(tot.select(col("slice").as("slice_a"),
        col("n").as("n_a"))), Seq("slice_a"))
    val b = counts.select(col(sliceCol).as("slice_b"),
      col(wordCol).as("w"), col(cntCol).as("cb"))
      .join(broadcast(tot.select(col("slice").as("slice_b"),
        col("n").as("n_b"))), Seq("slice_b"))
    val p = col("ca").cast("double") / col("n_a").cast("double")
    val q = col("cb").cast("double") / col("n_b").cast("double")
    val shared = a.join(b, Seq("w")).where(col("slice_a") < col("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(sum(p * log(lit(2.0) * p / (p + q))).as("sa"),
        sum(q * log(lit(2.0) * q / (p + q))).as("sb"),
        sum(col("ca")).as("sca"), sum(col("cb")).as("scb"))
    pairs.join(shared, Seq("slice_a", "slice_b"), "left")
      .select(col("slice_a"), col("slice_b"),
        round(
          lit(0.5) * (coalesce(col("sa"), lit(0.0))
            + (lit(1.0) - coalesce(col("sca"), lit(0L)).cast("double")
                / col("n_a").cast("double"))
              * log(lit(2.0)))
            + lit(0.5) * (coalesce(col("sb"), lit(0.0))
              + (lit(1.0) - coalesce(col("scb"), lit(0L)).cast("double")
                  / col("n_b").cast("double"))
                * log(lit(2.0))),
          roundDp).as("jsd"),
        col("n_a"), col("n_b"))
  }
}
