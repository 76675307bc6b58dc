package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid resampling — the TSDB downsample/align family
  * (chart feeds, feature grids, model inputs): generate a per-series
  * time axis, then attach values by as-of lookup. The reference's
  * consumers do this client-side over scan folds
  * (`marketdb-iteratee/.../MarketIteratees.scala:7-21` is the fold
  * surface); here the whole resample is declarative and distributes —
  * resampling IS an as-of join against a generated axis, so it rides
  * [[AsOfJoin]]'s union+window plan (one shuffle per join, no
  * per-series driver loops).
  *
  * Input points must be pre-deduped per (key, ts) — hard rule 4's
  * deterministic-winner requirement, exactly like q29.
  */
object Resample {

  /** Per-key regular grid: timestamps `[date_trunc(truncUnit, min ts),
    * max ts]` per key at `step` (e.g. "1 hour") — one row per
    * (key, grid_ts). `sequence` is end-inclusive like DuckDB's
    * generate_series, so the twins agree on the last point. */
  def grid(events: DataFrame, keyCol: String, tsCol: String,
      truncUnit: String, step: String): DataFrame =
    events.groupBy(keyCol)
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("t0"),
        max(col(tsCol)).as("t1"))
      .select(col(keyCol),
        explode(sequence(col("t0"), col("t1"), expr(s"interval $step")))
          .as("grid_ts"))

  /** Forward fill: each grid point carries the last (ts, value) at or
    * before it; points before a key's first observation carry nulls
    * (as-of LEFT semantics). Output: grid columns + (src_ts, value). */
  def ffill(grid: DataFrame, points: DataFrame, keyCol: String,
      tsCol: String, valCol: String): DataFrame =
    AsOfJoin.asOf(grid, points, Seq(keyCol), "grid_ts", tsCol,
      Seq(tsCol -> "src_ts", valCol -> "value"))

  /** Linear interpolation between the surrounding observations (one
    * backward + one forward as-of). Grid points exactly on an
    * observation, or one-sided (before first / after last), degrade to
    * the available neighbor. The lerp arithmetic is a fixed per-row op
    * sequence over exact integer micros — bit-equal across engines, no
    * rounding needed. Output: grid columns + (prev_ts, next_ts, value).
    *
    * `points` is consumed TWICE (both as-of unions); its lineage is
    * persisted MEMORY_AND_DISK for the duration of the call through a
    * derived alias (never the caller's own frame, so a caller persist
    * is untouched), materialized eagerly, and released — the CLAUDE.md
    * multi-consumer convention. The returned frame stays persisted
    * (caller-owned — unpersist when done). */
  def lerp(grid: DataFrame, points: DataFrame, keyCol: String,
      tsCol: String, valCol: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // identity projection: a DISTINCT plan node, so persist/unpersist
    // here can never clobber a caller-side cache of `points`
    val pts = points.select(points.columns.map(col): _*).persist(lvl)
    val withPrev = AsOfJoin.asOf(grid, pts, Seq(keyCol), "grid_ts", tsCol,
      Seq(tsCol -> "prev_ts", valCol -> "prev_v"))
    val both = AsOfJoin.asOf(withPrev, pts, Seq(keyCol), "grid_ts", tsCol,
      Seq(tsCol -> "next_ts", valCol -> "next_v"), forward = true)
    val g = unix_micros(col("grid_ts").cast("timestamp"))
    val p = unix_micros(col("prev_ts").cast("timestamp"))
    val n = unix_micros(col("next_ts").cast("timestamp"))
    val ratio = (g - p).cast("double") / (n - p).cast("double")
    val result = both
      .withColumn("value",
        when(col("prev_ts").isNull, col("next_v"))
          .when(col("next_ts").isNull || col("next_ts") === col("prev_ts"),
            col("prev_v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) * ratio))
      .drop("prev_v", "next_v")
      .persist(lvl)
    result.count() // materialize while pts is cached
    pts.unpersist()
    result
  }
}
