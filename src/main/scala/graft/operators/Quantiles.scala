package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT order statistics WITHOUT a global sort — the two-pass
  * histogram-prune algorithm (Munro–Paterson style selection): a
  * total order over 100 TB is the one plan shape that cannot scale
  * (a single range-partitioned sort of the full column), yet "exact
  * p99" is a routine ask. Selection needs only the k-th element, so:
  *
  *   - pass 1 (one scan): global (min, max, count) + an equi-width
  *     histogram of `bins` counts — O(bins) state per task, partial
  *     aggregation, zero rows shuffled beyond the bin counts;
  *   - driver: prefix-sum the histogram (bins rows, KBs), map each
  *     target rank k = ⌈q·n⌉ to its bin and the residual rank within
  *     that bin — exact integer arithmetic on exact integer counts;
  *   - pass 2 (one scan): keep ONLY rows falling in a needed bin
  *     (expected n/bins per target — the filter reaches the parquet
  *     scan), rank them within their bin, take each bin's residual
  *     rank. The windowed sort touches just the surviving sliver.
  *
  * The returned value is the exact k-th smallest element of the
  * multiset — deterministic even under duplicate values (whatever
  * order ties take, the value AT rank k is the tied value), and a raw
  * data value (no arithmetic), so it hash-compares exactly against a
  * rank-based oracle. Quantile ranks use rational arithmetic
  * (k = ⌈q·n⌉ as (n·num + den − 1) / den) — no float rank drift.
  *
  * At 1000× data the histogram stays `bins` longs per task and the
  * pass-2 sliver stays ~n/bins per target; if a pathological value
  * distribution packs everything into few bins, recurse the same
  * prune inside the bin — one extra level bounds the sliver by
  * n/bins², which is the published multi-pass selection bound. */
object Quantiles {

  /** Exact ⌈q·n⌉-th smallest of `valueCol` for each (label, num/den)
    * quantile. Returns (q_label, rank, value). */
  def exact(df: DataFrame, valueCol: String,
      quantiles: Seq[(String, Long, Long)], bins: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val src = df.where(v.isNotNull).select(v.as("v"))

    // pass 1: stats + histogram in ONE aggregation (bin of the max
    // value clamps into the last bin)
    val row0 = src.agg(min($"v").as("mn"), max($"v").as("mx"),
      count(lit(1)).as("n")).head()
    val (mn, mx, n) =
      (row0.getDouble(0), row0.getDouble(1), row0.getLong(2))
    require(n > 0, "Quantiles.exact over an empty column")
    val width = (mx - mn) / bins
    def binOf(c: Column): Column =
      if (width == 0d) lit(0L)
      else least(floor((c - lit(mn)) / lit(width)), lit(bins - 1L))
        .cast("long")
    val hist = src.groupBy(binOf($"v").as("bin"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

    // driver: rank -> (bin, residual rank within bin) via prefix sums
    val targets = quantiles.map { case (label, num, den) =>
      val k = (n * num + den - 1) / den // = ceil(n * num / den)
      var before = 0L
      var bin = -1L
      val it = hist.iterator
      while (bin < 0 && it.hasNext) {
        val (b, c) = it.next()
        if (before + c >= k) bin = b else before += c
      }
      (label, k, bin, k - before)
    }
    val tgt = targets.toDF("q_label", "rank", "bin", "local_rank")

    // pass 2: only rows of needed bins survive the scan; rank within
    // bin (value order; ties immaterial — see scaladoc) and join each
    // target's residual rank. The exact membership test is the SAME
    // binOf expression as pass 1 (a computed column — not pushable),
    // so a REDUNDANT coarse value-range bracket goes in front: one
    // bin of slack per side (orders of magnitude above float boundary
    // rounding), a plain predicate on the raw column that reaches the
    // parquet scan as PushedFilters — row groups outside the needed
    // bins never decompress at 100 TB.
    // pad bound: bin assignment's v-space error is ≤ ulp(max |v|)
    // from the subtraction plus ~2·eps·span from the division (both
    // dwarfed by one width except when the span is ulp-scale relative
    // to the offset — the 1e12-offset spec case), so width + 4·ulp
    // brackets every row binOf can assign to b
    val pad = width +
      4 * Math.ulp(math.max(math.abs(mn), math.abs(mx)))
    val needed = targets.map(_._3).distinct
    val bracket =
      if (width == 0d) lit(true)
      else needed.map { b =>
        $"v" >= lit(mn + b * width - pad) &&
          $"v" <= lit(mn + (b + 1) * width + pad)
      }.reduce(_ || _)
    val ranked = src.where(bracket).withColumn("bin", binOf($"v"))
      .where($"bin".isin(needed.map(java.lang.Long.valueOf): _*))
      .withColumn("lr",
        row_number().over(Window.partitionBy($"bin").orderBy($"v")).cast("long"))
    ranked.join(broadcast(tgt),
        ranked("bin") === tgt("bin") && $"lr" === $"local_rank")
      .select($"q_label", $"rank", $"v".as("value"))
  }

  /** WEIGHTED exact quantiles — [[exact]] with integer row weights:
    * the answer is the smallest value whose cumulative weight reaches
    * ⌈W·num/den⌉ (the lower weighted quantile). Same two-pass
    * histogram-prune shape, with the histogram counting WEIGHT SUMS
    * (exact longs) instead of rows, so neither pass sorts more than
    * the needed-bin sliver. Duplicate-value ties cannot move the
    * answer: the crossing row's VALUE is the tied value whatever
    * order ties take (min over `cw ≥ k` rows is order-invariant
    * because the cumulative weight is monotone in value order). */
  def weightedExact(df: DataFrame, valueCol: String, weightCol: String,
      quantiles: Seq[(String, Long, Long)], bins: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("double")
    val wgt = col(weightCol).cast("long")
    val src = df.where(v.isNotNull && wgt.isNotNull && wgt > 0L)
      .select(v.as("v"), wgt.as("w"))
    val row0 = src.agg(min($"v").as("mn"), max($"v").as("mx"),
      sum($"w").as("tw")).head()
    val (mn, mx, tw) =
      (row0.getDouble(0), row0.getDouble(1), row0.getLong(2))
    require(tw > 0, "weightedExact over empty/zero-weight input")
    val width = (mx - mn) / bins
    def binOf(c: Column): Column =
      if (width == 0d) lit(0L)
      else least(floor((c - lit(mn)) / lit(width)), lit(bins - 1L))
        .cast("long")
    val hist = src.groupBy(binOf($"v").as("bin"))
      .agg(sum($"w").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val targets = quantiles.map { case (label, num, den) =>
      val k = (tw * num + den - 1) / den
      var before = 0L
      var bin = -1L
      val it = hist.iterator
      while (bin < 0 && it.hasNext) {
        val (b, c) = it.next()
        if (before + c >= k) bin = b else before += c
      }
      (label, k, bin, k - before)
    }
    val tgt = targets.toDF("q_label", "rank", "bin", "local_rank")
    val pad = width +
      4 * Math.ulp(math.max(math.abs(mn), math.abs(mx)))
    val needed = targets.map(_._3).distinct
    val bracket =
      if (width == 0d) lit(true)
      else needed.map { b =>
        $"v" >= lit(mn + b * width - pad) &&
          $"v" <= lit(mn + (b + 1) * width + pad)
      }.reduce(_ || _)
    val ranked = src.where(bracket).withColumn("bin", binOf($"v"))
      .where($"bin".isin(needed.map(java.lang.Long.valueOf): _*))
      .withColumn("cw", sum($"w").over(
        Window.partitionBy($"bin").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.join(broadcast(tgt),
        ranked("bin") === tgt("bin") && $"cw" >= $"local_rank")
      .groupBy($"q_label", $"rank")
      .agg(min($"v").as("value"))
  }
}
