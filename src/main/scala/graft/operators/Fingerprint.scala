package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-invariant DATASET CONTENT FINGERPRINTS — the anti-entropy
  * primitive for verifying that two copies of a table (replication,
  * migration, engine swap, backfill) hold the SAME rows without
  * moving the data: hash every row to a 60-bit integer, then fold
  * per group with commutative ops (XOR + a bounded additive sum), so
  * the digest is a pure function of the row MULTISET — any
  * partitioning, any order, any engine. Divergent groups are found
  * by comparing digest rows (bytes per group), then only those
  * groups re-sync.
  *
  * Determinism contract: the row canonicalization avoids float
  * formatting entirely — timestamps hash as epoch micros, monetary
  * doubles as exact centi-longs — and the row hash keeps 15 hex
  * chars (60 bits), so every value stays inside BIGINT on both
  * engines (ANSI-safe). XOR alone cancels even-multiplicity rows;
  * the additive low-32 sum (bounded by rows·2³², overflow-free past
  * 2³⁰ rows) breaks that degeneracy, and the count pins cardinality.
  *
  * 100 TB shape: one zero-shuffle hash scan + one partial aggregate
  * — digests are O(groups), the comparison is a digest-table join,
  * and nothing row-sized ever crosses the network. */
object Fingerprint {

  /** 60-bit row hash of `cols` joined with '|'. */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
      .cast("long")

  /** Per-group digests: (groupCols..., n, xor_fp, sum_lo). */
  def grouped(df: DataFrame, groupCols: Seq[String],
      hashCols: Seq[Column]): DataFrame =
    df.withColumn("h", rowHash(hashCols))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("xor_fp"),
        sum(pmod(col("h"), lit(4294967296L))).as("sum_lo"))

  /** MERKLE-STYLE REPAIR TARGETING — the step that makes digests
    * actionable: full-outer-joins two replicas' per-group digest
    * tables and returns ONLY the groups needing re-sync, labeled
    * `a_only` / `b_only` / `divergent`. Re-sync then ships just those
    * groups' rows — the anti-entropy loop reads O(groups) digest rows
    * to locate divergence in a 100 TB table, never the table. */
  def divergence(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      hashCols: Seq[Column]): DataFrame = {
    val da = grouped(a, groupCols, hashCols)
      .withColumnsRenamed(Map("n" -> "n_a", "xor_fp" -> "xa", "sum_lo" -> "sa"))
    val db = grouped(b, groupCols, hashCols)
      .withColumnsRenamed(Map("n" -> "n_b", "xor_fp" -> "xb", "sum_lo" -> "sb"))
    da.join(db, groupCols, "full_outer")
      .withColumn("status",
        when(col("n_b").isNull, "a_only")
          .when(col("n_a").isNull, "b_only")
          .when(col("n_a") =!= col("n_b") || col("xa") =!= col("xb") ||
            col("sa") =!= col("sb"), "divergent"))
      .where(col("status").isNotNull)
      .select(groupCols.map(col) ++ Seq(col("status"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b")): _*)
  }
}
