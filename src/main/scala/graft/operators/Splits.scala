package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment a
  * training-data pipeline runs over every corpus snapshot.
  *
  * Why hash-based rather than `randomSplit`: the assignment must be a
  * PURE FUNCTION of the row id — stable across re-runs, Spark
  * versions, partition counts and row order — so that (a) a document
  * never migrates between train and eval as the corpus grows, and
  * (b) the split is reproducible from the id alone by any engine
  * (the DuckDB oracle re-derives it byte-for-byte from the same md5
  * arithmetic). `randomSplit` satisfies neither: it is seeded per
  * partition, so a repartition reshuffles the assignment.
  *
  * 100 TB shape: a zero-shuffle, codegen'd projection (md5 + substring
  * + conv per row); filters on the label column push into the scan of
  * a split-partitioned layout when the corpus is written
  * `partitionBy("split")` (the q68 directory-pruning story applied to
  * the training/eval read paths).
  */
object Splits {

  /** 0..n-1 hash shard for a row id: first 8 hex chars (32 bits) of
    * `md5(id || ":" || salt)`, read as an integer, mod n. The salt
    * decorrelates independent deals over the same ids (changing it
    * re-deals every assignment). */
  def hashShard(id: Column, salt: String, n: Int): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long"), lit(n.toLong))

  /** 0..99 hash bucket for a row id (the percent-granularity shard). */
  def hashBucket(id: Column, salt: String): Column = hashShard(id, salt, 100)

  /** DETERMINISTIC STRATIFIED SAMPLE — the data-MIXTURE operator: keep
    * each row iff its hash bucket falls below its stratum's percent
    * (e.g. "50% of web, 100% of code, 10% of logs" when composing a
    * training mix). Like [[hashSplit]], membership is a pure function
    * of the id: re-runs, repartitions and engines agree, and a kept
    * row STAYS kept as the corpus grows — `df.sample` guarantees
    * none of that. Strata absent from `percents` drop entirely.
    *
    * 100 TB shape: zero-shuffle codegen filter on the scan — the
    * mixture never materializes an intermediate. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      salt: String, percents: Map[String, Int]): DataFrame = {
    require(percents.nonEmpty && percents.values.forall(p => p >= 0 && p <= 100),
      s"stratum percents must be in [0,100]: $percents")
    val ordered = percents.toSeq.sortBy(_._1)
    val pct = ordered.tail
      .foldLeft(when(col(strataCol) === ordered.head._1, lit(ordered.head._2))) {
        case (acc, (k, p)) => acc.when(col(strataCol) === k, lit(p))
      }.otherwise(lit(0))
    df.where(hashBucket(col(idCol), salt) < pct)
  }

  /** Adds `bucket` (0..99) and `split` (label) columns. `splits` are
    * (label, percent) pairs summing to 100, assigned by cumulative
    * bucket ranges in order — e.g. Seq(("train", 90), ("val", 5),
    * ("test", 5)) puts buckets 0-89 in train, 90-94 in val, 95-99 in
    * test. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"split percents must be positive: $splits")
    require(splits.map(_._2).sum == 100,
      s"split percents must sum to 100: $splits")
    val bucket = hashBucket(col(idCol), salt)
    val uppers = splits.map(_._2).scanLeft(0)(_ + _).tail // cumulative
    val label = splits.zip(uppers).init
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(bucket < hi, name))(_.when(bucket < hi, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("bucket", bucket).withColumn("split", label)
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment: the row goes
    * to the shard s ∈ [0, n) whose `md5(salt:s:id)` is LEXICALLY
    * SMALLEST (ties — cryptographically improbable but hard rule 4 —
    * break to the lower s via the struct's second field). Unlike
    * `hashShard`'s mod-n deal, HRW is *minimally disruptive*: growing
    * n→n+1 moves EXACTLY the rows whose new shard wins the draw —
    * an expected 1/(n+1) fraction — and every moved row lands ON the
    * new shard; rows never migrate between pre-existing shards. That
    * is the property a 100 TB corpus layout needs to grow its shard
    * count without a full re-deal (a mod-n deal relocates ~n/(n+1)
    * of the corpus on the same change).
    *
    * Shape: a zero-shuffle codegen'd projection — n md5s + an
    * array_min fold per row, no state, no join. */
  def rendezvousShard(id: Column, salt: String, n: Int): Column = {
    require(n > 0, s"shard count must be positive: $n")
    array_min(transform(sequence(lit(0), lit(n - 1)),
      s => struct(
        md5(concat(lit(salt + ":"), s.cast("string"), lit(":"),
          id.cast("string"))).as("h"),
        s.as("s"))))
      .getField("s").cast("long")
  }
}
