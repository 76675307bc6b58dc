package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join on a skewed key (one market/security carrying most of
  * the volume — the exact hot-series shape the reference's per-series
  * row-key design suffers from, `marketdb-core/.../model/Trade.scala:22-30`)
  * sends the whole hot key to one task. Salting splits every key into
  * `nSalt` sub-keys: the big side scatters rows across salt buckets by
  * hashing a unique column, the small side replicates each row once per
  * bucket, and the join runs on (key, salt) — hot keys now spread over
  * `nSalt` tasks. Result is row-identical to the unsalted join.
  *
  * This is the manual fallback for engines/paths where AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin.enabled`) can't see
  * the skew — e.g. a deliberately co-partitioned join it must not
  * re-plan, or a non-AQE streaming micro-batch.
  *
  * @param saltBy unique-ish column on `big` used to scatter (a row id;
  *               determinism of the scatter makes reruns identical)
  */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Column, nSalt: Int): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    val b = big.withColumn("__salt", pmod(hash(saltBy), lit(nSalt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
