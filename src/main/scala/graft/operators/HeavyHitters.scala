package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** EXACT heavy hitters without a full-vocabulary shuffle — the
  * two-pass Misra–Gries candidate-pruning pattern (Misra & Gries
  * 1982; the "MG + rescan" exact variant).
  *
  * Pass 1 is a ZERO-SHUFFLE scan: each partition folds its rows into
  * a Misra–Gries summary of `phiDen` counters (bounded memory,
  * independent of vocabulary size). MG guarantees every key with
  * local count > n_i/(phiDen+1) survives its partition's summary;
  * by pigeonhole, any key with GLOBAL count > N/phiDen must exceed
  * n_i/phiDen in at least one partition — so the union of the
  * per-partition summaries (≤ partitions × phiDen keys, collected to
  * the driver with the row count) is a SUPERSET of the φ-heavy set.
  * Pass 2 broadcast-semi-joins the candidate set and exactly counts
  * ONLY candidate rows: the shuffle moves candidate keys instead of
  * the whole vocabulary.
  *
  * The output is a pure function of the multiset — exactly the keys
  * with count STRICTLY above N/phiDen, with exact counts — so MG's
  * internal arrival-order sensitivity never reaches the result and a
  * plain GROUP BY/HAVING oracle replays it (q166).
  *
  * 100 TB shape: pass 1 is O(phiDen) memory per task and emits one
  * tiny summary per partition; the candidate set is KBs (broadcast);
  * pass 2's aggregate shuffles only rows whose key is a candidate.
  * Compare q132's Count-Min: CMS gives approximate counts for ANY
  * key in one pass; this gives EXACT counts for the heavy tail in
  * two. */
object HeavyHitters {

  /** Keys of `keyCol` whose exact count strictly exceeds
    * `count(*) / phiDen`, as `(k, cnt)`. */
  def exact(df: DataFrame, keyCol: String, phiDen: Int): DataFrame = {
    require(phiDen >= 2, s"phiDen must be >= 2: $phiDen")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .as(Encoders.STRING)
    // pass 1: per-partition MG summaries + partition row counts
    val (candKeys, n) = keys.rdd.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var rows = 0L
      it.foreach { k =>
        rows += 1L
        counters.get(k) match {
          case Some(c) => counters(k) = c + 1L
          case None if counters.size < phiDen => counters(k) = 1L
          case None =>
            // classic MG step: decrement every counter, drop zeros
            val dead = List.newBuilder[String]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters(kk) = c - 1L
            }
            dead.result().foreach(counters.remove)
        }
      }
      Iterator.single((counters.keySet.toSet, rows))
    }.fold((Set.empty[String], 0L)) { case ((ka, na), (kb, nb)) =>
      (ka | kb, na + nb)
    }
    // pass 2: exact counts of candidate rows only
    import spark.implicits._
    val cands = candKeys.toSeq.toDF("k")
    df.select(col(keyCol).cast("string").as("k"))
      .join(broadcast(cands), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(phiDen.toLong) > lit(n))
  }
}
