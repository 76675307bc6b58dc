package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A Bloom shard index attached to an [[IndexedTable]]: point lookups
  * on `keyCol` consult `index`. When the table is physically laid out
  * by the index's shard function (the q147 shape — a materialized
  * `pmod(xxhash64(key), nShards)` partition column), `shardCol` names
  * that column and matched shards prune to DIRECTORIES; otherwise the
  * shard filter runs over the derived expression — still a
  * row-group-skippable predicate, just not a directory prune (the
  * q234 shape, where the table is laid out by a different unit). */
final case class BloomAttachment(keyCol: String,
    index: IncrementalBloomIndex, shardCol: Option[String] = None)

/** DEFAULT-ON DATA SKIPPING — the one read entry point that makes the
  * engine's skipping indexes ([[ZoneMapIndex]],
  * [[MultiColZoneMapIndex]], [[IncrementalBloomIndex]]) apply
  * automatically instead of per-query by hand: callers declare the
  * table's attached indexes ONCE and state predicates; [[readWhere]]
  * consults every index the predicates cover, intersects the
  * surviving unit sets, emits the unit-directory-pruned scan, and
  * applies the EXACT residual predicates over whatever is read — so
  * the indexes buy IO skipping and can never change an answer (the
  * q192 contract, now structural).
  *
  * Pruning composition (planner-side: stats rows only, never data):
  *
  *   - range predicates covered by the multi-column index probe it
  *     in ONE conjunction (strictly tighter than intersecting
  *     single-column prunes — the q236 argument); leftover ranges
  *     consult their single-column zone maps; all resulting unit
  *     sets INTERSECT (each is individually sound, so the
  *     intersection is);
  *   - point-lookup predicates consult their Bloom attachment:
  *     matched shards become a shard filter (directory-pruning when
  *     the layout is shard-keyed), and the probe set itself becomes
  *     the exact residual semi-join where false positives die;
  *   - a predicate no index covers prunes nothing and runs purely
  *     as residual — adding indexes never changes results, only IO.
  *
  * FRESHNESS contract (inherited from every index here): pruning
  * with a stale index is unsound for appends after its coverage
  * receipt (`coveredBatch`) — the caller fences on the receipt and
  * reads newer appends unconditionally, exactly as before; this
  * facade changes who COMPOSES the prune, not the coverage story.
  *
  * Reference anchor: the reference's scans always prune by row-key
  * ranges built inside ONE scan constructor
  * (`/root/reference/marketdb-core/src/main/scala/com/ergodicity/marketdb/core/MarketDb.scala:66-85`)
  * — pruning as the read path's default, not a per-caller option. */
final case class IndexedTable(tablePath: String, unitCol: String = "unit",
    zoneMaps: Map[String, ZoneMapIndex] = Map.empty,
    multiCol: Option[MultiColZoneMapIndex] = None,
    blooms: Seq[BloomAttachment] = Nil) {

  import IndexedTable._

  /** The unit ids surviving every covered range predicate — None when
    * no attached index covers any of them (scan un-pruned). Exposed
    * for specs and gate require-pins. */
  private[graft] def prunedUnits(spark: SparkSession,
      ranges: Seq[Range]): Option[Set[Long]] = {
    val mcCovered = multiCol.fold(Seq.empty[Range])(m =>
      ranges.filter(r => m.valCols.contains(r.valCol)))
    val sets: Seq[Set[Long]] =
      (if (mcCovered.nonEmpty)
        Seq(multiCol.get.matchingUnits(spark,
          mcCovered.map(r => (r.valCol, r.lo, r.hi))).toSet)
      else Nil) ++
        ranges.filterNot(mcCovered.contains).flatMap(r =>
          zoneMaps.get(r.valCol).map(
            _.matchingUnits(spark, r.lo, r.hi).toSet))
    sets.reduceOption(_ intersect _)
  }

  /** The pruned scan for a CONJUNCTION of predicates (class doc). */
  def readWhere(spark: SparkSession, preds: Seq[Pred]): DataFrame = {
    require(preds.nonEmpty, "readWhere: at least one predicate")
    val ranges = preds.collect { case r: Range => r }
    val keyIns = preds.collect { case k: KeyIn => k }
    val t = spark.read.parquet(tablePath)
    // ---- planner-side prune ----
    val unitPruned = prunedUnits(spark, ranges) match {
      case Some(units) if units.isEmpty => t.where(lit(false))
      case Some(units) =>
        // comparison against long unit ids promotes the (int) unit
        // column; partition pruning evaluates over partition values,
        // so the cast does not defeat the directory prune
        t.where(col(unitCol).cast("long")
          .isin(units.toSeq.sorted.map(Long.box): _*))
      case None => t
    }
    val shardPruned = keyIns.foldLeft(unitPruned) { (df, kin) =>
      blooms.find(_.keyCol == kin.keyCol).fold(df) { b =>
        val shards = b.index.matchingShards(spark, kin.probes, kin.keyCol)
        if (shards.isEmpty) df.where(lit(false))
        else {
          val sc = b.shardCol.map(col)
            .getOrElse(b.index.shardOf(col(kin.keyCol)))
          df.where(sc.cast("long").isin(shards.map(Long.box): _*))
        }
      }
    }
    // ---- exact residuals: the indexes never answer ----
    val afterRanges = ranges.foldLeft(shardPruned)((df, r) =>
      df.where(col(r.valCol).between(r.lo, r.hi)))
    keyIns.foldLeft(afterRanges)((df, kin) =>
      df.join(broadcast(kin.probes.select(col(kin.keyCol)).distinct()),
        Seq(kin.keyCol), "left_semi"))
  }
}

object IndexedTable {
  sealed trait Pred
  /** `valCol BETWEEN lo AND hi` (inclusive both ends). */
  final case class Range(valCol: String, lo: Column, hi: Column) extends Pred
  /** `keyCol IN (probes.keyCol)` — point lookups; `probes` must be
    * small (it is broadcast into the residual semi-join). */
  final case class KeyIn(keyCol: String, probes: DataFrame) extends Pred
}
