package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Exact top-k rows per group WITHOUT a window sort — the 100 TB
  * formulation of every "best k per key" query.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY ...) <= k`) shuffles EVERY row to its group's partition and
  * sorts the whole group just to throw away all but k. This operator
  * instead aggregates with the engine's bounded-heap
  * `CollectTopK` (surfaced via [[Bridge.collectTopK]]): each task
  * keeps at most k rows per group map-side, the shuffle moves only
  * those k-row partial heaps, and no sort of the full data ever
  * happens — plan shows an ObjectHashAggregate pair and zero
  * Sort/Window nodes (PlanPropertiesSpec-guarded).
  *
  * Ordering is the struct's lexicographic type-ordering, ALL fields
  * in the same direction (largest → every tiebreak field descending;
  * include a unique id as the last field to satisfy hard rule 4 —
  * the result is then a pure function of the data). Returns one row
  * per kept element: (groupCols..., rank, struct fields...). */
object GroupTopK {

  def topK(df: DataFrame, groupCols: Seq[String], orderStruct: Column,
      k: Int, largest: Boolean = true): DataFrame = {
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(Bridge.collectTopK(orderStruct, k, reverse = !largest)
        .as("top"))
    val exploded = agg.select(
      groupCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "row")): _*)
    exploded.select(
      groupCols.map(col) :+ (col("pos") + 1).cast("long").as("rank")
        :+ col("row.*"): _*)
  }
}
