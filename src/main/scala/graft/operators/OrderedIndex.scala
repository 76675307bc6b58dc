package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense sequential index in the total order of `orderCols`, computed
  * WITHOUT a single-partition window.
  *
  * `row_number() over (order by ...)` with no partition moves the whole
  * input through one task — the classic scale cliff for dictionary
  * allocation (it is exactly what the reference's single allocator row
  * serializes on, `marketdb-core/.../uid/UIDProvider.scala:267-336`).
  * Instead: a range-partitioned total sort, then `zipWithIndex`, which
  * adds per-partition offsets with one extra lightweight count job.
  * Parallelism scales with input size; the assignment is deterministic
  * whenever the `orderCols` tuple is unique per row (partition
  * boundaries shift, global positions don't).
  */
object OrderedIndex {

  /** Append `indexCol` (LongType, values startAt, startAt+1, ... in
    * `orderCols` order) to `df`. */
  def attach(df: DataFrame, orderCols: Seq[Column], indexCol: String,
      startAt: Long = 0L): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(indexCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
