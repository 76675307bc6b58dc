package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed prefix scans for per-key linear recurrences
  * `y_i = a*x_i + b*y_(i-1)` (y_0 = 0) evaluated in event order —
  * EWMA smoothing (`a = alpha, b = 1-alpha`), cumulative sums
  * (`a = b = 1`), discounted reward folds, decaying counters.
  *
  * A recurrence looks inherently sequential — the naive Spark
  * formulation is a single-partition window (`Window.orderBy` with no
  * partition spec), which serializes the whole table through one task
  * and is exactly the shape that dies at 100 TB. This operator is the
  * classic two-phase parallel scan instead (Blelloch '90, applied to
  * affine maps):
  *
  *  1. range-partition by (key, order...), then ONE sequential pass per
  *     partition computes each row's fold `y_local` as if the partition
  *     started from state 0, carrying `decay_i = b^i` (running product)
  *     alongside, and emits one (partition, key) summary holding the
  *     affine map of the whole run: state_out = A*state_in + B with
  *     `A = b^n`, `B = y_local_n`;
  *  2. the summaries — at most (#keys + #partitions) rows, NOT data-
  *     sized, the documented-bounded collect — are composed on the
  *     driver in partition order per key (`inc' = B + A*inc`), and the
  *     resulting incoming states are broadcast-joined back so every row
  *     finishes as `y_i = y_local_i + decay_i * incoming`.
  *
  * Wall-clock is two linear passes + a tiny broadcast join: the same
  * shape at 32 partitions and at 100k partitions on a 1000-executor
  * cluster. Affine-map correctness: y_true_i = y_local_i + b^i * y_in
  * by induction (y_1 = a*x_1 + b*y_in; step preserves the form).
  *
  * Float caveat (hard rule 9): for non-trivial b the composed result
  * differs from a sequential fold in the last ulps (different rounding
  * association at partition seams), so consumers must round before an
  * exact-hash compare. For a = b = 1 over integer-valued doubles the
  * scan is EXACT (every intermediate is an integer < 2^53), which is
  * what the token-budget cumsum query relies on.
  *
  * Reference anchor: marketdb folds its time-ordered scans through
  * scalaz iteratees on one node
  * (marketdb-core/src/main/scala/com/ergodicity/marketdb/TimeSeriesEnumerator.scala:30-76);
  * this is the multi-node re-expression of that sequential fold.
  *
  * Eager-operator convention (CLAUDE.md): phase 1 is persisted for its
  * two consumers (summary collect + final join); the returned frame is
  * materialized and stays persisted (caller-owned), intermediates are
  * unpersisted on exit.
  */
object Scan {

  /** Per-key linear recurrence y_i = a*x_i + b*y_(i-1), y_0 = 0, rows
    * ordered by `order` within `key`. Returns the input columns plus
    * `y`. `key` and order columns must be non-null; `x` is cast to
    * double. `ascending = false` entries order that column descending.
    */
  def linearRecurrence(
      df: DataFrame,
      key: String,
      order: Seq[(String, Boolean)],
      x: String,
      a: Double,
      b: Double,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val sortExprs = col(key) +: order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val base = df.select(
      (col(key) +: order.map(o => col(o._1))) :+ col(x).cast("double").as(x): _*)
    val arranged = base
      .repartitionByRange(nParts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)

    val inSchema = arranged.schema
    val nOrder = order.length
    val xIdx = nOrder + 1
    // Summary rows fill the order/x slots with null, so the encoder
    // schema must relax nullability the input may not have declared.
    val outSchema = StructType(inSchema.fields.map(_.copy(nullable = true)))
      .add("__pid", IntegerType)
      .add("__y", DoubleType)
      .add("__decay", DoubleType)
      .add("__summary", BooleanType)

    val phase1 = arranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      new Iterator[Row] {
        private var queued: List[Row] = Nil
        private var curKey: Any = null
        private var haveKey = false
        private var acc = 0.0
        private var decay = 1.0
        private var exhausted = false

        private def summaryRow(): Row = {
          val r = Row.fromSeq(
            (curKey +: Seq.fill[Any](nOrder + 1)(null)) ++
              Seq(pid, acc, decay, true))
          haveKey = false; acc = 0.0; decay = 1.0
          r
        }

        private def dataRow(r: Row, k: Any): Row = {
          if (!haveKey) { curKey = k; haveKey = true; acc = 0.0; decay = 1.0 }
          val xv = r.getDouble(xIdx)
          acc = a * xv + b * acc
          decay *= b
          Row.fromSeq(r.toSeq ++ Seq(pid, acc, decay, false))
        }

        private def advance(): Unit = {
          if (queued.nonEmpty || exhausted) return
          if (!it.hasNext) {
            exhausted = true
            if (haveKey) queued = List(summaryRow())
            return
          }
          val r = it.next()
          val k = r.get(0)
          queued =
            if (haveKey && k != curKey) { val s = summaryRow(); List(s, dataRow(r, k)) }
            else List(dataRow(r, k))
        }

        override def hasNext: Boolean = { advance(); queued.nonEmpty }
        override def next(): Row = {
          advance()
          val h = queued.head; queued = queued.tail; h
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // (#keys + #partitions)-bounded collect: one affine map per
    // (partition, key) run — never data-sized.
    val summaries = phase1
      .where(col("__summary"))
      .select(col("__pid"), col(key), col("__y"), col("__decay"))
      .collect()

    val incomingRows: Seq[Row] = summaries
      .groupBy(_.get(1))
      .iterator
      .flatMap { case (k, rows) =>
        var inc = 0.0
        rows.sortBy(_.getInt(0)).map { r =>
          val out = Row(r.getInt(0), k, inc)
          inc = r.getDouble(2) + r.getDouble(3) * inc // inc' = B + A*inc
          out
        }
      }
      .toSeq

    val incSchema = StructType(Seq(
      StructField("__pid", IntegerType, nullable = false),
      StructField(key, inSchema.head.dataType, nullable = false),
      StructField("__inc", DoubleType, nullable = false)))
    val incDF = spark.createDataFrame(
      spark.sparkContext.parallelize(incomingRows, 1), incSchema)

    val result = phase1
      .where(!col("__summary"))
      .join(broadcast(incDF), Seq("__pid", key), "left")
      .withColumn("y", col("__y") + col("__decay") * coalesce(col("__inc"), lit(0.0)))
      .select((col(key) +: order.map(o => col(o._1))) :+ col(x) :+ col("y"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    phase1.unpersist()
    result
  }
}
