package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator

/** Batched bulk sink — the reference's `bulkLoader`/`kestrelBulkLoader`
  * fold (`marketdb-loader/.../loader/util/Iteratees.scala:41-88`):
  * accumulate events into batches of `batchSize`, flush each batch as
  * one message, stop at an optional global `limit`, flush the
  * remainder at EOF, and report `(written, batches)`
  * (`LoaderReport`, `Iteratees.scala:28-33`).
  *
  * Spark-first: the limit is a plan-level `limit(n)` (short-circuits
  * the scan like the iteratee's `Done`), batching is per-partition
  * `grouped(n)` inside `foreachPartition` — each executor core keeps
  * its own open "connection" and flushes independently, which is the
  * scalable generalization of the reference's single-stream fold.
  * Counts come back through accumulators.
  */
object BatchedSink {

  /** Counts carry AT-LEAST-ONCE semantics: accumulators double-count
    * under task retries (Spark re-runs `flush` too — make it
    * idempotent, as the reference's keyed-overwrite sink is). For an
    * exact count, read the sink back after the write. */
  final case class Report(written: Long, batches: Long)

  /** @param flush called once per batch on the executor; must be
    *              serializable. */
  def write[T](ds: Dataset[T], batchSize: Int, limit: Option[Long] = None)(
      flush: Seq[T] => Unit): Report = {
    require(batchSize > 0, "batchSize must be positive")
    limit.foreach(n => require(n > 0 && n <= Int.MaxValue,
      s"limit must be in (0, ${Int.MaxValue}]: $n"))
    val spark = ds.sparkSession
    val rows: LongAccumulator = spark.sparkContext.longAccumulator("graft.sink.rows")
    val batches: LongAccumulator = spark.sparkContext.longAccumulator("graft.sink.batches")
    val limited = limit.fold(ds)(n => ds.limit(n.toInt))
    limited.foreachPartition { it: Iterator[T] =>
      it.grouped(batchSize).foreach { batch =>
        flush(batch)
        rows.add(batch.size.toLong)
        batches.add(1L)
      }
    }
    Report(rows.value, batches.value)
  }
}
