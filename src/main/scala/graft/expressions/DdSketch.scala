package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import scala.collection.mutable.LongMap

/** Mergeable relative-error quantile sketch (DDSketch — Masson, Rim &
  * Lee, "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees", VLDB 2019) — the 100 TB percentile
  * path. Exact per-group percentiles (q39's `quantile_cont` twin) need
  * a full per-group sort at scale; this sketch folds each value into a
  * logarithmic bucket histogram, so the shuffle moves one
  * O(buckets)-sized buffer per group and merge is bucket-count
  * ADDITION — commutative, associative, and a pure function of the
  * input multiset. Unlike GK/KLL (whose compactions depend on merge
  * order), the sketch state is partitioning-INDEPENDENT: any plan
  * shape yields bit-identical answers, which is what lets a DuckDB
  * oracle replay it exactly (q130).
  *
  * Oracle-parity trick (the LSH-planes pattern): bucket boundaries are
  * generated ONCE in Scala ([[DdSketch.boundaries]]) and emitted into
  * the SQL as double literals, so bucketing is pure `<=` comparisons —
  * no cross-engine `log()` ulp risk. The answer for rank r is the
  * representative (harmonic mean of the edges) of the bucket containing the
  * r-th order statistic, which SQL can find by order statistic +
  * comparison count without replaying the histogram.
  *
  * Guarantee: for values inside [bounds.head, bounds.last], the
  * estimate is within relative error alpha = (gamma-1)/(gamma+1) of
  * the exact rank-r value. Values below/above the covered range clamp
  * to the first/last bucket (estimates degrade gracefully; size the
  * range generously — ~700 buckets cover 1..2e6 at alpha=0.01).
  * Negative values mirror into a second store; zeros count separately
  * (the standard DDSketch three-store layout).
  */
object DdSketch {

  /** Strictly increasing bucket boundaries `lo * gamma^i` (successive
    * multiplication — deterministic doubles), covering [lo, hi].
    * gamma = (1+alpha)/(1-alpha). */
  def boundaries(alpha: Double, lo: Double, hi: Double): Array[Double] = {
    require(alpha > 0 && alpha < 1 && lo > 0 && hi > lo)
    val gamma = (1.0 + alpha) / (1.0 - alpha)
    val out = Array.newBuilder[Double]
    var b = lo
    while (b < hi) { out += b; b *= gamma }
    out += b
    out.result()
  }

  /** The boundary list as a DuckDB list literal. Every element is
    * emitted in SCIENTIFIC notation (`…e0`) so DuckDB parses it as a
    * DOUBLE directly (correctly rounded): a plain decimal literal
    * list is first unified to one DECIMAL(w, s) type across ALL
    * elements — the widest scale in the list wins — and DuckDB's
    * DECIMAL→DOUBLE cast then double-rounds (int128 → double, ÷10^s),
    * which moved boundary 246 of the q223 list by 1 ulp and flipped
    * the reported bucket midpoint (hard-rule-11 class, list form). */
  def sqlList(bounds: Array[Double]): String =
    bounds.map { d =>
      val s = java.lang.Double.toString(d)
      if (s.indexOf('E') >= 0 || s.indexOf('e') >= 0) s else s + "e0"
    }.mkString("[", ", ", "]")

  /** Number of boundaries <= x (0..n) — the bucket index. */
  def bucketOf(bounds: Array[Double], x: Double): Int = {
    val i = java.util.Arrays.binarySearch(bounds, x)
    if (i >= 0) i + 1 else -i - 1
  }

  /** Bucket representative: harmonic mean of the enclosing boundaries
    * `2*lo*hi/(lo+hi)` — the DDSketch representative, whose relative
    * error is exactly alpha at BOTH edges (an arithmetic midpoint
    * overshoots to (gamma-1)/2 at the low edge). Identical IEEE ops on
    * both engines given identical boundary doubles. */
  def rep(bounds: Array[Double], idx: Int): Double =
    if (idx <= 0) bounds(0)
    else if (idx >= bounds.length) bounds(bounds.length - 1)
    else 2.0 * bounds(idx - 1) * bounds(idx) /
      (bounds(idx - 1) + bounds(idx))

  /** Mutable three-store buffer: zeros + positive/negative bucket
    * histograms (key = bucket index of |x|). */
  final class Buf(var zero: Long, val pos: LongMap[Long], val neg: LongMap[Long])

  /** Exact histogram merge (count addition) of `b` into `a` — shared
    * by in-sketch merge and the stored-state reader. */
  private[expressions] def mergeInto(a: Buf, b: Buf): Buf = {
    a.zero += b.zero
    b.pos.foreach { case (k, c) => a.pos.update(k, a.pos.getOrElse(k, 0L) + c) }
    b.neg.foreach { case (k, c) => a.neg.update(k, a.neg.getOrElse(k, 0L) + c) }
    a
  }

  /** Wire form of a buffer (zero count + both histograms). Entry
    * order is the LongMap's internal order — NOT canonical; only the
    * decoded histogram is, which is all any consumer reads. */
  private[expressions] def serializeBuf(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + buf.pos.size * 12 + 4 + buf.neg.size * 12)
    bb.putLong(buf.zero)
    def putMap(m: LongMap[Long]): Unit = {
      bb.putInt(m.size)
      m.foreach { case (k, c) => bb.putInt(k.toInt); bb.putLong(c) }
    }
    putMap(buf.pos); putMap(buf.neg)
    bb.array()
  }

  private[expressions] def deserializeBuf(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val zero = bb.getLong
    def getMap(): LongMap[Long] = {
      val n = bb.getInt
      val m = LongMap.empty[Long]
      var i = 0
      while (i < n) { m.update(bb.getInt.toLong, bb.getLong); i += 1 }
      m
    }
    new Buf(zero, getMap(), getMap())
  }

  private def collapse(m: LongMap[Long], maxBuckets: Int): Unit =
    if (m.size > maxBuckets) {
      val ks = m.keys.toArray.sorted
      val cut = ks(ks.length - maxBuckets)
      var moved = 0L
      var i = 0
      while (ks(i) < cut) { moved += m(ks(i)); m.remove(ks(i)); i += 1 }
      if (moved > 0L) m.update(cut, m.getOrElse(cut, 0L) + moved)
    }

  /** Quantile answers from an exact merged histogram — the ONE
    * collapse (eval-only, see DdSketchAggregate scaladoc) + the
    * rank-walk rule r = max(1, ceil(q·n)); shared by the in-sketch
    * aggregate and the stored-state reader. */
  private[expressions] def evalQuantiles(buf: Buf, bounds: Array[Double],
      quantiles: Array[Double], maxBuckets: Int): GenericArrayData = {
    // the one and only collapse: exact histogram in, deterministic
    // out — applied to COPIES so the stored buffer stays the exact
    // multiset histogram structurally (an eval'd buffer that is later
    // merged again, e.g. a bounded sketch in a complete-mode streaming
    // snapshot, must not accumulate collapses)
    def copied(m: LongMap[Long]): LongMap[Long] = {
      val c = LongMap.empty[Long]
      m.foreachEntry((k, v) => c.update(k, v))
      c
    }
    val pos = if (buf.pos.size > maxBuckets) copied(buf.pos) else buf.pos
    val neg = if (buf.neg.size > maxBuckets) copied(buf.neg) else buf.neg
    collapse(pos, maxBuckets); collapse(neg, maxBuckets)
    val nNeg = neg.values.sum
    val n = nNeg + buf.zero + pos.values.sum
    val out = quantiles.map { q =>
      if (n == 0L) Double.NaN
      else {
        val r = math.max(1L, math.ceil(q * n).toLong)
        if (r <= nNeg) {
          // ascending value order over negatives = DESCENDING |x| bucket
          val ks = neg.keys.toArray.sorted
          var cum = 0L; var i = ks.length - 1; var ans = 0.0
          var found = false
          while (!found && i >= 0) {
            cum += neg(ks(i))
            if (cum >= r) { ans = -rep(bounds, ks(i).toInt); found = true }
            i -= 1
          }
          ans
        } else if (r <= nNeg + buf.zero) 0.0
        else {
          val rr = r - nNeg - buf.zero
          val ks = pos.keys.toArray.sorted
          var cum = 0L; var i = 0; var ans = 0.0
          var found = false
          while (!found && i < ks.length) {
            cum += pos(ks(i))
            if (cum >= rr) { ans = rep(bounds, ks(i).toInt); found = true }
            i += 1
          }
          ans
        }
      }
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` of the sketch's estimates at `quantiles` (rank rule
  * r = max(1, ceil(q*n)), the same on both engines). */
case class DdSketchAggregate(
    child: Expression,
    bounds: Array[Double],
    quantiles: Array[Double],
    maxBuckets: Int = Int.MaxValue,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch.Buf] {

  import DdSketch._

  /** Bounded mode (the DDSketch "collapsing lowest" store): fold all
    * but the `maxBuckets` HIGHEST-index occupied buckets into the
    * lowest kept bucket (the "cut"). UPPER quantiles whose bucket is
    * kept keep the alpha guarantee unchanged (mass only ever moves UP
    * to the cut, below them); quantiles below the cut degrade to the
    * cut's representative.
    *
    * Applied at EVAL ONLY — never in update/merge — so the collapse
    * runs exactly once, on the exact merged histogram, and the bounded
    * answer is a PURE FUNCTION OF THE MULTISET for ALL quantiles under
    * any partitioning (an eager per-partial collapse would cut at
    * arrival-order-dependent boundaries; two partials cutting at
    * different cuts merge into a store a sequential build never
    * produces). The memory trade is documented, not hidden: the
    * in-flight partial is already bounded by O(|bounds|) (~700 entries
    * for 6 decades at alpha=0.01, the DDSketch O(log(range)/alpha)
    * store) regardless of `maxBuckets` — the cap models what a
    * bounded-store DEPLOYMENT would answer, deterministically. */
  // collapse + rank walk live in DdSketch.evalQuantiles — shared with
  // the stored-state reader (DdSketchMergeAggregate), same contract

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Buf =
    new Buf(0L, LongMap.empty, LongMap.empty)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x == 0.0) buf.zero += 1
      else if (x > 0.0) {
        val k = bucketOf(bounds, x).toLong
        buf.pos.update(k, buf.pos.getOrElse(k, 0L) + 1L)
      } else {
        val k = bucketOf(bounds, -x).toLong
        buf.neg.update(k, buf.neg.getOrElse(k, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = DdSketch.mergeInto(a, b)

  override def eval(buf: Buf): Any =
    DdSketch.evalQuantiles(buf, bounds, quantiles, maxBuckets)

  override def serialize(buf: Buf): Array[Byte] = DdSketch.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): Buf =
    DdSketch.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(off: Int): DdSketchAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): DdSketchAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DdSketchAggregate {
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column, bounds: Array[Double], quantiles: Array[Double]): Column =
    apply(c, bounds, quantiles, Int.MaxValue)

  def apply(c: Column, bounds: Array[Double], quantiles: Array[Double],
      maxBuckets: Int): Column =
    Bridge.column(
      DdSketchAggregate(Bridge.expression(c), bounds, quantiles, maxBuckets)
        .toAggregateExpression())
}

/** Sketch-table WRITER: the DDSketch histogram itself as binary —
  * per-fine-grain-group states persisted once and re-aggregated
  * forever (the q176 sketch-table play for QUANTILES; q179).
  * The stored bytes are one wire form of the exact histogram (entry
  * order non-canonical — consumers only decode). */
case class DdSketchStateAggregate(
    child: Expression,
    bounds: Array[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch.Buf] {

  import DdSketch._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def createAggregationBuffer(): Buf =
    new Buf(0L, LongMap.empty, LongMap.empty)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (x == 0.0) buf.zero += 1
      else if (x > 0.0) {
        val k = bucketOf(bounds, x).toLong
        buf.pos.update(k, buf.pos.getOrElse(k, 0L) + 1L)
      } else {
        val k = bucketOf(bounds, -x).toLong
        buf.neg.update(k, buf.neg.getOrElse(k, 0L) + 1L)
      }
    }
    buf
  }
  override def merge(a: Buf, b: Buf): Buf = DdSketch.mergeInto(a, b)
  override def eval(buf: Buf): Any = DdSketch.serializeBuf(buf)

  override def serialize(buf: Buf): Array[Byte] = DdSketch.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): Buf =
    DdSketch.deserializeBuf(bytes)
  override def withNewMutableAggBufferOffset(off: Int): DdSketchStateAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): DdSketchStateAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sketch-table READER: merges STORED DDSketch states (exact count
  * addition — associative and commutative, so any rollup grain
  * equals sketching the raw data) and answers quantiles through the
  * shared eval (same collapse/rank contract as the direct sketch) —
  * or, with `emitState`, returns the MERGED STATE itself (the
  * incremental-sketch-view fold, q199: stored state ⊕ batch partial
  * → next stored state; addition is NOT idempotent, which is exactly
  * what the BucketedLog `#batch=` exactly-once guard exists for). */
case class DdSketchMergeAggregate(
    child: Expression,
    bounds: Array[Double],
    quantiles: Array[Double],
    maxBuckets: Int = Int.MaxValue,
    emitState: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch.Buf] {

  import DdSketch._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitState) org.apache.spark.sql.types.BinaryType
    else ArrayType(DoubleType, containsNull = false)
  override def createAggregationBuffer(): Buf =
    new Buf(0L, LongMap.empty, LongMap.empty)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null)
      DdSketch.mergeInto(buf,
        DdSketch.deserializeBuf(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: Buf, b: Buf): Buf = DdSketch.mergeInto(a, b)
  override def eval(buf: Buf): Any =
    if (emitState) DdSketch.serializeBuf(buf)
    else DdSketch.evalQuantiles(buf, bounds, quantiles, maxBuckets)

  override def serialize(buf: Buf): Array[Byte] = DdSketch.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): Buf =
    DdSketch.deserializeBuf(bytes)
  override def withNewMutableAggBufferOffset(off: Int): DdSketchMergeAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): DdSketchMergeAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DdSketchState {
  import org.apache.spark.sql.graft.Bridge
  def state(c: Column, bounds: Array[Double]): Column =
    Bridge.column(DdSketchStateAggregate(Bridge.expression(c), bounds)
      .toAggregateExpression())
  def mergeStates(c: Column, bounds: Array[Double],
      quantiles: Array[Double]): Column =
    Bridge.column(
      DdSketchMergeAggregate(Bridge.expression(c), bounds, quantiles)
        .toAggregateExpression())

  /** [[mergeStates]] emitting the merged STATE instead of quantiles —
    * the incremental-sketch-view fold (q199). */
  def mergeStatesVec(c: Column, bounds: Array[Double]): Column =
    Bridge.column(
      DdSketchMergeAggregate(Bridge.expression(c), bounds,
        Array.empty[Double], emitState = true)
        .toAggregateExpression())
}
