package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al., "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm",
  * AofA 2007) — the bounded-memory distinct counter for the 100 TB
  * path: `m = 2^p` byte registers per group instead of the
  * shuffle-heavy exact `count_distinct` expand. Standard error
  * ~1.04/sqrt(m) (4.6% at p=9).
  *
  * Merge is register-wise MAX — commutative, associative, idempotent,
  * a pure function of the input SET (duplicates are free), so answers
  * are partitioning-independent and a DuckDB oracle re-derives every
  * register exactly (q133):
  *  - hash = first 13 md5 hex chars = 52 bits ([[CountMin.hash52]],
  *    same primitive both engines compute identically);
  *  - bucket = top p bits; rho = leading-zero count of the remaining
  *    w = 52-p bits + 1. The SQL twin uses
  *    `floor(log2(tail))` for the highest set bit — exact for every
  *    integer tail: log2(2^k ± j) sits ≥ tens of ulps away from the
  *    integer k for w ≤ 43, so a correctly-rounded-to-1-ulp libm
  *    cannot cross the floor boundary;
  *  - estimator: harmonic sum Σ 2^-M[j] as an INDEX-ORDERED left fold
  *    of exactly-representable terms (`1.0 / (1L << M[j])`), then
  *    alpha·m²/S, with the standard linear-counting branch
  *    (m·ln(m/V)) below 2.5m — the branch predicate compares the
  *    identical doubles on both engines, and the one
  *    libm-sensitive op (ln) is covered by rounding the published
  *    estimate (hard rule 9).
  */
case class HllSketchAggregate(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p out of range: $p")
  private val m = 1 << p
  private val wBits = 52 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketch.offer(buf, wBits, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.maxInto(a, b)

  override def eval(buf: Array[Byte]): Any = HllSketch.estimate(buf)

  // defensive copies: the engine may reuse either array after the call
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(off: Int): HllSketchAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSketchAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketch {

  /** The standard HLL bias constant for m >= 128; generated here and
    * emitted into the oracle SQL as a literal so both engines multiply
    * the identical double. */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The ONE register-update rule every HLL variant shares (dense,
    * sparse upgrade target, register-table writer). */
  private[expressions] def offer(buf: Array[Byte], wBits: Int,
      s: String): Unit = {
    val h = CountMin.hash52(s)
    val bucket = (h >>> wBits).toInt
    val tail = h & ((1L << wBits) - 1)
    val rho =
      if (tail == 0L) wBits + 1
      else wBits - (63 - java.lang.Long.numberOfLeadingZeros(tail))
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
  }

  /** Register-wise max of `b` into `a` (the HLL merge). */
  private[expressions] def maxInto(a: Array[Byte],
      b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** The shared estimator: index-ordered harmonic fold (term j is a
    * power of two — exact double; the ACCUMULATION order is the
    * contract the oracle replays) + the standard linear-counting
    * branch. */
  private[expressions] def estimate(buf: Array[Byte]): Double = {
    val m = buf.length
    var s = 0.0; var v = 0L; var j = 0
    while (j < m) {
      s += 1.0 / (1L << buf(j))
      if (buf(j) == 0) v += 1
      j += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / s
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
    else raw
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column, p: Int): Column =
    Bridge.column(HllSketchAggregate(Bridge.expression(c), p)
      .toAggregateExpression())

  /** Sparse-mode variant ([[HllSparseAggregate]]): identical
    * registers and estimate, O(min(distinct, m)) per-group state. */
  def sparse(c: Column, p: Int): Column =
    Bridge.column(HllSparseAggregate(Bridge.expression(c), p)
      .toAggregateExpression())

  /** Sketch-table writer ([[HllRegistersAggregate]]): raw registers
    * as binary, for persisting and later re-aggregation. */
  def registers(c: Column, p: Int): Column =
    Bridge.column(HllRegistersAggregate(Bridge.expression(c), p)
      .toAggregateExpression())

  /** Sketch-table reader ([[HllMergeAggregate]]): estimate from
    * merged STORED register vectors. */
  def mergeRegisters(c: Column, p: Int): Column =
    Bridge.column(HllMergeAggregate(Bridge.expression(c), p)
      .toAggregateExpression())

  /** [[mergeRegisters]] emitting the merged VECTOR instead of the
    * estimate — the incremental-sketch-view fold (q195). */
  def mergeRegistersVec(c: Column, p: Int): Column =
    Bridge.column(HllMergeAggregate(Bridge.expression(c), p,
      emitRegisters = true).toAggregateExpression())

  /** Sparse-until-upgrade buffer: exactly one of `pairs` (bucket →
    * max rho) or `dense` is non-null. */
  final class SparseBuf(
      var pairs: java.util.HashMap[Integer, Integer],
      var dense: Array[Byte])
}

/** SPARSE-mode HyperLogLog (the HLL++ sparse representation, Heule et
  * al., "HyperLogLog in Practice", EDBT 2013): per-group state is a
  * (bucket → max rho) pair list until it would outgrow an eighth of
  * the dense array, then upgrades to the dense `2^p` byte registers.
  * For MANY-GROUP aggregations (per-user, per-key rollups at 100 TB,
  * where most groups see few distinct items) the shuffled state is
  * O(min(distinct, m)) per group instead of a fixed 2^p bytes —
  * the classic long-tail win — while groups that do grow degrade
  * gracefully to exactly the dense sketch.
  *
  * The sparse form is LOSSLESS: it stores the identical (bucket, rho)
  * maxima the dense array would hold, so the registers — and the
  * estimate — are bit-identical to [[HllSketchAggregate]] under any
  * partitioning and any mix of sparse/dense partials, and q133's
  * register-rebuild oracle applies verbatim (q146). */
case class HllSparseAggregate(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch.SparseBuf] {

  require(p >= 4 && p <= 16, s"p out of range: $p")
  private val m = 1 << p
  private val wBits = 52 - p
  // serialized sparse entry = 3 bytes (2 bucket + 1 rho); upgrade
  // before the sparse form could exceed the dense m bytes
  private val maxSparse = m / 8

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): HllSketch.SparseBuf =
    new HllSketch.SparseBuf(new java.util.HashMap[Integer, Integer](), null)

  private def toDense(buf: HllSketch.SparseBuf): Unit =
    if (buf.dense == null) {
      val d = new Array[Byte](m)
      buf.pairs.forEach { (b, r) =>
        if (r > d(b)) d(b) = r.toByte
      }
      buf.dense = d
      buf.pairs = null
    }

  private def offer(buf: HllSketch.SparseBuf, bucket: Int, rho: Int): Unit =
    if (buf.dense != null) {
      if (rho > buf.dense(bucket)) buf.dense(bucket) = rho.toByte
    } else {
      val prev = buf.pairs.get(bucket)
      if (prev == null || rho > prev.intValue) {
        buf.pairs.put(bucket, rho)
        if (buf.pairs.size > maxSparse) toDense(buf)
      }
    }

  override def update(buf: HllSketch.SparseBuf,
      input: InternalRow): HllSketch.SparseBuf = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.hash52(v.asInstanceOf[UTF8String].toString)
      val bucket = (h >>> wBits).toInt
      val tail = h & ((1L << wBits) - 1)
      val rho =
        if (tail == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(tail))
      offer(buf, bucket, rho)
    }
    buf
  }

  override def merge(a: HllSketch.SparseBuf,
      b: HllSketch.SparseBuf): HllSketch.SparseBuf = {
    if (b.dense != null) {
      toDense(a)
      var i = 0
      while (i < m) { if (b.dense(i) > a.dense(i)) a.dense(i) = b.dense(i); i += 1 }
    } else b.pairs.forEach { (bk, r) => offer(a, bk, r) }
    a
  }

  override def eval(buf: HllSketch.SparseBuf): Any = {
    toDense(buf)
    val d = buf.dense
    var s = 0.0; var v = 0L; var j = 0
    while (j < m) {
      s += 1.0 / (1L << d(j))
      if (d(j) == 0) v += 1
      j += 1
    }
    val raw = HllSketch.alpha(m) * m.toDouble * m.toDouble / s
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
    else raw
  }

  override def serialize(buf: HllSketch.SparseBuf): Array[Byte] =
    if (buf.dense != null) {
      val out = new Array[Byte](1 + m)
      out(0) = 1
      System.arraycopy(buf.dense, 0, out, 1, m)
      out
    } else {
      val n = buf.pairs.size
      val bb = java.nio.ByteBuffer.allocate(1 + 4 + 3 * n)
      bb.put(0.toByte).putInt(n)
      buf.pairs.forEach { (b, r) =>
        bb.putShort((b.intValue & 0xffff).toShort).put(r.byteValue)
      }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): HllSketch.SparseBuf =
    if (bytes(0) == 1) {
      val d = new Array[Byte](m)
      System.arraycopy(bytes, 1, d, 0, m)
      new HllSketch.SparseBuf(null, d)
    } else {
      val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      val n = bb.getInt
      val pairs = new java.util.HashMap[Integer, Integer](n * 2)
      var i = 0
      while (i < n) {
        val b = bb.getShort & 0xffff
        val r = bb.get.toInt
        pairs.put(b, r)
        i += 1
      }
      new HllSketch.SparseBuf(pairs, null)
    }

  override def withNewMutableAggBufferOffset(off: Int): HllSparseAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllSparseAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Register-table WRITER: the same sketch as [[HllSketchAggregate]],
  * evaluated to the raw `2^p` register bytes instead of the estimate
  * — what a SKETCH TABLE stores (per-fine-grain-group registers
  * persisted once, re-aggregated forever without touching raw data;
  * q176). Registers are a pure function of the input set. */
case class HllRegistersAggregate(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p out of range: $p")
  private val m = 1 << p
  private val wBits = 52 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      HllSketch.offer(buf, wBits, v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.maxInto(a, b)
  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(off: Int): HllRegistersAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllRegistersAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Register-table READER: merges STORED register vectors (register-
  * wise max — associative/commutative/idempotent, so rolling up
  * day-level sketches to any coarser grain equals sketching the raw
  * data directly) and evaluates the shared estimator — or, with
  * `emitRegisters`, returns the MERGED VECTOR itself (the
  * incremental-sketch-view fold: stored state ⊔ batch partial →
  * next stored state, q195). The re-aggregation reads
  * O(groups × 2^p) bytes, never the corpus. */
case class HllMergeAggregate(
    child: Expression,
    p: Int,
    emitRegisters: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p out of range: $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitRegisters) org.apache.spark.sql.types.BinaryType else DoubleType
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val in = v.asInstanceOf[Array[Byte]]
      require(in.length == m, s"register width ${in.length} != 2^$p")
      HllSketch.maxInto(buf, in)
    }
    buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllSketch.maxInto(a, b)
  override def eval(buf: Array[Byte]): Any =
    if (emitRegisters) buf.clone() else HllSketch.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(off: Int): HllMergeAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllMergeAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
