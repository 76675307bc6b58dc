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
    if (v != null) {
      val h = CountMin.hash52(v.asInstanceOf[UTF8String].toString)
      val bucket = (h >>> wBits).toInt
      val tail = h & ((1L << wBits) - 1)
      val rho =
        if (tail == 0L) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // index-ordered fold: term j is a power of two (exact double);
    // the ACCUMULATION order is the contract the oracle replays
    var s = 0.0; var v = 0L; var j = 0
    while (j < m) {
      s += 1.0 / (1L << buf(j))
      if (buf(j) == 0) v += 1
      j += 1
    }
    val raw = HllSketch.alpha(m) * m.toDouble * m.toDouble / s
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
    else raw
  }

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

  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column, p: Int): Column =
    Bridge.column(HllSketchAggregate(Bridge.expression(c), p)
      .toAggregateExpression())
}
