package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002; Beyer et al.,
  * SIGMOD 2007 for the unbiased estimator and set operations) — the
  * sketch to reach for when groups must be COMPARED, not just sized:
  * keeping the k smallest distinct hash values of a set supports
  * union (merge-min), intersection and Jaccard estimates, which
  * register sketches like HLL cannot do without inclusion-exclusion
  * error blowup.
  *
  * The state is the k smallest DISTINCT 52-bit md5 hashes
  * ([[CountMin.hash52]]) in ascending order — a pure function of the
  * input SET: duplicates are free, merge is multiset-union-then-trim
  * (commutative, associative, idempotent), so answers are
  * partitioning-independent AND the DuckDB oracle can rebuild the
  * sketch VERBATIM as `SELECT DISTINCT hash ORDER BY hash LIMIT k`
  * (q136) — no compaction rule to replay at all, the sharpest oracle
  * story of the sketch family. Estimators stay engine-exact: hashes
  * are exact integers, and (k-1)·2⁵² / h_(k) is one deterministic
  * double division of exactly-representable inputs.
  *
  * Estimate: if the sketch holds fewer than k hashes the set was
  * smaller than k — the estimate is the exact held count; otherwise
  * (k-1)·2⁵²/h_(k). Standard error ≈ 1/sqrt(k-2).
  */
case class KmvSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"k must be >= 2: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.hash52(v.asInstanceOf[UTF8String].toString)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) a.add(h)
      else if (h < a.last()) { a.add(h); if (a.size > k) a.pollLast() }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvSketchAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketchAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** 2^52 — hashes normalize to (0, 1] against this; exact double. */
  val HashSpace: Double = 4503599627370496.0

  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column, k: Int): Column =
    Bridge.column(KmvSketchAggregate(Bridge.expression(c), k)
      .toAggregateExpression())
}
