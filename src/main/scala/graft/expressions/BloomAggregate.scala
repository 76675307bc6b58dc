package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PER-GROUP Bloom filter build — the file/partition SECONDARY INDEX
  * primitive: `groupBy(file).agg(BloomAgg(xxhash64(key), words, k))`
  * yields one fixed-size bitset per data unit, and a point-lookup
  * planner probes the stored bitsets to read ONLY the units that
  * might contain the key (q183's zone-map discipline for EQUALITY
  * predicates, where min/max ranges prune nothing).
  *
  * State is `words` longs per group — constant regardless of group
  * row count; merge is bitwise OR (commutative, associative,
  * idempotent), so the built index is a pure function of each
  * group's key SET at any partitioning. Bit layout is EXACTLY
  * [[BloomMightContain]]'s Kirsch–Mitzenmacher double hashing over
  * the input's xxhash64 — one hash family shared by the whole-corpus
  * decontamination filter (q99/q93), this per-group build, and the
  * driver-side probe ([[BloomMightContain.contains]]), so index
  * build, SQL probe ([[BloomMightContain.containsArr]]) and planner
  * probe agree bit-for-bit. False positives only ever ADD units to
  * the read set — the residual exact predicate keeps results correct,
  * the index only buys IO skipping. */
case class BloomAggregate(
    child: Expression,
    words: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(words > 0 && (words & (words - 1)) == 0,
    s"words must be a power of two: $words")
  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomMightContain.add(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): BloomAggregate =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomAggregate =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomAggregate {

  import org.apache.spark.sql.graft.Bridge

  /** `hashed` must be the key's `xxhash64` column (same input the
    * probe side hashes). */
  def apply(hashed: Column, words: Int, numHashes: Int): Column =
    Bridge.column(BloomAggregate(Bridge.expression(hashed), words, numHashes)
      .toAggregateExpression())
}
