package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership probe as a codegen expression — the
  * shuffle-side pre-filter for joins whose build side outgrows the
  * broadcast budget (SCALE.md's ~7 M-doc bound for the
  * decontamination eval set): the filter itself is KBs–MBs at any
  * eval size, so it always broadcasts (shipped into generated code as
  * a reference object), and it cuts the probe side to near-matches
  * BEFORE the join's exchange. False positives are removed by the
  * exact join that follows — results stay bit-equal to the
  * broadcast-join formulation (q99 gates that against q80's oracle).
  *
  * Layout: `numBits = bits.length * 64` (power of two), probe hashes
  * by Kirsch–Mitzenmacher double hashing (h1 + i·h2 over the 64-bit
  * input hash) — deterministic, engine-independent, no per-row
  * allocation. Input is the value's xxhash64 (build and probe sides
  * must hash identically — [[BloomMightContain.build]] consumes the
  * same hashes).
  */
case class BloomMightContain(child: Expression, bits: Array[Long],
    numHashes: Int) extends UnaryExpression {

  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
    s"bits.length must be a power of two: ${bits.length}")
  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BloomMightContain.contains(bits, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BloomMightContain.contains($ref, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // bits arrays are fat; keep equality by reference identity semantics
  // out of trouble in plan comparison by comparing content
  override def equals(o: Any): Boolean = o match {
    case b: BloomMightContain =>
      b.child == child && b.numHashes == numHashes &&
        java.util.Arrays.equals(b.bits, bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + numHashes) + java.util.Arrays.hashCode(bits)
}

object BloomMightContain {

  /** Build the bit array over pre-hashed items (xxhash64 values).
    * `bitsPerItem` ≈ 16 gives fpp ≈ 4e-4 at optimal numHashes. */
  def build(hashes: Iterator[Long], n: Long, bitsPerItem: Int = 16)
      : (Array[Long], Int) = {
    require(n > 0, "empty build side — skip the filter instead")
    val targetBits = math.max(64L, n * bitsPerItem)
    val words = java.lang.Long.highestOneBit(
      math.max(1L, (targetBits + 63) / 64) * 2 - 1).toInt
    val bits = new Array[Long](words)
    val numHashes = math.max(1,
      math.round(0.6931471805599453 * words * 64L / n).toInt)
    hashes.foreach(h => add(bits, numHashes, h))
    (bits, numHashes)
  }

  /** [[build]] without the driver-side hash stream: each partition
    * folds its hashes into a LOCAL bitset (allocated executor-side —
    * no fat zero value crosses the wire) and the bitsets are OR-merged
    * up a tree, so the driver only ever receives the final KB–MB
    * array. Insertion is idempotent and OR is commutative, so the
    * result is bit-identical to a sequential [[build]] over the same
    * distinct hashes under ANY partitioning — duplicates need no
    * pre-`distinct()` (and skipping it saves that shuffle). `n` only
    * sizes the array (an approx distinct count is fine); `maxBits`
    * caps the array so the tree merge and the task-binary reference
    * object stay bounded — past the cap fpp degrades gracefully and
    * the exact join downstream keeps results identical. The default
    * cap (1<<27 bits = 16 MB) keeps the per-partition fold arrays,
    * the tree-merge payloads, and the codegen reference object inside
    * broadcast comfort; it holds 16 bits/item up to ~8 M distinct
    * items, and fpp at the cap is still ~0.1% at 50 M items. Raise it
    * deliberately (with executor memory to match) rather than by
    * default — a 1<<31 cap would mean 256 MB per partition fold. */
  def buildDistributed(hashes: org.apache.spark.rdd.RDD[Long], n: Long,
      bitsPerItem: Int = 16, maxBits: Long = 1L << 27): (Array[Long], Int) = {
    require(n > 0, "empty build side — skip the filter instead")
    val targetBits = math.min(maxBits, math.max(64L, n * bitsPerItem))
    val words = java.lang.Long.highestOneBit(
      math.max(1L, (targetBits + 63) / 64) * 2 - 1).toInt
    // same sizing formula as [[build]] so the two paths stay
    // bit-comparable below the cap
    val numHashes = math.max(1,
      math.round(0.6931471805599453 * words * 64L / n).toInt)
    val bits = hashes
      .mapPartitions { it =>
        val acc = new Array[Long](words)
        it.foreach(h => add(acc, numHashes, h))
        Iterator.single(acc)
      }
      .treeReduce({ (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }, depth = 2)
    (bits, numHashes)
  }

  private[expressions] def add(bits: Array[Long], numHashes: Int,
      hash: Long): Unit = {
    val mask = bits.length.toLong * 64 - 1 // Long: filters may exceed 2^31 bits
    val h1 = hash
    val h2 = java.lang.Long.rotateLeft(hash, 31) | 1L // odd, full-period
    var i = 0
    while (i < numHashes) {
      val idx = (h1 + i * h2) & mask
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Called from interpreted eval and generated code. */
  def contains(bits: Array[Long], numHashes: Int, hash: Long): Boolean = {
    val mask = bits.length.toLong * 64 - 1 // Long: filters may exceed 2^31 bits
    val h1 = hash
    val h2 = java.lang.Long.rotateLeft(hash, 31) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (h1 + i * h2) & mask
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Called from interpreted eval and generated code — the
    * column-side twin of [[contains]], probing a bitset that arrives
    * as a ROW VALUE (array<long>) instead of a plan literal. */
  def containsArr(bits: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int, hash: Long): Boolean = {
    val mask = bits.numElements().toLong * 64 - 1 // Long: filters may exceed 2^31 bits
    val h1 = hash
    val h2 = java.lang.Long.rotateLeft(hash, 31) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (h1 + i * h2) & mask
      if ((bits.getLong((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Shard router: the top log2(shards) bits of the hash (disjoint
    * from the low bits double-hashing consumes at any realistic
    * filter size). Shards must be a power of two. */
  def shardOf(hash: Long, shards: Int): Int =
    if (shards == 1) 0
    else (hash >>> (64 - Integer.numberOfTrailingZeros(shards))).toInt

  /** BEYOND the single-filter cap ([[buildDistributed]]'s 16 MB
    * default): shard the hash space by its top bits so each shard's
    * bitset covers ~n/shards items and no single array exceeds
    * `maxBits` — the total filter budget becomes shards × maxBits
    * while every per-task array, tree payload and probe-side row
    * value stays individually small. The build is one
    * combineByKey-by-shard pass (per-executor arrays, OR-merge), and
    * the result STAYS DISTRIBUTED: a (shard, bits) DataFrame the
    * probe side joins on its own shard key — no driver object ever
    * holds all shards. Probe cost: S join keys → S reducers, each
    * streaming its shard's probes against one array row
    * ([[graft.operators.Dedup.decontaminateBloomSharded]]).
    * Same add/probe bit math as the unsharded filter, so semantics
    * (no false negatives; fpp per shard as sized) are unchanged. */
  def buildShardedDf(hashes: org.apache.spark.rdd.RDD[Long], n: Long,
      shards: Int, bitsPerItem: Int = 16, maxBits: Long = 1L << 27)
      : (org.apache.spark.sql.DataFrame, Int) = {
    require(n > 0, "empty build side — skip the filter instead")
    require(shards >= 1 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two: $shards")
    val perShard = math.max(1L, n / shards)
    val targetBits = math.min(maxBits, math.max(64L, perShard * bitsPerItem))
    val words = java.lang.Long.highestOneBit(
      math.max(1L, (targetBits + 63) / 64) * 2 - 1).toInt
    val numHashes = math.max(1,
      math.round(0.6931471805599453 * words * 64L / perShard).toInt)
    val shardBits = hashes
      .map(h => (shardOf(h, shards), h))
      .combineByKey[Array[Long]](
        (h: Long) => {
          val a = new Array[Long](words); add(a, numHashes, h); a
        },
        (a: Array[Long], h: Long) => { add(a, numHashes, h); a },
        (a: Array[Long], b: Array[Long]) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.createDataFrame(
      shardBits.map { case (s, bits) =>
        org.apache.spark.sql.Row(s, bits.toSeq)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bloom_bits",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false))))
    (df, numHashes)
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(hashCol: Column, bits: Array[Long], numHashes: Int): Column =
    Bridge.column(BloomMightContain(Bridge.expression(hashCol), bits, numHashes))
}

/** [[BloomMightContain]] with the bitset as a CHILD COLUMN (the
  * sharded-filter probe: the bits row arrives from the (shard, bits)
  * join, so no plan-literal array exists anywhere). */
case class BloomMightContainCol(hash: Expression, bits: Expression,
    numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = hash
  override def right: Expression = bits
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any, b: Any): Any =
    BloomMightContain.containsArr(
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numHashes, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) =>
      s"${ev.value} = graft.expressions.BloomMightContain.containsArr($b, $numHashes, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(hash = newLeft, bits = newRight)
}

object BloomMightContainCol {
  import org.apache.spark.sql.graft.Bridge
  def apply(hashCol: Column, bitsCol: Column, numHashes: Int): Column =
    Bridge.column(BloomMightContainCol(
      Bridge.expression(hashCol), Bridge.expression(bitsCol), numHashes))
}
