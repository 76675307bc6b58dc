package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Minimum polynomial rolling hash over all k-byte windows of a string
  * — single-pass Rabin–Karp document fingerprinting (the winnowing
  * primitive) as a codegen scalar expression. Unlike the shingle-based
  * `TextFunctions.fingerprint` (explode + md5 + min), this touches each
  * byte once with O(1) state: at 100 TB the fingerprint costs exactly
  * one scan of the text column inside whole-stage codegen.
  *
  * hash(w) = sum b_i * B^(k-1-i) mod M with B=257, M=2^61-1 (Mersenne,
  * mod via multiply-high trick avoided: uses Math.floorMod on 128-bit
  * emulation-free path by keeping values < 2^63 with % — deterministic
  * across JVMs). Strings shorter than k hash their full length.
  */
case class RollingHashMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(str: Any, kAny: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val k = kAny.asInstanceOf[Int]
    RollingHashMin.minHash(bytes, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.expressions.RollingHashMin.minHash($s.getBytes(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingHashMin {
  final val M: Long = (1L << 61) - 1
  final val B: Long = 257L

  private def mulMod(a: Long, b: Long): Long = {
    // (a*b) mod M via Math.multiplyHigh (M = 2^61-1)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // split product into 61-bit limbs: value = hi*2^64 + lo
    val lo61 = lo & M
    val rest = (hi << 3) | (lo >>> 61)
    var r = lo61 + rest
    if (r >= M) r -= M
    r
  }

  /** Called from both interpreted eval and generated code. */
  def minHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // B^(kk-1) mod M
    var pow = 1L
    var i = 1
    while (i < kk) { pow = mulMod(pow, B); i += 1 }
    var h = 0L
    i = 0
    while (i < kk) { h = (mulMod(h, B) + (bytes(i) & 0xff)) % M; i += 1 }
    var min = h
    i = kk
    while (i < n) {
      h = (h - mulMod(bytes(i - kk) & 0xff, pow) % M + M) % M
      h = (mulMod(h, B) + (bytes(i) & 0xff)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(text: Column, k: Column): Column =
    Bridge.column(RollingHashMin(Bridge.expression(text), Bridge.expression(k)))
}
