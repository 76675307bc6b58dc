package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass CODE-POINT histogram of a string: text → map<char, count>,
  * the scan-side kernel of the char-entropy quality signal (q84) and
  * any per-character corpus statistic.
  *
  * Two reasons to be native rather than `explode(split(text, ""))`:
  *
  *  1. CORRECTNESS AT THE UNICODE BOUNDARY — Spark's regex split cuts
  *     UTF-16 code units, so a supplementary-plane character (emoji,
  *     CJK ext B) becomes two lone surrogates, while DuckDB's
  *     `string_split(text, '')` yields whole code points. This
  *     expression walks the UTF-8 byte sequence directly (each code
  *     point = one 1–4-byte sequence), so both engines agree BY
  *     CONSTRUCTION on any input — the q84 BMP caveat is gone, and
  *     q91 proves it on a supplementary-plane corpus.
  *  2. SCALE — the declarative form allocates a len-sized array of
  *     1-char strings per document before the partial aggregate
  *     collapses it; this builds the histogram in one pass, and the
  *     downstream explode emits one row per DISTINCT character
  *     (≈ alphabet size), not one per character (≈ doc length) —
  *     rows into the aggregate drop by ~len/alphabet.
  *
  * Map keys are single-code-point strings in first-occurrence order
  * (deterministic, though consumers aggregate and don't depend on it).
  * Empty string → empty map (explode then drops the doc — identical to
  * the old formulation, where every split fragment was filtered out).
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CharCounts.histogram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharCounts.histogram($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharCounts {

  /** Called from interpreted eval and generated code. */
  def histogram(text: UTF8String): MapData = {
    val bytes = text.getBytes
    val n = bytes.length
    // LinkedHashMap: first-occurrence key order, deterministic
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val len = UTF8String.numBytesForFirstByte(bytes(i))
      val cp = UTF8String.fromBytes(bytes, i, math.min(len, n - i))
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += len
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column): Column = Bridge.column(CharCounts(Bridge.expression(c)))
}
