package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles ("a b c") of a document in one byte-level pass — the
  * scan-side unit of the MinHash/Jaccard dedup family.
  *
  * Semantics are byte-identical to the declarative formulation
  * `filter(zip_with-fold(filter(split(lower(text), " "))))` in
  * `graft.functions.TextFunctions.shingles` (and to the DuckDB oracle's
  * `string_split(lower(text), ' ')` + `list_transform` join): lowercase
  * via `UTF8String.toLowerCase`, tokens are the non-empty runs between
  * single 0x20 bytes (a space never occurs inside a UTF-8 multibyte
  * sequence), shingles join k consecutive tokens with one space.
  * Fewer than k tokens ⇒ empty array.
  *
  * Why native: higher-order functions evaluate interpreted and the
  * fold materializes k-1 intermediate arrays per row; this expression
  * emits the shingle array in a single pass inside whole-stage codegen
  * (static helper call, same pattern as `RollingHashMin`).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(text: Any, kAny: Any): Any =
    WordShingles.shingles(text.asInstanceOf[UTF8String],
      kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.expressions.WordShingles.shingles($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {

  /** Called from interpreted eval and generated code. */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    // collect (start, end) of non-empty runs between 0x20 bytes
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var nTok = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        // token ended at i (empty runs skipped by the start tracking below)
        i += 1
      } else {
        val s = i
        while (i < n && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s; ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nTok - k + 1)
    var w = 0
    while (w <= nTok - k) {
      var len = k - 1 // separating spaces
      var j = w
      while (j < w + k) { len += ends(j) - starts(j); j += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      j = w
      while (j < w + k) {
        if (j > w) { buf(pos) = ' '; pos += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, pos, tl)
        pos += tl
        j += 1
      }
      out(w) = UTF8String.fromBytes(buf)
      w += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(text: Column, k: Column): Column =
    Bridge.column(WordShingles(Bridge.expression(text), Bridge.expression(k)))
}
