package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics of a document — the Gopher-style
  * repetition quality filters (Rae et al. '21 §A1.1) as a single
  * codegen scan expression: token count, distinct-token count, the
  * occurrence count of the most frequent word k-gram, total k-gram
  * instances, and instances belonging to duplicated k-grams.
  *
  * Why native: the declarative form (`explode(shingles) → two-level
  * groupBy`) shuffles one row per k-gram instance AND — because the
  * optimizer collapses sibling projections past the Generate — ends up
  * re-evaluating the interpreted `size(tokens)` / `array_distinct`
  * higher-order expressions once per exploded row (~tokens× per doc,
  * measured 10× q84's wall at sf0.1). The signal is purely doc-local,
  * so the right 100 TB shape is NO exchange at all: this expression
  * folds everything in one pass inside whole-stage codegen and the
  * catalog query becomes a zero-shuffle scan (`PlanPropertiesSpec`).
  *
  * Tokenization matches `TextFunctions.tokens` byte-for-byte:
  * lowercase via `UTF8String.toLowerCase`, tokens = non-empty runs
  * between single 0x20 bytes, k-grams join k consecutive tokens with
  * one space (`WordShingles` semantics, and the DuckDB oracle's
  * `string_split(lower(text), ' ')` + list_transform join).
  *
  * Returns null when the doc has fewer than k tokens (no k-grams —
  * screened out identically on both engines).
  */
case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def nullIntolerant: Boolean = true
  // null for docs with fewer than k tokens EVEN when inputs are
  // non-null — without this override, non-nullable children make
  // nullSafeCodeGen skip the isNull declaration our template assigns
  // (Janino "isNull_1 is not an rvalue" → silent interpreter fallback)
  // and the plan wrongly advertises a non-nullable output.
  override def nullable: Boolean = true

  override def nullSafeEval(text: Any, kAny: Any): Any =
    RepetitionStats.stats(text.asInstanceOf[UTF8String],
      kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) => s"""
      ${ev.value} = graft.expressions.RepetitionStats.stats($t, $k);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_dtoks", LongType, nullable = false),
    StructField("mx", LongType, nullable = false),
    StructField("tot", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  /** Called from interpreted eval and generated code; null if fewer
    * than k tokens. */
  def stats(text: UTF8String, k: Int): InternalRow = {
    val s = text.toLowerCase.toString
    // tokens: non-empty runs between single spaces (split(" ") keeps
    // empties for runs; filter matches TextFunctions.tokens)
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val nTok = toks.size
    if (nTok < k) return null
    val distinct = new java.util.HashSet[String]()
    var j = 0
    while (j < nTok) { distinct.add(toks.get(j)); j += 1 }
    val counts = new java.util.HashMap[String, Array[Long]]()
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w <= nTok - k) {
      sb.setLength(0)
      var m = 0
      while (m < k) {
        if (m > 0) sb.append(' ')
        sb.append(toks.get(w + m))
        m += 1
      }
      val g = sb.toString
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
      w += 1
    }
    var mx = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > mx) mx = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](
      nTok.toLong, distinct.size.toLong, mx, (nTok - k + 1).toLong, dup))
  }

  import org.apache.spark.sql.graft.Bridge
  def apply(text: Column, k: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text), Bridge.expression(k)))
}
