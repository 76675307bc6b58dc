package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row signature expressions for the STREAMING screens — the
  * codegen replacements for the scalar UDFs the micro-batch scans used
  * to pay (`ScalaUDF` survives whole-stage codegen but adds a
  * per-row catalyst<->Scala converter bridge; these call the same
  * shared pure functions directly on the UTF8String bytes' String
  * view). Expression-only projection keeps the event-time watermark
  * tag on the stateful operator's child, which a typed flatMap would
  * drop — the reason the streaming path could not reuse the batch
  * explode/aggregate shape in the first place.
  *
  * Bit-parity contract: BOTH the interpreted eval and the generated
  * code call the exact shared functions
  * ([[graft.streaming.StreamingNearDup.simhash64]],
  * [[graft.streaming.StreamingMinHash.signature]]) that the streaming
  * parity specs pin against the batch Column formulations — there is
  * no second implementation to drift. */
case class SimHash64Text(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.streaming.StreamingNearDup.simhash64(
      input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.streaming.StreamingNearDup.simhash64($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Text {
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column): Column = Bridge.column(SimHash64Text(Bridge.expression(c)))
}

/** MinHash signature of a text as `array<string>` (8-hex min slices) —
  * null when the doc has fewer than `k` tokens, matching the batch
  * operator which emits no signature row for such docs. */
case class MinHashSignatureText(child: Expression, k: Int, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val sig = graft.streaming.StreamingMinHash.signature(
        v.asInstanceOf[UTF8String].toString, k, nHashes)
      if (sig == null) null
      else new GenericArrayData(sig.map(UTF8String.fromString(_)): Array[Any])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("sig")
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      s"""
         |String[] $arr = graft.streaming.StreamingMinHash.signature(
         |  $c.toString(), $k, $nHashes);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $u = new Object[$arr.length];
         |  for (int $i = 0; $i < $arr.length; $i++) {
         |    $u[$i] = org.apache.spark.unsafe.types.UTF8String.fromString($arr[$i]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($u);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureText {
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column, k: Int, nHashes: Int): Column =
    Bridge.column(MinHashSignatureText(Bridge.expression(c), k, nHashes))
}
