package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — the first step
  * of corpus text cleanup (decomposed sequences like `e` + U+0301 and
  * their precomposed forms must dedup/fingerprint identically).
  *
  * Spark has no normalization built-in; a Scala UDF would break
  * whole-stage codegen on the hottest scan of a cleanup pipeline, so
  * this wraps `java.text.Normalizer` (the JDK's Unicode implementation,
  * the same NFC the DuckDB oracle's `nfc_normalize` implements) in a
  * one-call generated expression. Already-NFC strings (all ASCII) pass
  * through `Normalizer.normalize` with no allocation beyond the
  * round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
