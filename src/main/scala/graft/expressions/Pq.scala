package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization kernels (the q118/q119 hot path).
  *
  * The Column-API formulation — `array_min(array(struct ...))` per
  * subspace for encode, `aggregate(sequence(...))` for the ADC fold —
  * evaluates interpreted (higher-order functions are not codegen'd)
  * and allocates ksub structs per (row, subspace): ~8× wall on the
  * corpus scan at sf0.1. These expressions run the same arithmetic as
  * single fused loops inside whole-stage codegen.
  *
  * BIT-PARITY CONTRACT (oracle-critical): every double op replicates
  * the interpreted formulation exactly —
  *  - `d(j, c) = c2(j)(c) - 2.0 * Σ_i v(j·d+i)·cb(i)` with the dot
  *    accumulated in index order ([[FloatDotProduct]] semantics) and
  *    `c2` folded in index order on the driver;
  *  - encode argmin: strict `<`, ties → lowest code;
  *  - ADC: j-ascending left fold `((0 + t0) + t1) …`.
  * DuckDB's q118/q119 SQL replays the same folds, so results stay
  * hash-green with no rounding.
  */
private[graft] class PqKernel(
    val codebooks: Array[Array[Array[Float]]]) extends Serializable {
  val m: Int = codebooks.length
  val ksub: Int = codebooks.head.length
  val d: Int = codebooks.head.head.length
  /** ||c||² per (subspace, code), folded in index order on the driver
    * — same fold as the Column formulation's driver-side literal. */
  val c2: Array[Array[Double]] =
    codebooks.map(_.map(_.map(x => x.toDouble * x).sum))

  private def dist(v: ArrayData, j: Int, c: Int): Double = {
    val cb = codebooks(j)(c)
    val off = j * d
    var s = 0.0
    var i = 0
    while (i < d) {
      s += v.getFloat(off + i).toDouble * cb(i).toDouble
      i += 1
    }
    c2(j)(c) - 2.0 * s
  }

  def encode(v: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val dd = dist(v, j, c)
        if (dd < bestD) { bestD = dd; best = c } // ties -> lowest code
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Flat (m·ksub) distance table for one query vector. */
  def distTable(v: ArrayData): ArrayData = {
    val t = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) { t(j * ksub + c) = dist(v, j, c); c += 1 }
      j += 1
    }
    new GenericArrayData(t)
  }

  /** ADC: j-ascending left fold of dtab[j·ksub + codes(j)]. */
  def adc(codes: ArrayData, dtab: ArrayData): Double = {
    var s = 0.0
    var j = 0
    while (j < m) {
      s += dtab.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    s
  }
}

/** vec (array<float>) → PQ codes (array<int>, one per subspace). */
case class PqEncode(child: Expression, kernel: PqKernel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel,
      classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec (array<float>) → flat m·ksub ADC distance table (array<double>). */
case class PqDistTable(child: Expression, kernel: PqKernel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    kernel.distTable(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel,
      classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.distTable($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (codes array<int>, dtab array<double>) → ADC score (double). */
case class PqAdc(left: Expression, right: Expression, kernel: PqKernel)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    kernel.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel,
      classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.adc($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Pq {
  import org.apache.spark.sql.graft.Bridge
  def encode(vec: Column, kernel: PqKernel): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), kernel))
  def distTable(vec: Column, kernel: PqKernel): Column =
    Bridge.column(PqDistTable(Bridge.expression(vec), kernel))
  def adc(codes: Column, dtab: Column, kernel: PqKernel): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(dtab), kernel))
}
