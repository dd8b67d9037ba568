// Hosted under org.apache.spark.sql for the same private[sql] access
// as VectorExpressions (AbstractDataType / TypeCollection, the
// Column <-> Expression bridge).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-key sequential folds for the window-family operators
  * whose recurrences cannot be expressed as Spark windows (ewm).
  *
  * The declarative formulation (`aggregate` over the collected row
  * array, appending each output with `concat(outs, array(y))`) is
  * semantically exact but costs O(n²) per key — every step copies the
  * accumulated output array — and runs interpreted lambda calls per
  * element. These expressions produce the SAME values in one O(n)
  * pass: the state recurrence below is the declarative fold's
  * arithmetic operation-for-operation (each IEEE `+ − × ÷` in the
  * same order on the same operands), so results are bit-identical and
  * the DuckDB oracle replay ([[graft.operators.Ewm.meanSql]]) is
  * unchanged. EwmSpec pins the equality against the declarative form.
  */

/** pandas-parity exponentially weighted mean over one key's sorted
  * row array: input `array<struct<ord, value:double>>` (value at
  * field ordinal 1), output `array<double>` — element i is the ewm
  * mean after row i (null until the first non-null value arrives).
  * See [[graft.operators.Ewm.mean]] for the recurrence contract.
  */
case class EwmMeanFold(child: Expression, alpha: Double, adjust: Boolean,
    ignoreNa: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
        if s.length >= 2 && s(1).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"EwmMeanFold needs array<struct<ord, value:double>>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  private val f = 1.0 - alpha
  private val nw = if (adjust) 1.0 else alpha
  // child.dataType is only legal once resolved — defer (withNewChild
  // copies run on the unresolved tree during analysis)
  private lazy val nFields = child.dataType match {
    case ArrayType(s: StructType, _) => s.length
    case _ => 2
  }

  /** Shared by eval and the generated code (called via reference). */
  def fold(rows: ArrayData): ArrayData = {
    val n = rows.numElements()
    val out = new Array[Any](n)
    var y = 0.0
    var yNull = true
    var w = 0.0
    var i = 0
    while (i < n) {
      val s = rows.getStruct(i, nFields)
      val curNull = s.isNullAt(1)
      val cur = if (curNull) 0.0 else s.getDouble(1)
      if (yNull) {
        // no mean yet: seed on the first non-null value
        if (!curNull) { y = cur; yNull = false; w = 1.0 } else w = 0.0
      } else {
        // one decay step per row (absolute positions) or per value
        // (relative positions, ignore_na)
        val w1 = if (!curNull || !ignoreNa) w * f else w
        if (!curNull) {
          // pandas skips the no-op blend; Spark's `===` calls NaN
          // equal to NaN, where Java's == does not — both routes
          // yield NaN there, so values agree on every input
          y = if (cur == y) y else (w1 * y + nw * cur) / (w1 + nw)
          w = if (adjust) w1 + nw else 1.0
        } else w = w1
      }
      out(i) = if (yNull) null else java.lang.Double.valueOf(y)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    fold(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("ewmMeanFold", this,
        classOf[EwmMeanFold].getName)
      s"${ev.value} = $self.fold($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): EwmMeanFold =
    copy(child = newChild)
}

/** Column-level entry points for the fold expressions. */
object FoldExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def ewmMeanFold(rows: Column, alpha: Double, adjust: Boolean,
      ignoreNa: Boolean): Column =
    ExpressionUtils.column(EwmMeanFold(ExpressionUtils.expression(rows),
      alpha, adjust, ignoreNa))
}
