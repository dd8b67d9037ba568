// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] pieces of the extension surface (AbstractDataType /
// TypeCollection for input-type checking, classic.ExpressionUtils for
// the Column <-> Expression bridge) — the standard packaging for
// native Catalyst expression libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the ANN scoring hot path.
  *
  * The declarative formulation (`aggregate`/`zip_with` higher-order
  * functions) is semantically right but executes interpreted lambda
  * calls per element and blocks whole-stage codegen around it — at
  * 100 TB the brute-force/LSH/IVF scoring loops are exactly where
  * that tax lands (corpus × dim multiply-adds). These expressions
  * compute the same values in one fused per-row loop with `doGenCode`,
  * staying inside WholeStageCodegen.
  *
  * Semantics mirror the HOF forms bit-for-bit: left-to-right double
  * accumulation, null result when the lengths differ (zip_with pads
  * with null, poisoning the fold) or any element is null, and — for
  * cosine — null on a zero norm (`Num.safeDiv`).
  */
abstract class VecFoldExpression extends BinaryExpression with ExpectsInputTypes {

  // DoubleType FIRST: an exact input type (float/double array) is
  // accepted as-is, but anything else (int/long/decimal arrays)
  // implicitly casts to the first member — double, which is lossless
  // for integers up to 2^53, where a float cast would silently round
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def getter(float: Boolean): String =
    if (float) "getFloat" else "getDouble"
}

/** Plain dot product Σ a(i)·b(i) (double accumulation). */
case class VecDot(left: Expression, right: Expression) extends VecFoldExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val (lf, rf) = (isFloat(left), isFloat(right))
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += get(x, i, lf) * get(y, i, rf)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (double) $a.${getter(isFloat(left))}($i) *
         |      (double) $b.${getter(isFloat(right))}($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity dot/(‖a‖·‖b‖) in ONE pass (three accumulators). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VecFoldExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val (lf, rf) = (isFloat(left), isFloat(right))
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = get(x, i, lf)
      val yi = get(y, i, rf)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val den = math.sqrt(nx) * math.sqrt(ny)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.${getter(isFloat(left))}($i);
         |    double $yi = (double) $b.${getter(isFloat(right))}($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    if ($den == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $den; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the vector expressions. */
object VectorExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
