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

/** Nearest-centroid argmax over a FIXED centroid matrix — the IVF /
  * SemDeDup assignment hot path as ONE native expression.
  *
  * The declarative form (`array_max` over an array of k
  * `named_struct(cos, cid)` entries, one [[CosineSimilarity]] each)
  * re-walks the vector k times through k independent expression
  * nodes; its generated code grows with k (codegen gives up past a
  * few dozen centroids and the plan falls back to interpreted
  * evaluation of a k·dim-node tree — measured superlinear on the
  * semdedup bench as the centroid count scales with the corpus).
  * Here the centroid matrix rides along as a REFERENCED object
  * (`addReferenceObj`, the [[BloomAnyContain]] pattern): one fused
  * loop, constant generated-code size in k.
  *
  * Semantics mirror the declarative argmax exactly: per-centroid
  * cosine with left-to-right double accumulation (‖c‖ precomputed
  * with the same summation order, so each score is bit-identical to
  * [[CosineSimilarity]]'s), ties prefer the LARGER cid (the
  * (cos, cid) struct-max rule), dimension mismatches, zero norms,
  * and NaN cosines (NaN vector components) score as null candidates,
  * and a vector with no scorable centroid — or a null vector —
  * yields null.
  */
case class NearestCentroid(child: Expression, cids: Array[Int],
    centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(cids.length == centroids.length && cids.nonEmpty,
    s"cids (${cids.length}) and centroids (${centroids.length}) must be " +
      "equal-length and non-empty")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ‖c‖ per centroid, summed left-to-right like the per-row loop. */
  @transient private lazy val norms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  /** Shared by eval and the generated code (called via reference). */
  def assign(x: ArrayData): Any = {
    val n = x.numElements()
    val float = isFloat
    var nx = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = if (float) x.getFloat(i).toDouble else x.getDouble(i)
      nx += xi * xi
      i += 1
    }
    val nxr = math.sqrt(nx)
    var bestCid = 0
    var bestCos = 0.0
    var found = false
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      if (c.length == n && norms(k) != 0.0 && nxr != 0.0) {
        var dot = 0.0
        var j = 0
        while (j < n) {
          val xj = if (float) x.getFloat(j).toDouble else x.getDouble(j)
          dot += xj * c(j)
          j += 1
        }
        val cos = dot / (nxr * norms(k))
        // struct-max tie rule: strictly greater cos, or equal cos
        // with a larger cid. NaN scores (NaN vector components) are
        // UNSCORABLE, not winners — without the explicit check the
        // !found branch would latch the first centroid with a NaN
        // cos, diverging from the exact path's filtered argmax
        // (round-7 advice item: both forms yield null for vectors
        // with no scorable centroid)
        if (!java.lang.Double.isNaN(cos) &&
            (!found || cos > bestCos || (cos == bestCos && cids(k) > bestCid))) {
          found = true; bestCos = cos; bestCid = cids(k)
        }
      }
      k += 1
    }
    if (found) bestCid else null
  }

  override protected def nullSafeEval(v: Any): Any =
    assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the whole argmax runs in the referenced expression instance —
      // generated code stays O(1) in the centroid count
      val self = ctx.addReferenceObj("nearestCentroid", this,
        classOf[NearestCentroid].getName)
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.assign($a);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $res).intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
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

  def nearestCentroid(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    ExpressionUtils.column(NearestCentroid(ExpressionUtils.expression(v),
      centroids.map(_._1).toArray, centroids.map(_._2.toArray).toArray))
}
