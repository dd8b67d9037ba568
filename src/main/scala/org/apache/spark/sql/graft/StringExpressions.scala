// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] pieces of the extension surface (classic.ExpressionUtils
// for the Column <-> Expression bridge) — the standard packaging for
// native Catalyst expression libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[DeletionHashes]] — static so both the
  * interpreted eval and the generated code call the same body.
  */
object DeletionHashUtil {
  // FNV-64 prime as the polynomial base; the final murmur3 fmix64
  // avalanche breaks the algebraic structure so banding/bucketing
  // downstream sees uniform bits
  private final val B = 1099511628211L

  @inline private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** 64-bit hashes of {key} ∪ {key with one code point deleted},
    * mixed with the block-prefix hash — identity first, then the
    * deletion at each position in order.
    *
    * One O(n) pass instead of materializing n strings of length n-1:
    * with H(x) = Σ x(k)·B^(m-1-k), the deletion at i factors into a
    * left-fold prefix value and a positional-power suffix sum,
    * H(del_i) = V(i)·B^(n-1-i) + S(i+1) — so a length-n key costs
    * ~4n long ops and ZERO string allocation (the old expression-tree
    * form built n substring concats per key: measured ~14 CPU-seconds
    * and gigabytes of char churn per 8.6M variants, the GC driver of
    * the x30 recording's variance).
    *
    * Equality semantics match string equality of the variants exactly,
    * modulo 64-bit collisions — which the caller's verification plus
    * structural prefix re-check make additive-only, never lossy.
    * Deletions are per CODE POINT, the unit `levenshtein` counts, so
    * the maxDist ≤ 1 completeness argument holds beyond the BMP.
    */
  def hashes(key: UTF8String, pfx: UTF8String): ArrayData = {
    val cps = key.toString.codePoints().toArray
    val n = cps.length
    val pfxH = fmix(pfx.hashCode().toLong * B + 0x9e3779b97f4a7c15L)
    // pow(k) = B^k; suf(i) = Σ_{j>=i} cp(j)·B^(n-1-j) — absolute
    // exponents, so suf(i+1) drops into the deleted-string hash as-is
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var k = 1
    while (k <= n) { pow(k) = pow(k - 1) * B; k += 1 }
    val suf = new Array[Long](n + 1)
    var j = n - 1
    while (j >= 0) { suf(j) = cps(j) * pow(n - 1 - j) + suf(j + 1); j -= 1 }
    val out = new Array[Long](n + 1)
    out(0) = fmix(suf(0) ^ pfxH) // identity: H of the full key
    var v = 0L                   // left fold: V(i) = Σ_{j<i} cp(j)·B^(i-1-j)
    var i = 0
    while (i < n) {
      out(i + 1) = fmix((v * pow(n - 1 - i) + suf(i + 1)) ^ pfxH)
      v = v * B + cps(i)
      i += 1
    }
    // primitive-array form: GenericArrayData(Array[Long]) boxes every
    // element — hundreds of millions of Long objects at 30× — while
    // the unsafe form is one flat allocation the explode reads as-is
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `DeletionHashes(key, pfx)` → `array<long>`: the deletion
  * neighborhood of `key` as 64-bit hashes (identity + one hash per
  * deleted code point), each mixed with the hash of `pfx` so the
  * block key rides inside the join key. The fuzzyJoin deletion path's
  * per-unit kernel — see [[DeletionHashUtil.hashes]] for the O(n)
  * formulation and the collision-safety argument.
  */
case class DeletionHashes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_hashes"

  override protected def nullSafeEval(k: Any, p: Any): Any =
    DeletionHashUtil.hashes(k.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, p) =>
      s"${ev.value} = org.apache.spark.sql.graft.DeletionHashUtil.hashes($k, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeletionHashes =
    copy(left = newLeft, right = newRight)
}

object StringExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def deletionHashes(key: Column, pfx: Column): Column =
    ExpressionUtils.column(
      DeletionHashes(ExpressionUtils.expression(key),
        ExpressionUtils.expression(pfx)))
}
