// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] pieces of the extension surface (classic.ExpressionUtils
// for the Column <-> Expression bridge) — the standard packaging for
// native Catalyst expression libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Shared kernel for [[HashFeatureBuckets]] — static so both the
  * interpreted eval and the generated code call the same body.
  */
object FeatureBucketUtil {
  private final val P = 2147483647L // PortableHash.P (Mersenne 2^31-1)
  private final val MaxLen = 64     // PortableHash.MaxLen

  /** Hashed token-n-gram feature buckets of `text` — bit-identical to
    * the expression-tree form it replaces
    * (`transform(concat(ngramArray*), g -> polyHash(g) % dim)`,
    * TextFunctions.scala), replayed natively in ONE pass:
    *
    *   - tokens: `split(text, " ")` semantics — literal single-space
    *     separator, Java limit −1: empty input → one empty token
    *     (bucket 0), interior/trailing empty tokens kept (probed,
    *     not assumed);
    *   - grams: for each width n, the `count − n + 1` windows of n
    *     consecutive tokens joined by a single space (none when the
    *     doc has fewer than n tokens), unigram widths emitting the
    *     tokens themselves — all widths in caller order, matching the
    *     `concat` of per-width arrays;
    *   - hash: the PortableHash Horner fold `(acc·31 + cp) % P` over
    *     the gram's first [[MaxLen]] CODE POINTS (Spark's `ascii`/
    *     `substr`/`length` are code-point-based — probed on
    *     surrogate-pair input), empty gram → 0, then `% dim`.
    *
    * The fold runs over the token array directly — the joining space
    * is hashed as code point 32 in stream — so a document costs one
    * split plus ~4 long ops per gram code point, with ZERO gram-
    * string allocation. The expression tree it replaces built every
    * gram string (slice + array_join), then re-walked it per
    * character with `substr(i, 1)` + `ascii` inside nested
    * higher-order functions — non-codegen, one single-char UTF8String
    * allocation per code point; measured 4.2 s of the quality_train
    * bench row's ~8 s at sf0.1 (the dominant term and, with its
    * allocation churn, the row's GC-variance driver).
    */
  def buckets(text: UTF8String, dim: Int, grams: Array[Int]): ArrayData = {
    val s = text.toString
    // Java limit -1 split: empty input -> [""] (one empty token that
    // hashes to bucket 0), interior/trailing empties kept — probed
    // equal to Spark's split() on all the spec's adversarial inputs
    val toks: Array[String] = s.split(" ", -1)
    val nT = toks.length
    var total = 0
    var gi = 0
    while (gi < grams.length) {
      val n = grams(gi)
      if (nT >= n) total += nT - n + 1
      gi += 1
    }
    val out = new Array[Long](total)
    var o = 0
    gi = 0
    while (gi < grams.length) {
      val n = grams(gi)
      var i = 0
      while (i + n <= nT) {
        out(o) = gramBucket(toks, i, n, dim)
        o += 1; i += 1
      }
      gi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** polyHash(toks(start..start+n-1) joined by " ") % dim, folding
    * code points in stream with the MaxLen cap counted over the
    * JOINED gram (separators included), exactly like `polyHash` of
    * the materialized gram string.
    */
  private def gramBucket(toks: Array[String], start: Int, n: Int,
      dim: Int): Long = {
    var h = 0L
    var budget = MaxLen
    var k = start
    while (k < start + n && budget > 0) {
      if (k > start) { h = (h * 31L + 32L) % P; budget -= 1 }
      val tk = toks(k)
      var ci = 0
      while (ci < tk.length && budget > 0) {
        val cp = tk.codePointAt(ci)
        h = (h * 31L + cp) % P
        ci += Character.charCount(cp)
        budget -= 1
      }
      k += 1
    }
    h % dim
  }
}

/** `HashFeatureBuckets(text)` → `array<long>`: hashing-trick feature
  * buckets (token n-grams → polyHash % dim) as a native codegen'd
  * expression — the featurization kernel behind the quality-model
  * train/score surface. `dim` and `grams` are literal parameters of
  * the operator, not data inputs. See [[FeatureBucketUtil.buckets]]
  * for the exact (probed) semantics contract with the expression
  * tree it replaces.
  */
case class HashFeatureBuckets(child: Expression, dim: Int, grams: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_feature_buckets"

  @transient private lazy val gramsArr: Array[Int] = grams.toArray

  override protected def nullSafeEval(t: Any): Any =
    FeatureBucketUtil.buckets(t.asInstanceOf[UTF8String], dim, gramsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gramsRef = ctx.addReferenceObj("grams", gramsArr, "int[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.FeatureBucketUtil" +
        s".buckets($t, $dim, $gramsRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashFeatureBuckets = copy(child = newChild)
}

object StringExpressions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def deletionHashes(key: Column, pfx: Column): Column =
    ExpressionUtils.column(
      DeletionHashes(ExpressionUtils.expression(key),
        ExpressionUtils.expression(pfx)))

  def hashFeatureBuckets(text: Column, dim: Int, grams: Seq[Int]): Column =
    ExpressionUtils.column(
      HashFeatureBuckets(ExpressionUtils.expression(text), dim, grams))
}
