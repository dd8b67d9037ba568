// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the expression uses the private[sql] pieces of
// the extension surface (ExpectsInputTypes, the codegen context) —
// the standard packaging for native Catalyst expression libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** True iff ANY element of a string-array column might be in `bloom`
  * (an [[org.apache.spark.util.sketch.BloomFilter]] built with
  * `df.stat.bloomFilter` — items are hashed over their UTF-8 bytes,
  * which `mightContainBinary` on the element's UTF8String bytes
  * replays exactly, no String allocation per element).
  *
  * The filter object rides into generated code via
  * `ctx.addReferenceObj`, so the membership loop runs INSIDE
  * WholeStageCodegen with one short-circuiting fused loop per row —
  * the probe stays a pure projection over the scan: no join, no
  * shuffle, and therefore identical on batch and streaming frames.
  * Null elements are skipped; a null array yields null; an empty
  * array yields false. One-sided error mirrors the sketch: may be
  * true for an absent element (false positive), never false for a
  * present one.
  */
case class BloomAnyContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
        bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // freshName: two probes in one codegen'd projection over
      // non-nullable children emit into a shared unbraced scope — a
      // fixed local name would collide and fail Janino compilation
      val found = ctx.freshName("found")
      s"""
         |final int $n = $arr.numElements();
         |boolean $found = false;
         |for (int $i = 0; $i < $n && !$found; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $found = $ref.mightContainBinary($arr.getUTF8String($i).getBytes());
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
}

/** Column-level entry point for the bloom probe. */
object BloomExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def bloomAnyContain(arr: Column, bloom: BloomFilter): Column =
    ExpressionUtils.column(
      BloomAnyContain(ExpressionUtils.expression(arr), bloom))
}
