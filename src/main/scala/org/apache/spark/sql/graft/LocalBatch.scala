// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the Column/LogicalPlan bridge (Dataset.ofRows,
// LocalRelation) is private[sql] surface.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** Driver-local DataFrame over ALREADY-COLLECTED internal rows.
  *
  * Why this exists (round-15, Pq query batches): an operator that
  * collects a bounded input once (`executeCollect`) and then ALSO
  * references the same input as a DataFrame in its output plan makes
  * Spark execute the input's plan twice — once for the collect, once
  * at execution — which both doubles the work and, for a
  * nondeterministic input plan (sample, rand-derived ids), lets the
  * two executions disagree (round-14 advice item). Re-wrapping the
  * collected rows as a `LocalRelation` makes every later consumer —
  * including broadcasts — read the one collected batch: same rows by
  * construction, zero extra jobs (a broadcast over a LocalRelation
  * materializes driver-side without submitting a stage).
  */
object LocalBatch {

  /** Wrap `rows` (internal representation, matching `schema`) as a
    * DataFrame backed by a `LocalRelation`. Rows are compacted into
    * fresh UnsafeRows so no caller-side buffer reuse can alias them.
    */
  def of(spark: SparkSession, schema: StructType,
      rows: Seq[Array[Any]]): DataFrame = {
    val proj = UnsafeProjection.create(schema)
    val data: Seq[InternalRow] =
      rows.map(vals => proj(new GenericInternalRow(vals)).copy())
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(schema).toSeq,
        data))
  }
}
