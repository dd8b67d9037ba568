package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Privacy screens for published/training corpora beyond the
  * regex-level PII redaction in
  * [[graft.functions.TextFunctions.redactPii]]: k-anonymity over
  * quasi-identifier columns (Sweeney 2002) — a row whose
  * quasi-identifier combination is shared by fewer than k rows is
  * re-identifiable by linkage and must be suppressed before the data
  * leaves the pipeline. No reference counterpart; designed
  * Spark-first.
  */
object Privacy {

  /** Suppress rare quasi-identifier combinations: rows whose
    * combination of `quasi` column values occurs fewer than `k` times
    * get those columns NULLED and `flag` = true; frequent rows pass
    * through with `flag` = false. Output keeps every row (suppression,
    * not deletion — volume-preserving, the variant that doesn't bias
    * downstream statistics). Null quasi values form their own
    * combination (SQL GROUP BY semantics, identically in the oracle).
    *
    * Distributed shape: one hash aggregation on the combination key
    * (map-side partial counts) and one equijoin back on a
    * materialized struct key — co-partitioned, AQE owns skew; a hot
    * combination is by definition frequent, never suppressed, and
    * costs one combiner per partition. The struct join key makes the
    * null-combination match without per-column null-safe predicates.
    */
  def suppressRare(df: DataFrame, quasi: Seq[Column], k: Long,
      flag: String = "suppressed"): DataFrame = {
    require(quasi.nonEmpty, "no quasi-identifier columns given")
    require(k >= 1, s"k must be >= 1, got $k")
    val names = df.select(quasi: _*).columns.toSeq
    require(names.distinct.size == names.size,
      s"duplicate quasi column names: $names — alias expressions with .as(...)")
    require(names.forall(df.columns.contains),
      s"quasi columns must exist on the input (alias-only expressions " +
        s"not supported): $names vs ${df.columns.toSeq}")
    require(!df.columns.contains(flag),
      s"flag column '$flag' already exists — pick another name")
    val qid = "__graft_qid"
    val cnt = "__graft_qn"
    val withKey = df.withColumn(qid, struct(names.map(col): _*))
    val counts = withKey.groupBy(col(qid)).agg(F.count(lit(1)).as(cnt))
    withKey.join(counts, Seq(qid))
      .withColumn(flag, col(cnt) < k)
      .select(df.columns.map { c =>
        if (names.contains(c))
          when(col(flag), lit(null).cast(df.schema(c).dataType))
            .otherwise(col(c)).as(c)
        else col(c)
      } :+ col(flag): _*)
  }
}
