package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI invariant for the correctness gate (round-2 verdict item 2).
  *
  * Round 2 shipped two gate queries that crashed at output-write time;
  * because the driver records a crashed query as ABSENT rather than
  * failed, the round still read as a clean sweep. This spec closes that
  * hole locally:
  *
  *   1. every declared query must have an oracle (so the declared set
  *      and the checked set cannot drift), and
  *   2. every declared query must actually run AND survive the parquet
  *      write path at sf0.001 — `write` is where duplicate/invalid
  *      column names explode, which `collect()`-based specs never see.
  */
class GateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every declared query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every declared query runs, has clean column names, and writes") {
    val base = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val cols = df.columns.toSeq
          require(cols == cols.distinct, s"duplicate columns: $cols")
          require(!cols.exists(_.startsWith("__graft")),
            s"internal column leaked: $cols")
          df.write.mode("overwrite").parquet(s"$base/$name")
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
