package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Generic single-gate probe: runs ONLY the named SparkEntry queries
  * under Verify's exact session config and dumps their results +
  * oracle_sql.json, so `tools/check_oracle.py` can replay a new gate
  * row in seconds instead of re-running all ~170. Run:
  * `sbt "Test/runMain graft.GateProbe /root/testdata/sf0.01 /tmp/probe q1 q2 ..."`
  * (supersedes the one-off PcaOracleProbe pattern).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    require(names.nonEmpty, "pass at least one gate query name")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown gate queries: $unknown")
    SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(s"[probe] wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
