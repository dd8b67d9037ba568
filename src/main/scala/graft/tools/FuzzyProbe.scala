package graft.tools

import graft.operators.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the fuzzyJoin q-gram path (round-9 perf work;
  * deleted once the hybrid lands).
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1000000L
    }
    val p = spark.read.parquet(s"$sfDir/part.parquet").persist()
    p.count()
    val l = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
    val r = p.select((col("p_partkey") + 1000000L).as("id"),
      concat(substring(col("p_name"), 1, 4), lit("x"),
        substring(col("p_name"), 6, 100000)).as("name"))
    def qj = Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"),
      col("name"), maxDist = 1)
    def pj = Joins.fuzzyJoin(l, col("id"), col("name"), r, col("id"),
      col("name"), maxDist = 1, qgramFilter = false)
    println(s"[probe] parts=${p.count()}")
    println(s"[probe] qgram warm=${force(qj)}ms")
    println(s"[probe] qgram t1=${force(qj)}ms t2=${force(qj)}ms")
    println(s"[probe] plain warm=${force(pj)}ms")
    println(s"[probe] plain t1=${force(pj)}ms t2=${force(pj)}ms")
    println(s"[probe] out rows qgram=${qj.count()} plain=${pj.count()}")
    spark.stop()
  }
}
