package graft

import graft.operators.Pq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for the PQ production path (native
  * expressions) at bench shape — `sbt "Test/runMain graft.PqTimingProbe
  * /root/testdata/sf0.1"`.
  */
object PqTimingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    embs.count()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val model = Pq.fit(embs, col("vec_id"), col("embedding"),
        dim = 64, m = 8, ksub = 16, iters = 2)
      val t1 = System.nanoTime()
      val n = Pq.adcTopK(embs, embs.filter(col("vec_id") < 100),
        col("vec_id"), col("embedding"), 10, model).count()
      val t2 = System.nanoTime()
      println(f"[pqtime] round $round fit ${(t1 - t0) / 1e9}%.2f s, " +
        f"adc ${(t2 - t1) / 1e9}%.2f s, rows $n")
    }
    spark.stop()
  }
}
