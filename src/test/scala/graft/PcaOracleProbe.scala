package graft

import graft.operators.Pca
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scratch harness for the PCA gate rows: dumps the engine-side fit
  * and projection results plus the generated oracle SQL so
  * tools/check_oracle-style local DuckDB replay can be diffed before
  * the gate declaration lands. Run:
  * `sbt "Test/runMain graft.PcaOracleProbe /root/testdata/sf0.001 /tmp/pca_probe"`.
  */
object PcaOracleProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (k, iters, dim) = (2, 8, 64)
    val m = Pca.fit(embs, col("embedding"), k = k, iters = iters, dim = Some(dim))
    import spark.implicits._
    val fitDf = m.components.zipWithIndex.flatMap { case (c, ci) =>
      c.zipWithIndex.map { case (l, i) => (ci, i, l, m.eigenvalues(ci)) }
    }.toDF("component", "i", "loading", "eigenvalue")
      .orderBy(col("component"), col("i"))
    fitDf.coalesce(1).write.mode("overwrite").parquet(s"$outDir/pca_fit")
    Pca.project(embs, col("embedding"), m)
      .select(col("vec_id").as("rid"), col("pc0"), col("pc1"))
      .orderBy(col("rid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/pca_project")
    val corpusSql = "SELECT vec_id AS rid, embedding AS v FROM embeddings"
    Files.writeString(Paths.get(s"$outDir/fit.sql"),
      Pca.fitSql(corpusSql, dim, k, iters))
    Files.writeString(Paths.get(s"$outDir/project.sql"),
      Pca.projectSql(corpusSql, dim, k, iters))
    spark.stop()
  }
}
