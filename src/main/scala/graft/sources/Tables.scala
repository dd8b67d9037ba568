package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink layer. The reference has no I/O surface (data arrives
  * as in-memory arrays — SURVEY §2.9); Spark's readers/writers are the
  * free replacement. This module pins the scale-relevant conventions:
  *
  *   - columnar formats + pushdown by default (parquet/orc),
  *   - partitioned layout for coarse pruning (low-cardinality
  *     partition keys only — never a high-cardinality user/doc id),
  *   - bucketed tables for shuffle-free co-located joins and
  *     aggregations on hot keys — the persistent, cross-job form of
  *     `GroupBy.persisted`.
  */
object Tables {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = false,
      schema: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  def readJson(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC: the other pushdown-capable columnar format (predicate +
    * column pruning work as with parquet).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partition-pruned layout: one directory per value of
    * `partitionCols` — predicates on them never touch excluded files.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String],
      format: String = "parquet"): Unit =
    df.write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(partitionCols: _*).save(path)

  /** Bucketed managed table: rows are hash-distributed into `buckets`
    * files per partition by `bucketCols` and sorted within. Joins and
    * aggregations between tables bucketed on the same keys/count run
    * WITHOUT a shuffle — the disk-resident equivalent of reusing the
    * reference's factorization across queries.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
