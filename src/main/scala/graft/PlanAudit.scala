package graft

import graft.operators.{Dedup, GroupBy, Margins, Reshape}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints `explain("formatted")` for representative operator plans so
  * scale properties can be eyeballed per change: column pruning
  * (`ReadSchema`), predicate pushdown (`PushedFilters`), broadcast vs
  * shuffle joins, and the absence of single-partition exchanges.
  * Usage: `sbt "runMain graft.PlanAudit /root/testdata/sf0.001"`.
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val liKeys = Seq(col("l_returnflag"), col("l_linestatus"))

    def show(name: String)(planOf: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      planOf.explain("formatted")
    }

    show("masked grouped agg (q1 shape)") {
      new GroupBy(li, liKeys).sum(Seq(col("l_quantity").as("sum_qty")),
        mask = Some(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")))
    }
    show("density single-key (broadcast grand total)") {
      new GroupBy(li, Seq(col("l_returnflag"))).density(col("l_extendedprice"))
    }
    show("density two-level (level-0 partitioned window)") {
      new GroupBy(li, liKeys).density(col("l_extendedprice"))
    }
    show("valueCounts normalize (broadcast total)") {
      GroupBy.valueCounts(orders, col("o_orderpriority"), normalize = true)
    }
    show("crosstab margins single-pass (count-like)") {
      Reshape.crosstab(orders, Seq(col("o_orderstatus")),
        col("o_orderpriority"), margins = Margins.All, fillZero = true)
    }
    show("approx nunique (HLL partial/final, no distinct expand)") {
      new GroupBy(li, liKeys).nuniqueApprox(Seq(col("l_partkey")))
    }
    show("ngram jaccard with hot-shingle cap (co-partitioned df filter)") {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        maxDocFreq = Some(100))
    }
    show("minhash LSH banding (shuffle on (band, slice-array) key)") {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      Dedup.minHashPairs(docs, col("doc_id"), col("text"))
    }
    show("brute-force ANN (native cosine expr — scoring inside codegen)") {
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      graft.operators.Similarity.bruteForceTopK(embs,
        embs.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), 5)
    }
    show("embedding pairs, default LSH bucketing (bucket equijoin, no cross)") {
      val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      Dedup.embeddingPairs(embs, col("vec_id"), col("embedding"),
        threshold = 0.4)
    }
    show("asof sliceWidth (windows on (key, slice); summary-sized carry side)") {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          col("event_type"))
      graft.operators.Joins.asof(
        ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"), col("event_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value").as("p_value")),
        Seq("user_id"), "ts", "ts", rightVals = Seq("p_value" -> "p_value"),
        sliceWidth = Some(21600000000000L))
    }
    show("rolling sliceWidth (per-slice tails; no full-key window anywhere)") {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      new graft.operators.RollingOps(new GroupBy(ev, Seq(col("user_id"))))
        .rollingSum(col("value"), col("ts"), 50, minPeriods = Some(1),
          sliceWidth = Some(21600000000000L))
    }
    show("cumsum sliceWidth (one injected prefix row per slice)") {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      new graft.operators.RollingOps(new GroupBy(ev, Seq(col("user_id"))))
        .cumsum(col("value"), col("ts"), exact = true,
          sliceWidth = Some(21600000000000L))
    }
    spark.stop()
  }
}
