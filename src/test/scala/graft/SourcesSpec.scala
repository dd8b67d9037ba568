package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink layer: formats round-trip, partitioned layout prunes,
  * and bucketed tables join without a shuffle (the co-located-join
  * lever from DESIGN.md).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("csv and json round-trip with explicit schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val csv = Tables.readCsv(spark, s"$dir/csv",
      schema = Some("id LONG, s STRING, v DOUBLE"))
    val json = Tables.readJson(spark, s"$dir/json",
      schema = Some("id LONG, s STRING, v DOUBLE"))
    assert(csv.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    assert(json.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("orc round-trips and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "v")
    Tables.writeOrc(df, s"$dir/orc")
    val back = Tables.readOrc(spark, s"$dir/orc")
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
    val plan = back.filter(col("id") > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"),
      s"filter not pushed to orc scan:\n$plan")
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq((1, "x"), (2, "y"), (3, "x")).toDF("id", "part")
    Tables.writePartitioned(df, s"$dir/t", Seq("part"))
    val back = Tables.readParquet(spark, s"$dir/t").filter(col("part") === "x")
    assert(back.count() === 2)
    // pruned scan: only the part=x directory is listed in the plan
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("part=y"))
  }

  test("bucketed tables aggregate and join without a shuffle") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // the metastore is per-JVM but the warehouse dir persists: clear
    // both the table entries and any stale locations
    for (t <- Seq("graft_bucketed_a", "graft_bucketed_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val b = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    Tables.writeBucketed(a, "graft_bucketed_a", Seq("k"), 4, sortCols = Seq("k"))
    Tables.writeBucketed(b, "graft_bucketed_b", Seq("k"), 4, sortCols = Seq("k"))
    val ta = spark.table("graft_bucketed_a")
    val tb = spark.table("graft_bucketed_b")

    // aggregation on the bucket key: no Exchange in the plan
    val agg = ta.groupBy("k").agg(sum("v"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "bucketed aggregation should not shuffle")

    // equijoin on the bucket key: no shuffle on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ta.join(tb, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join should not shuffle")
      assert(joined.count() === 1000)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
