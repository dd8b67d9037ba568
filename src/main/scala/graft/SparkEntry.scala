package graft

import graft.operators.{AggSpec, GroupBy, Margins}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2.
  *
  * Determinism policy (so Spark parquet output hash-matches the
  * DuckDB oracle bit-for-bit regardless of partitioning):
  *   - floating sums/means go through exact decimal accumulation on
  *     BOTH sides (`graft.functions.Num` ⇔ `CAST(SUM(CAST(x AS
  *     DECIMAL(28,6))) AS DOUBLE)`),
  *   - results are explicitly ordered by a unique key,
  *   - algorithm-dependent aggregates (var/std) are rounded on both
  *     sides.
  */
object SparkEntry {

  // ------------------------------------------------------------ helpers

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def liKeys = Seq(col("l_returnflag"), col("l_linestatus"))
  private def shipMask: Column =
    col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00"))

  /** Unique physical-order surrogate for lineitem (SURVEY §7.4: Spark
    * has no implicit row order, so positional ops key on this).
    */
  private def liOrd: Column = col("l_orderkey") * 10 + col("l_linenumber")

  /** SQL-side twin of Num.exactSum. */
  private def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  private def dmean(x: String): String = s"${dsum(x)} / COUNT($x)"

  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String])

  // ------------------------------------------------------------ queries

  private def all: Seq[Q] = coreAgg

  private def coreAgg: Seq[Q] = Seq(
    Q("q1_agg",
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        new GroupBy(li, liKeys).aggregate(
          Seq(
            AggSpec("sum", col("l_quantity"), "sum_qty", exact = true),
            AggSpec("sum", col("l_extendedprice"), "sum_base_price", exact = true),
            AggSpec("sum", col("l_extendedprice") * (lit(1) - col("l_discount")),
              "sum_disc_price", exact = true),
            AggSpec("mean", col("l_discount"), "avg_disc", exact = true),
            AggSpec("size", lit(1), "count_order")),
          mask = Some(shipMask))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty,
        | ${dsum("l_extendedprice")} AS sum_base_price,
        | ${dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        | ${dmean("l_discount")} AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("gb_size",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).size(),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS size
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_count_masked",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(
        Seq(AggSpec("count", col("l_quantity"), "n")),
        mask = Some(col("l_discount") > 0.02)),
      Some("""SELECT l_returnflag, l_linestatus,
        | COUNT(CASE WHEN l_discount > 0.02 THEN l_quantity END) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_sum",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).sum(
        Seq(col("l_quantity").as("sum_qty"), col("l_extendedprice").as("sum_price")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty, ${dsum("l_extendedprice")} AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_mean",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).mean(
        Seq(col("l_quantity").as("avg_qty"), col("l_discount").as("avg_disc")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dmean("l_quantity")} AS avg_qty, ${dmean("l_discount")} AS avg_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_minmax",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
        AggSpec("min", col("l_extendedprice"), "min_price"),
        AggSpec("max", col("l_extendedprice"), "max_price"),
        AggSpec("min", col("l_shipdate"), "min_ship"),
        AggSpec("max", col("l_shipdate"), "max_ship"))),
      Some("""SELECT l_returnflag, l_linestatus,
        | MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        | MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_median",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).median(
        Seq(col("l_quantity").as("med_qty"), col("l_extendedprice").as("med_price"))),
      Some("""SELECT l_returnflag, l_linestatus,
        | MEDIAN(l_quantity) AS med_qty, MEDIAN(l_extendedprice) AS med_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_var_std",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("var", col("l_quantity"), "v1"),
          AggSpec("std", col("l_quantity"), "s1"),
          AggSpec("var", col("l_quantity"), "v0", ddof = 0),
          AggSpec("var", col("l_quantity"), "v2", ddof = 2)))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("v1"), 4).as("var_qty"), round(col("s1"), 4).as("std_qty"),
          round(col("v0"), 4).as("varp_qty"), round(col("v2"), 4).as("var2_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
        | ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        | ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
        | ROUND(VAR_POP(l_quantity), 4) AS varp_qty,
        | ROUND((SUM(l_quantity*l_quantity) - SUM(l_quantity)*SUM(l_quantity)/COUNT(l_quantity))
        |       / (COUNT(l_quantity) - 2), 4) AS var2_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_first_last",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is not unique in the synthetic data,
        // so the order key ties; tie-break by the value itself to keep
        // first/last deterministic on both engines.
        val ordV = struct(liOrd.as("o"), col("l_extendedprice").as("v"))
        new GroupBy(T(s, dir, "lineitem"), liKeys).aggregate(Seq(
          AggSpec("first", col("l_extendedprice"), "first_price", ord = Some(ordV)),
          AggSpec("last", col("l_extendedprice"), "last_price", ord = Some(ordV))))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        | (MIN(CASE WHEN l_extendedprice IS NOT NULL THEN
        |   struct_pack(o := l_orderkey*10 + l_linenumber, v := l_extendedprice) END)).v AS first_price,
        | (MAX(CASE WHEN l_extendedprice IS NOT NULL THEN
        |   struct_pack(o := l_orderkey*10 + l_linenumber, v := l_extendedprice) END)).v AS last_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_agg_zip",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).agg(
        Seq("sum", "mean", "max"),
        Seq(col("l_quantity").as("sum_qty"), col("l_extendedprice").as("avg_price"),
          col("l_discount").as("max_disc")),
        exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty, ${dmean("l_extendedprice")} AS avg_price,
        | MAX(l_discount) AS max_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_ratio",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).ratio(
        col("l_extendedprice") * col("l_discount"), col("l_extendedprice"),
        name = "disc_ratio", exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_extendedprice * l_discount")} / ${dsum("l_extendedprice")} AS disc_ratio
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_subset_ratio",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).subsetRatio(
        col("l_quantity"), col("l_discount") > 0.05,
        globalMask = Some(shipMask), exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("CASE WHEN l_discount > 0.05 AND l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' THEN l_quantity END")}
        |   / ${dsum("CASE WHEN l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' THEN l_quantity END")}
        |   AS subset_ratio
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_density",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).density(
        col("l_extendedprice"), exact = true),
      Some(s"""SELECT l_returnflag, l_linestatus,
        | ${dsum("l_extendedprice")}
        |   / CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))) OVER () AS DOUBLE)
        |   * 100 AS density
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("gb_sum_margins",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys).sum(
        Seq(col("l_quantity").as("sum_qty")), margins = Margins.All, exact = true),
      Some(s"""SELECT
        | CASE WHEN GROUPING(l_returnflag) = 1 THEN 'All' ELSE l_returnflag END AS l_returnflag,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'All' ELSE l_linestatus END AS l_linestatus,
        | ${dsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), (l_returnflag), ())
        |ORDER BY 1, 2""".stripMargin)),

    Q("gb_transform_sum",
      (s, dir) => new GroupBy(T(s, dir, "lineitem"), liKeys)
        .sum(Seq(col("l_quantity").as("qty_total")), transform = true, exact = true)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("qty_total"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
        |   OVER (PARTITION BY l_returnflag, l_linestatus) AS DOUBLE) AS qty_total
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("gb_value_counts",
      (s, dir) => GroupBy.valueCounts(T(s, dir, "orders"), col("o_orderpriority"),
        normalize = true),
      Some("""SELECT o_orderpriority,
        | CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE) AS proportion
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("gb_key_count",
      (s, dir) => new GroupBy(T(s, dir, "orders"), Seq(col("o_orderstatus")))
        .keyCount(),
      Some("""SELECT o_orderstatus, COUNT(*) AS key_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("gb_groups",
      (s, dir) => new GroupBy(T(s, dir, "orders"), Seq(col("o_orderstatus")))
        .groupsOf(col("o_orderkey")).orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
        | LIST(o_orderkey ORDER BY o_orderkey) AS row_ids
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  // ----------------------------------------------------------- contract

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
