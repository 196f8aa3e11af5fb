package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * SQL-expressible relational operators from SURVEY.md §2 (filters,
 * aggregations, joins, top-k, set ops — the reference's monitoring/search
 * query surface, `app/api/monitoring.py` / `app/api/bugs.py`), exercised
 * over the driver's TPC-H-ish tables and cross-checked against DuckDB.
 *
 * Hash-stability rules (the driver compares value hashes):
 *  - money sums go through decimal(18,2) casts — exact in both engines;
 *  - ratios/averages are computed as exact decimal sums cast to double,
 *    divided, then rounded — deterministic on both sides;
 *  - every top-k has a total tie-break on a unique key.
 */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val dec = "decimal(18,2)"

  /** A1/A5-style full-scan aggregation (TPC-H Q1 shape). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("decimal(28,4)")).cast("double").as("revenue"),
        count(lit(1)).as("cnt"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_price,
      |  cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2))) AS decimal(28,4))) AS double) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** F2/F8/F9-style predicate + projection (parquet pushdown target). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast(dec).cast("double").as("price"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, cast(cast(l_extendedprice AS decimal(18,2)) AS double) AS price
      |FROM lineitem
      |WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** 3-way join + group + top-k (TPC-H Q3 shape; JN2 top-parents analog). */
  def q03TopRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum((col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey,
      |  cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2))) AS decimal(28,4))) AS double) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Small-dimension broadcast join chain (A3 group-by-region analog). */
  def q04RegionSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val n = broadcast(t(spark, dir, "nation"))
    val r = broadcast(t(spark, dir, "region"))
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("suppliers"),
        round(sum(col("s_acctbal").cast(dec)).cast("double") / count(lit(1)), 3).as("avg_bal"))
  }

  val q04Sql: String =
    """SELECT r_name, count(*) AS suppliers,
      |  round(cast(sum(cast(s_acctbal AS decimal(18,2))) AS double) / count(*), 3) AS avg_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** T1 per-group top-k via window (the reference's sort+slice per query). */
  def q05TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("event_type"), col("event_id"), col("rank"))
  }

  val q05Sql: String =
    """SELECT event_type, event_id, rank FROM (
      |  SELECT event_type, event_id,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
      |  FROM events) WHERE rank <= 3""".stripMargin

  /** A3 group-by + avg (monitoring by-region analog). */
  def q06MarketSegments(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customers"),
        round(sum(col("c_acctbal").cast(dec)).cast("double") / count(lit(1)), 3).as("avg_bal"))

  val q06Sql: String =
    """SELECT c_mktsegment, count(*) AS customers,
      |  round(cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(*), 3) AS avg_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** A4 time bucketing (daily timeline, `monitoring.py:189-213`). */
  def q07DailyEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))

  val q07Sql: String =
    """SELECT cast(ts AS date) AS day, count(*) AS events,
      |  cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM events GROUP BY cast(ts AS date)""".stripMargin

  /** A6 histogram / range buckets (`monitoring.py:293-300`). */
  def q08ValueHistogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("bucket",
        when(col("value") < 20, "p0_20")
          .when(col("value") < 50, "p20_50")
          .when(col("value") < 100, "p50_100")
          .otherwise("p100_plus"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))

  val q08Sql: String =
    """SELECT CASE WHEN value < 20 THEN 'p0_20' WHEN value < 50 THEN 'p20_50'
      |            WHEN value < 100 THEN 'p50_100' ELSE 'p100_plus' END AS bucket,
      |  count(*) AS cnt, cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  /** A4 variant: yearly grouping on a second time column. */
  def q09PriorityTimeline(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("orders"))

  val q09Sql: String =
    """SELECT year(o_orderdate) AS yr, o_orderpriority, count(*) AS orders
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** JN2 top-parents-by-duplicate-count analog (`monitoring.py:73-86`). */
  def q10TopCustomers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("orders"))
      .orderBy(col("orders").desc, col("o_custkey").asc)
      .limit(10)

  val q10Sql: String =
    """SELECT o_custkey, count(*) AS orders FROM orders
      |GROUP BY o_custkey ORDER BY orders DESC, o_custkey ASC LIMIT 10""".stripMargin

  /** F7 ILIKE text search (`app/api/bugs.py:440-447`). */
  def q11LikeSearch(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(lower(col("text")).contains("spark"))
      .select(col("doc_id"), col("lang"), col("source"))

  val q11Sql: String =
    "SELECT doc_id, lang, source FROM documents WHERE lower(text) LIKE '%spark%'"

  /** A2 prevention-rate-style scalar aggregate (`monitoring.py:41-44`). */
  def q12StatusRate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .agg(count(lit(1)).as("total"),
        count(when(col("o_orderstatus") === "F", 1)).as("fulfilled"),
        round(count(when(col("o_orderstatus") === "F", 1)).cast("double") * 100.0 /
          count(lit(1)), 4).as("fulfilled_pct"))

  val q12Sql: String =
    """SELECT count(*) AS total,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled,
      |  round(cast(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS double) * 100.0 / count(*), 4) AS fulfilled_pct
      |FROM orders""".stripMargin

  /** Anti join: rows with no match (graft singleton detection, SURVEY §2.7).
    * Restricted to year-2000 orders so the result is non-trivial. */
  def q13CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").where(year(col("o_orderdate")) === 2000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  val q13Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND year(o_orderdate) = 2000)""".stripMargin

  /** Semi join: EXISTS (reference "has duplicates" filters). */
  def q14ActiveCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").where(year(col("o_orderdate")) === 1997)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_nationkey"))
  }

  val q14Sql: String =
    """SELECT c_custkey, c_nationkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND year(o_orderdate) = 1997)""".stripMargin

  /** A9 recurring-pattern detection (>= k events per key,
    * `duplicate_detector.py:315-347`). */
  def q15RecurringCustomers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("orders"))
      .where(col("orders") >= 20)
      .withColumn("tag", lit("Recurring"))

  val q15Sql: String =
    """SELECT o_custkey, count(*) AS orders, 'Recurring' AS tag FROM orders
      |GROUP BY o_custkey HAVING count(*) >= 20""".stripMargin

  /** T2 pagination: page 2 of the price-ranked orders (offset + limit with
    * a total tie-break so pages are deterministic). */
  def q35Pagination(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast(dec).cast("double").as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .offset(10)
      .limit(10)

  val q35Sql: String =
    """SELECT o_orderkey, cast(cast(o_totalprice AS decimal(18,2)) AS double) AS price
      |FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10 OFFSET 10""".stripMargin
}
