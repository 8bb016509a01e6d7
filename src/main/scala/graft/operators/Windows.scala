package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window functions (SURVEY.md §2.7 W1-W3). A window spec shuffles once on
  * its partition key and sorts within partitions — the same shape at 100 TB
  * as long as a single partition key's rows fit an executor (customer/user
  * keys here are high-cardinality and unskewed).
  *
  * Oracle notes: every ORDER BY inside a window carries a unique tie-break
  * key so both engines see one deterministic order; running sums over
  * doubles are then bit-identical (same sequential fold order).
  */
object Windows {

  /** W1 ranking: each customer's single largest order. */
  def topOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("top_total"))
      .orderBy(col("o_custkey"))
  }

  def topOrderPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_total
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** W2 analytic lag: mean inter-event gap per event type. Timestamps are
    * compared at whole-second precision (unix epoch) because the parquet
    * files carry ns timestamps that Spark truncates to µs while DuckDB
    * keeps ns (FIXTURES.md §B). */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch"))
      .withColumn("gap", col("epoch") - lag(col("epoch"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap")), 4).as("avg_gap_sec"),
        max(col("gap")).as("max_gap_sec"))
      .orderBy(col("event_type"))
  }

  def interEventGapsSql: String =
    """WITH g AS (
      |  SELECT event_type,
      |    floor(epoch(ts))::BIGINT
      |      - lag(floor(epoch(ts))::BIGINT) OVER (
      |          PARTITION BY user_id ORDER BY event_id) AS gap
      |  FROM events
      |)
      |SELECT event_type, count(*) AS n_gaps,
      |  round(avg(gap), 4) AS avg_gap_sec, max(gap) AS max_gap_sec
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** W1+ distribution functions: ntile / percent_rank / cume_dist over
    * each customer's orders by price. The partition key is the
    * high-cardinality o_custkey (a low-cardinality key like priority
    * would sort corpus-sized partitions in single tasks at scale). With
    * the unique (price, orderkey) tie-break every rank is distinct, so
    * percent_rank = (i−1)/(n−1) and cume_dist = i/n are exact integer
    * ratios — bit-identical across engines (n=1 partitions define
    * percent_rank = 0 in both). */
  def orderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def orderDistributionSql: String =
    """SELECT o_custkey, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** W3 frame aggregation: per-customer running order total in date order.
    * Deterministic fold order via the (o_orderdate, o_orderkey) sort, so
    * the double running sum is bit-identical across engines. */
  def runningOrderTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def runningOrderTotalsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
}
