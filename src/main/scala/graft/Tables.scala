package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet scans over the driver test tables (`TESTDATA.md`).
  *
  * Twin of the reference's sources (SURVEY.md §2.1): the push-based tweet
  * stream (`streamer.py:41-48`) is replayed here as columnar Parquet scans;
  * the streaming twin lives in [[graft.streaming.Pipeline]].
  *
  * Scale posture: a plain `spark.read.parquet` is the right 100 TB shape —
  * Catalyst pushes predicates into row-group pruning and prunes columns, so
  * every query below only pays for the columns/rows it touches. No caching,
  * no collect: the loaders stay lazy plan fragments.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and truncate to µs —
    * the same truncation Spark applies to ns inputs everywhere else.
    * DuckDB keeps full ns, so oracle queries compare at whole-second or
    * µs granularity (FIXTURES.md §B). */
  def events(s: SparkSession, d: String): DataFrame = {
    // Sessions.local sets this at build time; this runtime set is
    // defense-in-depth for user-supplied sessions (it mutates session
    // conf — direct spark.read.parquet of events needs the flag too)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
