package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Relational, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public surface: one named, parameterized
  * entry per implemented operator from SURVEY.md §2. `oracleSql` carries
  * the DuckDB twin for the driver's hash-match correctness gate; column
  * names/aliases are identical on both sides by construction.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 0) on sf0.001; driver smoke-checks
    * rows>0: language filter + track match + lexicon sentiment + grouped
    * counts — the reference's whole purpose as one Spark plan. */
  def entry(spark: SparkSession): DataFrame =
    TextPipeline.sentimentByLabel(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sentiment_track" -> ((s, d) => TextPipeline.sentimentByLabel(s, d)),
    "q02_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q03_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_sentiment_track" -> TextPipeline.sentimentByLabelSql(),
    "q02_pricing_summary" -> Relational.pricingSummarySql,
    "q03_revenue_by_nation" -> Relational.revenueByNationSql
  )
}
