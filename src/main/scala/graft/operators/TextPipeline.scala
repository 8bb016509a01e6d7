package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Sentiment

/** The reference's end-to-end purpose as one batch operator
  * (SURVEY.md §3.1): language filter (F1, `streamer.py:48` languages=[lan])
  * + case-insensitive track match (F2, `streamer.py:48` track=[hashtag])
  * + sentiment enrichment (E1, `ProcessStreamData.py:21`) + the
  * sentiment-per-label analytics the reference's README promises but never
  * computes (SURVEY.md §2.5).
  *
  * Plan shape: parquet scan (lang filter + text/lang column pruning pushed
  * to the scan) → narrow codegen'd map → single hash aggregation on a
  * 4-value key. The only shuffle carries ≤4 rows per partition after
  * partial agg — this shape is flat-scalable to 100 TB.
  */
object TextPipeline {

  /** Rows of `documents` matching (lang, track) with sentiment attached. */
  def scored(spark: SparkSession, dir: String, lang: String, track: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang") === lit(lang) &&
        lower(col("text")).contains(track.toLowerCase))
      .withColumn("s", Sentiment.score(col("text")))

  /** Flagship: sentiment distribution for a (language, track term) pair. */
  def sentimentByLabel(spark: SparkSession, dir: String,
                       lang: String = "en", track: String = "spark"): DataFrame =
    scored(spark, dir, lang, track)
      .groupBy(col("s.label").as("sentiment"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("s.positive")), 6).as("avg_positive"),
        round(avg(col("s.negative")), 6).as("avg_negative"),
        round(avg(col("s.neutral")), 6).as("avg_neutral"),
        round(avg(col("s.mixed")), 6).as("avg_mixed"))
      .orderBy(col("sentiment"))

  /** EXT: per-hashtag sentiment analytics — the reference's headline
    * promise (README.md:2-4 "hashtag sentiment analysis"; `streamer.py:48`
    * track=[hashtag]) as a grouped table rather than one tracked term:
    * explode each document's distinct tags, count mentions, profile
    * sentiment, keep the global top-k by mention count.
    *
    * `tagPattern` defaults to `#\w+` (real tweet data); the synthetic
    * corpus carries no '#', and Twitter track semantics make the '#'
    * optional (F2), so callers on `documents` pass `\w+` — every token is
    * a candidate tag. Same plan either way.
    *
    * Plan shape at 100 TB: scan → narrow sentiment map (scored once per
    * doc, BEFORE the explode) → explode distinct tags (~tokens× rows, all
    * narrow) → hash agg on tag (partial agg collapses each partition to
    * its distinct-tag count, the shuffle carries tags not mentions) →
    * global top-k via TakeOrderedAndProject (per-partition top-k, k-row
    * merge — no full sort). Deterministic under ties: (n_docs DESC,
    * hashtag ASC) is a total order. */
  def hashtagSentiment(spark: SparkSession, dir: String,
                       tagPattern: String = "#\\w+", k: Int = 20): DataFrame =
    hashtagSentimentOf(Tables.documents(spark, dir), tagPattern, k)

  /** [[hashtagSentiment]] over any frame with a `text` column — the
    * injected-tag gate (q79) and user corpora enter here. */
  def hashtagSentimentOf(docs: DataFrame,
                         tagPattern: String = "#\\w+", k: Int = 20): DataFrame =
    docs
      .withColumn("s", Sentiment.score(col("text")))
      .select(col("s"), explode(array_distinct(
        regexp_extract_all(lower(col("text")), lit(tagPattern), lit(0))))
        .as("hashtag"))
      .groupBy("hashtag")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("s.label") === "POSITIVE", 1L).otherwise(0L)).as("n_positive"),
        sum(when(col("s.label") === "NEGATIVE", 1L).otherwise(0L)).as("n_negative"),
        round(avg(col("s.positive")), 6).as("avg_positive"),
        round(avg(col("s.negative")), 6).as("avg_negative"))
      .orderBy(col("n_docs").desc, col("hashtag"))
      .limit(k)

  /** Oracle-gated literal-`#` gate (q79): the reference's DEFAULT tag
    * semantics (`streamer.py:48` tracks `#hashtag` terms) need text that
    * actually carries `#` — the synthetic corpus is lowercase-alpha, so
    * q47 runs the `\w+` degenerate pattern and the `#\w+` extraction
    * branch had no green row of its own. Tags are injected IN-QUERY,
    * derived deterministically from doc_id (same device as q60's scrub
    * injection, `Curation.scrubAudit`), and BOTH engines extract with the
    * default `#\w+` pattern over the identical augmented text. Plan shape
    * is [[hashtagSentiment]]'s unchanged — the injection is a narrow
    * constant-folding-friendly concat before the sentiment map. */
  def hashtagSentimentTagged(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val d = col("doc_id")
    val injected = concat(
      col("text"),
      when(pmod(d, lit(2)) === 0,
        concat(lit(" #tag"), pmod(d, lit(7)).cast("string"))).otherwise(lit("")),
      when(pmod(d, lit(3)) === 0,
        concat(lit(" #topic"), pmod(d, lit(5)).cast("string"))).otherwise(lit("")),
      when(pmod(d, lit(5)) === 1, lit(" #spark")).otherwise(lit("")))
    hashtagSentimentOf(
      Tables.documents(spark, dir).select(injected.as("text")), "#\\w+", k)
  }

  /** DuckDB twin of [[hashtagSentimentTagged]]: same doc_id-derived tag
    * injection in an `aug` CTE, then the verbatim `#\w+` oracle. */
  def hashtagSentimentTaggedSql(k: Int = 20): String =
    // NOTE: '||' concatenations stay at line ENDS — the enclosing oracle
    // template applies .stripMargin to the whole interpolated SQL, and a
    // line-leading '||' would lose its first '|' as a margin marker
    hashtagSentimentSql("#\\w+", k, source =
      """(SELECT text ||
        | CASE WHEN doc_id % 2 = 0 THEN ' #tag' || (doc_id % 7)::VARCHAR ELSE '' END ||
        | CASE WHEN doc_id % 3 = 0 THEN ' #topic' || (doc_id % 5)::VARCHAR ELSE '' END ||
        | CASE WHEN doc_id % 5 = 1 THEN ' #spark' ELSE '' END AS text
        | FROM documents)""".stripMargin)

  /** DuckDB twin of [[hashtagSentiment]]. sum() cast ::BIGINT (HUGEINT
    * otherwise); tie-broken ORDER BY before LIMIT on both sides.
    * `source`: any FROM-able relation with a `text` column. */
  def hashtagSentimentSql(tagPattern: String = "#\\w+", k: Int = 20,
                          source: String = "documents"): String = {
    val pos = Sentiment.posSqlList
    val neg = Sentiment.negSqlList
    val pat = tagPattern.replace("'", "''")
    s"""WITH hits AS (
       |  SELECT lower(text) AS lt,
       |    len(list_filter(string_split(lower(text), ' '), t -> t IN ($pos)))::DOUBLE AS p,
       |    len(list_filter(string_split(lower(text), ' '), t -> t IN ($neg)))::DOUBLE AS n
       |  FROM $source
       |), lab AS (
       |  SELECT lt,
       |    CASE WHEN p > n THEN 'POSITIVE' WHEN n > p THEN 'NEGATIVE'
       |         WHEN p > 0 THEN 'MIXED' ELSE 'NEUTRAL' END AS label,
       |    (p - LEAST(p, n)) / (p + n + 1.0) AS positive,
       |    (n - LEAST(p, n)) / (p + n + 1.0) AS negative
       |  FROM hits
       |), tags AS (
       |  SELECT unnest(list_distinct(regexp_extract_all(lt, '$pat'))) AS hashtag,
       |         label, positive, negative
       |  FROM lab
       |)
       |SELECT hashtag, count(*)::BIGINT AS n_docs,
       |       sum(CASE WHEN label = 'POSITIVE' THEN 1 ELSE 0 END)::BIGINT AS n_positive,
       |       sum(CASE WHEN label = 'NEGATIVE' THEN 1 ELSE 0 END)::BIGINT AS n_negative,
       |       round(avg(positive), 6) AS avg_positive,
       |       round(avg(negative), 6) AS avg_negative
       |FROM tags GROUP BY hashtag
       |ORDER BY n_docs DESC, hashtag LIMIT $k""".stripMargin
  }

  /** DuckDB twin of [[sentimentByLabel]]; lexicon inlined from the single
    * Scala source of truth. */
  def sentimentByLabelSql(lang: String = "en", track: String = "spark"): String = {
    val pos = Sentiment.posSqlList
    val neg = Sentiment.negSqlList
    // mirror the Spark side's case-insensitive track match and keep the
    // literal SQL-safe (parity bug otherwise for non-lowercase/quoted terms)
    val trackLit = track.toLowerCase.replace("'", "''")
    val langLit = lang.replace("'", "''")
    s"""WITH hits AS (
       |  SELECT
       |    len(list_filter(string_split(lower(text), ' '), t -> t IN ($pos)))::DOUBLE AS p,
       |    len(list_filter(string_split(lower(text), ' '), t -> t IN ($neg)))::DOUBLE AS n
       |  FROM documents
       |  WHERE lang = '$langLit' AND contains(lower(text), '$trackLit')
       |), scored AS (
       |  SELECT
       |    CASE WHEN p > n THEN 'POSITIVE' WHEN n > p THEN 'NEGATIVE'
       |         WHEN p > 0 THEN 'MIXED' ELSE 'NEUTRAL' END AS sentiment,
       |    (p - LEAST(p, n)) / (p + n + 1.0) AS positive,
       |    (n - LEAST(p, n)) / (p + n + 1.0) AS negative,
       |    (1.0 + LEAST(p, n)) / (p + n + 1.0) AS neutral,
       |    LEAST(p, n) / (p + n + 1.0) AS mixed
       |  FROM hits
       |)
       |SELECT sentiment, count(*) AS n_docs,
       |       round(avg(positive), 6) AS avg_positive,
       |       round(avg(negative), 6) AS avg_negative,
       |       round(avg(neutral), 6) AS avg_neutral,
       |       round(avg(mixed), 6) AS avg_mixed
       |FROM scored GROUP BY sentiment ORDER BY sentiment""".stripMargin
  }
}
