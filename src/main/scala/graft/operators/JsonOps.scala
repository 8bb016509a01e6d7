package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** JSON parse/serialize and binary codec operators (SURVEY.md §2.3 P1-P5,
  * §2.4 E4): the reference's per-record data path — `json.loads` →
  * project → base64 decode/encode (`streamer.py:26-28`,
  * `ProcessStreamData.py:16-28`) — as columnar Spark expressions.
  *
  * Both are narrow per-row maps + one small agg; codegen'd end-to-end.
  */
object JsonOps {

  /** P1/E4: schema'd JSON extraction from `events.props` (`{"k": int}`),
    * aggregated per event type. Uses `from_json` with an explicit schema —
    * the declared-schema twin of the reference's schemaless `json.loads`
    * (`streamer.py:26`). */
  def propsExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  def propsExtractSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  sum(k)::BIGINT AS sum_k, round(avg(k), 4) AS avg_k,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |    json_extract_string(props, '$.k')::BIGINT AS k
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** P3/P4: base64 encode → decode round-trip over document text (the
    * reference's Firehose payload codec, `ProcessStreamData.py:16-28`),
    * verified in-plan: n_roundtrip_ok must equal n_docs. */
  def base64Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val b64 = base64(col("text").cast("binary"))
    val back = decode(unbase64(b64), "UTF-8")
    // Spark's base64 is the MIME encoder (CRLF every 76 chars); strip the
    // line breaks so the length matches DuckDB's unchunked base64.
    val b64flat = translate(b64, "\r\n", "")
    Tables.documents(spark, dir)
      .select(col("lang"), length(b64flat).cast("long").as("b64_len"),
        when(back === col("text"), 1L).otherwise(0L).as("ok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ok")).as("n_roundtrip_ok"),
        sum(col("b64_len")).as("total_b64_len"))
      .orderBy(col("lang"))
  }

  /** E7/E4: props parsed as a MAP column, exploded to (key, value) rows —
    * map_keys/explode coverage plus grouped stats per (event_type, key). */
  def propsMapStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        explode(from_json(col("props"), lit("map<string,bigint>")))
          .as(Seq("key", "value")))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"), col("key"))

  def propsMapStatsSql: String =
    """SELECT event_type, key, count(*) AS n,
      |  sum(v)::BIGINT AS sum_value, round(avg(v), 4) AS avg_value
      |FROM (
      |  SELECT event_type, unnest(json_keys(props)) AS key,
      |    json_extract_string(props, '$.' || unnest(json_keys(props)))::BIGINT AS v
      |  FROM events)
      |GROUP BY event_type, key
      |ORDER BY event_type, key""".stripMargin

  def base64RoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  sum(CASE WHEN from_base64(base64(text::BLOB))::VARCHAR = text
      |      THEN 1 ELSE 0 END)::BIGINT AS n_roundtrip_ok,
      |  sum(length(base64(text::BLOB)))::BIGINT AS total_b64_len
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin
}
