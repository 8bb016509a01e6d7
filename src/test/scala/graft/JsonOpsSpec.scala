package graft

import org.apache.spark.sql.functions._

import graft.operators.JsonOps

/** JSON serialize/deserialize coverage (SURVEY.md §2.3 P1/P5, §2.4 E4/E7). */
class JsonOpsSpec extends SparkSpec {
  import spark.implicits._

  test("P5: to_json∘from_json is identity on struct payloads") {
    val df = Seq(("click", 87L), ("view", -3L)).toDF("event_type", "k")
      .select(col("event_type"),
        to_json(struct(col("event_type"), col("k"))).as("j"))
      .select(col("event_type"),
        from_json(col("j"), lit("event_type STRING, k BIGINT")).as("back"))
    val rows = df.select("back.event_type", "back.k").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("click", 87L), ("view", -3L)))
  }

  test("map-typed props explode: one (key,value) row per JSON key") {
    val n = JsonOps.propsMapStats(spark, sf0001)
      .agg(sum("n")).head.getLong(0)
    assert(n == Tables.events(spark, sf0001).count(),
      "every event contributes exactly its key count (props has 1 key)")
  }

  test("reference codec chain: to_json + newline + base64 (P4/P5) round-trips") {
    // ProcessStreamData.py:28 — b64encode(json.dumps(payload) + '\n')
    val df = Seq("hello world").toDF("text")
      .select(base64(concat(to_json(struct(col("text"))), lit("\n"))
        .cast("binary")).as("b64"))
      .select(decode(unbase64(col("b64")), "UTF-8").as("line"))
    assert(df.head.getString(0) == """{"text":"hello world"}""" + "\n")
  }
}
