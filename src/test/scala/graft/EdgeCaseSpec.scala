package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions, TextHash}
import graft.operators.TextPipeline
import graft.streaming.Pipeline

/** Regression coverage for the review-found edge cases. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("sentiment oracle SQL lowercases and escapes the track literal") {
    val sql = TextPipeline.sentimentByLabelSql("en", "O'Spark")
    assert(sql.contains("contains(lower(text), 'o''spark')"),
      s"track literal must be lowercased + escaped:\n$sql")
    assert(!sql.contains("O'Spark"))
  }

  test("native minhash on sub-n-token docs matches the all-P fold init") {
    val sig = Seq("a b").toDF("text")
      .select(HashExpressions.minhashSig(col("text"))).head.getSeq[Long](0)
    assert(sig == Seq.fill(16)(TextHash.P))
  }

  test("minhash oracle SQL coalesces empty-shingle min to P") {
    assert(TextHash.minhashSignatureSql("sh").contains(s"coalesce(") &&
      TextHash.minhashSignatureSql("sh").contains(s"${TextHash.P})"))
  }

  test("dot_product is NULL on length mismatch and null elements") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d)) AS short,
        |  dot_product(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS withnull,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ok""".stripMargin)
    val r = rows.head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getDouble(2) == 11.0)
  }

  test("VectorMean skips empty vectors without counting them") {
    val m = udaf(graft.functions.VectorMean)
    val df = Seq((0, Seq(2.0, 4.0)), (0, Seq.empty[Double]), (0, Seq(4.0, 8.0)))
      .toDF("g", "v")
    val c = df.groupBy("g").agg(m(col("v"))).head.getSeq[Double](1)
    assert(c == Seq(3.0, 6.0), s"empty vector must not affect the mean: $c")
  }

  test("streaming dedup drops same-key records even with re-stamped times") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventFixture]
    val e = EventFixture(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"),
      1L, "click", 1.0)
    // redelivery with a re-stamped ts (+2s): same key, must still dedup
    mem.addData(e, e.copy(ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:03")))
    val q = Pipeline.dedupByKey(mem.toDF(), "ts", Seq("event_id"))
      .writeStream.format("memory").queryName("restamp_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("restamp_dedup").count() == 1)
  }
}
