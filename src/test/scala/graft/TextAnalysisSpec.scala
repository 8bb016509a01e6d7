package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.TextAnalysis

/** Unit coverage for text analysis (SURVEY.md §2.12 X4). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality score stays in [0,1] on the real corpus") {
    val qs = Tables.documents(spark, sf0001)
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("language-ID is deterministic and total (every doc gets a prediction)") {
    val conf = TextAnalysis.langIdConfusion(spark, sf0001)
    val total = conf.agg(sum("n_docs")).head.getLong(0)
    assert(total == Tables.documents(spark, sf0001).count())
    val preds = conf.select("predicted").distinct().collect().map(_.getString(0))
    assert(preds.toSet.subsetOf(TextAnalysis.Markers.map(_._1).toSet))
  }

  test("lang-ID tie-break: marker-free text falls through to priority order") {
    val p = Seq("qqq www eee").toDF("text")
      .select(TextAnalysis.langIdPredict(col("text"))).head.getString(0)
    assert(p == "en", "all-zero scores resolve to first-listed language")
  }

  test("rolling fingerprint is order-sensitive; md5 set-hash twin is not") {
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(TextHash.rollingFingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "permuted docs must fingerprint differently")
    assert(fps.forall(f => f >= 0 && f < TextHash.FpP))
  }

  test("token stats: regex tokens >= whitespace tokens on alpha text") {
    TextAnalysis.tokenStats(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("sum_re_tokens") >= r.getAs[Long]("sum_ws_tokens"))
    }
  }
}
