package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Sentiment

class SentimentSpec extends SparkSpec {
  import spark.implicits._

  private def scoreOf(text: String): Row =
    Seq(text).toDF("text").select(Sentiment.score(col("text")).as("s"))
      .select("s.*").head()

  test("no lexicon hits -> NEUTRAL with neutral=1") {
    val r = scoreOf("table scan row column")
    assert(r.getString(0) == "NEUTRAL")
    assert(r.getDouble(3) == 1.0) // neutral
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("positive-dominant -> POSITIVE; case-insensitive tokenization") {
    val r = scoreOf("Fast BIG table slow")
    assert(r.getString(0) == "POSITIVE") // p=2, n=1
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-15) // (2-1)/4
  }

  test("negative-dominant -> NEGATIVE") {
    assert(scoreOf("slow slow small fast").getString(0) == "NEGATIVE")
  }

  test("balanced polarity -> MIXED") {
    val r = scoreOf("fast slow")
    assert(r.getString(0) == "MIXED")
    assert(math.abs(r.getDouble(4) - (1.0 / 3)) < 1e-15) // mixed = 1/3
  }

  test("empty text -> NEUTRAL") {
    assert(scoreOf("").getString(0) == "NEUTRAL")
  }

  test("property: components in [0,1] and sum exactly 1 (200 generated texts)") {
    val vocab = Gen.oneOf("fast", "slow", "big", "small", "table", "scan", "a", "the")
    val textGen = Gen.listOf(vocab).map(_.mkString(" "))
    val texts = (0 until 200).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    val rows = texts.toDF("text")
      .select(Sentiment.score(col("text")).as("s")).select("s.*").collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val comps = (1 to 4).map(r.getDouble)
      comps.foreach(c => assert(c >= 0.0 && c <= 1.0, s"component out of range in $r"))
      // components are deterministic IEEE ratios; their sum is 1 up to
      // rounding of x/d (exact only when d is a power of two)
      assert(math.abs(comps.sum - 1.0) < 1e-12, s"sum != 1 in $r")
    }
  }

  test("hashtag analytics: distinct tags per doc, counts consistent, top-k ordered (EXT)") {
    import graft.operators.TextPipeline
    val rows = TextPipeline.hashtagSentiment(spark, sf0001, tagPattern = "\\w+", k = 20)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // deterministic top-k total order: n_docs DESC, hashtag ASC
    val keys = rows.map(r => (-r.getAs[Long]("n_docs"), r.getAs[String]("hashtag"))).toSeq
    assert(keys == keys.sorted, "output not in (n_docs DESC, hashtag ASC) order")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_positive") + r.getAs[Long]("n_negative") <= n)
      assert(n >= 1)
    }
    // per-doc distinctness: a tag repeated within one doc counts once —
    // no hashtag can exceed the corpus document count
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.forall(_.getAs[Long]("n_docs") <= nDocs))
    // '#'-shaped default pattern finds nothing in the synthetic corpus
    assert(TextPipeline.hashtagSentiment(spark, sf0001).count() == 0)
  }
}
