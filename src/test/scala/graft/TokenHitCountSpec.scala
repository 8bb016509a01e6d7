package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Sentiment, TokenHitCount}

/** Native codegen TokenHitCount must be bit-equivalent to the HOF
  * formulation size(filter(split(lower(s)," "), isin(lexicon))). */
class TokenHitCountSpec extends SparkSpec {
  import spark.implicits._

  private val lex = Seq("fast", "slow", "好", "emoji🚀")

  test("equivalence with HOF on generated unicode/edge-case texts") {
    val pieces = Gen.oneOf("fast", "SLOW", "Fast", "x", "", " ", "好", "好 好",
      "emoji🚀", "ümlaut", "fast fast")
    val gen = Gen.listOf(pieces).map(_.mkString(" "))
    val texts = (0 until 300)
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "  ", "fast", "FAST  SLOW   fast")
    val df = texts.toDF("text").select(
      TokenHitCount.tokenHits(col("text"), lex).as("native"),
      size(filter(split(lower(col("text")), " "),
        t => t.isin(lex.map(_.toLowerCase): _*))).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null input yields null (UnaryExpression null contract)") {
    val df = Seq(Option("fast"), None).toDF("text")
      .select(TokenHitCount.tokenHits(col("text"), lex).as("n"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 1)
    assert(rows(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // needs a real scan — a local Seq collapses to LocalTableScan with no
    // codegen stage regardless of the expression
    val plan = Tables.documents(spark, sf0001)
      .select(TokenHitCount.tokenHits(col("text"), lex).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      s"expected codegen'd project, got:\n$plan")
  }

  test("sentiment scorer still matches its documented contract after swap") {
    val r = Seq("fast big slow").toDF("text")
      .select(Sentiment.score(col("text")).as("s"))
      .select("s.label", "s.positive", "s.negative", "s.neutral", "s.mixed")
      .head
    // p=2, n=1, m=1, d=4 → label POSITIVE, pos=1/4, neg=0, neu=2/4, mix=1/4
    assert(r.getString(0) == "POSITIVE")
    assert(r.getDouble(1) == 0.25 && r.getDouble(2) == 0.0 &&
      r.getDouble(3) == 0.5 && r.getDouble(4) == 0.25)
  }
}
