package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic lexicon-based sentiment scorer.
  *
  * Native twin of the reference's managed sentiment call
  * (`ProcessStreamData.py:21`, `comprehend.detect_sentiment`) which returns
  * a label in {POSITIVE, NEGATIVE, NEUTRAL, MIXED} plus four scores summing
  * to ~1. The reference throws the structured result away (logs only,
  * `ProcessStreamData.py:21-29`); here sentiment is a first-class nested
  * column. Unlike the reference (hardcoded `LanguageCode='en'`,
  * SURVEY.md §2.4 E2), the scorer is language-agnostic by construction.
  *
  * Design constraints (SURVEY.md §5):
  *  - deterministic (DuckDB-oracle hash parity) — a fixed lexicon, no ML;
  *  - expressible with built-in higher-order functions so it stays a
  *    white-box Catalyst expression tree (whole-stage codegen, no UDF) AND
  *    has a 1:1 SQL twin in DuckDB (`list_filter` + lambda);
  *  - the lexicon lives ONCE here; oracle SQL embeds it via [[posSqlList]] /
  *    [[negSqlList]].
  *
  * Scoring model (documented contract, asserted by SentimentSpec):
  * with p = #positive-lexicon tokens, n = #negative tokens, m = min(p,n),
  * d = p + n + 1 (the +1 is a neutral pseudo-count so d > 0):
  *   mixed = m/d, positive = (p-m)/d, negative = (n-m)/d,
  *   neutral = (1+m)/d  — components in [0,1], sum 1 within 1e-12 (each
  *   ratio rounds independently in IEEE double).
  * Label: POSITIVE if p>n, NEGATIVE if n>p, MIXED if p==n>0, else NEUTRAL.
  * All arithmetic is exact-integer ratios evaluated in IEEE double, hence
  * bit-identical across engines.
  *
  * Scale posture: per-row narrow map over a short token array; fully
  * codegen'd, no shuffle, no broadcast state (the lexicon is inlined into
  * the expression tree as literals). At 100 TB this pipelines with the
  * scan.
  */
object Sentiment {
  /** Positive-polarity lexicon (includes tokens present in the driver
    * `documents` vocabulary: fast, big, merge). */
  val Positive: Seq[String] =
    Seq("fast", "big", "merge", "good", "great", "love", "win", "happy")

  /** Negative-polarity lexicon (vocabulary hits: slow, small, error). */
  val Negative: Seq[String] =
    Seq("slow", "small", "error", "bad", "fail", "hate", "broken", "sad")

  /** Lexicons as SQL IN-list literals for the DuckDB oracle twin. */
  def posSqlList: String = Positive.map(w => s"'$w'").mkString(", ")
  def negSqlList: String = Negative.map(w => s"'$w'").mkString(", ")

  /** Whitespace tokenizer; lowercases first (track-match semantics F2 are
    * case-insensitive, `streamer.py:48`). Delegates to the single
    * tokenization contract in [[TextHash.tokens]]. */
  def tokenize(text: Column): Column = TextHash.tokens(text)

  /** HOF formulation — kept as the reference semantics the native
    * expression must match (TokenHitCountSpec asserts equivalence). */
  def hitsHof(text: Column, lexicon: Seq[String]): Column =
    size(filter(tokenize(text), t => t.isin(lexicon: _*)))

  /** Hit counting via the native codegen expression ([[TokenHitCount]]) —
    * same semantics, whole-stage-codegen-friendly (no per-row ArrayData,
    * no interpreted lambda). */
  def positiveHits(text: Column): Column = TokenHitCount.tokenHits(text, Positive)
  def negativeHits(text: Column): Column = TokenHitCount.tokenHits(text, Negative)

  /** Sentiment label column from the two hit counts. */
  def label(p: Column, n: Column): Column =
    when(p > n, "POSITIVE")
      .when(n > p, "NEGATIVE")
      .when(p > lit(0), "MIXED")
      .otherwise("NEUTRAL")

  /** Struct column `(label, positive, negative, neutral, mixed)` — the
    * Comprehend response shape (FIXTURES.md A3) as a native nested column. */
  def score(text: Column): Column = {
    val p = positiveHits(text).cast("double")
    val n = negativeHits(text).cast("double")
    val m = least(p, n)
    val d = p + n + lit(1.0)
    struct(
      label(p, n).as("label"),
      ((p - m) / d).as("positive"),
      ((n - m) / d).as("negative"),
      ((lit(1.0) + m) / d).as("neutral"),
      (m / d).as("mixed")
    )
  }
}
