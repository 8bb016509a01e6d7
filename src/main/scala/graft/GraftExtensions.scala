package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

import graft.functions.{DotProduct, Int8Audit, MinHashSig, NGramJaccard, QualityScore, ShingleHashes, Shingles, SignBandKeys, SimHash, SpanGramHashes, TaggedGrams, TokenHitCount}

/** SQL surface for the native expressions via the public
  * `SparkSessionExtensions` hook:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or on an already-built session:
  * GraftExtensions.register(spark)
  *
  * SELECT token_hit_count(text, 'fast', 'slow'),
  *        minhash_sig(text), simhash(text),
  *        ngram_jaccard(a, b), dot_product(u, v) FROM ...
  * }}}
  *
  * Lexicon/k/n arguments must be foldable literals — they parameterize
  * the generated code, exactly like the Column-API entry points.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def lit(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v, _) if v != null => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triples — the injectFunction contract. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("token_hit_count"),
      info("token_hit_count", "token_hit_count(text, w1, w2, ...) - lexicon hits"),
      (args: Seq[Expression]) =>
        TokenHitCount(args.head, args.tail.map(lit(_, "lexicon word")))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text[, n, k]) - MinHash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSig(t, 3, 16)
        case Seq(t, n, k) => MinHashSig(t, intLit(n, "n"), intLit(k, "k"))
        case _ => throw new IllegalArgumentException("minhash_sig(text[, n, k])")
      }),
    (FunctionIdentifier("simhash"),
      info("simhash", "simhash(text[, bits]) - SimHash fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHash(t, 48)
        case Seq(t, b) => SimHash(t, intLit(b, "bits"))
        case _ => throw new IllegalArgumentException("simhash(text[, bits])")
      }),
    (FunctionIdentifier("ngram_jaccard"),
      info("ngram_jaccard", "ngram_jaccard(a, b[, n]) - exact n-gram Jaccard"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => NGramJaccard(a, b, 3)
        case Seq(a, b, n) => NGramJaccard(a, b, intLit(n, "n"))
        case _ => throw new IllegalArgumentException("ngram_jaccard(a, b[, n])")
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential-fold dot product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("dot_product(a, b)")
      }),
    (FunctionIdentifier("tagged_grams"),
      info("tagged_grams", "tagged_grams(text) - t:-tokens + b:-bigrams for repetition scoring"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => TaggedGrams(t)
        case _ => throw new IllegalArgumentException("tagged_grams(text)")
      }),
    (FunctionIdentifier("sign_band_keys"),
      info("sign_band_keys", "sign_band_keys(v, bands, band_planes) - fused sign-LSH band keys"),
      (args: Seq[Expression]) => args match {
        case Seq(v, b, p) => SignBandKeys(v, intLit(b, "bands"), intLit(p, "band_planes"))
        case _ => throw new IllegalArgumentException("sign_band_keys(v, bands, band_planes)")
      }),
    (FunctionIdentifier("int8_audit"),
      info("int8_audit", "int8_audit(v) - absmax int8 quantization audit: [sse_micro, n_sat]"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => Int8Audit(v)
        case _ => throw new IllegalArgumentException("int8_audit(v)")
      }),
    (FunctionIdentifier("shingles"),
      info("shingles", "shingles(text[, n]) - distinct word n-gram strings, first-occurrence order"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => Shingles(t, 3)
        case Seq(t, n) => Shingles(t, intLit(n, "n"))
        case _ => throw new IllegalArgumentException("shingles(text[, n])")
      }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text[, n]) - distinct word n-gram 60-bit hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => ShingleHashes(t, 3)
        case Seq(t, n) => ShingleHashes(t, intLit(n, "n"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, n])")
      }),
    (FunctionIdentifier("span_gram_hashes"),
      info("span_gram_hashes", "span_gram_hashes(text[, n]) - POSITIONAL word n-gram 60-bit hashes, no dedup (one per start position)"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SpanGramHashes(t, 3)
        case Seq(t, n) => SpanGramHashes(t, intLit(n, "n"))
        case _ => throw new IllegalArgumentException("span_gram_hashes(text[, n])")
      }),
    (FunctionIdentifier("quality_score"),
      info("quality_score", "quality_score(text[, stop1, stop2, ...]) - fused 4-term heuristic quality in [0,1]"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => QualityScore(t, graft.operators.TextAnalysis.Stopwords)
        case t +: stops if stops.nonEmpty =>
          QualityScore(t, stops.map(lit(_, "stopword")))
        case _ => throw new IllegalArgumentException("quality_score(text[, stopwords...])")
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, inf, builder) =>
      org.apache.spark.sql.graft.bridge.registerFunction(spark, id, inf, builder)
    }
}
