package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** The whole pretraining-data-prep pipeline as ONE composed plan — the
  * end-to-end shape every individual operator in this library exists to
  * serve:
  *
  * {{{
  * documents ─ dedupKept ─ scrub ─ quality floor ─ split ─ packContexts
  * }}}
  *
  * Each stage is the library operator, not a reimplementation, so the
  * composition inherits their scale postures: dedup joins only the tiny
  * member-label table, scrub is a narrow map fused into whatever scan
  * feeds it, the quality floor is a per-row predicate, split assignment
  * is a content-hash map, and packing shuffles once on (lang, shard).
  * End to end the corpus body crosses exactly TWO shuffles (the dedup
  * doc_id join and the packing partition) — a 100 TB run is two passes,
  * not six.
  *
  * The reference stores raw tweets with no preparation at all
  * (`ProcessStreamData.py:25-30`); this is the LLM-pipeline composition
  * the driver's north star mandates.
  */
object CurationPipeline {

  /** Per-document curated output: the scrubbed text plus its split and
    * context assignment. `minQuality` floors the heuristic score (docs
    * below it are dropped rather than packed). */
  /** dedup survivors, scrubbed, quality-floored, split-assigned —
    * the shared prefix of [[curate]] and [[summary]]. */
  private def curatedSplit(spark: SparkSession, dir: String,
                           minQuality: Double): DataFrame = {
    val kept = Dedup.dedupKept(spark, dir)
      .select(col("doc_id"), col("lang"),
        Curation.scrub(col("text")).as("text"))
      .filter(round(TextAnalysis.qualityScore(col("text")), 6) >= minQuality)
    val h = TextHash.h1(col("text")) % 100
    kept.withColumn("split",
      when(h < 80, "train").when(h < 90, "val").otherwise("test"))
  }

  def curate(spark: SparkSession, dir: String,
             minQuality: Double = 0.3,
             ctxLen: Int = 512, nShards: Int = 8): DataFrame = {
    val split = curatedSplit(spark, dir, minQuality)
    // pack AFTER filtering/splitting so contexts hold only surviving docs
    Packing.packContextsOf(split.select(col("doc_id"), col("lang"), col("text")),
        ctxLen, nShards)
      .join(split.select(col("doc_id"), col("text"), col("split")), Seq("doc_id"))
  }

  /** One-row-per-(split, lang) audit of [[curate]]: docs, tokens,
    * contexts — the numbers a training run budgets from. */
  def summary(spark: SparkSession, dir: String,
              minQuality: Double = 0.3,
              ctxLen: Int = 512, nShards: Int = 8): DataFrame =
    // `split` rides the packing shuffle as a carried column: one pass
    // over the scrub+quality chain, no join back (unlike curate, which
    // must re-attach the text payload for its per-doc output)
    Packing.packContextsOf(
        curatedSplit(spark, dir, minQuality)
          .select(col("doc_id"), col("lang"), col("text"), col("split")),
        ctxLen, nShards, carry = Seq("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        countDistinct(col("shard"), col("context_id")).as("n_contexts_touched"))
      .orderBy(col("split"), col("lang"))

  /** DuckDB oracle of [[summary]] (q77): the ENTIRE composed pipeline —
    * LSH dedup label propagation, scrub chain, quality score, hash
    * split, sharded packing — re-expressed in one SQL statement from the
    * same single-source fragments the component oracles use
    * ([[Dedup.labelPropagationCtes]], [[Curation.ScrubPatterns]],
    * [[TextAnalysis.Stopwords]], [[TextHash.h1Sql]]). A hash-match here
    * gates the COMPOSITION, not just the stages: any drift in how stages
    * hand columns to each other (scrubbed text reaching the tokenizer,
    * the split hash seeing the scrubbed bytes, packing ordering) breaks
    * it. */
  def summarySql(minQuality: Double = 0.3,
                 ctxLen: Int = 512, nShards: Int = 8): String = {
    val scrubbed = Curation.ScrubPatterns.foldLeft("d.text") {
      case (e, (tag, re)) =>
        s"regexp_replace($e, '$re', '[${tag.toUpperCase}]', 'g')"
    }
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    val h = TextHash.h1Sql("text")
    s"""WITH ${Dedup.labelPropagationCtes()},
       |kept AS (
       |  SELECT d.doc_id, d.lang, $scrubbed AS text
       |  FROM documents d JOIN l6 ON l6.doc_id = d.doc_id
       |  WHERE l6.label = d.doc_id
       |), feat AS (
       |  SELECT doc_id, lang, text,
       |    len(t)::DOUBLE AS ntok,
       |    len(list_distinct(t))::DOUBLE AS uniq,
       |    len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |    length(text)::DOUBLE AS chars,
       |    len(t)::BIGINT AS n_tokens
       |  FROM (SELECT doc_id, lang, text,
       |        string_split(lower(text), ' ') AS t FROM kept)
       |), flt AS (
       |  SELECT doc_id, lang, text, n_tokens
       |  FROM feat
       |  WHERE round(0.25 * least(ntok / 50.0, 1.0) +
       |              0.25 * (uniq / ntok) +
       |              0.25 * (1.0 - (stops / ntok)) +
       |              0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6)
       |    >= $minQuality
       |), spl AS (
       |  SELECT doc_id, lang, n_tokens, doc_id % $nShards AS shard,
       |    CASE WHEN $h % 100 < 80 THEN 'train'
       |         WHEN $h % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM flt
       |), packed AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
       |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW) AS cum
       |  FROM spl
       |)
       |SELECT split, lang, count(*) AS n_docs,
       |  sum(n_tokens)::BIGINT AS sum_tokens,
       |  count(DISTINCT (shard, (cum - n_tokens) // $ctxLen))::BIGINT
       |    AS n_contexts_touched
       |FROM packed GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }
}
