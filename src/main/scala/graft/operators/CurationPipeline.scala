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
  def curate(spark: SparkSession, dir: String,
             minQuality: Double = 0.3,
             ctxLen: Int = 512, nShards: Int = 8): DataFrame = {
    val kept = Dedup.dedupKept(spark, dir)
      .select(col("doc_id"), col("lang"),
        Curation.scrub(col("text")).as("text"))
      .filter(round(TextAnalysis.qualityScore(col("text")), 6) >= minQuality)
    val h = TextHash.h1(col("text")) % 100
    val split = kept.withColumn("split",
      when(h < 80, "train").when(h < 90, "val").otherwise("test"))
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
    curate(spark, dir, minQuality, ctxLen, nShards)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        countDistinct(col("shard"), col("context_id")).as("n_contexts_touched"))
      .orderBy(col("split"), col("lang"))
}
