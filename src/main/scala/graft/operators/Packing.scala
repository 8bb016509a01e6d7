package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Sequence packing (north-star LLM-pipeline surface): assign documents
  * to fixed-size training contexts the way a pretraining tokenizer run
  * does — concatenate docs in a deterministic order and cut every
  * `ctxLen` tokens, letting documents straddle context boundaries.
  * The packing decision is pure integer arithmetic over a running token
  * count, so the assignment (and its audit summary, q71) is exactly
  * reproducible across engines and re-runs.
  *
  * Scale posture: a single global concatenation order would be one
  * unbounded window partition — a single task at 100 TB. Packing is
  * therefore SHARDED: docs are split into `nShards` deterministic shards
  * per language (doc_id mod nShards) and each (lang, shard) packs
  * independently, which is exactly how a production tokenizer fleet
  * packs — N workers, each packing its own shard's stream. The only
  * shuffle is the hash partition on (lang, shard); the running sum is a
  * streaming window inside each partition (no additional sort pass
  * beyond the shuffle's, and the frame is growing-only so Spark keeps
  * one running accumulator, never buffering the partition).
  *
  * Reference tie-in: the reference stores raw tweets with no
  * training-side preparation (`ProcessStreamData.py:25-30`); packing is
  * part of the LLM-data-pipeline extension the driver mandates.
  */
object Packing {

  /** Per-document context assignment: (doc_id, lang, shard, n_tokens,
    * cum_tokens, context_id, end_context). `context_id` is the context
    * the doc STARTS in; `end_context` the one its last token lands in —
    * a doc straddles iff they differ. Token count = whitespace tokens
    * (the same tokenization q15 reports on). */
  def packContexts(spark: SparkSession, dir: String,
                   ctxLen: Int = 512, nShards: Int = 8): DataFrame =
    packContextsOf(Tables.documents(spark, dir), ctxLen, nShards)

  /** Same assignment over any (doc_id, lang, text) frame — the library
    * entry point; the dir overload binds it to the test corpus. `carry`
    * names extra input columns to keep on the output rows (computed
    * once, riding the one packing shuffle — cheaper than re-deriving
    * them downstream and joining back). `groupCols` are the stream
    * boundaries documents must NEVER pack across (default: language);
    * a curation run adds its split column so no context can interleave
    * train and held-out text. */
  def packContextsOf(docs: DataFrame, ctxLen: Int = 512, nShards: Int = 8,
                     carry: Seq[String] = Nil,
                     groupCols: Seq[String] = Seq("lang")): DataFrame = {
    require(ctxLen > 0 && nShards > 0 && groupCols.nonEmpty)
    val w = Window
      .partitionBy((groupCols.map(col) :+ col("shard")): _*)
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select((Seq(col("doc_id")) ++ groupCols.map(col) ++ Seq(
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"))
        ++ carry.map(col)): _*)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // integer div (never float): both engines agree bit-for-bit
      .withColumn("context_id",
        expr(s"(cum_tokens - n_tokens) div ${ctxLen.toLong}"))
      .withColumn("end_context",
        expr(s"(cum_tokens - 1) div ${ctxLen.toLong}"))
  }

  /** Packing audit (q71): per language — docs, tokens, number of
    * ctxLen-token contexts the shards cut, docs straddling a context
    * boundary, and the fill ratio of the allocated contexts in exact
    * integer BASIS POINTS (10000 = fully packed; < 10000 only through
    * per-shard tail remainders; straddling docs waste nothing).
    * Basis points instead of a rounded double: the whole row stays in
    * integer arithmetic, so the cross-engine hash can never diverge on
    * float formatting (FIXTURES.md §C). n_contexts sums each shard's
    * ceil(tokens/ctxLen) — closed form, so the summary never re-reads
    * the assignment rows. */
  def packingSummary(spark: SparkSession, dir: String,
                     ctxLen: Int = 512, nShards: Int = 8): DataFrame = {
    val perShard = packContexts(spark, dir, ctxLen, nShards)
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("toks"),
        sum(when(col("end_context") > col("context_id"), 1L).otherwise(0L))
          .as("strad"))
      .withColumn("n_ctx", expr(s"(toks + ${ctxLen - 1}) div ${ctxLen.toLong}"))
    perShard.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("toks")).as("sum_tokens"),
        sum(col("n_ctx")).as("n_contexts"),
        sum(col("strad")).as("n_straddling"))
      .select(col("lang"), col("n_docs"), col("sum_tokens"),
        col("n_contexts"), col("n_straddling"),
        // DECIMAL(38,0) mirrors DuckDB's HUGEINT intermediate: sum_tokens
        // * 10000 would overflow 64-bit past ~9.2e14 tokens per language,
        // which a 100 TB corpus can reach. One row per lang — decimal
        // cost is nil. IntegralDivide on decimals returns BIGINT.
        expr(s"cast(sum_tokens as decimal(38,0)) * 10000 div " +
          s"(cast(n_contexts as decimal(38,0)) * ${ctxLen.toLong})")
          .cast("long").as("fill_bp"))
      .orderBy(col("lang"))
  }

  def packingSummarySql(ctxLen: Int = 512, nShards: Int = 8): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, doc_id % $nShards AS shard,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
       |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS cum
       |  FROM d
       |), s AS (
       |  SELECT lang, shard, count(*) AS n_docs, sum(n_tokens) AS toks,
       |    sum(CASE WHEN (cum - 1) // $ctxLen >
       |             (cum - n_tokens) // $ctxLen THEN 1 ELSE 0 END) AS strad,
       |    (sum(n_tokens) + ${ctxLen - 1}) // $ctxLen AS n_ctx
       |  FROM c GROUP BY lang, shard
       |)
       |SELECT lang, sum(n_docs)::BIGINT AS n_docs, sum(toks)::BIGINT AS sum_tokens,
       |  sum(n_ctx)::BIGINT AS n_contexts, sum(strad)::BIGINT AS n_straddling,
       |  ((sum(toks) * 10000) // (sum(n_ctx) * $ctxLen))::BIGINT AS fill_bp
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin
}
