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

  /** Document chunking — the complement of packing: where packing
    * CONCATENATES short docs into fixed contexts, chunking SPLITS long
    * docs into overlapping fixed-token windows (the standard prep for
    * context-bounded training/embedding/retrieval corpora). Chunk `i` of
    * a doc covers tokens `[i·stride, i·stride + chunkLen)` where
    * `stride = chunkLen − overlap`; the last chunk is the remainder
    * (always ≥ 1 token, always reaching the doc's final token).
    *
    * Scale posture: chunking is embarrassingly parallel — one narrow
    * projection + a bounded explode (fan-out ≤ tokens/stride per doc),
    * NO shuffle, no window, nothing driver-side. The token array is
    * materialized once per doc and sliced per chunk.
    *
    * Reference tie-in: the reference stores raw tweets un-prepared
    * (`ProcessStreamData.py:25-30`); chunking is part of the mandated
    * LLM-data-pipeline extension (SURVEY.md §2.12). */
  def chunkDocs(spark: SparkSession, dir: String,
                chunkLen: Int = 32, overlap: Int = 8): DataFrame =
    chunkDocsOf(Tables.documents(spark, dir), chunkLen, overlap)

  /** Chunk rows for any (doc_id, lang, text) frame: (doc_id, lang,
    * n_tokens, n_chunks, chunk_id, chunk_start, chunk_tokens,
    * chunk_text). Tokenization = the q15/q71 whitespace tokens. */
  def chunkDocsOf(docs: DataFrame, chunkLen: Int = 32, overlap: Int = 8): DataFrame = {
    require(chunkLen > 0 && overlap >= 0 && overlap < chunkLen,
      s"need 0 <= overlap < chunkLen, got chunkLen=$chunkLen overlap=$overlap")
    val stride = (chunkLen - overlap).toLong
    docs
      .select(col("doc_id"), col("lang"),
        TextHash.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      // integer ceil-div keeps both engines in exact 64-bit arithmetic
      .withColumn("n_chunks",
        when(col("n_tokens") <= chunkLen, lit(1L))
          .otherwise(expr(s"(n_tokens - $chunkLen + ${stride - 1}) div $stride")
            + lit(1L)))
      .select(col("doc_id"), col("lang"), col("toks"), col("n_tokens"),
        col("n_chunks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_tokens",
        least(lit(chunkLen.toLong), col("n_tokens") - col("chunk_start")))
      .withColumn("chunk_text", array_join(slice(col("toks"),
        (col("chunk_start") + 1).cast("int"),
        col("chunk_tokens").cast("int")), " "))
      .drop("toks")
  }

  /** Chunking audit (q80): per language — docs, chunks, docs that split
    * into >1 chunk, total chunk tokens, the duplicated-token overhead the
    * overlap costs (`sum_chunk_tokens − Σ n_tokens`), and a cross-engine
    * content gate: Σ (60-bit md5 of `doc_id:chunk_id:chunk_text` mod P)
    * mod 1e9+7 — any divergence in any chunk's TEXT (not just its
    * bounds) flips the hash. The sum rides a decimal(38,0) accumulator
    * (DuckDB sums BIGINT into HUGEINT; Spark must match past ~4e9 chunks
    * where a signed-64 sum of 31-bit values overflows). */
  def chunkSummary(spark: SparkSession, dir: String,
                   chunkLen: Int = 32, overlap: Int = 8): DataFrame =
    chunkDocs(spark, dir, chunkLen, overlap)
      .withColumn("chash",
        TextHash.h1(concat(col("doc_id").cast("string"), lit(":"),
          col("chunk_id").cast("string"), lit(":"), col("chunk_text")))
          % TextHash.P)
      .groupBy(col("lang"))
      .agg(
        sum(when(col("chunk_id") === 0, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_id") === 0 && col("n_chunks") > 1, 1L)
          .otherwise(0L)).as("n_multichunk_docs"),
        sum(col("chunk_tokens")).as("sum_chunk_tokens"),
        (sum(col("chunk_tokens")) -
          sum(when(col("chunk_id") === 0, col("n_tokens")).otherwise(0L)))
          .as("overlap_tokens"),
        sum(col("chash").cast("decimal(38,0)")).as("hsum"))
      .select(col("lang"), col("n_docs"), col("n_chunks"),
        col("n_multichunk_docs"), col("sum_chunk_tokens"),
        col("overlap_tokens"),
        expr(s"cast(hsum % ${TextHash.FpP} as bigint)").as("content_hash"))
      .orderBy(col("lang"))

  def chunkSummarySql(chunkLen: Int = 32, overlap: Int = 8): String = {
    val s = chunkLen - overlap
    val c = chunkLen
    s"""WITH d AS (
       |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, lang, toks, len(toks)::BIGINT AS n_tokens,
       |    (CASE WHEN len(toks) <= $c THEN 1
       |          ELSE (len(toks) - $c + ${s - 1}) // $s + 1 END)::BIGINT AS n_chunks
       |  FROM d
       |), ch AS (
       |  SELECT doc_id, lang, n_tokens, n_chunks, toks,
       |    unnest(range(0, n_chunks)) AS chunk_id
       |  FROM n
       |), cc AS (
       |  SELECT doc_id, lang, n_tokens, n_chunks, chunk_id,
       |    LEAST($c, n_tokens - chunk_id * $s) AS chunk_tokens,
       |    array_to_string(toks[(chunk_id * $s + 1)::INT :
       |      (chunk_id * $s + LEAST($c, n_tokens - chunk_id * $s))::INT], ' ')
       |      AS chunk_text
       |  FROM ch
       |)
       |SELECT lang,
       |  sum(CASE WHEN chunk_id = 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_chunks,
       |  sum(CASE WHEN chunk_id = 0 AND n_chunks > 1 THEN 1 ELSE 0 END)::BIGINT
       |    AS n_multichunk_docs,
       |  sum(chunk_tokens)::BIGINT AS sum_chunk_tokens,
       |  (sum(chunk_tokens)
       |    - sum(CASE WHEN chunk_id = 0 THEN n_tokens ELSE 0 END))::BIGINT
       |    AS overlap_tokens,
       |  (sum(${TextHash.h1Sql("doc_id::VARCHAR || ':' || chunk_id::VARCHAR || ':' || chunk_text")}
       |       % ${TextHash.P}) % ${TextHash.FpP})::BIGINT AS content_hash
       |FROM cc GROUP BY lang ORDER BY lang""".stripMargin
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

  // ---- X17: context-length frontier (q88) ---------------------------------

  /** Candidate context lengths for [[contextFrontier]], spanning the
    * corpus's 10-100-token doc-length range so the frontier shows both
    * chunk-heavy (32) and padding-heavy (256) regimes. */
  val FrontierBuckets: Seq[Int] = Seq(32, 64, 128, 256)

  /** X17 context-length election (q88): for each candidate context
    * length B, the cost of cutting every document into ceil(len/B)
    * B-token sequences (chunk-then-pad, no cross-doc packing) — docs,
    * tokens, sequences, docs that must chunk, and the fill ratio in
    * exact integer basis points. The frontier quantifies the
    * chunking-vs-padding trade a training pipeline walks when fixing
    * its context length; read alongside q71 (which packs MULTIPLE docs
    * into one context and so models the concat regime).
    *
    * Scale posture: one narrow projection reduces each doc to an 8-byte
    * token count BEFORE the |buckets|-way constant fan-out, so the
    * explode multiplies longs, not text; the aggregate is map-side
    * combinable down to |buckets| rows. Like q71 the fill ratio stays
    * in integer arithmetic end-to-end (decimal(38,0) guards the 1e4
    * scaling past 9.2e14 tokens), so no float ever crosses engines. */
  def contextFrontier(spark: SparkSession, dir: String,
                      buckets: Seq[Int] = FrontierBuckets): DataFrame = {
    require(buckets.nonEmpty && buckets.forall(_ > 0))
    Tables.documents(spark, dir)
      .select(size(TextHash.tokens(col("text"))).cast("long").as("len"))
      .select(col("len"),
        explode(array(buckets.map(b => lit(b.toLong)): _*)).as("ctx_len"))
      .withColumn("n_seq", expr("(len + ctx_len - 1) div ctx_len"))
      .groupBy(col("ctx_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("sum_tokens"),
        sum(col("n_seq")).as("n_seqs"),
        sum(when(col("len") > col("ctx_len"), 1L).otherwise(0L)).as("n_chunked"))
      .select(col("ctx_len"), col("n_docs"), col("sum_tokens"), col("n_seqs"),
        col("n_chunked"),
        expr("cast(sum_tokens as decimal(38,0)) * 10000 div " +
          "(cast(n_seqs as decimal(38,0)) * ctx_len)").cast("long").as("fill_bp"))
      .orderBy(col("ctx_len"))
  }

  def contextFrontierSql(buckets: Seq[Int] = FrontierBuckets): String = {
    val lst = buckets.map(b => s"$b::BIGINT").mkString("[", ", ", "]")
    s"""WITH l AS (
       |  SELECT len(string_split(lower(text), ' '))::BIGINT AS len FROM documents
       |), e AS (
       |  SELECT len, unnest($lst) AS ctx_len FROM l
       |)
       |SELECT ctx_len, count(*)::BIGINT AS n_docs, sum(len)::BIGINT AS sum_tokens,
       |  sum((len + ctx_len - 1) // ctx_len)::BIGINT AS n_seqs,
       |  sum(CASE WHEN len > ctx_len THEN 1 ELSE 0 END)::BIGINT AS n_chunked,
       |  ((sum(len) * 10000) //
       |    (sum((len + ctx_len - 1) // ctx_len) * ctx_len))::BIGINT AS fill_bp
       |FROM e GROUP BY ctx_len ORDER BY ctx_len""".stripMargin
  }

  // ---- X25: length-bucketed batch packing (q98) ---------------------------

  /** Length-bucket caps for [[batchingSummary]], chosen like
    * [[FrontierBuckets]] to straddle the corpus's 10-100-token range. A
    * doc lands in the smallest cap that holds it; docs beyond the top
    * cap are truncated to it (counted in `n_truncated`). */
  val BatchBuckets: Seq[Int] = Seq(16, 32, 64, 128)

  /** Docs per training batch for [[batchingSummary]]. */
  val DocsPerBatch: Int = 16

  /** X25 length-bucketed batching audit (q98): the padding-efficiency
    * device for NON-packed training (SFT/contrastive/reward batches,
    * where each doc is one sequence and a batch pads every row to the
    * batch max). Docs are bucketed by length (smallest cap that fits),
    * sharded, and cut into deterministic `docsPerBatch`-doc batches in
    * doc_id order within (bucket, shard); each batch pads to ITS OWN max
    * row length. Per bucket: docs, batches, real tokens, padded (=
    * Σ_batch rows·max_len) tokens, and the waste in exact integer basis
    * points — the number a batching scheduler minimizes; compare
    * `waste_bp` here with one unbucketed global batcher to see what the
    * bucketing buys.
    *
    * Scale posture: same sharded shape as [[packContextsOf]] — the only
    * shuffle is the hash partition on (bucket, shard) and the per-group
    * row_number is a streaming window inside each partition (shard count
    * is the parallelism knob, so no partition outgrows an executor at
    * 100 TB). The doc body is reduced to an 8-byte length BEFORE the
    * shuffle; the two-level rollup (batch → bucket) is map-side
    * combinable. Integer arithmetic end-to-end (decimal(38,0) guards the
    * basis-point scaling past 9.2e14 tokens — FIXTURES.md §C).
    *
    * Reference tie-in: the reference stores raw tweets with no
    * training-side batching (`ProcessStreamData.py:25-30`); this is part
    * of the mandated LLM-data-pipeline extension (SURVEY.md §2.12). */
  def batchingSummary(spark: SparkSession, dir: String,
                      buckets: Seq[Int] = BatchBuckets,
                      docsPerBatch: Int = DocsPerBatch,
                      nShards: Int = 8): DataFrame =
    batchingSummaryOf(Tables.documents(spark, dir), buckets, docsPerBatch,
      nShards)

  /** [[batchingSummary]] over any (doc_id, text) frame. */
  def batchingSummaryOf(docs: DataFrame, buckets: Seq[Int] = BatchBuckets,
                        docsPerBatch: Int = DocsPerBatch,
                        nShards: Int = 8): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted && buckets.forall(_ > 0)
      && docsPerBatch > 0 && nShards > 0)
    val maxCap = buckets.last.toLong
    val bucketOf = buckets.init.foldRight(lit(maxCap)) { (b, rest) =>
      when(col("len") <= b.toLong, lit(b.toLong)).otherwise(rest)
    }
    val w = Window.partitionBy(col("bucket_cap"), col("shard"))
      .orderBy(col("doc_id"))
    val perBatch = docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(TextHash.tokens(col("text"))).cast("long").as("len"))
      .select(col("doc_id"), col("shard"), bucketOf.as("bucket_cap"),
        least(col("len"), lit(maxCap)).as("tok"),
        when(col("len") > maxCap, 1L).otherwise(0L).as("trunc"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", expr(s"(rn - 1) div ${docsPerBatch.toLong}"))
      .groupBy(col("bucket_cap"), col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("rows"), max(col("tok")).as("max_tok"),
        sum(col("tok")).as("toks"), sum(col("trunc")).as("truncs"))
    perBatch
      .groupBy(col("bucket_cap"))
      .agg(sum(col("rows")).as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum(col("toks")).as("sum_tokens"),
        sum(col("rows") * col("max_tok")).as("padded_tokens"),
        sum(col("truncs")).as("n_truncated"))
      .select(col("bucket_cap"), col("n_docs"), col("n_batches"),
        col("sum_tokens"), col("padded_tokens"), col("n_truncated"),
        expr("cast(padded_tokens - sum_tokens as decimal(38,0)) * 10000 div " +
          "cast(padded_tokens as decimal(38,0))").cast("long").as("waste_bp"))
      .orderBy(col("bucket_cap"))
  }

  // ---- X124: packing-regime election (q198) -------------------------------

  /** X124 packing-regime election (q198): the exact waste bill of three
    * batch-construction regimes over the SAME truncated length corpus —
    * `a_naive_padded` (every doc its own row padded to the cap),
    * `b_bucket_padded` (the q98 length-bucketed batcher, folded to one
    * row), and `c_fold_packed` (histogram fold-packing: the r-th
    * longest sequence shares a cap-length bin with the r-th shortest
    * when they fit — the depth-2 regime of packed-BERT's
    * histogram-based packing, Krell et al. 2021, arXiv:2107.02027).
    * Per regime: sequences, bins, real tokens, cost (= bin) tokens and
    * waste in exact bp. This is the election a training-data platform
    * runs before choosing its collator: q71/q98 price two regimes in
    * isolation; this puts all three on one bill.
    *
    * Histogram-driven, NEVER a per-doc sort: the corpus collapses to a
    * ≤cap-row length histogram (map-side combine), desc-rank intervals
    * come from the q167-style broadcast triangle fold over that
    * histogram, and the fold pairing's per-(la, lb)
    * pair counts are closed-form interval intersections on the
    * histogram×histogram cross (≤cap² cells at ANY corpus scale —
    * the allow-listed broadcast-audit cross pattern). The middle
    * element of an odd corpus packs alone (the `n % 2` term).
    *
    * Cross-engine: pure integer interval algebra; the bp division
    * rides the q98 decimal(38,0) guard. */
  def packingElection(spark: SparkSession, dir: String,
                      buckets: Seq[Int] = BatchBuckets,
                      docsPerBatch: Int = DocsPerBatch,
                      nShards: Int = 8): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted)
    val cap = buckets.last.toLong
    val docs = Tables.documents(spark, dir)
    val hist = docs
      .select(least(size(TextHash.tokens(col("text"))).cast("long"),
        lit(cap)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totals = hist.agg(sum(col("c")).as("n"),
      sum(col("tok") * col("c")).as("rt"))
    // desc-rank interval of each length class: ranks [lo, hi] hold
    // exactly the docs of this truncated length (ties are
    // interchangeable, so pair COUNTS are order-free). The cumulative
    // fold is the q167/q168 broadcast triangle theta-join over the
    // ≤cap-row histogram — never a SinglePartition window.
    val h2 = hist.select(col("tok").as("tok2"), col("c").as("c2"))
    val iv = hist.join(broadcast(h2), col("tok2") >= col("tok"))
      .groupBy(col("tok"), col("c"))
      .agg(sum(col("c2")).as("hi"))
      .select(col("tok"), (col("hi") - col("c") + 1).as("lo"), col("hi"))
    val a1 = iv.select(col("tok").as("la"), col("lo").as("lo1"),
      col("hi").as("hi1"))
    val a2 = iv.select(col("tok").as("lb"), col("lo").as("lo2"),
      col("hi").as("hi2"))
    // rank r (≤ n div 2) pairs with rank n+1−r: pairs with lengths
    // (la, lb) = |[lo1,hi1] ∩ [n+1−hi2, n+1−lo2] ∩ [1, n div 2]|
    val pairs = a1.crossJoin(broadcast(a2))
      .crossJoin(broadcast(totals.select(col("n"))))
      .select(col("la"), col("lb"),
        greatest(lit(0L),
          least(col("hi1"), col("n") + 1 - col("lo2"),
            expr("n div 2")) -
            greatest(col("lo1"), col("n") + 1 - col("hi2")) + 1).as("np"))
      .filter(col("np") > 0)
    val packAgg = pairs.agg(
      sum(when(col("la") + col("lb") <= cap, col("np")).otherwise(0L))
        .as("fit"),
      sum(when(col("la") + col("lb") > cap, col("np")).otherwise(0L))
        .as("split"))
    val packed = packAgg.crossJoin(broadcast(totals))
      .select(lit("c_fold_packed").as("regime"), col("n").as("n_seqs"),
        (col("fit") + col("split") * 2 + pmod(col("n"), lit(2L)))
          .as("n_bins"), col("rt").as("real_tokens"))
      .withColumn("cost_tokens", lit(cap) * col("n_bins"))
    val naive = totals.select(lit("a_naive_padded").as("regime"),
      col("n").as("n_seqs"), col("n").as("n_bins"),
      col("rt").as("real_tokens"), (lit(cap) * col("n")).as("cost_tokens"))
    val bucketed = batchingSummaryOf(docs, buckets, docsPerBatch, nShards)
      .agg(sum(col("n_docs")).as("n_seqs"), sum(col("n_batches")).as("n_bins"),
        sum(col("sum_tokens")).as("real_tokens"),
        sum(col("padded_tokens")).as("cost_tokens"))
      .select(lit("b_bucket_padded").as("regime"), col("n_seqs"),
        col("n_bins"), col("real_tokens"), col("cost_tokens"))
    Seq(naive, bucketed,
      packed.select(col("regime"), col("n_seqs"), col("n_bins"),
        col("real_tokens"), col("cost_tokens")))
      .reduce(_ unionByName _)
      .select(col("regime"), col("n_seqs"), col("n_bins"),
        col("real_tokens"), col("cost_tokens"),
        expr("cast(cost_tokens - real_tokens as decimal(38,0)) * 10000 div " +
          "cast(cost_tokens as decimal(38,0))").cast("long").as("waste_bp"))
      .orderBy(col("regime"))
  }

  def packingElectionSql(buckets: Seq[Int] = BatchBuckets,
                         docsPerBatch: Int = DocsPerBatch,
                         nShards: Int = 8): String = {
    val cap = buckets.last
    s"""WITH h AS (
       |  SELECT least(len(string_split(lower(text), ' ')), $cap)::BIGINT
       |    AS tok, count(*)::BIGINT AS c
       |  FROM documents GROUP BY 1
       |), nn AS (
       |  SELECT sum(c)::BIGINT AS n, sum(tok * c)::BIGINT AS rt FROM h
       |), iv AS (
       |  SELECT tok,
       |    (sum(c) OVER (ORDER BY tok DESC) - c + 1)::BIGINT AS lo,
       |    (sum(c) OVER (ORDER BY tok DESC))::BIGINT AS hi
       |  FROM h
       |), p AS (
       |  SELECT a1.tok AS la, a2.tok AS lb,
       |    greatest(0, least(a1.hi, nn.n + 1 - a2.lo, nn.n // 2)
       |      - greatest(a1.lo, nn.n + 1 - a2.hi) + 1)::BIGINT AS np
       |  FROM iv a1 CROSS JOIN iv a2 CROSS JOIN nn
       |), agg AS (
       |  SELECT sum(CASE WHEN la + lb <= $cap THEN np ELSE 0 END)::BIGINT
       |      AS fit,
       |    sum(CASE WHEN la + lb > $cap THEN np ELSE 0 END)::BIGINT AS split
       |  FROM p
       |), bq AS (${batchingSummarySql(buckets, docsPerBatch, nShards)}
       |), u AS (
       |  SELECT 'a_naive_padded' AS regime, n AS n_seqs, n AS n_bins,
       |    rt AS real_tokens, ($cap * n)::BIGINT AS cost_tokens FROM nn
       |  UNION ALL
       |  SELECT 'b_bucket_padded', sum(n_docs)::BIGINT,
       |    sum(n_batches)::BIGINT, sum(sum_tokens)::BIGINT,
       |    sum(padded_tokens)::BIGINT FROM bq
       |  UNION ALL
       |  SELECT 'c_fold_packed', nn.n,
       |    (agg.fit + 2 * agg.split + nn.n % 2)::BIGINT,
       |    nn.rt,
       |    ($cap * (agg.fit + 2 * agg.split + nn.n % 2))::BIGINT
       |  FROM agg CROSS JOIN nn
       |)
       |SELECT regime, n_seqs, n_bins, real_tokens, cost_tokens,
       |  ((cost_tokens - real_tokens) * 10000 // cost_tokens)::BIGINT
       |    AS waste_bp
       |FROM u ORDER BY regime""".stripMargin
  }

  def batchingSummarySql(buckets: Seq[Int] = BatchBuckets,
                         docsPerBatch: Int = DocsPerBatch,
                         nShards: Int = 8): String = {
    val maxCap = buckets.last
    val bucketCase = buckets.init
      .map(b => s"WHEN len <= $b THEN $b").mkString("CASE ", " ", s" ELSE $maxCap END")
    s"""WITH l AS (
       |  SELECT doc_id, doc_id % $nShards AS shard,
       |    len(string_split(lower(text), ' '))::BIGINT AS len
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, shard, ($bucketCase)::BIGINT AS bucket_cap,
       |    least(len, $maxCap) AS tok,
       |    CASE WHEN len > $maxCap THEN 1 ELSE 0 END AS trunc
       |  FROM l
       |), r AS (
       |  SELECT *, (row_number() OVER (PARTITION BY bucket_cap, shard
       |    ORDER BY doc_id) - 1) // $docsPerBatch AS batch_id
       |  FROM b
       |), pb AS (
       |  SELECT bucket_cap, shard, batch_id, count(*)::BIGINT AS rows,
       |    max(tok) AS max_tok, sum(tok)::BIGINT AS toks,
       |    sum(trunc)::BIGINT AS truncs
       |  FROM r GROUP BY bucket_cap, shard, batch_id
       |)
       |SELECT bucket_cap, sum(rows)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_batches, sum(toks)::BIGINT AS sum_tokens,
       |  sum(rows * max_tok)::BIGINT AS padded_tokens,
       |  sum(truncs)::BIGINT AS n_truncated,
       |  ((sum(rows * max_tok) - sum(toks)) * 10000
       |    // sum(rows * max_tok))::BIGINT AS waste_bp
       |FROM pb GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin
  }
}
