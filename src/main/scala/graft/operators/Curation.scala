package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Training-data curation operators (north-star LLM-pipeline surface,
  * beyond SURVEY §2.12): deterministic split assignment, text
  * normalization, and benchmark-contamination detection — the three ops
  * every pretraining corpus pipeline runs after dedup.
  *
  * Scale posture: split assignment and normalization are narrow per-row
  * maps; contamination joins on 60-bit shingle HASHES (not shingle
  * strings), with the benchmark side distinct'd and broadcast — at 100 TB
  * the corpus never shuffles, only its hashed shingles stream through a
  * broadcast semi-join.
  */
object Curation {

  /** THE 80/10/10 content-hash split rule — single source of truth for
    * every operator that assigns splits (q43, the composed pipeline
    * q77): md5-hash-mod on the text (NOT rand() — re-runs and engines
    * agree, and the split follows content, so exact dups land in the
    * same split). */
  def splitAssign(text: Column): Column = {
    val h = TextHash.h1(text) % 100
    when(h < 80, "train").when(h < 90, "val").otherwise("test")
  }

  /** DuckDB twin of [[splitAssign]]. `hmod` must be a PRE-BOUND column
    * holding `h1(text) % 100` — bind the md5 once per row in an
    * enclosing CTE (TextHash's documented oracle pattern) instead of
    * baking the hash expression into the CASE twice. */
  def splitAssignSql(hmod: String): String =
    s"CASE WHEN $hmod < 80 THEN 'train' " +
      s"WHEN $hmod < 90 THEN 'val' ELSE 'test' END"

  /** Deterministic train/val/test assignment ([[splitAssign]]),
    * summarized per (lang, split). */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"),
        splitAssign(col("text")).as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))
  }

  def trainSplitSql: String =
    s"""SELECT lang,
       |  ${splitAssignSql("hmod")} AS split,
       |  count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
       |FROM (SELECT lang, n_chars,
       |      ${TextHash.h1Sql("text")} % 100 AS hmod FROM documents)
       |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** X22 split-leakage audit (q94): near-dup components that straddle a
    * train/val/test boundary — the classic contamination pitfall
    * [[splitAssign]] alone cannot prevent: EXACT duplicates share a
    * split by construction (same text, same hash), but a NEAR-duplicate
    * pair can hash apart, putting a test document's sibling in train.
    * Per component-anchor language: multi-member components, leaky ones
    * (spanning >1 split), documents inside leaky components, and the
    * leak rate. A dedup-aware split assigns per COMPONENT (hash the
    * anchor, not the member) — this audit is the evidence for that fix.
    *
    * Scale posture: reuses the PlanCache'd label propagation (shared
    * with q64/q91); everything added is keyed joins on doc_id/label and
    * a component-sized rollup — no new corpus-sized shuffle beyond the
    * split projection. */
  def splitLeakage(spark: SparkSession, dir: String,
                   threshold: Double = 0.5, rounds: Int = 6): DataFrame = {
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), splitAssign(col("text")).as("split"))
    val comp = Dedup.dedupClusterAssignments(spark, dir, threshold, rounds)
      .join(s, Seq("doc_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("split")).as("n_splits"))
      // exact twin of the oracle's HAVING count(*) > 1: a no-op when label
      // propagation has fully converged (assignments are members-only), but
      // a chain whose min-label eccentricity exceeds `rounds` leaves size-1
      // label groups that would otherwise inflate n_components Spark-side
      .filter(col("n_members") > 1)
    comp.join(Tables.documents(spark, dir)
        .select(col("doc_id").as("label"), col("lang")), Seq("label"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_components"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaky"),
        sum(when(col("n_splits") > 1, col("n_members")).otherwise(lit(0L)))
          .as("n_docs_leaky"))
      .select(col("lang"), col("n_components"), col("n_leaky"),
        col("n_docs_leaky"),
        round(col("n_leaky").cast("double") / col("n_components"), 6)
          .as("leak_rate"))
      .orderBy(col("lang"))
  }

  def splitLeakageSql(threshold: Double = 0.5, rounds: Int = 6): String =
    s"""WITH ${Dedup.labelPropagationCtes(threshold, rounds)}, s AS (
       |  SELECT doc_id, ${splitAssignSql("hmod")} AS split
       |  FROM (SELECT doc_id, ${TextHash.h1Sql("text")} % 100 AS hmod
       |        FROM documents)
       |), comp AS (
       |  SELECT l.label, count(*)::BIGINT AS n_members,
       |    count(DISTINCT s.split)::BIGINT AS n_splits
       |  FROM l$rounds l JOIN s ON s.doc_id = l.doc_id
       |  GROUP BY l.label HAVING count(*) > 1
       |)
       |SELECT d.lang, count(*)::BIGINT AS n_components,
       |  sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaky,
       |  sum(CASE WHEN n_splits > 1 THEN n_members ELSE 0 END)::BIGINT
       |    AS n_docs_leaky,
       |  round(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
       |    / count(*)::DOUBLE, 6) AS leak_rate
       |FROM comp JOIN documents d ON d.doc_id = comp.label
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** X24 component-anchored split (q96): the FIX the q94 leakage audit
    * is evidence for — hash the near-dup component's ANCHOR text instead
    * of each member's own, so every member of a component inherits one
    * split and near-duplicates can never straddle a train/test boundary
    * (exact dups already couldn't; q94 shows near-dups CAN under
    * [[splitAssign]]). Audited per (lang, split): docs, components, and
    * how many docs the fix RELOCATED relative to their own content-hash
    * split — the migration cost of adopting component splits.
    *
    * Scale posture: reuses the PlanCache'd label propagation (shared
    * with q64/q91/q94); the anchor-split table is doc-keyed and joins on
    * the component label; everything added is keyed joins plus one
    * (lang, split)-sized rollup — no new corpus-wide shuffle beyond what
    * the components already paid. */
  def componentSplit(spark: SparkSession, dir: String,
                     threshold: Double = 0.5, rounds: Int = 6): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        splitAssign(col("text")).as("own_split"))
    val anchors = Tables.documents(spark, dir)
      .select(col("doc_id").as("label"), splitAssign(col("text")).as("split"))
    // assignments cover edge-connected docs only — a doc with no near-dup
    // candidate anchors ITSELF (its component is the singleton {doc}),
    // the same totalization dedupClusters applies via its anti-join
    docs.join(Dedup.dedupClusterAssignments(spark, dir, threshold, rounds),
        Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
      .join(anchors, Seq("label"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("label")).as("n_components"),
        sum(when(col("own_split") =!= col("split"), 1L).otherwise(0L))
          .as("n_moved"))
      .orderBy(col("lang"), col("split"))
  }

  def componentSplitSql(threshold: Double = 0.5, rounds: Int = 6): String =
    s"""WITH ${Dedup.labelPropagationCtes(threshold, rounds)}, s AS (
       |  SELECT doc_id, lang, ${splitAssignSql("hmod")} AS own_split
       |  FROM (SELECT doc_id, lang, ${TextHash.h1Sql("text")} % 100 AS hmod
       |        FROM documents)
       |), a AS (
       |  SELECT doc_id AS label, ${splitAssignSql("hmod")} AS split
       |  FROM (SELECT doc_id, ${TextHash.h1Sql("text")} % 100 AS hmod
       |        FROM documents)
       |)
       |SELECT s.lang, a.split, count(*)::BIGINT AS n_docs,
       |  count(DISTINCT l.label)::BIGINT AS n_components,
       |  sum(CASE WHEN s.own_split <> a.split THEN 1 ELSE 0 END)::BIGINT
       |    AS n_moved
       |FROM l$rounds l
       |JOIN s ON s.doc_id = l.doc_id
       |JOIN a ON a.label = l.label
       |GROUP BY s.lang, a.split ORDER BY s.lang, a.split""".stripMargin

  /** Stratified k-fold assignment for cross-validation: content-hash mod
    * k (same determinism/dup-cohesion argument as [[trainSplit]] — exact
    * duplicates always share a fold, so no fold ever trains on another
    * fold's eval text), summarized per (lang, fold) so stratification is
    * auditable. */
  def kfoldSplit(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val fold = TextHash.h1(col("text")) % k
    Tables.documents(spark, dir)
      .select(col("lang"), fold.as("fold"), col("n_chars"))
      .groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("fold"))
  }

  def kfoldSplitSql(k: Int = 5): String =
    s"""SELECT lang, (${TextHash.h1Sql("text")} % $k) AS fold,
       |  count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
       |FROM documents
       |GROUP BY 1, 2 ORDER BY lang, fold""".stripMargin

  /** Default per-language resampling rates (percent): downsample the
    * over-represented languages, upsample an under-represented one —
    * the shape of a training-data language-mix rebalance. */
  val MixRates: Map[String, Int] = Map("en" -> 50, "de" -> 150)

  /** Deterministic mix resampler: every doc gets an integer copy count
    * `rate÷100 + (salted-hash < rate mod 100 ? 1 : 0)` — rate 50 keeps a
    * deterministic half, rate 150 keeps every doc and duplicates a
    * deterministic half. The hash is SALTED (text‖"|mix") so sampling is
    * independent of the split assignment ([[trainSplit]] hashes the bare
    * text — reusing it would correlate the sample with the split folds).
    * Summarized per language; the materializing twin is an
    * `explode(sequence(1, copies))` away and shares the counts. */
  def mixResample(spark: SparkSession, dir: String,
                  rates: Map[String, Int] = MixRates,
                  defaultRate: Int = 100): DataFrame = {
    val h = TextHash.h1(concat(col("text"), lit("|mix"))) % 100
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (els, (l, r)) => when(col("lang") === l, lit(r)).otherwise(els)
    }
    val copies = (rate - pmod(rate, lit(100))) / 100 +
      when(h < pmod(rate, lit(100)), 1).otherwise(0)
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"), copies.cast("long").as("copies"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("copies")).as("n_after"),
        sum(col("n_chars") * col("copies")).as("chars_after"))
      .orderBy(col("lang"))
  }

  def mixResampleSql(rates: Map[String, Int] = MixRates,
                     defaultRate: Int = 100): String = {
    val rateCase = rates.toSeq.sortBy(_._1).reverse
      .foldLeft(defaultRate.toString) { case (els, (l, r)) =>
        s"CASE WHEN lang = '$l' THEN $r ELSE $els END"
      }
    s"""WITH d AS (
       |  SELECT lang, n_chars,
       |    (${TextHash.h1Sql("(text || '|mix')")} % 100) AS h,
       |    ($rateCase) AS rate
       |  FROM documents
       |), c AS (
       |  SELECT lang, n_chars,
       |    ((rate - (rate % 100)) / 100
       |      + CASE WHEN h < rate % 100 THEN 1 ELSE 0 END)::BIGINT AS copies
       |  FROM d
       |)
       |SELECT lang, count(*) AS n_docs,
       |  sum(copies)::BIGINT AS n_after,
       |  sum(n_chars * copies)::BIGINT AS chars_after
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Text normalization: lowercase → strip non-[a-z ] → collapse runs of
    * spaces → trim; summarized per language (bytes saved, distinct-after
    * counts expose normalization-induced duplicates). */
  def normalizeSummary(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z ]", ""), " +", " "))
    Tables.documents(spark, dir)
      .select(col("lang"), length(col("text")).cast("long").as("raw_len"),
        length(norm).cast("long").as("norm_len"), norm.as("norm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_len")).as("sum_raw_chars"),
        sum(col("norm_len")).as("sum_norm_chars"),
        countDistinct(col("norm")).as("n_distinct_normalized"))
      .orderBy(col("lang"))
  }

  def normalizeSummarySql: String =
    """SELECT lang, count(*) AS n_docs,
      |  sum(length(text))::BIGINT AS sum_raw_chars,
      |  sum(length(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z ]', '', 'g'), ' +', ' ', 'g'))))::BIGINT AS sum_norm_chars,
      |  count(DISTINCT trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z ]', '', 'g'), ' +', ' ', 'g'))) AS n_distinct_normalized
      |FROM documents
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** PII/boilerplate scrub patterns (C4-style): conservative regexes for
    * URLs, e-mail addresses, and long digit runs (phone/ID shapes). Java
    * and RE2 dialect-compatible (no lookbehind). */
  val ScrubPatterns: Seq[(String, String)] = Seq(
    "url" -> "https?://\\S+",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "digits" -> "\\d{7,}")

  /** Scrub a text column: every pattern match is replaced with its
    * `[TAG]` sentinel. Pure per-row `regexp_replace` chain — narrow,
    * codegen'd, no UDF; at 100 TB this is a map stage fused into
    * whatever scan feeds it. Oracle-gated by [[scrubAudit]] (q60), which
    * injects scrub-able tokens in-query; raw-fixture semantics are pinned
    * by CurationSpec. */
  def scrub(text: org.apache.spark.sql.Column,
            patterns: Seq[(String, String)] = ScrubPatterns): org.apache.spark.sql.Column =
    patterns.foldLeft(text) { case (c, (tag, re)) =>
      regexp_replace(c, re, s"[${tag.toUpperCase}]")
    }

  /** Per-language scrub audit: docs touched per pattern + chars removed. */
  def scrubSummary(df: DataFrame,
                   patterns: Seq[(String, String)] = ScrubPatterns): DataFrame = {
    val flags = patterns.map { case (tag, re) =>
      sum(when(regexp_like(col("text"), lit(re)), 1L).otherwise(0L))
        .as(s"n_docs_with_$tag")
    }
    val delta = sum(length(col("text")) - length(scrub(col("text"), patterns)))
      .as("chars_delta")
    val aggs = flags :+ delta
    df.select(col("lang"), col("text"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .orderBy(col("lang"))
  }

  /** Oracle-gated scrub audit (q60): the driver's synthetic corpus is
    * lowercase-alpha (zero scrub matches — a degenerate oracle row proves
    * nothing), so scrub-able URL/email/digit-run tokens are injected
    * IN-QUERY, derived deterministically from doc_id, and both engines
    * scrub the identical augmented text. Same narrow regexp chain as
    * [[scrubSummary]]; the injection is a constant-folding-friendly
    * concat. */
  def scrubAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val injected = concat(
      col("text"),
      when(pmod(d, lit(3)) === 0,
        concat(lit(" see http://ex"), pmod(d, lit(7)).cast("string"),
          lit(".com/p now"))).otherwise(lit("")),
      when(pmod(d, lit(4)) === 1,
        concat(lit(" mail u"), d.cast("string"), lit("@ex"),
          pmod(d, lit(5)).cast("string"), lit(".net ok"))).otherwise(lit("")),
      when(pmod(d, lit(5)) === 2,
        concat(lit(" ref "), (lit(1000000L) + pmod(d * 37, lit(9000000)))
          .cast("string"), lit(" end"))).otherwise(lit("")))
    scrubSummary(Tables.documents(spark, dir)
      .select(col("lang"), injected.as("text")))
  }

  def scrubAuditSql(patterns: Seq[(String, String)] = ScrubPatterns): String = {
    // one source of truth: the SQL twin derives its regex chain from the
    // same ScrubPatterns list the Column side folds over
    val scrubbed = patterns.foldLeft("text") { case (e, (tag, re)) =>
      s"regexp_replace($e, '$re', '[${tag.toUpperCase}]', 'g')"
    }
    val flagCols = patterns.map { case (tag, re) =>
      s"  sum(CASE WHEN regexp_matches(text, '$re') THEN 1 ELSE 0 END)::BIGINT AS n_docs_with_$tag,"
    }.mkString("\n")
    s"""WITH aug AS (
       |  SELECT lang, text
       |    || CASE WHEN doc_id % 3 = 0 THEN ' see http://ex' || (doc_id % 7)::VARCHAR || '.com/p now' ELSE '' END
       |    || CASE WHEN doc_id % 4 = 1 THEN ' mail u' || doc_id::VARCHAR || '@ex' || (doc_id % 5)::VARCHAR || '.net ok' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 2 THEN ' ref ' || (1000000 + (doc_id * 37) % 9000000)::VARCHAR || ' end' ELSE '' END
       |    AS text
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_docs,
       |$flagCols
       |  sum(length(text) - length($scrubbed))::BIGINT AS chars_delta
       |FROM aug GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Benchmark-contamination check: corpus docs (doc_id ≥ benchSize)
    * sharing any word 5-gram with the "benchmark set" (doc_id <
    * benchSize) are flagged. The join key is the 60-bit shingle hash;
    * the benchmark hash set is distinct'd and broadcast. */
  def contamination(spark: SparkSession, dir: String,
                    benchSize: Int = 10, n: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.HashExpressions.shingleHashes(col("text"), n)).as("h"))
    val bench = sh.filter(col("doc_id") < benchSize).select(col("h")).distinct()
    val contaminated = sh.filter(col("doc_id") >= benchSize)
      .join(broadcast(bench), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("is_cont", lit(1L))
    docs.filter(col("doc_id") >= benchSize)
      .select(col("doc_id"), col("lang"))
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_corpus_docs"),
        sum(coalesce(col("is_cont"), lit(0L))).as("n_contaminated"))
      .orderBy(col("lang"))
  }

  /** Bloom-prefiltered contamination: the scale path for when the
    * benchmark shingle set outgrows the broadcast budget. A Bloom filter
    * over the bench hashes (1.44·n·log2(1/fpp) bits — size bounded by
    * construction, independent of the corpus) prunes the corpus-side
    * shingles first; only the survivors (true hits + ~fpp false
    * positives) reach the exact semi-join, which the planner can then
    * shuffle cheaply or broadcast. The final answer is EXACT — the bloom
    * is a bandwidth optimization, invisible in the result — so this
    * shares q45's oracle.
    *
    * The bloom is built IN-PLAN: a Catalyst `BloomFilterAggregate` over
    * the bench hashes, delivered to the corpus side through a scalar
    * subquery feeding `BloomFilterMightContain` — the same machinery
    * Spark's own runtime row-group filtering injects. Constructing this
    * DataFrame therefore launches ZERO driver-side jobs (the old shape
    * ran `count()` + `stat.bloomFilter` eagerly and computed the bench
    * subquery three times); the bloom is sized statically from
    * `benchSize × maxShinglesPerDoc`, a bound that depends only on
    * construction parameters, never on corpus statistics. */
  def contaminationBloom(spark: SparkSession, dir: String,
                         benchSize: Int = 10, n: Int = 5,
                         fpp: Double = 0.03,
                         maxShinglesPerDoc: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.bridge
    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.HashExpressions.shingleHashes(col("text"), n)).as("h"))
    val bench = sh.filter(col("doc_id") < benchSize).select(col("h")).distinct()
    val estItems = math.max(benchSize.toLong * maxShinglesPerDoc, 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(estItems, fpp)
    val bloomDf = bench.select(bridge.column(
      new BloomFilterAggregate(bridge.expression(col("h")),
        Literal(estItems), Literal(numBits)).toAggregateExpression()).as("bloom"))
    val mightContain = bridge.column(new BloomFilterMightContain(
      bridge.scalarSubquery(bloomDf), bridge.expression(col("h"))))
    val contaminated = sh.filter(col("doc_id") >= benchSize)
      .filter(mightContain)                  // bounded-size prefilter
      .join(bench, Seq("h"), "left_semi")    // exact verify on survivors
      .select(col("doc_id")).distinct()
      .withColumn("is_cont", lit(1L))
    docs.filter(col("doc_id") >= benchSize)
      .select(col("doc_id"), col("lang"))
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_corpus_docs"),
        sum(coalesce(col("is_cont"), lit(0L))).as("n_contaminated"))
      .orderBy(col("lang"))
  }

  def contaminationSql(benchSize: Int = 10, n: Int = 5): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, lang, ${TextHash.h1Sql("g")} AS h
       |  FROM (SELECT doc_id, lang,
       |    unnest(${TextHash.shinglesSql("t", n)}) AS g FROM toks)
       |), bench AS (
       |  SELECT DISTINCT h FROM sh WHERE doc_id < $benchSize
       |), cont AS (
       |  SELECT DISTINCT doc_id FROM sh
       |  WHERE doc_id >= $benchSize AND h IN (SELECT h FROM bench)
       |)
       |SELECT lang, count(*) AS n_corpus_docs,
       |  sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
       |      THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
       |FROM documents WHERE doc_id >= $benchSize
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Contamination by OVERLAP FRACTION (q74): where q45 flags a doc on
    * ANY shared shingle, the production decontamination rule is graded —
    * a doc is dropped when ≥ `minPct`% of its distinct n-grams appear in
    * the benchmark (the "dirty above a threshold" rule). The per-doc
    * test is pure integer arithmetic (n_hit·100 ≥ n_sh·minPct — no
    * float threshold to drift cross-engine), and the reported per-lang
    * ratio is ONE division of two exact integer sums. Docs shorter than
    * n tokens have no shingles and are out of scope (no overlap is
    * defined for them).
    *
    * Scale posture: same as q45 — the benchmark side reduces to a
    * distinct 60-bit hash set and broadcasts; the corpus's hashed
    * shingles stream through the broadcast join and collapse back to
    * per-doc counts keyed on doc_id. Nothing corpus-sized shuffles on a
    * gram key. */
  def contaminationOverlap(spark: SparkSession, dir: String,
                           benchSize: Int = 10, n: Int = 5,
                           minPct: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // native one-pass kernel (bit-equivalent to explode(shingles)+h1 —
    // HashKernelsSpec): the HOF shingle chain is CodegenFallback and was
    // ~2× the kernel's cost on this full-corpus pass (same move as q45)
    val sh = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.HashExpressions.shingleHashes(col("text"), n))
        .as("h"))
    val bench = sh.filter(col("doc_id") < benchSize)
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    val perDoc = sh.filter(col("doc_id") >= benchSize)
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hit") * 100 >= col("n_sh") * minPct, 1L)
          .otherwise(0L)).as("n_flagged"),
        round(sum(col("n_hit")).cast("double") / sum(col("n_sh")), 4)
          .as("overlap_ratio"))
      .orderBy(col("lang"))
  }

  /** Scale-harness seam (ScaleHarnessSpec): the broadcast (bench-side)
    * input of the q74 overlap join — the distinct benchmark gram-hash
    * set. Bounded by the BENCHMARK's vocabulary, so corpus-side
    * duplicate inflation cannot grow what gets broadcast. */
  def contaminationBenchGrams(spark: SparkSession, dir: String,
                              benchSize: Int = 10, n: Int = 5): Long =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < benchSize)
      .select(explode(
        graft.functions.HashExpressions.shingleHashes(col("text"), n)).as("h"))
      .distinct().count()

  def contaminationOverlapSql(benchSize: Int = 10, n: Int = 5,
                              minPct: Int = 50): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, lang, ${TextHash.h1Sql("g")} AS h
       |  FROM (SELECT doc_id, lang,
       |    unnest(${TextHash.shinglesSql("t", n)}) AS g FROM toks)
       |), bench AS (
       |  SELECT DISTINCT h FROM sh WHERE doc_id < $benchSize
       |), per_doc AS (
       |  SELECT doc_id, lang, count(*) AS n_sh,
       |    sum(CASE WHEN h IN (SELECT h FROM bench) THEN 1 ELSE 0 END) AS n_hit
       |  FROM sh WHERE doc_id >= $benchSize GROUP BY doc_id, lang
       |)
       |SELECT lang, count(*) AS n_docs,
       |  sum(CASE WHEN n_hit * 100 >= n_sh * $minPct THEN 1 ELSE 0 END)::BIGINT
       |    AS n_flagged,
       |  round(sum(n_hit) * 1.0 / sum(n_sh), 4) AS overlap_ratio
       |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** Latest-version-wins upsert — the batch MERGE INTO shape a corpus
    * refresh runs: union base + updates, keep one row per key (highest
    * `version`, ties broken by highest `tiebreak` so re-runs are
    * deterministic even when one refresh carries several updates for a
    * key). Scale posture: ONE hash-partitioned shuffle on the key; the
    * running row_number needs no partition buffering, and AQE splits a
    * hot key's sort at runtime. (A real table format would do this as a
    * compaction; this is the engine-level semantics underneath it.) */
  def upsertLatest(base: DataFrame, updates: DataFrame,
                   key: String, version: String, tiebreak: String): DataFrame = {
    require(!base.columns.contains("_rn") && !updates.columns.contains("_rn"),
      "upsertLatest: inputs must not already carry a '_rn' column — " +
        "withColumn would replace it and the final drop would remove both")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
      .orderBy(col(version).desc, col(tiebreak).desc)
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Oracle-gated upsert audit (q72): a historical snapshot (doc_id <
    * histSize, version 0) refreshed with an update batch (doc_id >=
    * histSize, version 1) that half overwrites existing keys and half
    * inserts new ones (key = doc_id mod 2·histSize). Per language: rows
    * in the merged snapshot, how many came from the update batch, and
    * the merged char mass. */
  def snapshotUpsertSummary(spark: SparkSession, dir: String,
                            histSize: Int = 200): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") < histSize)
      .select(col("doc_id").as("key"), col("lang"), col("n_chars"),
        lit(0L).as("version"), col("doc_id").as("src_id"))
    val updates = docs.filter(col("doc_id") >= histSize)
      .select(pmod(col("doc_id"), lit(2L * histSize)).as("key"), col("lang"),
        col("n_chars"), lit(1L).as("version"), col("doc_id").as("src_id"))
    upsertLatest(base, updates, "key", "version", "src_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("version") === 1L, 1L).otherwise(0L)).as("n_from_updates"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Deterministic per-stratum EXACT-k sample (q75): the eval-subset /
    * pilot-corpus selection move — take exactly k docs per language,
    * chosen by content-hash order (h1(text), doc_id tie-break), so the
    * sample is reproducible across runs and engines and follows content,
    * not storage order. rand()-based sampling gives neither.
    *
    * Scale posture: selection is the bounded-heap [[graft.functions
    * .MinKDocs]] two-phase aggregate — each map task keeps its k smallest
    * (hash, doc_id) pairs per language, the shuffle carries ~partitions×k
    * rows, and no task ever sorts a stratum (a whole language of a 100 TB
    * corpus would be one window partition in the rank formulation —
    * CurationSpec proves heap == window-rank). The k winners then
    * broadcast back onto the corpus to fetch payload columns. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       k: Int = 50): DataFrame = {
    val minK = udaf(new graft.functions.MinKDocs(k))
    val docs = Tables.documents(spark, dir)
    val picked = docs
      .select(col("lang"), TextHash.h1(col("text")).as("h"), col("doc_id"))
      .groupBy(col("lang"))
      .agg(minK(col("h"), col("doc_id")).as("picks"))
      .select(col("lang"), explode(col("picks")).as("p"))
      .select(col("lang"), col("p.doc_id").as("doc_id"))
    broadcast(picked)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy(col("lang"))
  }

  def stratifiedSampleSql(k: Int = 50): String =
    s"""WITH r AS (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${TextHash.h1Sql("text")}, doc_id) AS rn
       |  FROM documents
       |)
       |SELECT lang, count(*) AS n_sampled,
       |  sum(n_chars)::BIGINT AS sum_chars,
       |  sum(doc_id)::BIGINT AS sum_doc_ids
       |FROM r WHERE rn <= $k
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Coin modulus for [[weightedSample]]: the race coin is uniform on
    * [1, 2²⁰], so its integer log2 costs span [0, 20000] milli-bits. */
  private val WsCoinM = 1L << 20

  /** X88 weighted reservoir sample (q162): exactly-k-per-language
    * TOKEN-MASS-weighted sampling — the Efraimidis–Spirakis exponential
    * race (public: Efraimidis & Spirakis 2006, "Weighted random sampling
    * with a reservoir": key uᵢ^(1/wᵢ), keep top-k ⇔ keep the k smallest
    * −ln(uᵢ)/wᵢ), re-expressed on the repo's exact-integer rails so both
    * engines elect the identical sample: the coin is the q78/q86 md5
    * device (uniform on [1, 2²⁰]), −ln u becomes the q140 integer
    * log2-milli-bit cost (20000 − log2mb(u)), and the race key is one
    * BIGINT division (cost·10⁹ div w, doc_id tie-break). Bigger
    * documents draw proportionally smaller keys, so the k winners are a
    * weighted-without-replacement draw — the eval-subset move when docs
    * must be sampled by token mass, not per-doc uniformly (q75's rule).
    *
    * Scale posture: q75's exact shape with the race key in place of the
    * content hash — bounded-heap [[graft.functions.MinKDocs]] two-phase
    * aggregate (each map task keeps k rows per language, no stratum ever
    * sorts), winners broadcast back for payload. No float anywhere: the
    * E-S exponentials live entirely in milli-bit integers. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 8,
                     seed: Long = 42): DataFrame = {
    val minK = udaf(new graft.functions.MinKDocs(k))
    val docs = Tables.documents(spark, dir)
    val keyed = docs
      .select(col("lang"), col("doc_id"),
        size(TextHash.tokens(col("text"))).cast("long").as("w"))
      .withColumn("u",
        TextHash.h1(concat(lit(s"ws:$seed:"), col("doc_id").cast("string")))
          % WsCoinM + 1L)
      .withColumn("race_key",
        expr(s"(20000 - ${TextAnalysis.log2MilliSpark("u")}) " +
          "* cast(1000000000 as bigint) div w"))
    val picked = keyed
      .groupBy(col("lang"))
      .agg(minK(col("race_key"), col("doc_id")).as("picks"))
      .select(col("lang"), posexplode(expr("array_sort(picks)")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rn"),
        col("col.h").as("race_key"), col("col.doc_id").as("doc_id"))
    broadcast(picked)
      .join(keyed.select(col("doc_id"), col("w")), Seq("doc_id"))
      .select(col("lang"), col("rn"), col("doc_id"), col("w"), col("race_key"))
      .orderBy(col("lang"), col("rn"))
  }

  def weightedSampleSql(k: Int = 8, seed: Long = 42): String =
    s"""WITH d AS (
       |  SELECT lang, doc_id, len(string_split(lower(text), ' '))::BIGINT AS w
       |  FROM documents
       |), c AS (
       |  SELECT lang, doc_id, w,
       |    (${TextHash.h1Sql(s"'ws:$seed:' || doc_id")} % $WsCoinM) + 1 AS u
       |  FROM d
       |), kx AS (
       |  SELECT lang, doc_id, w,
       |    ((20000 - ${TextAnalysis.log2MilliDuck("u")}) * 1000000000) // w
       |      AS race_key
       |  FROM c
       |), r AS (
       |  SELECT lang, doc_id, w, race_key,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY race_key, doc_id) AS rn
       |  FROM kx
       |)
       |SELECT lang, rn::BIGINT AS rn, doc_id, w, race_key
       |FROM r WHERE rn <= $k ORDER BY lang, rn""".stripMargin

  /** Deterministic corpus shuffle (q78): reproducible training-order
    * randomization. Every doc gets a pseudorandom-but-deterministic
    * 60-bit key = md5("shuf:<seed>:<doc_id>") — NOT rand(): re-runs,
    * engines, and resumed jobs all agree on the exact order, which is
    * what makes a training run reproducible and an interrupted epoch
    * resumable from a position. shard = key mod nShards spreads docs
    * uniformly; within a shard the key ascending IS the read order
    * ([[corpusShuffleLayout]] materializes it; [[Packing.packContextsOf]]
    * consumes an order like it). This query is the audit: per-shard doc/
    * token mass (uniformity check), language diversity (a shuffle that
    * clusters languages starves mixed batches), and the first/last doc
    * ids in shard order (positional spot-check that the order itself —
    * not just membership — is reproducible).
    *
    * Scale posture: one narrow map (hash key from doc_id, no text bytes)
    * + one nShards-row aggregate; the layout twin is exactly one
    * exchange. Nothing here reads text except the token count. */
  def corpusShuffle(spark: SparkSession, dir: String,
                    nShards: Int = 32, seed: Long = 42): DataFrame = {
    val key = TextHash.h1(concat(lit(s"shuf:$seed:"), col("doc_id").cast("string")))
    val shuffleOrderKey = concat(
      lpad(col("skey").cast("string"), 20, "0"),
      lpad(col("doc_id").cast("string"), 20, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"),
        key.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        // tiebreak on doc_id (60-bit keys collide past ~2^30 docs): the
        // (skey, doc_id) order is packed into a zero-padded string because
        // DuckDB's arg_min can't order by a struct — lexicographic equals
        // numeric for fixed-width non-negative digits
        min_by(col("doc_id"), shuffleOrderKey).as("first_doc"),
        max_by(col("doc_id"), shuffleOrderKey).as("last_doc"))
      .orderBy(col("shard"))
  }

  def corpusShuffleSql(nShards: Int = 32, seed: Long = 42): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens,
       |    ${TextHash.h1Sql(s"'shuf:$seed:' || doc_id::VARCHAR")} AS skey
       |  FROM documents
       |)
       |SELECT skey % $nShards AS shard, count(*) AS n_docs,
       |  sum(n_tokens)::BIGINT AS sum_tokens,
       |  count(DISTINCT lang)::BIGINT AS n_langs,
       |  arg_min(doc_id, lpad(skey::VARCHAR, 20, '0') || lpad(doc_id::VARCHAR, 20, '0')) AS first_doc,
       |  arg_max(doc_id, lpad(skey::VARCHAR, 20, '0') || lpad(doc_id::VARCHAR, 20, '0')) AS last_doc
       |FROM d GROUP BY shard ORDER BY shard""".stripMargin

  /** The materializing twin of [[corpusShuffle]]: the corpus re-keyed
    * into training order — ONE exchange on shard, rows inside each shard
    * sorted by the shuffle key, so a partitioned writer emits files a
    * trainer reads sequentially. The 60-bit md5 key is near-unique but NOT
    * collision-free at corpus scale (birthday bound: collisions expected
    * past ~2^30 docs), so doc_id is the final tiebreaker — the order stays
    * total and stable even when two docs share a key. */
  def corpusShuffleLayout(docs: DataFrame,
                          nShards: Int = 32, seed: Long = 42): DataFrame = {
    val key = TextHash.h1(concat(lit(s"shuf:$seed:"), col("doc_id").cast("string")))
    docs.withColumn("skey", key)
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("skey"), col("doc_id"))
  }

  // ---- X42: shard content manifest (q115) ---------------------------------

  /** X42 shard manifest (q115): the reproducibility certificate for a
    * materialized training layout — per q78 shard: doc count, token
    * mass, an ORDER-INVARIANT content checksum (`bit_xor` of a 60-bit
    * row signature over (doc_id, sha256(text))), and the min/max row
    * signatures as spot-check anchors. Two materializations of "the same
    * corpus" (different writers, different partition layouts, a resumed
    * job) are byte-equivalent iff their manifests match; a single
    * changed/missing/extra document flips exactly its shard's xor.
    * doc_id is folded into the signature so duplicate texts cannot
    * cancel under xor.
    *
    * Scale posture: one narrow scan (hash + token count, no text bytes
    * survive the map) into an nShards-row aggregate with map-side
    * combine — xor is commutative/associative, so the checksum is
    * indifferent to partitioning and addition order by construction.
    * That is the whole point: the certificate can be recomputed on ANY
    * cluster layout and still match. */
  def shardManifest(spark: SparkSession, dir: String,
                    nShards: Int = 16, seed: Long = 42): DataFrame = {
    val skey = TextHash.h1(concat(lit(s"shuf:$seed:"), col("doc_id").cast("string")))
    val sig = TextHash.h1(concat(col("doc_id").cast("string"), lit(":"),
      sha2(col("text").cast("binary"), 256)))
    Tables.documents(spark, dir)
      .select(pmod(skey, lit(nShards.toLong)).as("shard"),
        size(TextHash.tokens(col("text"))).cast("long").as("n_tokens"),
        sig.as("sig"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        expr("bit_xor(sig)").as("content_xor"),
        min(col("sig")).as("min_sig"),
        max(col("sig")).as("max_sig"))
      .orderBy(col("shard"))
  }

  def shardManifestSql(nShards: Int = 16, seed: Long = 42): String =
    s"""WITH d AS (
       |  SELECT ${TextHash.h1Sql(s"'shuf:$seed:' || doc_id::VARCHAR")}
       |      % $nShards AS shard,
       |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens,
       |    ${TextHash.h1Sql("doc_id::VARCHAR || ':' || sha256(text)")} AS sig
       |  FROM documents
       |)
       |SELECT shard, count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
       |  bit_xor(sig)::BIGINT AS content_xor,
       |  min(sig)::BIGINT AS min_sig, max(sig)::BIGINT AS max_sig
       |FROM d GROUP BY shard ORDER BY shard""".stripMargin

  // ---- X46: scaling-ladder nested subsets (q119) --------------------------

  /** Ladder rungs in permil of the corpus: 1%, 10%, 100%. */
  val LadderPermil: Seq[Int] = Seq(10, 100, 1000)

  /** X46 scaling-ladder subset election (q119): the nested corpus
    * subsets a scaling-law study trains its model ladder on — rung r
    * keeps doc iff md5("ladder:<seed>:<doc_id>") mod 1000 < r, so the
    * 1% set is BY CONSTRUCTION a subset of the 10% set is a subset of
    * the full corpus (threshold nesting — the property that makes
    * ladder points comparable: a bigger run sees a superset, never a
    * resample). Per (rung, lang): docs, token mass, the rung's share of
    * the language's full token mass in basis points, and the order-free
    * doc_id sum — the q101 cross-engine MEMBERSHIP gate (the oracle can
    * only match if both engines elected identical documents).
    *
    * Scale posture: one scan, a constant 3-way rung fan-out of 8-byte
    * projected rows (the q88 device — text never fans out), map-side
    * combinable rollup to |rungs|·|langs| rows, lang totals broadcast
    * back. No sort, no corpus-keyed join, deterministic under re-runs
    * and engines (md5 coin, NOT rand() — the q43/q86 rule). */
  def scalingLadder(spark: SparkSession, dir: String,
                    seed: Long = 42): DataFrame = {
    val h = TextHash.h1(concat(lit(s"ladder:$seed:"),
      col("doc_id").cast("string"))) % 1000
    val per = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(TextHash.tokens(col("text"))).cast("long").as("t"), h.as("h"))
      .withColumn("rung_permil",
        explode(array(LadderPermil.map(r => lit(r.toLong)): _*)))
      .filter(col("h") < col("rung_permil"))
      .groupBy(col("rung_permil"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"),
        sum(col("doc_id")).as("sum_doc_ids"))
    val tot = Tables.documents(spark, dir)
      .select(col("lang"), size(TextHash.tokens(col("text"))).cast("long").as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("lang_tokens"))
    per.join(broadcast(tot), Seq("lang"))
      .select(col("rung_permil"), col("lang"), col("n_docs"),
        col("sum_tokens"), col("sum_doc_ids"),
        expr("cast(sum_tokens as decimal(38,0)) * 10000 div lang_tokens")
          .cast("long").as("share_bp"))
      .orderBy(col("rung_permil"), col("lang"))
  }

  def scalingLadderSql(seed: Long = 42): String =
    s"""WITH d AS (
       |  SELECT lang, doc_id,
       |    len(string_split(lower(text), ' '))::BIGINT AS t,
       |    ${TextHash.h1Sql(s"'ladder:$seed:' || doc_id::VARCHAR")} % 1000 AS h
       |  FROM documents
       |), per AS (
       |  SELECT r.rung_permil, d.lang, count(*)::BIGINT AS n_docs,
       |    sum(d.t)::BIGINT AS sum_tokens,
       |    sum(d.doc_id)::BIGINT AS sum_doc_ids
       |  FROM d CROSS JOIN (SELECT unnest([${LadderPermil.mkString(", ")}])
       |    AS rung_permil) r
       |  WHERE d.h < r.rung_permil
       |  GROUP BY 1, 2
       |), tot AS (
       |  SELECT lang, sum(t)::BIGINT AS lang_tokens FROM d GROUP BY lang
       |)
       |SELECT per.rung_permil::BIGINT AS rung_permil, per.lang, per.n_docs,
       |  per.sum_tokens, per.sum_doc_ids,
       |  ((per.sum_tokens * 10000) // tot.lang_tokens)::BIGINT AS share_bp
       |FROM per JOIN tot USING (lang)
       |ORDER BY rung_permil, lang""".stripMargin

  // ---- X47: split token-distribution divergence (q120) --------------------

  /** X47 split-distribution audit (q120): the eval-hygiene check AFTER
    * q94/q96 settle membership — do train/val/test still SPEAK THE SAME
    * LANGUAGE? Each split's token distribution over the elected top-V
    * vocabulary (q85's election; everything else folds into one
    * `<oov>` bucket, so the histogram is exactly V+1 cells) is compared
    * against the corpus distribution: per split, the sum and max of
    * |split-share − corpus-share| in basis points. A split whose
    * divergence spikes is measuring a different distribution than the
    * model trains on — exact-integer evidence, no χ² float ever crosses
    * engines.
    *
    * Scale posture: the corpus is scanned once into (split, bucket)
    * counts with map-side combine — the V+1 bucketing happens BEFORE the
    * shuffle against the broadcast vocabulary, so the aggregate moves
    * ≤ 3·(V+1) rows no matter the corpus size; the deviation table is a
    * 3-row × (V+1)-row broadcast cross (audit-sized by construction). */
  def splitDivergence(spark: SparkSession, dir: String,
                      v: Int = TextAnalysis.VocabSize): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // ≤ 3·(V+1) rows consumed by the split totals, the corpus-bucket
    // fold, AND the grid join — persist so the token scan behind it
    // runs once, not three times
    val sb = graft.PlanCache.cached(spark, s"curation.splitBuckets:$v:$dir") {
      val vocab = TextAnalysis.vocabulary(spark, dir, v)
        .withColumn("in_vocab", lit(1))
      docs
        .select(splitAssign(col("text")).as("split"),
          explode(TextHash.tokens(col("text"))).as("w"))
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("split"),
          when(col("in_vocab").isNull, lit("<oov>")).otherwise(col("w")).as("b"))
        .agg(count(lit(1)).as("c"))
    }
    val st = sb.groupBy(col("split")).agg(sum(col("c")).as("tot"))
    val dc = docs.select(splitAssign(col("text")).as("split"))
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
    val cb = sb.groupBy(col("b")).agg(sum(col("c")).as("cc"))
    val ct = cb.agg(sum(col("cc")).as("ctot"))
    // exact TVD needs every (split, bucket) cell, including buckets a
    // split never emits — build the full 3×(V+1) grid, then left-join
    // the observed counts
    st.crossJoin(broadcast(cb))
      .join(sb, Seq("split", "b"), "left")
      .crossJoin(broadcast(ct))
      .select(col("split"), col("tot"),
        abs(expr("cast(coalesce(c, 0) as decimal(38,0)) * 10000 div tot") -
          expr("cast(cc as decimal(38,0)) * 10000 div ctot"))
          .cast("long").as("dev"))
      .groupBy(col("split"), col("tot"))
      .agg(sum(col("dev")).as("sum_abs_dev_bp"),
        max(col("dev")).as("max_abs_dev_bp"))
      .join(broadcast(dc), Seq("split"))
      .select(col("split"), col("n_docs"), col("tot").as("n_tokens"),
        col("sum_abs_dev_bp"), col("max_abs_dev_bp"))
      .orderBy(col("split"))
  }

  def splitDivergenceSql(v: Int = TextAnalysis.VocabSize): String =
    s"""WITH tok AS (
       |  SELECT ${splitAssignSql("hmod")} AS split, w FROM (
       |    SELECT ${TextHash.h1Sql("text")} % 100 AS hmod,
       |      unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents)
       |), gc AS (
       |  SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w
       |), vv AS (
       |  SELECT w FROM (
       |    SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rn FROM gc)
       |  WHERE rn <= $v
       |), sb AS (
       |  SELECT split,
       |    CASE WHEN w IN (SELECT w FROM vv) THEN w ELSE '<oov>' END AS b,
       |    count(*)::BIGINT AS c
       |  FROM tok GROUP BY 1, 2
       |), st AS (
       |  SELECT split, sum(c)::BIGINT AS tot FROM sb GROUP BY split
       |), dc AS (
       |  SELECT ${splitAssignSql("hmod")} AS split, count(*)::BIGINT AS n_docs
       |  FROM (SELECT ${TextHash.h1Sql("text")} % 100 AS hmod FROM documents)
       |  GROUP BY 1
       |), cb AS (
       |  SELECT b, sum(c)::BIGINT AS cc FROM sb GROUP BY b
       |), ct AS (
       |  SELECT sum(cc)::BIGINT AS ctot FROM cb
       |), grid AS (
       |  SELECT st.split, st.tot, cb.b, cb.cc FROM st CROSS JOIN cb
       |), dev AS (
       |  SELECT g.split, g.tot,
       |    abs(((coalesce(sb.c, 0) * 10000) // g.tot) -
       |        ((g.cc * 10000) // ct.ctot))::BIGINT AS dev
       |  FROM grid g LEFT JOIN sb ON sb.split = g.split AND sb.b = g.b
       |  CROSS JOIN ct
       |)
       |SELECT dev.split, dc.n_docs, dev.tot AS n_tokens,
       |  sum(dev.dev)::BIGINT AS sum_abs_dev_bp,
       |  max(dev.dev)::BIGINT AS max_abs_dev_bp
       |FROM dev JOIN dc USING (split)
       |GROUP BY 1, 2, 3 ORDER BY split""".stripMargin

  // ---- X48: gate-ablation contingency audit (q121) ------------------------

  /** X48 gate-ablation audit (q121): the 2×2 contingency table of the
    * intake pipeline's two independent gates — the scalar quality floor
    * (round(q,6) ≥ `minQuality`, default 0.75 — a stricter ablation
    * floor than `curatedIntake`'s 0.2 admission default, so the table
    * stresses the regime where the gate actually rejects) × the q86 mixture
    * acceptance coin — with each cell's doc/token mass, corpus share,
    * and share WITHIN its quality stratum in basis points. The stratum
    * share is the independence check: if the mixture coin (an md5 hash
    * of doc_id) accepted high-quality documents at a different rate than
    * low-quality ones, the "content-blind downsampling" claim the
    * mixture design rests on would be false, and the ablation table is
    * where that would show. Also the capacity-planning surface: how many
    * tokens survive BOTH gates.
    *
    * Scale posture: one corpus scan against the broadcast |sources|-row
    * rate table; two boolean flags computed per row pre-shuffle; the
    * rollup is ≤4 cells with map-side combine and the marginals fold
    * from those cells. Nothing corpus-sized ever shuffles. */
  def gateAblation(spark: SparkSession, dir: String,
                   minQuality: Double = 0.75, seed: Long = 42): DataFrame = {
    // ≤4 rows consumed by the total fold, the stratum marginal, AND the
    // output — persist so the corpus scan behind it runs once, not three
    // times
    val cells = graft.PlanCache.cached(spark,
      s"curation.gateCells:$minQuality:$seed:$dir") {
      val rt = mixtureRates(spark, dir).select(col("source"), col("rate"))
      Tables.documents(spark, dir)
        .join(broadcast(rt), Seq("source"))
        .select(
          (round(TextAnalysis.qualityScore(col("text")), 6) >= minQuality)
            .as("quality_pass"),
          (mixtureCoin(col("doc_id"), seed) < col("rate")).as("mixture_accept"),
          size(TextHash.tokens(col("text"))).cast("long").as("t"))
        .groupBy(col("quality_pass"), col("mixture_accept"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"))
    }
    val tot = cells.agg(sum(col("n_docs")).as("n_tot"))
    val marg = cells.groupBy(col("quality_pass"))
      .agg(sum(col("n_docs")).as("stratum"))
    cells.crossJoin(broadcast(tot))
      .join(broadcast(marg), Seq("quality_pass"))
      .select(col("quality_pass"), col("mixture_accept"),
        col("n_docs"), col("sum_tokens"),
        expr("n_docs * 10000 div n_tot").as("share_bp"),
        expr("n_docs * 10000 div stratum").as("stratum_share_bp"))
      .orderBy(col("quality_pass"), col("mixture_accept"))
  }

  def gateAblationSql(minQuality: Double = 0.75, seed: Long = 42): String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    ${mixtureWeightSql("source")} AS tw
       |  FROM documents GROUP BY source
       |), c AS (
       |  SELECT min(n_docs / tw) AS cap FROM w
       |), rt AS (
       |  SELECT w.source, least(1.0, c.cap * w.tw / w.n_docs) AS rate
       |  FROM w CROSS JOIN c
       |), q AS (
       |  SELECT doc_id, source, ntok::BIGINT AS t,
       |    round(0.25 * least(ntok / 50.0, 1.0) +
       |      0.25 * (uniq / ntok) +
       |      0.25 * (1.0 - (stops / ntok)) +
       |      0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6) AS qq
       |  FROM (
       |    SELECT doc_id, source,
       |      len(t)::DOUBLE AS ntok,
       |      len(list_distinct(t))::DOUBLE AS uniq,
       |      len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT doc_id, source, text,
       |          string_split(lower(text), ' ') AS t FROM documents))
       |), flags AS (
       |  SELECT (q.qq >= $minQuality) AS quality_pass,
       |    (${TextHash.h1Sql(s"'mix:$seed:' || q.doc_id::VARCHAR")}
       |      / 1152921504606846976.0 < rt.rate) AS mixture_accept,
       |    q.t
       |  FROM q JOIN rt ON q.source = rt.source
       |), cells AS (
       |  SELECT quality_pass, mixture_accept, count(*)::BIGINT AS n_docs,
       |    sum(t)::BIGINT AS sum_tokens
       |  FROM flags GROUP BY 1, 2
       |), tot AS (SELECT sum(n_docs)::BIGINT AS n_tot FROM cells),
       |marg AS (
       |  SELECT quality_pass, sum(n_docs)::BIGINT AS stratum
       |  FROM cells GROUP BY 1
       |)
       |SELECT cells.quality_pass, cells.mixture_accept, cells.n_docs,
       |  cells.sum_tokens,
       |  ((cells.n_docs * 10000) // tot.n_tot)::BIGINT AS share_bp,
       |  ((cells.n_docs * 10000) // marg.stratum)::BIGINT AS stratum_share_bp
       |FROM cells CROSS JOIN tot JOIN marg USING (quality_pass)
       |ORDER BY quality_pass, mixture_accept""".stripMargin
  }

  // ---- X65: per-source ingestion quality trend (q138) ---------------------

  /** X65 ingestion-trend audit (q138): per (source, ingestion quarter) —
    * doc count, exact quality micro-mass, the quarter mean, and the
    * drift against the source's FIRST quarter. doc_id is the ingestion
    * order proxy (the corpus's append sequence), cut into four global
    * id-range quarters, so the table answers the crawl-ops question
    * "did source S degrade as the crawl went on?" — the early-warning
    * twin of q113's between-snapshot diff, visible WITHIN one snapshot.
    *
    * Scale posture: one scan against a broadcast 1-row max-id scalar;
    * the quarter is integer range arithmetic per row (no per-source
    * window — a 100 TB source never sorts); rollup to |sources|×4 rows
    * with map-side combine; the drift join is that tiny table against
    * its own quarter-0 slice. */
  def sourceQualityTrend(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val cells = graft.PlanCache.cached(spark, s"curation.qTrend:$dir") {
      docs
        .select(col("source"), col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
        .select(col("source"), col("doc_id"),
          expr("cast(round(q * 1000000) as bigint)").as("qm"))
        .crossJoin(broadcast(mx))
        .withColumn("quarter", least(lit(3L), expr("doc_id * 4 div (mx + 1)")))
        .groupBy(col("source"), col("quarter"))
        .agg(count(lit(1)).as("n_docs"), sum(col("qm")).as("sum_q_micro"))
    }
    val q0 = cells.filter(col("quarter") === 0)
      .select(col("source"),
        expr("sum_q_micro div n_docs").as("first_avg"))
    cells.join(broadcast(q0), Seq("source"))
      .select(col("source"), col("quarter"), col("n_docs"),
        col("sum_q_micro"),
        expr("sum_q_micro div n_docs").as("avg_q_micro"),
        (expr("sum_q_micro div n_docs") - col("first_avg"))
          .as("drift_micro"))
      .orderBy(col("source"), col("quarter"))
  }

  def sourceQualityTrendSql: String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH qd AS (
       |  SELECT source, doc_id,
       |    CAST(round(round(0.25 * least(ntok / 50.0, 1.0) +
       |      0.25 * (uniq / ntok) +
       |      0.25 * (1.0 - (stops / ntok)) +
       |      0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6)
       |      * 1000000) AS BIGINT) AS qm
       |  FROM (
       |    SELECT source, doc_id,
       |      len(t)::DOUBLE AS ntok,
       |      len(list_distinct(t))::DOUBLE AS uniq,
       |      len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT source, doc_id, text,
       |          string_split(lower(text), ' ') AS t FROM documents))
       |), mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
       |cells AS (
       |  SELECT source, least(3, doc_id * 4 // (mx.mx + 1)) AS quarter,
       |    count(*)::BIGINT AS n_docs, sum(qm)::BIGINT AS sum_q_micro
       |  FROM qd CROSS JOIN mx GROUP BY 1, 2
       |), q0 AS (
       |  SELECT source, (sum_q_micro // n_docs)::BIGINT AS first_avg
       |  FROM cells WHERE quarter = 0
       |)
       |SELECT cells.source, cells.quarter::BIGINT AS quarter, cells.n_docs,
       |  cells.sum_q_micro,
       |  (cells.sum_q_micro // cells.n_docs)::BIGINT AS avg_q_micro,
       |  ((cells.sum_q_micro // cells.n_docs) - q0.first_avg)::BIGINT
       |    AS drift_micro
       |FROM cells JOIN q0 USING (source)
       |ORDER BY cells.source, cells.quarter""".stripMargin
  }

  // ---- X186: Wilson lower-bound source ranking (q260) ---------------------

  /** X186 Wilson lower-bound source ranking (q260): rank sources by
    * the 95% Wilson score LOWER bound of their quality pass rate
    * (Wilson 1927; the classic "sort by lower bound, not by average"
    * ranking rule) — the small-sample-honest answer to "which sources
    * feed the best docs": a source with 3/3 passes must NOT outrank
    * one with 95/100 (raw rates say it does; the Wilson bound says the
    * 3-doc source could easily be a 47% source). Pass = the q121 gate
    * rule (round(quality, 6) ≥ 0.75). Exactly integer: with k of n
    * passing and z = 1.96 carried as the milli literal 1960,
    * LB = (k + z²/2 − z·√(k(n−k)/n + z²/4)) / (n + z²) becomes
    * lb_milli = 1000·(10⁶k + 1920800 − 1960·s) div (10⁶n + 3841600)
    * where s = CEIL-isqrt(⌊10⁶k(n−k)/n⌋ + 960400) — the root is
    * rounded UP so the bound stays conservative (a lower bound must
    * never optimistically round), via the q245 restoring isqrt plus
    * one exactness probe; clamped at 0. The shrink column (rate − LB)
    * is the per-source evidence deficit.
    *
    * Domain bound: exact while a source holds ≲ 9e12 docs (10⁶n must
    * fit BIGINT; the t product rides decimal(38,0) far past that).
    *
    * Scale posture: ONE corpus collapse to |sources| (n, k) rows
    * (map-side combinable); everything after is per-row arithmetic on
    * the source dimension — no window, no join; |sources| output
    * rows. */
  def wilsonQualityRank(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.PlanCache.cached(spark, s"curation.wilsonCells:$dir") {
      Tables.documents(spark, dir)
        .select(col("source"),
          (round(TextAnalysis.qualityScore(col("text")), 6) >= 0.75)
            .as("pass"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
    }
    cells
      .withColumn("t", expr(
        "cast(cast(1000000 as decimal(38,0)) * n_pass * (n_docs - n_pass) " +
          "div n_docs as bigint)"))
      .withColumn("s0", expr(isqrtSpark("t + 960400")))
      .withColumn("s", expr("s0 + IF(s0 * s0 < t + 960400, 1L, 0L)"))
      .withColumn("wilson_lb_milli", expr(
        "greatest(cast(cast(1000 as decimal(38,0)) * " +
          "(1000000 * n_pass + 1920800 - 1960 * s) div " +
          "(1000000 * n_docs + 3841600) as bigint), 0L)"))
      .select(col("source"), col("n_docs"), col("n_pass"),
        expr("n_pass * 1000 div n_docs").as("pass_rate_milli"),
        col("wilson_lb_milli"),
        expr("n_pass * 1000 div n_docs - wilson_lb_milli")
          .as("shrink_milli"))
      .orderBy(col("wilson_lb_milli").desc, col("source"))
  }

  def wilsonQualityRankSql: String = {
    val stop = graft.operators.TextAnalysis.Stopwords
      .map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE qd AS (
       |  SELECT source,
       |    (round(0.25 * least(ntok / 50.0, 1.0) +
       |      0.25 * (uniq / ntok) +
       |      0.25 * (1.0 - (stops / ntok)) +
       |      0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6)
       |      >= 0.75) AS pass
       |  FROM (
       |    SELECT source,
       |      len(t)::DOUBLE AS ntok,
       |      len(list_distinct(t))::DOUBLE AS uniq,
       |      len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT source, text,
       |          string_split(lower(text), ' ') AS t FROM documents))
       |), cells AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_pass
       |  FROM qd GROUP BY 1
       |), base AS (
       |  SELECT source, n_docs, n_pass,
       |    (1000000::HUGEINT * n_pass * (n_docs - n_pass)
       |      // n_docs)::BIGINT + 960400 AS arg
       |  FROM cells
       |), f AS (
       |  SELECT source, n_docs, n_pass, arg,
       |    arg AS num, 0::BIGINT AS res, 0 AS i FROM base
       |  UNION ALL
       |  SELECT source, n_docs, n_pass, arg,
       |    CASE WHEN num >= res + (1::BIGINT << (62 - 2 * i))
       |      THEN num - res - (1::BIGINT << (62 - 2 * i)) ELSE num END,
       |    CASE WHEN num >= res + (1::BIGINT << (62 - 2 * i))
       |      THEN res // 2 + (1::BIGINT << (62 - 2 * i)) ELSE res // 2 END,
       |    i + 1
       |  FROM f WHERE i < 32
       |), s AS (
       |  SELECT source, n_docs, n_pass,
       |    res + (CASE WHEN res * res < arg THEN 1 ELSE 0 END) AS sq
       |  FROM f WHERE i = 32
       |)
       |SELECT source, n_docs, n_pass,
       |  (n_pass * 1000 // n_docs)::BIGINT AS pass_rate_milli,
       |  greatest((1000::HUGEINT *
       |    (1000000 * n_pass + 1920800 - 1960 * sq)
       |    // (1000000 * n_docs + 3841600))::BIGINT, 0)::BIGINT
       |    AS wilson_lb_milli,
       |  ((n_pass * 1000 // n_docs) -
       |    greatest((1000::HUGEINT *
       |      (1000000 * n_pass + 1920800 - 1960 * sq)
       |      // (1000000 * n_docs + 3841600))::BIGINT, 0))::BIGINT
       |    AS shrink_milli
       |FROM s ORDER BY wilson_lb_milli DESC, source""".stripMargin
  }

  // ---- X7+: quality-ranked token-budget selection (q82) ------------------
  //
  // "Select the best documents until the token budget is spent" — the
  // data-selection step of a pretraining run: per language, walk docs in
  // (quality desc, doc_id) order and keep each doc while the running
  // token total stays within budget (tokens are positive, so the
  // cumulative-sum filter IS take-while).

  /** Per-lang token budget for q82: below every language's corpus total
    * at every SF, so the selection boundary is always exercised. */
  val BudgetTokens = 2500L

  /** Quality buckets per unit score for the two-phase selection: bucket
    * id floor(q·1000) is a monotone function of the 6-dp-rounded score,
    * so (bucket desc, score desc, doc_id) equals the global greedy
    * order. */
  private val BucketScale = 1000.0

  /** Token-budget selection audit (q82): per language — corpus size,
    * selected size, selected token mass, and the worst quality score
    * that made the cut.
    *
    * Scale posture: the oracle-defining formulation is ONE global
    * cumulative-sum window per language — a single sort partition per
    * lang, unusable on a 100 TB monolingual corpus. This implementation
    * is the production two-phase shape with identical output: (1) a
    * per-(lang, quality-bucket) token histogram (map-side-combinable
    * agg, ~1000 rows/lang) whose tiny prefix-sum window runs on the
    * driver-scale histogram, classifying every bucket all-in / all-out;
    * (2) only the ONE straddling bucket per language is sorted. The
    * full corpus never enters a sort — only its histogram does. */
  def tokenBudgetSelect(spark: SparkSession, dir: String,
                        budget: Long = BudgetTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("qd"),
        size(TextHash.tokens(col("text"))).cast("long").as("ntok"))
      .withColumn("bkt", floor(col("qd") * lit(BucketScale)).cast("long"))
    val bstats = base.groupBy(col("lang"), col("bkt"))
      .agg(sum(col("ntok")).as("btok"))
    val wPre = Window.partitionBy(col("lang")).orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bpre = bstats
      .withColumn("pre", coalesce(sum(col("btok")).over(wPre), lit(0L)))
    val tagged = base.join(broadcast(bpre), Seq("lang", "bkt"))
    val allIn = tagged.filter(col("pre") + col("btok") <= budget)
    // the straddling bucket: docs sorted only here, with the running sum
    // seeded by the histogram prefix — same greedy order as the oracle
    val wBoundary = Window.partitionBy(col("lang"), col("bkt"))
      .orderBy(col("qd").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = tagged
      .filter(col("pre") < budget && col("pre") + col("btok") > budget)
      .withColumn("cum", col("pre") + sum(col("ntok")).over(wBoundary))
      .filter(col("cum") <= budget)
    val sel = allIn.select(col("lang"), col("qd"), col("ntok"))
      .unionAll(boundary.select(col("lang"), col("qd"), col("ntok")))
    val totals = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok_total"))
    sel.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("ntok")).as("tok_selected"),
        min(col("qd")).as("min_sel_quality"))
      .join(totals, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("tok_total"),
        col("n_selected"), col("tok_selected"), col("min_sel_quality"))
      .orderBy(col("lang"))
  }

  /** DuckDB twin of [[tokenBudgetSelect]] — the one-window greedy
    * formulation that DEFINES the semantics the two-phase plan must
    * reproduce exactly. */
  def tokenBudgetSelectSql(budget: Long = BudgetTokens): String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH s AS (
       |  SELECT lang, doc_id,
       |    len(t)::DOUBLE AS ntok_d,
       |    len(list_distinct(t))::DOUBLE AS uniq,
       |    len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |    length(text)::DOUBLE AS chars,
       |    len(t)::BIGINT AS ntok
       |  FROM (SELECT lang, doc_id, text,
       |        string_split(lower(text), ' ') AS t FROM documents)
       |), q AS (
       |  SELECT lang, doc_id, ntok,
       |    round(0.25 * least(ntok_d / 50.0, 1.0) +
       |          0.25 * (uniq / ntok_d) +
       |          0.25 * (1.0 - (stops / ntok_d)) +
       |          0.25 * least(((chars - (ntok_d - 1)) / ntok_d) / 6.0, 1.0), 6) AS qd
       |  FROM s
       |), o AS (
       |  SELECT lang, qd, ntok,
       |    sum(ntok) OVER (PARTITION BY lang ORDER BY qd DESC, doc_id
       |                    ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM q
       |), sel AS (SELECT * FROM o WHERE cum <= $budget),
       |tot AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs,
       |    sum(ntok)::BIGINT AS tok_total
       |  FROM q GROUP BY lang
       |)
       |SELECT t.lang, t.n_docs, t.tok_total,
       |  count(*)::BIGINT AS n_selected,
       |  sum(sel.ntok)::BIGINT AS tok_selected,
       |  min(sel.qd) AS min_sel_quality
       |FROM sel JOIN tot t ON sel.lang = t.lang
       |GROUP BY t.lang, t.n_docs, t.tok_total
       |ORDER BY t.lang""".stripMargin
  }

  def snapshotUpsertSummarySql(histSize: Int = 200): String =
    s"""WITH both_sides AS (
       |  SELECT doc_id AS key, lang, n_chars, 0 AS version, doc_id AS src_id
       |  FROM documents WHERE doc_id < $histSize
       |  UNION ALL
       |  SELECT doc_id % ${2 * histSize} AS key, lang, n_chars, 1 AS version,
       |    doc_id AS src_id
       |  FROM documents WHERE doc_id >= $histSize
       |), merged AS (
       |  SELECT *, row_number() OVER (PARTITION BY key
       |    ORDER BY version DESC, src_id DESC) AS rn
       |  FROM both_sides
       |)
       |SELECT lang, count(*) AS n_rows,
       |  sum(CASE WHEN version = 1 THEN 1 ELSE 0 END)::BIGINT AS n_from_updates,
       |  sum(n_chars)::BIGINT AS sum_chars
       |FROM merged WHERE rn = 1
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- X15: domain-mixture resampling (q86) -------------------------------

  /** Target mixture weight per source domain, keyed on the numeric source
    * suffix in tiers (src0-4: 8%, src5-9: 6%, src10-14: 4%, src15-19: 2%;
    * sums to 1 over the 20 driver sources). A DoReMi-style recipe would
    * learn these; here they are a fixed literal so the resample is
    * oracle-checkable. */
  def mixtureWeight(source: Column): Column = {
    val sn = substring(source, 4, 10).cast("int")
    when(sn < 5, 0.08).when(sn < 10, 0.06).when(sn < 15, 0.04).otherwise(0.02)
  }

  private def mixtureWeightSql(source: String): String =
    s"""(CASE WHEN substr($source, 4)::INT < 5 THEN 0.08
       |      WHEN substr($source, 4)::INT < 10 THEN 0.06
       |      WHEN substr($source, 4)::INT < 15 THEN 0.04
       |      ELSE 0.02 END)::DOUBLE""".stripMargin

  /** X15 domain-mixture resampling audit (q86): downsample each source so
    * the surviving corpus matches the [[mixtureWeight]] target shares,
    * keeping ALL of the binding (most under-represented relative to its
    * weight) source — per-source acceptance rate min(1, C*w_s/n_s) with
    * C = min_s(n_s/w_s), the largest feasible corpus with exact target
    * proportions in expectation. Acceptance is the deterministic md5
    * coin of q78 (h1("mix:seed:doc_id") / 2^60 < rate), so the sample is
    * reproducible run-over-run and engine-independent.
    *
    * Scale posture: rates derive from a source-cardinality-sized count
    * (tiny) broadcast back onto the corpus; the accept test is a narrow
    * per-row map — the corpus is never shuffled, never sorted, and the
    * only corpus-sized work is one scan. The exact-integer division for
    * achieved_share happens once at the end on audit-sized rows. */
  /** Per-source acceptance-rate table (source, n_docs, tw, rate) — the
    * feasible-max rates described on [[mixtureResample]]. Exposed so the
    * streaming gate ([[graft.streaming.Pipeline.mixtureGate]]) can apply
    * a snapshot's rates to incoming documents. */
  def mixtureRates(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("tw", mixtureWeight(col("source")))
    val cap = w.agg(min(col("n_docs") / col("tw")).as("cap"))
    w.crossJoin(broadcast(cap))
      .withColumn("rate", least(lit(1.0), col("cap") * col("tw") / col("n_docs")))
      .drop("cap")
  }

  /** The deterministic md5 acceptance coin: uniform double on [0,1),
    * compared strictly below the source's rate. */
  def mixtureCoin(docId: Column, seed: Long = 42): Column =
    TextHash.h1(concat(lit(s"mix:$seed:"), docId.cast("string"))) /
      lit(1152921504606846976.0) // 2^60: h1 is uniform on [0, 2^60)

  def mixtureResample(spark: SparkSession, dir: String,
                      seed: Long = 42): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rt = mixtureRates(spark, dir)
    val acc = docs.join(broadcast(rt.select(col("source"), col("rate"))), Seq("source"))
      .filter(mixtureCoin(col("doc_id"), seed) < col("rate"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
    val tot = acc.agg(sum(col("n_sampled")).as("n_tot"))
    rt.join(broadcast(acc), Seq("source"), "left").crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        round(col("rate"), 6).as("rate"),
        round(col("tw"), 6).as("target_share"),
        round(coalesce(col("n_sampled"), lit(0L)) / col("n_tot").cast("double"), 6)
          .as("achieved_share"))
      .orderBy(col("source"))
  }

  def mixtureResampleSql(seed: Long = 42): String =
    s"""WITH w AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    ${mixtureWeightSql("source")} AS tw
       |  FROM documents GROUP BY source
       |), c AS (
       |  SELECT min(n_docs / tw) AS cap FROM w
       |), rt AS (
       |  SELECT w.source, w.n_docs, w.tw,
       |    least(1.0, c.cap * w.tw / w.n_docs) AS rate
       |  FROM w CROSS JOIN c
       |), acc AS (
       |  SELECT d.source, count(*)::BIGINT AS n_sampled
       |  FROM documents d JOIN rt ON d.source = rt.source
       |  WHERE ${TextHash.h1Sql(s"'mix:$seed:' || d.doc_id::VARCHAR")}
       |    / 1152921504606846976.0 < rt.rate
       |  GROUP BY d.source
       |), tot AS (SELECT sum(n_sampled)::BIGINT AS n_tot FROM acc)
       |SELECT rt.source, rt.n_docs,
       |  coalesce(acc.n_sampled, 0)::BIGINT AS n_sampled,
       |  round(rt.rate, 6) AS rate, round(rt.tw, 6) AS target_share,
       |  round(coalesce(acc.n_sampled, 0) / tot.n_tot::DOUBLE, 6) AS achieved_share
       |FROM rt LEFT JOIN acc ON rt.source = acc.source CROSS JOIN tot
       |ORDER BY rt.source""".stripMargin

  // ---- X33: DoReMi-style domain reweighting (q106) ------------------------
  //
  // q86's target shares are a fixed literal ("a DoReMi-style recipe would
  // learn these"); q106 IS that election step. DoReMi (Xie et al. 2023,
  // arXiv:2305.10429) runs multiplicative weights on domain shares: domains
  // whose proxy model underperforms the reference (high excess loss) get
  // upweighted, then the update is smoothed toward uniform. The published
  // recipe's exp(eta * excess) doesn't survive a cross-engine hash gate
  // (libm), so this is the integer first-order twin: factor = 1e6 +
  // eta * excess_micro — same monotone structure (more excess, more
  // weight), exact in both engines. The loss proxy is the corpus's own
  // measurable stand-in: a domain's mean quality deficit vs the corpus
  // mean, in the q89/q103 micro-unit device.

  /** Integer multiplicative-weights learning rate: the update factor is
    * 1e6 + [[DoremiEta]]·excess_micro (excess ≤ 1e6, so the factor stays
    * under 9e6 and the bp-quantized weight product under 9e10 — long-safe
    * at ANY corpus scale because the base share is already in bp). */
  val DoremiEta = 8L
  /** Uniform-smoothing mass in basis points (DoReMi's c = 1/10). */
  val DoremiSmoothBp = 1000L

  /** X33 DoReMi-shaped domain-weight election (q106): per source domain —
    * token base share (bp), mean quality (micro), excess deficit vs the
    * corpus mean (micro), the multiplicative-weights updated share (bp),
    * and the uniform-smoothed final share (bp) a q86-style resample would
    * then target. All arithmetic is exact integers after the one rounded
    * quality projection.
    *
    * Scale posture: one corpus scan collapses to a |sources|-row table
    * via map-side-combinable sums; every subsequent op (corpus totals,
    * weight normalization, smoothing) is arithmetic over that tiny table
    * with 1-row broadcasts — no corpus-sized shuffle besides the source
    * rollup, no sort, no window. The 100 TB run pays exactly one
    * tokenize+score pass. */
  def doremiReweight(spark: SparkSession, dir: String): DataFrame = {
    // the |sources|-row rollup is referenced three times downstream
    // (corpus totals, weight-sum, output rows); persisting it pins the
    // plan to ONE corpus tokenize+score pass instead of one per reference
    val per = graft.PlanCache.cached(spark, s"curation.doremiPer:$dir") {
      Tables.documents(spark, dir)
        .select(col("source"),
          size(TextHash.tokens(col("text"))).cast("long").as("t"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("t")).as("n_tokens"),
          sum(expr("cast(round(q * 1000000) as bigint)")).as("sum_q_micro"))
    }
    val tot = per.agg(sum(col("n_docs")).as("tot_docs"),
      sum(col("n_tokens")).as("tot_tokens"),
      sum(col("sum_q_micro")).as("tot_q_micro"),
      count(lit(1)).as("n_domains"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("base_share_bp", expr("n_tokens * 10000 div tot_tokens"))
      .withColumn("mean_q_micro", expr("sum_q_micro div n_docs"))
      .withColumn("excess_micro",
        greatest(lit(0L), expr("tot_q_micro div tot_docs - sum_q_micro div n_docs")))
      .withColumn("w",
        expr(s"base_share_bp * (1000000 + $DoremiEta * excess_micro)"))
    val wsum = scored.agg(sum(col("w")).as("w_tot"))
    scored.crossJoin(broadcast(wsum))
      .withColumn("new_share_bp", expr("w * 10000 div w_tot"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("base_share_bp"), col("mean_q_micro"), col("excess_micro"),
        col("new_share_bp"),
        expr(s"((10000 - $DoremiSmoothBp) * new_share_bp + " +
          s"$DoremiSmoothBp * (10000 div n_domains)) div 10000")
          .as("final_share_bp"))
      .orderBy(col("source"))
  }

  def doremiReweightSql: String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH qd AS (
       |  SELECT source, ntok::BIGINT AS t,
       |    round(0.25 * least(ntok / 50.0, 1.0) +
       |          0.25 * (uniq / ntok) +
       |          0.25 * (1.0 - (stops / ntok)) +
       |          0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6) AS q
       |  FROM (
       |    SELECT source,
       |      len(tk)::DOUBLE AS ntok,
       |      len(list_distinct(tk))::DOUBLE AS uniq,
       |      len(list_filter(tk, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT source, text, string_split(lower(text), ' ') AS tk
       |          FROM documents))
       |), per AS (
       |  SELECT source, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS n_tokens,
       |    sum(CAST(round(q * 1000000) AS BIGINT))::BIGINT AS sum_q_micro
       |  FROM qd GROUP BY source
       |), tot AS (
       |  SELECT sum(n_docs)::BIGINT AS tot_docs,
       |    sum(n_tokens)::BIGINT AS tot_tokens,
       |    sum(sum_q_micro)::BIGINT AS tot_q_micro,
       |    count(*)::BIGINT AS n_domains
       |  FROM per
       |), s AS (
       |  SELECT per.source, per.n_docs, per.n_tokens,
       |    (per.n_tokens * 10000 // tot.tot_tokens)::BIGINT AS base_share_bp,
       |    (per.sum_q_micro // per.n_docs)::BIGINT AS mean_q_micro,
       |    greatest(0, tot.tot_q_micro // tot.tot_docs
       |      - per.sum_q_micro // per.n_docs)::BIGINT AS excess_micro,
       |    tot.n_domains
       |  FROM per CROSS JOIN tot
       |), w AS (
       |  SELECT s.*,
       |    (base_share_bp * (1000000 + $DoremiEta * excess_micro))::BIGINT AS w
       |  FROM s
       |), ws AS (SELECT sum(w)::BIGINT AS w_tot FROM w)
       |SELECT w.source, w.n_docs, w.n_tokens, w.base_share_bp, w.mean_q_micro,
       |  w.excess_micro,
       |  (w.w * 10000 // ws.w_tot)::BIGINT AS new_share_bp,
       |  (((10000 - $DoremiSmoothBp) * (w.w * 10000 // ws.w_tot)
       |    + $DoremiSmoothBp * (10000 // w.n_domains)) // 10000)::BIGINT
       |    AS final_share_bp
       |FROM w CROSS JOIN ws ORDER BY w.source""".stripMargin
  }

  // ---- X23: importance-guided selection (q95) -----------------------------
  //
  // DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169): score
  // every pool document by how much its hashed n-gram feature distribution
  // resembles a TARGET domain, then keep the top slice per language. The
  // published recipe uses log-likelihood ratios of hashed-ngram language
  // models; floats don't survive a cross-engine hash gate, so the scorer
  // here is the integer twin: per-bucket target affinity = the Laplace-
  // smoothed share of target tokens in the bucket, in exact micro-units,
  // and a doc's score is the token-count-weighted integer mean. Same
  // monotone structure (docs whose tokens live in target-heavy buckets
  // score high), exact in both engines (q88/q90's micro-unit device).

  /** Hashed-feature bucket count for [[importanceSelection]] — small
    * enough that the bucket-stats table always broadcasts, large enough
    * that a unigram vocabulary spreads (the DSIR paper uses 10k buckets
    * for hashed bigrams; 1k suffices for the synthetic corpus). */
  val DsirBuckets = 1024
  private[graft] val DsirScale = 1000000L
  /** Affinity of a bucket NO training token ever hit — the Laplace prior
    * (0+1)·scale / (0+0+2): what the streaming gate scores unseen-bucket
    * tokens at. */
  private[graft] val DsirPrior = DsirScale / 2

  /** The per-(doc, bucket) hashed-feature histogram [[importanceSelection]]
    * scores from — feeds BOTH the bucket-stats agg and the scoring join;
    * persisted once per (session, dir) so the token fan-out is paid a
    * single time (the q20 signature-table device) — a production pipeline
    * materializes its feature table the same way. */
  private def dsirHist(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.cached(spark, s"curation.dsirHist:$dir") {
      dsirHistOf(Tables.documents(spark, dir))
    }

  /** The histogram over ANY (doc_id, lang, source, text) frame — the
    * composed pipeline (q97) feeds its dedup survivors through this so
    * the importance stage scores the HANDED-OFF corpus, not the raw
    * table. Callers owning a reusable frame wrap it in their own
    * PlanCache entry (as [[dsirHist]] does for the per-dir table). */
  private[graft] def dsirHistOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(TextHash.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"), col("source"),
        (TextHash.h1(col("tok")) % DsirBuckets).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** The bucket-affinity table (b, aff): Laplace-smoothed target share of
    * each hashed-feature bucket in exact micro-units — the published
    * snapshot artifact of the q95 recipe (≤ [[DsirBuckets]] rows; the
    * streaming intake gate [[graft.streaming.Pipeline.importanceGate]]
    * consumes it as a literal map). */
  def importanceAffinity(spark: SparkSession, dir: String,
                         targetSource: String = "src0"): DataFrame =
    importanceAffinityOf(dsirHist(spark, dir), targetSource)

  /** Affinity over any histogram frame (see [[dsirHistOf]]). */
  private[graft] def importanceAffinityOf(hist: DataFrame,
                                          targetSource: String): DataFrame =
    hist.groupBy(col("b"))
      .agg(sum(when(col("source") === targetSource, col("cnt"))
          .otherwise(lit(0L))).as("ct"),
        sum(when(col("source") =!= targetSource, col("cnt"))
          .otherwise(lit(0L))).as("cs"))
      .select(col("b"),
        expr(s"((ct + 1) * $DsirScale) DIV (ct + cs + 2)").as("aff"))

  /** Per-pool-document affinity scores (doc_id, lang, score): the
    * token-count-weighted integer mean of bucket affinities — identical
    * to a per-token mean, which is what the streaming gate recomputes
    * per incoming row (batch/stream parity is exact, not approximate). */
  private[graft] def importanceScores(spark: SparkSession, dir: String,
                                      targetSource: String = "src0"): DataFrame =
    // (doc_id, lang, score) — three longs per pool doc, consumed by the
    // q95 election, its spec's ranking twin, and the streaming-gate
    // snapshot; persisted so the histogram scoring join runs once per
    // (session, dir, target), not once per consumer/pass
    graft.PlanCache.cached(spark, s"curation.dsirScores:$targetSource:$dir") {
      importanceScoresOf(dsirHist(spark, dir), targetSource)
    }

  /** Scores over any histogram frame (see [[dsirHistOf]]). */
  private[graft] def importanceScoresOf(hist: DataFrame,
                                        targetSource: String): DataFrame =
    hist.filter(col("source") =!= targetSource)
      .join(broadcast(importanceAffinityOf(hist, targetSource)), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("sum(cnt * aff) DIV sum(cnt)").as("score"))

  /** Per-DOCUMENT admitted set of the q95 election over `scored`
    * (doc_id, lang, score): every doc strictly above the elected
    * per-language threshold, plus the lowest-doc_id slice of the
    * threshold TIE bucket that fills the quota — row-identical to the
    * per-lang (score desc, doc_id) top-quota ranking at any SF, with
    * the q95 scale posture intact: the election runs on the bounded
    * per-(lang, score) histogram, and the only per-document sort is a
    * row_number confined to each language's threshold tie bucket (the
    * corpus as a whole never sorts). The composed pipeline (q97) chains
    * this where the q95 audit only reports counts. */
  private[graft] def importanceSelectedOf(scored: DataFrame,
                                          quotaBp: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("c"))
    val pool = hist.groupBy(col("lang")).agg(sum(col("c")).as("n_pool"))
    val wPre = Window.partitionBy(col("lang")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = hist
      .withColumn("pre", coalesce(sum(col("c")).over(wPre), lit(0L)))
      .join(broadcast(pool), Seq("lang"))
      .withColumn("quota",
        greatest(expr(s"(n_pool * $quotaBp) DIV 10000"), lit(1L)))
      .filter(col("pre") < col("quota"))
      .withColumn("take", least(col("c"), col("quota") - col("pre")))
      .groupBy(col("lang"))
      .agg(min(col("score")).as("thr_score"),
        min_by(col("take"), col("score")).as("thr_take"))
    val withThr = scored.join(broadcast(thr), Seq("lang"))
    val wTie = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    withThr.filter(col("score") > col("thr_score"))
      .unionByName(
        withThr.filter(col("score") === col("thr_score"))
          .withColumn("_rn", row_number().over(wTie).cast("long"))
          .filter(col("_rn") <= col("thr_take")).drop("_rn"))
      .select(col("doc_id"), col("lang"), col("score"))
  }

  /** X23 importance-guided selection audit (q95): per language — pool
    * size, selected size at a `quotaBp` basis-point quota, the admission
    * threshold score, and the mean selected score (micro-units).
    *
    * Target domain = `targetSource` documents; pool = everything else.
    * Deterministic end to end: md5 token buckets, integer affinity,
    * ties broken by doc_id.
    *
    * Scale posture: tokens collapse to per-(doc, bucket) histogram rows
    * with map-side combine BEFORE any join; bucket stats are
    * [[DsirBuckets]] rows broadcast back; scoring is one combinable agg
    * over histogram rows. Selection is the [[tokenBudgetSelect]]
    * two-phase device: the corpus reduces to a per-(lang, score)
    * histogram (bounded by the integer micro-unit scale), the
    * prefix-sum window runs over THAT, and the straddling score bucket
    * contributes the remainder — output identical to the per-doc
    * top-quota ranking (spec-asserted), but the corpus never sorts. */
  def importanceSelection(spark: SparkSession, dir: String,
                          targetSource: String = "src0",
                          quotaBp: Long = 4000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = importanceScores(spark, dir, targetSource)
    // Two-phase election (the q82 device): the oracle-DEFINING semantics
    // is a per-lang top-`quota` ranking with doc_id ties, but every
    // audited number (count, threshold, score sum) is a function of the
    // per-(lang, score) HISTOGRAM alone — tied docs are interchangeable
    // to the audit. So the corpus never enters a sort: the histogram
    // (≤ |distinct integer scores| rows per lang, bounded by the
    // micro-unit scale) takes the prefix-sum window, and the threshold
    // bucket contributes `quota - cum_above` of its count. Identical
    // output to the ranking formulation at any SF (spec-asserted), with
    // the 100 TB-safe plan shape.
    val hist = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("c"))
    val pool = hist.groupBy(col("lang")).agg(sum(col("c")).as("n_pool"))
    val wPre = Window.partitionBy(col("lang")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val take = hist
      .withColumn("pre", coalesce(sum(col("c")).over(wPre), lit(0L)))
      .join(broadcast(pool), Seq("lang"))
      .withColumn("quota",
        greatest(expr(s"(n_pool * $quotaBp) DIV 10000"), lit(1L)))
      .filter(col("pre") < col("quota"))
      .withColumn("take", least(col("c"), col("quota") - col("pre")))
    take.groupBy(col("lang"), col("n_pool"))
      .agg(sum(col("take")).as("n_selected"),
        min(col("score")).as("threshold_score"),
        expr("sum(score * take) DIV sum(take)").as("avg_sel_score"))
      .select(col("lang"), col("n_pool"), col("n_selected"),
        col("threshold_score"), col("avg_sel_score"))
      .orderBy(col("lang"))
  }

  def importanceSelectionSql(targetSource: String = "src0",
                             quotaBp: Long = 4000L): String =
    s"""WITH tb AS (
       |  SELECT doc_id, lang, source,
       |    ${TextHash.h1Sql("tok")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang, source,
       |        unnest(string_split(lower(text), ' ')) AS tok
       |        FROM documents)
       |), hist AS (
       |  SELECT doc_id, lang, source, b, count(*)::BIGINT AS cnt
       |  FROM tb GROUP BY doc_id, lang, source, b
       |), stats AS (
       |  SELECT b,
       |    (((sum(CASE WHEN source = '$targetSource' THEN cnt ELSE 0 END) + 1)
       |      * $DsirScale)
       |     // (sum(cnt) + 2))::BIGINT AS aff
       |  FROM hist GROUP BY b
       |), scored AS (
       |  SELECT h.doc_id, h.lang,
       |    (sum(h.cnt * s.aff) // sum(h.cnt))::BIGINT AS score
       |  FROM hist h JOIN stats s USING (b)
       |  WHERE h.source <> '$targetSource'
       |  GROUP BY h.doc_id, h.lang
       |), pool AS (
       |  SELECT lang, count(*)::BIGINT AS n_pool FROM scored GROUP BY lang
       |), ranked AS (
       |  SELECT lang, doc_id, score, row_number() OVER (
       |    PARTITION BY lang ORDER BY score DESC, doc_id) AS rn
       |  FROM scored
       |), sel AS (
       |  SELECT r.lang, r.score, p.n_pool FROM ranked r
       |  JOIN pool p USING (lang)
       |  WHERE r.rn <= greatest((p.n_pool * $quotaBp) // 10000, 1)
       |)
       |SELECT lang, n_pool, count(*)::BIGINT AS n_selected,
       |  min(score) AS threshold_score,
       |  (sum(score) // count(*))::BIGINT AS avg_sel_score
       |FROM sel GROUP BY lang, n_pool ORDER BY lang""".stripMargin

  // ---- X27: epoch/repetition schedule (q100) ------------------------------

  /** Token budget the default [[epochSchedule]] plans for — ~4× the
    * sf0.01 corpus, so the schedule exercises both regimes (heavy-weight
    * sources hit the epoch cap, light ones repeat fractionally). */
  val ScheduleBudget = 100000L

  /** Epoch ceiling in micro-epochs (4.0 epochs): past ~4 repetitions a
    * source's marginal value collapses (Muennighoff et al. 2023,
    * arXiv:2305.16264 — "data-constrained scaling"), so the scheduler
    * reallocates the excess implicitly as a reported deficit. */
  val MaxEpochsMicro = 4000000L

  /** [[mixtureWeight]]'s tiers in exact integer basis points — the
    * schedule's arithmetic never touches a float. */
  def mixtureWeightBp(source: Column): Column = {
    val sn = substring(source, 4, 10).cast("int")
    when(sn < 5, 800L).when(sn < 10, 600L).when(sn < 15, 400L).otherwise(200L)
  }

  private def mixtureWeightBpSql(source: String): String =
    s"""(CASE WHEN substr($source, 4)::INT < 5 THEN 800
       |      WHEN substr($source, 4)::INT < 10 THEN 600
       |      WHEN substr($source, 4)::INT < 15 THEN 400
       |      ELSE 200 END)::BIGINT""".stripMargin

  /** X27 epoch/repetition schedule (q100): given a total token budget
    * and the q86 target mixture, how many EPOCHS of each source does a
    * training run take? Each source's allocation is its mixture share of
    * the budget (`budget·w_bp div 10000`); its repeat factor is
    * `alloc/n_tokens` in exact micro-epochs, capped at
    * [[MaxEpochsMicro]] (the data-constrained-scaling ceiling —
    * repeating a small source 40× buys nothing); `effective_tokens` is
    * what the cap actually lets the run consume and `deficit_tokens` the
    * shortfall a planner must re-source (new data or re-weighting). The
    * whole schedule is integer arithmetic — budget, shares, micro-epochs
    * — so the cross-engine hash can never float-drift.
    *
    * Scale posture: ONE corpus scan reduces to a source-cardinality
    * table (map-side-combinable count+sum), and every schedule column is
    * per-row scalar math on those ~20 rows; decimal(38,0) intermediates
    * guard the micro-epoch products past 9.2×10^12 tokens per source
    * (a 100 TB corpus's big sources), mirroring DuckDB's HUGEINT. */
  def epochSchedule(spark: SparkSession, dir: String,
                    budget: Long = ScheduleBudget,
                    maxEpochsMicro: Long = MaxEpochsMicro): DataFrame = {
    require(budget > 0 && maxEpochsMicro > 0)
    Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_tokens"))
      .withColumn("weight_bp", mixtureWeightBp(col("source")))
      .withColumn("alloc_tokens",
        expr(s"cast($budget as decimal(38,0)) * weight_bp div 10000"))
      .withColumn("epochs_micro",
        least(lit(maxEpochsMicro),
          expr("cast(alloc_tokens as decimal(38,0)) * 1000000 div n_tokens")))
      .withColumn("effective_tokens",
        expr("cast(n_tokens as decimal(38,0)) * epochs_micro div 1000000"))
      .withColumn("deficit_tokens", col("alloc_tokens") - col("effective_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight_bp"),
        col("alloc_tokens"), col("epochs_micro"), col("effective_tokens"),
        col("deficit_tokens"))
      .orderBy(col("source"))
  }

  def epochScheduleSql(budget: Long = ScheduleBudget,
                       maxEpochsMicro: Long = MaxEpochsMicro): String =
    s"""WITH t AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source
       |), w AS (
       |  SELECT *, ${mixtureWeightBpSql("source")} AS weight_bp FROM t
       |), a AS (
       |  SELECT *, ($budget * weight_bp) // 10000 AS alloc_tokens FROM w
       |), e AS (
       |  SELECT *, least($maxEpochsMicro,
       |    (alloc_tokens * 1000000) // n_tokens)::BIGINT AS epochs_micro
       |  FROM a
       |)
       |SELECT source, n_docs, n_tokens, weight_bp, alloc_tokens, epochs_micro,
       |  ((n_tokens * epochs_micro) // 1000000)::BIGINT AS effective_tokens,
       |  (alloc_tokens - (n_tokens * epochs_micro) // 1000000)::BIGINT
       |    AS deficit_tokens
       |FROM e ORDER BY source""".stripMargin

  // ---- X35: UniMax water-filling language allocation (q108) ---------------
  //
  // UniMax (Chung et al. 2023, arXiv:2304.09151): allocate a multilingual
  // token budget so every language gets an EQUAL share unless capped by
  // its epoch ceiling (a language may repeat at most E epochs) — the
  // fairness alternative to temperature sampling. The classic computation
  // is sequential water-filling over languages sorted by capacity; the
  // closed form used here: with capacities ascending, language k is
  // capped iff cap_k·(L−k+1) ≤ B − prefix_{k−1} (the capped set is a
  // RANK PREFIX — spec-asserted), every uncapped language gets the even
  // split of what the capped prefix left.

  /** Epoch ceiling per language (UniMax's E). */
  val UnimaxEpochCap = 4L
  /** Token budget as a multiple of the corpus size — derived from the
    * corpus, not a literal, so both regimes (capped small languages,
    * even-split large ones) appear at every SF. */
  val UnimaxBudgetX = 3L

  /** X35 UniMax allocation (q108): per language — token count, epoch
    * capacity, water-filling rank, capped flag, allocated tokens, exact
    * micro-epochs, and budget share in bp. All integer arithmetic;
    * decimal(38,0) guards the micro products past 9.2e12 tokens
    * (mirroring DuckDB's HUGEINT widening, the q100 device).
    *
    * Scale posture: one corpus scan collapses to the |langs|-row table;
    * rank and prefix sums come from a TRIANGLE SELF-JOIN over those ≤
    * dozens of rows (strictly-before keys), NOT a window — the plan
    * stays windowless and nothing ever single-partitions more than
    * |langs|² rows. The crossover rank and capped-prefix mass are 1-row
    * broadcasts back onto the same tiny table. */
  def unimaxAllocation(spark: SparkSession, dir: String): DataFrame = {
    // the |langs|-row rollup feeds totals, the triangle join (both
    // sides), the crossover election, and the output — persist it so
    // the executed plan pays ONE corpus scan, not one per reference
    val per = graft.PlanCache.cached(spark, s"curation.unimaxPer:$dir") {
      Tables.documents(spark, dir)
        .select(col("lang"),
          size(TextHash.tokens(col("text"))).cast("long").as("len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_tokens"))
    }
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_langs"))
    val base = per.crossJoin(broadcast(tot))
      .withColumn("budget", col("tot_tokens") * UnimaxBudgetX)
      .withColumn("cap_tokens", col("n_tokens") * UnimaxEpochCap)
    // rank/prefix over the |langs|-row table via the strictly-before
    // triangle join: rank = 1 + |{j: key_j < key_k}|, prefix = Σ cap_j
    val keys = base.select(col("lang").as("lang2"),
      col("cap_tokens").as("cap2"))
    val ranked = base.join(broadcast(keys),
        col("cap2") < col("cap_tokens") ||
          (col("cap2") === col("cap_tokens") && col("lang2") < col("lang")),
        "left")
      .groupBy(col("lang"), col("n_docs"), col("n_tokens"), col("budget"),
        col("cap_tokens"), col("n_langs"))
      .agg((count(col("lang2")) + 1L).as("alloc_rank"),
        coalesce(sum(col("cap2")), lit(0L)).as("prefix"))
    // ONE scalar agg elects both the crossover rank m and the capped-
    // prefix mass: the capped set is a rank prefix, so the max flagged
    // row's prefix + cap IS Σ_{rank ≤ m} cap
    val flag = expr("cap_tokens * (n_langs - alloc_rank + 1) <= budget - prefix")
    val m = ranked.agg(
      coalesce(max(when(flag, col("alloc_rank"))), lit(0L)).as("m"),
      coalesce(max(when(flag, col("prefix") + col("cap_tokens"))), lit(0L))
        .as("prefix_m"))
    ranked.crossJoin(broadcast(m))
      .withColumn("capped", col("alloc_rank") <= col("m"))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("(budget - prefix_m) div (n_langs - m)")))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("cap_tokens"),
        col("alloc_rank"), col("capped"), col("alloc_tokens"),
        expr("cast(alloc_tokens as decimal(38,0)) * 1000000 div n_tokens")
          .as("epochs_micro"),
        expr("cast(alloc_tokens as decimal(38,0)) * 10000 div budget")
          .as("share_bp"))
      .orderBy(col("lang"))
  }

  def unimaxAllocationSql: String =
    s"""WITH per AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs,
       |    sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY lang
       |), tot AS (
       |  SELECT sum(n_tokens)::BIGINT AS tot_tokens, count(*)::BIGINT AS n_langs
       |  FROM per
       |), base AS (
       |  SELECT per.*, tot.tot_tokens * $UnimaxBudgetX AS budget,
       |    per.n_tokens * $UnimaxEpochCap AS cap_tokens, tot.n_langs
       |  FROM per CROSS JOIN tot
       |), ranked AS (
       |  SELECT a.lang, a.n_docs, a.n_tokens, a.budget, a.cap_tokens,
       |    a.n_langs,
       |    1 + count(b.lang)::BIGINT AS alloc_rank,
       |    coalesce(sum(b.cap_tokens), 0)::BIGINT AS prefix
       |  FROM base a LEFT JOIN base b
       |    ON b.cap_tokens < a.cap_tokens
       |      OR (b.cap_tokens = a.cap_tokens AND b.lang < a.lang)
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |), mm AS (
       |  SELECT coalesce(max(CASE WHEN cap_tokens * (n_langs - alloc_rank + 1)
       |      <= budget - prefix THEN alloc_rank END), 0)::BIGINT AS m
       |  FROM ranked
       |), pm AS (
       |  SELECT coalesce(sum(CASE WHEN r.alloc_rank <= mm.m
       |    THEN r.cap_tokens END), 0)::BIGINT AS prefix_m
       |  FROM ranked r CROSS JOIN mm
       |), f AS (
       |  SELECT r.*, mm.m, pm.prefix_m,
       |    CASE WHEN r.alloc_rank <= mm.m THEN r.cap_tokens
       |      ELSE (r.budget - pm.prefix_m) // (r.n_langs - mm.m) END AS alloc
       |  FROM ranked r CROSS JOIN mm CROSS JOIN pm
       |)
       |SELECT lang, n_docs, n_tokens, cap_tokens, alloc_rank,
       |  (alloc_rank <= m) AS capped, alloc::BIGINT AS alloc_tokens,
       |  ((alloc * 1000000) // n_tokens)::BIGINT AS epochs_micro,
       |  ((alloc * 10000) // budget)::BIGINT AS share_bp
       |FROM f ORDER BY lang""".stripMargin

  // ---- X41: temperature-sampled language allocation (q114) ----------------

  /** X41 temperature sampling (q114): the classic multilingual sampling
    * rule p_l ∝ n_l^α with α = 1/2 — the smoothing XLM-R/mT5-style
    * pretraining applies so low-resource languages are up-sampled
    * relative to their natural share (arXiv:1911.02116 §3.1; UniMax's
    * q108 water-filling is the cap-aware alternative). α is pinned to
    * 1/2 so the power is ONE IEEE-correctly-rounded `sqrt` over an exact
    * integer token count — both engines compute the identical double,
    * and `floor(·×1e6)` lifts it to an exact micro-unit integer before
    * any sum, so share arithmetic is order-free (the q107 device). Per
    * language: token mass, natural share, temperature share, the boost
    * factor (temperature/natural, bp of bp), and the token allocation
    * under a budget of one corpus-equivalent.
    *
    * Scale posture: one corpus scan collapses to the PlanCache'd
    * |langs|-row rollup shared with q108; everything after is tiny-table
    * arithmetic against two broadcast scalars. n_tokens per language
    * stays < 2^53 well past 100 TB (2.5e13 tokens ≪ 9e15), so the
    * bigint→double sqrt input is exact by construction. */
  def temperatureAllocation(spark: SparkSession, dir: String): DataFrame = {
    val per = graft.PlanCache.cached(spark, s"curation.unimaxPer:$dir") {
      Tables.documents(spark, dir)
        .select(col("lang"),
          size(TextHash.tokens(col("text"))).cast("long").as("len"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_tokens"))
    }
    val w = per.withColumn("w_micro",
      floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    val tot = w.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("w_micro")).as("tot_w"))
    w.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("w_micro"),
        expr("cast(n_tokens as decimal(38,0)) * 10000 div tot_tokens")
          .cast("long").as("natural_bp"),
        expr("cast(w_micro as decimal(38,0)) * 10000 div tot_w")
          .cast("long").as("temp_bp"),
        expr("cast(cast(w_micro as decimal(38,0)) * 10000 div tot_w " +
          "as decimal(38,0)) * 10000 div " +
          "(cast(n_tokens as decimal(38,0)) * 10000 div tot_tokens)")
          .cast("long").as("boost_bp"),
        expr("cast(tot_tokens as decimal(38,0)) * w_micro div tot_w")
          .cast("long").as("alloc_tokens"))
      .orderBy(col("lang"))
  }

  def temperatureAllocationSql: String =
    s"""WITH per AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs,
       |    sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY lang
       |), w AS (
       |  SELECT *, CAST(floor(sqrt(n_tokens::DOUBLE) * 1e6) AS BIGINT)
       |    AS w_micro FROM per
       |), tot AS (
       |  SELECT sum(n_tokens)::BIGINT AS tot_tokens,
       |    sum(w_micro)::BIGINT AS tot_w FROM w
       |)
       |SELECT lang, n_docs, n_tokens, w_micro,
       |  ((n_tokens * 10000) // tot_tokens)::BIGINT AS natural_bp,
       |  ((w_micro * 10000) // tot_w)::BIGINT AS temp_bp,
       |  ((((w_micro * 10000) // tot_w) * 10000) //
       |    ((n_tokens * 10000) // tot_tokens))::BIGINT AS boost_bp,
       |  ((tot_tokens * w_micro) // tot_w)::BIGINT AS alloc_tokens
       |FROM w CROSS JOIN tot ORDER BY lang""".stripMargin

  // ---- X38: decontaminated eval-set builder (q111) ------------------------

  /** X38 eval-set construction (q111): the composed recipe an evaluation
    * pipeline runs to carve a CLEAN held-out set from a corpus — q45
    * decontamination (drop any doc sharing a 5-gram with the benchmark)
    * → q19 exact dedup (one survivor per content digest) → q75
    * deterministic per-language exact-k sample (smallest-k by content
    * hash — dup-stable and engine-independent). One row per language:
    * pool size, contaminated / duplicate exclusions, sample size, and
    * the order-free sum of sampled doc_ids — the cross-engine MEMBERSHIP
    * gate (the q101 elected-id-sum device): the oracle can only match if
    * both engines picked the exact same documents.
    *
    * Scale posture: every stage is the already-audited library operator
    * shape — broadcast bench-hash semi-join (or its q50 bloom twin at
    * larger bench sizes), digest-keyed map-side-combinable dedup, and
    * the bounded-heap [[graft.functions.MinKDocs]] two-phase sample
    * (never a per-language window sort). The corpus body crosses one
    * digest shuffle; everything else moves 8-byte keys. */
  def evalSetBuild(spark: SparkSession, dir: String,
                   benchSize: Int = 10, n: Int = 5, k: Int = 25): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.HashExpressions.shingleHashes(col("text"), n)).as("h"))
    val bench = sh.filter(col("doc_id") < benchSize).select(col("h")).distinct()
    val contaminated = sh.filter(col("doc_id") >= benchSize)
      .join(broadcast(bench), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    val pool = docs.filter(col("doc_id") >= benchSize)
      .select(col("doc_id"), col("lang"), col("text"))
    val flagged = pool.join(contaminated.withColumn("is_cont", lit(1L)),
      Seq("doc_id"), "left")
    val clean = flagged.filter(col("is_cont").isNull)
    // one survivor per content digest; lang and content hash are
    // digest-constant, so min() carries them without a join-back
    val dedup = clean
      .select(col("doc_id"), col("lang"),
        sha2(col("text").cast("binary"), 256).as("dg"),
        TextHash.h1(col("text")).as("hkey"))
      .groupBy(col("dg"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"),
        min(col("hkey")).as("hkey"))
    val minK = udaf(new graft.functions.MinKDocs(k))
    val sampled = dedup.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_dedup"), minK(col("hkey"), col("doc_id")).as("picks"))
      .select(col("lang"), col("n_dedup"),
        size(col("picks")).cast("long").as("n_sampled"),
        aggregate(col("picks"), lit(0L),
          (acc, p) => acc + p.getField("doc_id")).as("sum_doc_ids"))
    val poolStats = flagged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pool"),
        sum(coalesce(col("is_cont"), lit(0L))).as("n_contaminated"))
    poolStats.join(sampled, Seq("lang"))
      .select(col("lang"), col("n_pool"), col("n_contaminated"),
        (col("n_pool") - col("n_contaminated") - col("n_dedup"))
          .as("n_dup_excluded"),
        col("n_dedup"), col("n_sampled"), col("sum_doc_ids"))
      .orderBy(col("lang"))
  }

  def evalSetBuildSql(benchSize: Int = 10, n: Int = 5, k: Int = 25): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, text, string_split(lower(text), ' ') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, ${TextHash.h1Sql("g")} AS h
       |  FROM (SELECT doc_id, unnest(${TextHash.shinglesSql("t", n)}) AS g
       |        FROM toks)
       |), bench AS (
       |  SELECT DISTINCT h FROM sh WHERE doc_id < $benchSize
       |), cont AS (
       |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (h)
       |  WHERE s.doc_id >= $benchSize
       |), pool AS (
       |  SELECT d.doc_id, d.lang, d.text,
       |    CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS is_cont
       |  FROM documents d LEFT JOIN cont c USING (doc_id)
       |  WHERE d.doc_id >= $benchSize
       |), ded AS (
       |  SELECT min(doc_id) AS doc_id, min(lang) AS lang,
       |    min(${TextHash.h1Sql("text")}) AS hkey
       |  FROM pool WHERE is_cont = 0
       |  GROUP BY sha256(text)
       |), r AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn
       |  FROM ded
       |), samp AS (
       |  SELECT lang, count(*)::BIGINT AS n_dedup,
       |    sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       |    coalesce(sum(CASE WHEN rn <= $k THEN doc_id END), 0)::BIGINT
       |      AS sum_doc_ids
       |  FROM r GROUP BY lang
       |), ps AS (
       |  SELECT lang, count(*)::BIGINT AS n_pool,
       |    sum(is_cont)::BIGINT AS n_contaminated
       |  FROM pool GROUP BY lang
       |)
       |SELECT ps.lang, ps.n_pool, ps.n_contaminated,
       |  (ps.n_pool - ps.n_contaminated - samp.n_dedup)::BIGINT
       |    AS n_dup_excluded,
       |  samp.n_dedup, samp.n_sampled, samp.sum_doc_ids
       |FROM ps JOIN samp USING (lang) ORDER BY ps.lang""".stripMargin

  // ---- X40: corpus snapshot diff (q113) -----------------------------------

  /** X40 corpus snapshot diff (q113): the q103 datasheet's DELTA report
    * between two ingest snapshots (old = even doc_id, new = odd — the
    * q107 device on the document side): per language, doc/token masses
    * on each side, the mean-quality shift in exact micro-units, and the
    * content turnover — digests present in both snapshots, minted by the
    * new one, retired from the old. This is the report a data-ops
    * rotation reviews after every refresh: "fr shrank 4%, quality up
    * 12 m, a third of its content is new".
    *
    * Scale posture: ONE corpus scan; the side rollup is a (lang, parity)
    * map-side-combinable aggregate and the turnover is a digest-keyed
    * aggregate (32-byte keys, never bodies) collapsing to per-lang
    * counts — the q103 shapes, nothing new at 100 TB. Mean deltas use
    * `greatest(1, n)` guards so a one-sided language degrades to a
    * defined value instead of a null. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"), (col("doc_id") % 2 === 0).as("is_old"),
        size(TextHash.tokens(col("text"))).cast("long").as("t"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"),
        sha2(col("text").cast("binary"), 256).as("dg"))
      .withColumn("qm", expr("cast(round(q * 1000000) as bigint)"))
    val sides = d.groupBy(col("lang"))
      .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("n_docs_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_docs_new"),
        sum(when(col("is_old"), col("t")).otherwise(0L)).as("n_tokens_old"),
        sum(when(!col("is_old"), col("t")).otherwise(0L)).as("n_tokens_new"),
        sum(when(col("is_old"), col("qm")).otherwise(0L)).as("qm_old"),
        sum(when(!col("is_old"), col("qm")).otherwise(0L)).as("qm_new"))
    val turnover = d.groupBy(col("lang"), col("dg"))
      .agg(max(when(col("is_old"), 1L).otherwise(0L)).as("o"),
        max(when(!col("is_old"), 1L).otherwise(0L)).as("w"))
      .groupBy(col("lang"))
      .agg(sum(when(col("o") === 1L && col("w") === 1L, 1L).otherwise(0L))
          .as("n_shared_texts"),
        sum(when(col("o") === 0L && col("w") === 1L, 1L).otherwise(0L))
          .as("n_new_texts"),
        sum(when(col("o") === 1L && col("w") === 0L, 1L).otherwise(0L))
          .as("n_retired_texts"))
    sides.join(turnover, Seq("lang"))
      .select(col("lang"), col("n_docs_old"), col("n_docs_new"),
        col("n_tokens_old"), col("n_tokens_new"),
        expr("qm_new div greatest(1L, n_docs_new) - " +
          "qm_old div greatest(1L, n_docs_old)").as("mean_q_delta_micro"),
        col("n_shared_texts"), col("n_new_texts"), col("n_retired_texts"))
      .orderBy(col("lang"))
  }

  def corpusDiffSql: String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH qd AS (
       |  SELECT lang, (doc_id % 2 = 0) AS is_old, text, ntok::BIGINT AS t,
       |    CAST(round(round(0.25 * least(ntok / 50.0, 1.0) +
       |      0.25 * (uniq / ntok) +
       |      0.25 * (1.0 - (stops / ntok)) +
       |      0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6)
       |      * 1000000) AS BIGINT) AS qm
       |  FROM (
       |    SELECT lang, doc_id, text,
       |      len(tk)::DOUBLE AS ntok,
       |      len(list_distinct(tk))::DOUBLE AS uniq,
       |      len(list_filter(tk, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT lang, doc_id, text, string_split(lower(text), ' ') AS tk
       |          FROM documents))
       |), sides AS (
       |  SELECT lang,
       |    sum(CASE WHEN is_old THEN 1 ELSE 0 END)::BIGINT AS n_docs_old,
       |    sum(CASE WHEN is_old THEN 0 ELSE 1 END)::BIGINT AS n_docs_new,
       |    sum(CASE WHEN is_old THEN t ELSE 0 END)::BIGINT AS n_tokens_old,
       |    sum(CASE WHEN is_old THEN 0 ELSE t END)::BIGINT AS n_tokens_new,
       |    sum(CASE WHEN is_old THEN qm ELSE 0 END)::BIGINT AS qm_old,
       |    sum(CASE WHEN is_old THEN 0 ELSE qm END)::BIGINT AS qm_new
       |  FROM qd GROUP BY lang
       |), tv AS (
       |  SELECT lang,
       |    sum(CASE WHEN o = 1 AND w = 1 THEN 1 ELSE 0 END)::BIGINT
       |      AS n_shared_texts,
       |    sum(CASE WHEN o = 0 AND w = 1 THEN 1 ELSE 0 END)::BIGINT
       |      AS n_new_texts,
       |    sum(CASE WHEN o = 1 AND w = 0 THEN 1 ELSE 0 END)::BIGINT
       |      AS n_retired_texts
       |  FROM (
       |    SELECT lang, sha256(text) AS dg,
       |      max(CASE WHEN is_old THEN 1 ELSE 0 END) AS o,
       |      max(CASE WHEN is_old THEN 0 ELSE 1 END) AS w
       |    FROM qd GROUP BY 1, 2)
       |  GROUP BY lang
       |)
       |SELECT s.lang, s.n_docs_old, s.n_docs_new, s.n_tokens_old,
       |  s.n_tokens_new,
       |  (s.qm_new // greatest(1, s.n_docs_new)
       |    - s.qm_old // greatest(1, s.n_docs_old))::BIGINT
       |    AS mean_q_delta_micro,
       |  tv.n_shared_texts, tv.n_new_texts, tv.n_retired_texts
       |FROM sides s JOIN tv USING (lang) ORDER BY s.lang""".stripMargin
  }

  // ---- X29: curriculum phase schedule (q102) ------------------------------

  /** Curriculum phases for [[curriculumSchedule]]: 4 quartile bands per
    * language, trained easy→hard (phase 1 = hardest-to-read lowest-
    * quality quartile last or first is the RECIPE's choice; the operator
    * just makes the bands exact and auditable). */
  val CurriculumPhases = 4

  /** X29 curriculum phase schedule (q102): partition each language's
    * corpus into [[CurriculumPhases]] quality-quantile bands — the
    * per-phase doc/token budget a curriculum-learning run trains
    * through in order. Phase boundaries are the exact discrete
    * quantiles of the q99 device (smallest rounded score covering
    * ceil(p·n/P) docs); a doc's phase is the first band whose cutoff
    * holds its score, so ties land deterministically in the earlier
    * band in BOTH engines. The audit reports per (lang, phase): docs,
    * tokens, and the exact micro-unit quality sum (q89's device) plus
    * the band's score range.
    *
    * Scale posture: the corpus collapses to the same (lang,
    * rounded-score) histogram as q99 (map-side combine) — the window
    * and the P-way fan-out order HISTOGRAM rows only; phase assignment
    * is a broadcast join of ≤ 3·|langs| cutoff rows back onto one
    * corpus scan, then a map-side-combinable (lang, phase) rollup. The
    * corpus is never sorted and never shuffled except the final
    * |langs|·P-row aggregate. */
  def curriculumSchedule(spark: SparkSession, dir: String,
                         phases: Int = CurriculumPhases): DataFrame = {
    require(phases >= 2)
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy(col("lang"))
    val cumW = byLang.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    // interior cutoffs p = 1..P-1, elected from the histogram (q99),
    // folded into ONE sorted array per language so phase assignment is a
    // pure per-row map after the broadcast join — the corpus crosses no
    // shuffle between the scan and the |langs|·P-row rollup
    val cutoffs = scored
      .groupBy(col("lang"), col("q")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("n", sum(col("cnt")).over(byLang))
      .select(col("lang"), col("q"), col("cum"), col("n"),
        explode(array((1 until phases).map(p => lit(p.toLong)): _*)).as("p"))
      .filter(col("cum") >= expr(s"(p * n + ${phases - 1}) div $phases"))
      .groupBy(col("lang"), col("p")).agg(min(col("q")).as("cutoff"))
      .groupBy(col("lang"))
      .agg(sort_array(collect_list(col("cutoff"))).as("cuts"))
    scored
      .join(broadcast(cutoffs), Seq("lang"))
      // first band whose cutoff holds the score = 1 + bands strictly below
      .withColumn("phase",
        lit(1L) + size(filter(col("cuts"), c => c < col("q"))).cast("long"))
      .select(col("lang"), col("phase"), col("n_tokens"),
        expr("cast(round(q * 1000000) as bigint)").as("q_micro"))
      .groupBy(col("lang"), col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        sum(col("q_micro")).as("sum_q_micro"),
        min(col("q_micro")).as("min_q_micro"),
        max(col("q_micro")).as("max_q_micro"))
      .orderBy(col("lang"), col("phase"))
  }

  def curriculumScheduleSql(phases: Int = CurriculumPhases): String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    round(0.25 * least(ntok / 50.0, 1.0) +
       |          0.25 * (uniq / ntok) +
       |          0.25 * (1.0 - (stops / ntok)) +
       |          0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6) AS q,
       |    ntok::BIGINT AS n_tokens
       |  FROM (
       |    SELECT doc_id, lang,
       |      len(t)::DOUBLE AS ntok,
       |      len(list_distinct(t))::DOUBLE AS uniq,
       |      len(list_filter(t, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT doc_id, lang, text,
       |          string_split(lower(text), ' ') AS t FROM documents))
       |), h AS (
       |  SELECT lang, q, count(*)::BIGINT AS cnt FROM s GROUP BY lang, q
       |), c AS (
       |  SELECT lang, q, cnt,
       |    sum(cnt) OVER (PARTITION BY lang ORDER BY q
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (PARTITION BY lang) AS n
       |  FROM h
       |), cu AS (
       |  SELECT lang, p, min(q) AS cutoff
       |  FROM (SELECT lang, q, cum, n,
       |        unnest(range(1, $phases)::BIGINT[]) AS p FROM c)
       |  WHERE cum >= (p * n + ${phases - 1}) // $phases
       |  GROUP BY lang, p
       |), ph AS (
       |  SELECT s.doc_id, s.lang, s.q, s.n_tokens,
       |    (1 + sum(CASE WHEN cu.cutoff < s.q THEN 1 ELSE 0 END))::BIGINT
       |      AS phase
       |  FROM s JOIN cu USING (lang)
       |  GROUP BY s.doc_id, s.lang, s.q, s.n_tokens
       |)
       |SELECT lang, phase, count(*)::BIGINT AS n_docs,
       |  sum(n_tokens)::BIGINT AS sum_tokens,
       |  sum(CAST(round(q * 1000000) AS BIGINT))::BIGINT AS sum_q_micro,
       |  min(CAST(round(q * 1000000) AS BIGINT))::BIGINT AS min_q_micro,
       |  max(CAST(round(q * 1000000) AS BIGINT))::BIGINT AS max_q_micro
       |FROM ph GROUP BY lang, phase ORDER BY lang, phase""".stripMargin
  }

  // ---- X30: corpus datasheet (q103) ---------------------------------------

  /** X30 corpus datasheet (q103): the one-call per-language report a
    * corpus consumer reads before anything else — size (docs, tokens),
    * redundancy (distinct texts + exact-dup rate in basis points),
    * quality mass (micro-unit sum of the q17 score), and provenance
    * concentration (source count, the dominant source and its share).
    * Every column is either an exact integer or the q89 micro-unit
    * device, so the whole datasheet is hash-stable cross-engine. The
    * dominant source ties break lexicographically — deterministic in
    * both engines.
    *
    * Scale posture: three map-side-combinable aggregates, none over more
    * than the corpus once — (lang) doc/token/quality rollup on the scan;
    * (lang, digest) → (lang) distinct counting keyed on the 32-byte
    * sha256 (never the body); (lang, source) counts (|langs|·|sources|
    * rows) ranked by a window over that TINY table. One final 5-row
    * join fan-in. Nothing sorts or shuffles the corpus body.
    *
    * Reference tie-in: the reference ships raw tweets with no corpus
    * reporting at all (`ProcessStreamData.py:25-30`); the datasheet is
    * the LLM-pipeline extension's summary surface (SURVEY.md §2.12). */
  def corpusDatasheet(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    // (lang) body rollup — one scan: docs, tokens, quality micro-mass,
    // distinct texts counted on the 32-byte digest (never the body)
    val body = docs
      .select(col("lang"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("t"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"),
        sha2(col("text").cast("binary"), 256).as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(expr("cast(round(q * 1000000) as bigint)")).as("sum_q_micro"),
        countDistinct(col("h")).as("n_distinct_texts"))
    // (lang, source) concentration: dominant source by count, ties
    // lexicographic — a window over the |langs|·|sources|-row table
    val srcW = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("source"))
    val srcs = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(srcW))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        max(when(col("rk") === 1, col("source"))).as("top_source"),
        max(when(col("rk") === 1, col("cnt"))).as("top_cnt"))
    body.join(srcs, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("n_distinct_texts"),
        expr("(n_docs - n_distinct_texts) * 10000 div n_docs").as("dup_rate_bp"),
        col("sum_q_micro"), col("n_sources"), col("top_source"),
        expr("top_cnt * 10000 div n_docs").as("top_source_share_bp"))
      .orderBy(col("lang"))
  }

  def corpusDatasheetSql: String = {
    val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH q AS (
       |  SELECT lang, text,
       |    round(0.25 * least(ntok / 50.0, 1.0) +
       |          0.25 * (uniq / ntok) +
       |          0.25 * (1.0 - (stops / ntok)) +
       |          0.25 * least(((chars - (ntok - 1)) / ntok) / 6.0, 1.0), 6) AS q,
       |    ntok::BIGINT AS t
       |  FROM (
       |    SELECT lang, text,
       |      len(tk)::DOUBLE AS ntok,
       |      len(list_distinct(tk))::DOUBLE AS uniq,
       |      len(list_filter(tk, x -> x IN ($stop)))::DOUBLE AS stops,
       |      length(text)::DOUBLE AS chars
       |    FROM (SELECT lang, text, string_split(lower(text), ' ') AS tk
       |          FROM documents))
       |), body AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS n_tokens,
       |    sum(CAST(round(q * 1000000) AS BIGINT))::BIGINT AS sum_q_micro,
       |    count(DISTINCT sha256(text))::BIGINT AS n_distinct_texts
       |  FROM q GROUP BY lang
       |), sc AS (
       |  SELECT lang, source, count(*)::BIGINT AS cnt,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY count(*) DESC, source) AS rk
       |  FROM documents GROUP BY lang, source
       |), srcs AS (
       |  SELECT lang, count(*)::BIGINT AS n_sources,
       |    max(CASE WHEN rk = 1 THEN source END) AS top_source,
       |    max(CASE WHEN rk = 1 THEN cnt END) AS top_cnt
       |  FROM sc GROUP BY lang
       |)
       |SELECT b.lang, b.n_docs, b.n_tokens, b.n_distinct_texts,
       |  ((b.n_docs - b.n_distinct_texts) * 10000 // b.n_docs)::BIGINT
       |    AS dup_rate_bp,
       |  b.sum_q_micro, s.n_sources, s.top_source,
       |  (s.top_cnt * 10000 // b.n_docs)::BIGINT AS top_source_share_bp
       |FROM body b JOIN srcs s USING (lang) ORDER BY b.lang""".stripMargin
  }

  /** The four encoding-hygiene character classes [[encodingHygiene]]
    * screens for, as (tag, codepoint): the UTF-8 decode-failure
    * REPLACEMENT CHARACTER, a control char (BEL — the class
    * representative; real cleaners sweep C0 minus tab/newline), the
    * no-break space that poisons whitespace tokenization, and the
    * zero-width space that makes visually-identical strings unequal
    * (a dedup killer). */
  val HygieneChars: Seq[(String, Int)] = Seq(
    "repl" -> 0xFFFD, "ctrl" -> 0x0007, "nbsp" -> 0x00A0, "zwsp" -> 0x200B)

  /** Encoding-hygiene audit (q182): per language — docs carrying each
    * hygiene-class character, total bad characters, and the characters
    * a cleaner would REMOVE (replacement/control/zero-width deleted;
    * NBSP maps 1:1 to a plain space, so it flags but removes nothing).
    * This is the decode-sanity row of a corpus datasheet: replacement
    * chars mean upstream charset damage (mojibake), zero-width
    * characters silently defeat exact dedup (X1) and token counting
    * (X4), and NBSP splits the whitespace tokenizer's contract.
    *
    * The driver corpus is clean lowercase-alpha (zero hits proves
    * nothing), so hygiene characters are injected IN-QUERY,
    * deterministically from doc_id — the q60 scrub-audit device; both
    * engines audit the identical augmented text. Counting is pure
    * length algebra (length(t) − length(replace(t, c, ''))): no
    * regex, so no dialect ever crosses engines.
    *
    * Scale posture: a narrow per-row map (four replace/length pairs,
    * codegen'd) into a |langs|-row rollup with map-side combine — the
    * flat-scalable q15 shape. */
  def encodingHygiene(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    def ch(tag: String): String =
      new String(Character.toChars(HygieneChars.toMap.apply(tag)))
    val injected = concat(col("text"),
      when(pmod(d, lit(3)) === 0, lit(ch("repl"))).otherwise(lit("")),
      when(pmod(d, lit(4)) === 1, lit(ch("ctrl"))).otherwise(lit("")),
      when(pmod(d, lit(5)) === 2, lit(ch("nbsp"))).otherwise(lit("")),
      when(pmod(d, lit(7)) === 3, lit(ch("zwsp"))).otherwise(lit("")))
    def cnt(t: org.apache.spark.sql.Column, tag: String) =
      (length(t) - length(translate(t, ch(tag), ""))).cast("long")
    val t = injected
    Tables.documents(spark, dir)
      .select(col("lang"),
        cnt(t, "repl").as("c_repl"), cnt(t, "ctrl").as("c_ctrl"),
        cnt(t, "nbsp").as("c_nbsp"), cnt(t, "zwsp").as("c_zwsp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c_repl") > 0, 1L).otherwise(0L)).as("docs_repl"),
        sum(when(col("c_ctrl") > 0, 1L).otherwise(0L)).as("docs_ctrl"),
        sum(when(col("c_nbsp") > 0, 1L).otherwise(0L)).as("docs_nbsp"),
        sum(when(col("c_zwsp") > 0, 1L).otherwise(0L)).as("docs_zwsp"),
        sum(col("c_repl") + col("c_ctrl") + col("c_nbsp") + col("c_zwsp"))
          .as("n_bad_chars"),
        sum(col("c_repl") + col("c_ctrl") + col("c_zwsp"))
          .as("n_chars_removed"))
      .orderBy(col("lang"))
  }

  /** The three PII pattern classes [[piiAudit]] screens for, as
    * (tag, regex): the C4/Dolma masking battery's core — email
    * addresses, IP-like dotted quads, and US-style hyphenated phone
    * numbers. The patterns deliberately stay inside the regex subset
    * where Java (Spark) and RE2 (DuckDB) agree exactly: literal
    * classes, bounded repetition, `\d`, ASCII `\b` — no backreferences,
    * no lookaround, no alternation ambiguity — so non-overlapping
    * left-to-right match COUNTS are engine-identical. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** PII-detection audit (q197): per (lang, PII class) — documents
    * carrying at least one hit, total hits, and the carrying-doc share
    * in bp. This is the privacy row of a corpus datasheet (the audit a
    * C4/Dolma-style PII-masking pass runs BEFORE deciding to mask or
    * drop): emails and phone numbers are direct identifiers, IP
    * addresses are quasi-identifiers, and the per-language split shows
    * which ingest streams leak them.
    *
    * The driver corpus is clean word-soup (zero hits proves nothing),
    * so PII strings are injected IN-QUERY, deterministically from
    * doc_id — the q60/q182 device; both engines audit the identical
    * augmented text. doc_id ≡ 0 (mod 3) gains one email and ≡ 0
    * (mod 9) a second (exercising hit counts > 1), ≡ 1 (mod 4) a
    * phone, ≡ 2 (mod 5) a dotted quad. Counting is `regexp_count`
    * over [[PiiPatterns]] — the documented Java/RE2-agreeing subset.
    *
    * Scale posture: a narrow per-row projection (three codegen'd
    * regexp counters) into a |langs|-row rollup with map-side combine
    * (the q15/q182 shape); the per-class long format unpivots AFTER
    * aggregation via one stack() over |langs| rows, never a corpus
    * Expand. */
  def piiAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val injected = concat(col("text"),
      when(pmod(d, lit(3)) === 0,
        concat(lit(" u"), pmod(d, lit(97)).cast("string"), lit("@ex.org")))
        .otherwise(lit("")),
      when(pmod(d, lit(9)) === 0,
        concat(lit(" re"), pmod(d, lit(89)).cast("string"), lit("@ex.org")))
        .otherwise(lit("")),
      when(pmod(d, lit(4)) === 1,
        concat(lit(" 555-"), lpad(pmod(d, lit(1000)).cast("string"), 3, "0"),
          lit("-"), lpad(pmod(d, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod(d, lit(5)) === 2,
        concat(lit(" 10."), pmod(d, lit(256)).cast("string"),
          lit("."), pmod(d, lit(199)).cast("string"),
          lit("."), pmod(d, lit(97)).cast("string")))
        .otherwise(lit("")))
    val pats = PiiPatterns.toMap
    def cnt(tag: String) =
      regexp_count(injected, lit(pats(tag))).cast("long")
    Tables.documents(spark, dir)
      .select(col("lang"), cnt("email").as("c_email"),
        cnt("ip").as("c_ip"), cnt("phone").as("c_phone"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c_email") > 0, 1L).otherwise(0L)).as("d_email"),
        sum(col("c_email")).as("h_email"),
        sum(when(col("c_ip") > 0, 1L).otherwise(0L)).as("d_ip"),
        sum(col("c_ip")).as("h_ip"),
        sum(when(col("c_phone") > 0, 1L).otherwise(0L)).as("d_phone"),
        sum(col("c_phone")).as("h_phone"))
      .select(col("lang"), col("n_docs"), expr(
        "stack(3, 'email', d_email, h_email, 'ip', d_ip, h_ip, " +
          "'phone', d_phone, h_phone) AS (pii_class, docs_hit, n_hits)"))
      .select(col("lang"), col("pii_class"), col("n_docs"),
        col("docs_hit"), col("n_hits"),
        expr("docs_hit * 10000 div n_docs").as("density_bp"))
      .orderBy(col("lang"), col("pii_class"))
  }

  def piiAuditSql: String = {
    val pats = PiiPatterns.toMap
    def cnt(tag: String): String =
      s"len(regexp_extract_all(t, '${pats(tag)}'))::BIGINT"
    s"""WITH aug AS (
       |  SELECT lang, text
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN ' u' || (doc_id % 97)::VARCHAR || '@ex.org'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 9 = 0
       |         THEN ' re' || (doc_id % 89)::VARCHAR || '@ex.org'
       |         ELSE '' END
       |    || CASE WHEN doc_id % 4 = 1
       |         THEN ' 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
       |           || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
       |         ELSE '' END
       |    || CASE WHEN doc_id % 5 = 2
       |         THEN ' 10.' || (doc_id % 256)::VARCHAR
       |           || '.' || (doc_id % 199)::VARCHAR
       |           || '.' || (doc_id % 97)::VARCHAR
       |         ELSE '' END AS t
       |  FROM documents
       |), c AS (
       |  SELECT lang, ${cnt("email")} AS c_email, ${cnt("ip")} AS c_ip,
       |    ${cnt("phone")} AS c_phone
       |  FROM aug
       |), g AS (
       |  SELECT lang, count(*)::BIGINT AS n_docs,
       |    sum(CASE WHEN c_email > 0 THEN 1 ELSE 0 END)::BIGINT AS d_email,
       |    sum(c_email)::BIGINT AS h_email,
       |    sum(CASE WHEN c_ip > 0 THEN 1 ELSE 0 END)::BIGINT AS d_ip,
       |    sum(c_ip)::BIGINT AS h_ip,
       |    sum(CASE WHEN c_phone > 0 THEN 1 ELSE 0 END)::BIGINT AS d_phone,
       |    sum(c_phone)::BIGINT AS h_phone
       |  FROM c GROUP BY 1
       |), u AS (
       |  SELECT lang, 'email' AS pii_class, n_docs, d_email AS docs_hit,
       |    h_email AS n_hits FROM g
       |  UNION ALL
       |  SELECT lang, 'ip', n_docs, d_ip, h_ip FROM g
       |  UNION ALL
       |  SELECT lang, 'phone', n_docs, d_phone, h_phone FROM g
       |)
       |SELECT lang, pii_class, n_docs, docs_hit, n_hits,
       |  (docs_hit * 10000 // n_docs)::BIGINT AS density_bp
       |FROM u ORDER BY lang, pii_class""".stripMargin
  }

  /** Anonymity thresholds [[kAnonymity]] prices: the k values privacy
    * reviews actually debate (k = 2 "any corroboration", 5 and 10 "the
    * common policy floors", 20 "strict release"). */
  val KAnonThresholds: Seq[Int] = Seq(2, 5, 10, 20)

  /** k-anonymity audit (q199): for the quasi-identifier tuple
    * (nation, market segment, $100 account-balance band) — the classic
    * "coarse demographics + a binned numeric is still identifying"
    * setup (Sweeney 2002) — the exact re-identification exposure at
    * each policy threshold k: equivalence classes smaller than k, the
    * rows inside them, and the at-risk share in bp. A singleton class
    * is a direct re-identification; the audit is what a privacy review
    * runs BEFORE any release or join against external data, and the
    * q193 erasure sweep is its remediation twin.
    *
    * The balance band shifts by +100000 cents before the integer
    * division: TPC-H balances go negative, and Spark `div` truncates
    * while DuckDB `//` floors — non-negative operands are the only
    * regime where both engines agree (FIXTURES.md §C sign rule).
    *
    * Scale posture: ONE corpus shuffle (the quasi-identifier groupBy,
    * map-side combinable, keyed on the high-cardinality QI tuple),
    * collapsed to a class-SIZE histogram (≤|distinct sizes| rows —
    * audit-sized at any corpus scale); every threshold is a
    * conditional sum over that histogram in one pass, and the
    * per-k long format is a 4-row stack over the 1-row aggregate,
    * never a re-scan. */
  def kAnonymity(spark: SparkSession, dir: String,
                 thresholds: Seq[Int] = KAnonThresholds): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.forall(_ > 1), s"kAnonymity: bad thresholds $thresholds")
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("q_nation"),
        col("c_mktsegment").as("q_segment"),
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 10000")
          .as("q_balband"))
      .groupBy(col("q_nation"), col("q_segment"), col("q_balband"))
      .agg(count(lit(1)).as("gsize"))
    val hist = classes.groupBy(col("gsize")).agg(count(lit(1)).as("ng"))
    val sums = thresholds.flatMap { k =>
      Seq(sum(when(col("gsize") < k, col("ng")).otherwise(0L))
        .as(s"gb_$k"),
        sum(when(col("gsize") < k, col("gsize") * col("ng")).otherwise(0L))
          .as(s"rk_$k"))
    }
    val stackArgs = thresholds
      .map(k => s"${k}L, gb_$k, rk_$k").mkString(", ")
    val aggCols = Seq(sum(col("gsize") * col("ng")).as("n_rows")) ++ sums
    hist
      .agg(sum(col("ng")).as("n_classes"), aggCols: _*)
      .select(col("n_classes"), col("n_rows"), expr(
        s"stack(${thresholds.size}, $stackArgs) " +
          "AS (k, classes_below, rows_at_risk)"))
      .select(col("k"), col("n_classes"), col("classes_below"),
        col("n_rows"), col("rows_at_risk"),
        expr("rows_at_risk * 10000 div n_rows").as("risk_bp"))
      .orderBy(col("k"))
  }

  def kAnonymitySql(thresholds: Seq[Int] = KAnonThresholds): String = {
    val legs = thresholds.map { k =>
      s"""SELECT $k::BIGINT AS k, n_classes, (
         |    SELECT count(*)::BIGINT FROM cls WHERE gsize < $k) AS classes_below,
         |  n_rows, (
         |    SELECT coalesce(sum(gsize), 0)::BIGINT FROM cls
         |    WHERE gsize < $k) AS rows_at_risk
         |FROM tot""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH cls AS (
       |  SELECT c_nationkey::BIGINT AS q_nation, c_mktsegment AS q_segment,
       |    ((round(c_acctbal * 100)::BIGINT + 100000) // 10000) AS q_balband,
       |    count(*)::BIGINT AS gsize
       |  FROM customer GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT count(*)::BIGINT AS n_classes, sum(gsize)::BIGINT AS n_rows
       |  FROM cls
       |), u AS (
       |  $legs
       |)
       |SELECT k, n_classes, classes_below, n_rows, rows_at_risk,
       |  (rows_at_risk * 10000 // n_rows)::BIGINT AS risk_bp
       |FROM u ORDER BY k""".stripMargin
  }

  /** Diversity thresholds [[lDiversity]] prices: ℓ = 2 ("not every row
    * in the class agrees"), 3 and 5 (the common policy floors from the
    * original paper's examples). */
  val LDivThresholds: Seq[Int] = Seq(2, 3, 5)

  /** X137 ℓ-diversity audit (q211): k-anonymity's successor read
    * (Machanavajjhala et al. 2006) over the RELEASED table q199's QI
    * classes would actually ship — orders joined to customer
    * demographics, sensitive attribute `o_orderpriority`. A class can
    * be large (k-anonymous) and still leak: if every order in it shares
    * one priority, the attacker learns it without re-identifying
    * anyone (the homogeneity attack). Per policy threshold ℓ: classes
    * whose distinct-sensitive-value count is below ℓ, the released
    * rows inside them, and the at-risk share in bp — the companion
    * table a privacy review reads NEXT TO q199 before a release.
    *
    * Scale posture: orders pre-collapse to (custkey, priority) cells
    * with map-side combine BEFORE the customer join (≤5 rows per
    * customer joins instead of every order); the join is the only
    * row-scale shuffle; one explicit repartition on the QI tuple then
    * serves BOTH the (QI, sens) cell collapse and the QI class rollup
    * (the q183 exchange-reuse device, prefix-clustering satisfies the
    * superset groupBy); everything after is the q199 histogram device —
    * thresholds are conditional sums over the class-diversity
    * histogram, per-ℓ rows stack over the 1-row aggregate. */
  def lDiversity(spark: SparkSession, dir: String,
                 thresholds: Seq[Int] = LDivThresholds): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.forall(_ > 1), s"lDiversity: bad thresholds $thresholds")
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val released = perCust
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("q_nation"),
        col("c_mktsegment").as("q_segment"),
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 10000")
          .as("q_balband"),
        col("o_orderpriority").as("sens"), col("n"))
      .repartition(col("q_nation"), col("q_segment"), col("q_balband"))
    val cells = released
      .groupBy(col("q_nation"), col("q_segment"), col("q_balband"),
        col("sens"))
      .agg(sum(col("n")).as("n"))
    val classes = cells
      .groupBy(col("q_nation"), col("q_segment"), col("q_balband"))
      .agg(sum(col("n")).as("gsize"), count(lit(1)).as("ldiv"))
    val hist = classes.groupBy(col("ldiv"))
      .agg(count(lit(1)).as("ng"), sum(col("gsize")).as("rows_g"))
    val sums = thresholds.flatMap { l =>
      Seq(sum(when(col("ldiv") < l, col("ng")).otherwise(0L)).as(s"cb_$l"),
        sum(when(col("ldiv") < l, col("rows_g")).otherwise(0L)).as(s"rk_$l"))
    }
    val stackArgs = thresholds.map(l => s"${l}L, cb_$l, rk_$l").mkString(", ")
    hist
      .agg(sum(col("ng")).as("n_classes"),
        (Seq(sum(col("rows_g")).as("n_rows")) ++ sums): _*)
      .select(col("n_classes"), col("n_rows"), expr(
        s"stack(${thresholds.size}, $stackArgs) " +
          "AS (l, classes_below, rows_at_risk)"))
      .select(col("l"), col("n_classes"), col("classes_below"),
        col("n_rows"), col("rows_at_risk"),
        expr("rows_at_risk * 10000 div n_rows").as("risk_bp"))
      .orderBy(col("l"))
  }

  def lDiversitySql(thresholds: Seq[Int] = LDivThresholds): String = {
    val legs = thresholds.map { l =>
      s"""SELECT $l::BIGINT AS l, n_classes, (
         |    SELECT count(*)::BIGINT FROM cls WHERE ldiv < $l)
         |    AS classes_below,
         |  n_rows, (
         |    SELECT coalesce(sum(gsize), 0)::BIGINT FROM cls
         |    WHERE ldiv < $l) AS rows_at_risk
         |FROM tot""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH rel AS (
       |  SELECT c_nationkey::BIGINT AS q_nation, c_mktsegment AS q_segment,
       |    ((round(c_acctbal * 100)::BIGINT + 100000) // 10000) AS q_balband,
       |    o_orderpriority AS sens
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |), cls AS (
       |  SELECT q_nation, q_segment, q_balband,
       |    count(*)::BIGINT AS gsize,
       |    count(DISTINCT sens)::BIGINT AS ldiv
       |  FROM rel GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT count(*)::BIGINT AS n_classes, sum(gsize)::BIGINT AS n_rows
       |  FROM cls
       |), u AS (
       |  $legs
       |)
       |SELECT l, n_classes, classes_below, n_rows, rows_at_risk,
       |  (rows_at_risk * 10000 // n_rows)::BIGINT AS risk_bp
       |FROM u ORDER BY l""".stripMargin
  }

  /** X148 Hamilton largest-remainder apportionment (q222): allocate an
    * exact integer sample budget across sources proportionally —
    * base = ⌊target·nₛ/total⌋ per source, then the leftover seats go to
    * the largest remainders (ties by source name). Hamilton's method
    * (1792, the US House apportionment rule) is THE exact-integer
    * proportional allocator: q86/q114/q108 decide what the target MIX
    * should be; this converts any mix into whole-document counts that
    * sum EXACTLY to the budget — the last step before a sampler runs,
    * where naive rounding silently over- or under-draws.
    *
    * Scale posture: one corpus pass collapses to the |sources|-row
    * count table; base/remainder are per-row integer algebra against a
    * broadcast 1-row total; the remainder ranking is the q167 broadcast
    * triangle (never a single-partition window); the leftover is a
    * 1-row fold. Σ alloc = target is spec-asserted. */
  def hamiltonAllocation(spark: SparkSession, dir: String,
                         target: Long = 1000L): DataFrame = {
    require(target > 0, s"hamiltonAllocation: target must be positive")
    val src = graft.PlanCache.cached(spark, s"curation.srcCounts:$dir") {
      Tables.documents(spark, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    }
    val tot = src.agg(sum(col("n_docs")).as("total"))
    val base = src.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("total"),
        expr(s"n_docs * ${target}L div total").as("base_alloc"),
        expr(s"(n_docs * ${target}L) % total").as("remainder"))
    val leftover = base.agg((lit(target) - sum(col("base_alloc")))
      .as("leftover"))
    val b2 = base.select(col("source").as("s2"), col("remainder").as("r2"))
    base
      .join(broadcast(b2),
        expr("r2 > remainder OR (r2 = remainder AND s2 < source)"), "left")
      .groupBy(col("source"), col("n_docs"), col("total"),
        col("base_alloc"), col("remainder"))
      .agg(count(col("s2")).as("rnk"))
      .crossJoin(broadcast(leftover))
      .select(col("source"), col("n_docs"),
        expr("n_docs * 10000 div total").as("share_bp"),
        col("base_alloc"), col("remainder"),
        (col("rnk") < col("leftover")).as("plus_one"),
        expr("base_alloc + (CASE WHEN rnk < leftover THEN 1 ELSE 0 END)")
          .as("alloc"))
      .orderBy(col("source"))
  }

  def hamiltonAllocationSql(target: Long = 1000L): String =
    s"""WITH src AS (
       |  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT sum(n_docs)::BIGINT AS total FROM src
       |), base AS (
       |  SELECT source, n_docs, total,
       |    (n_docs * $target // total)::BIGINT AS base_alloc,
       |    ((n_docs * $target) % total)::BIGINT AS remainder
       |  FROM src CROSS JOIN tot
       |), lo AS (
       |  SELECT ($target - sum(base_alloc))::BIGINT AS leftover FROM base
       |), ranked AS (
       |  SELECT a.source, a.n_docs, a.total, a.base_alloc, a.remainder,
       |    count(b.source)::BIGINT AS rnk
       |  FROM base a LEFT JOIN base b
       |    ON b.remainder > a.remainder
       |    OR (b.remainder = a.remainder AND b.source < a.source)
       |  GROUP BY 1, 2, 3, 4, 5
       |)
       |SELECT source, n_docs,
       |  (n_docs * 10000 // total)::BIGINT AS share_bp,
       |  base_alloc, remainder,
       |  (rnk < lo.leftover) AS plus_one,
       |  (base_alloc + CASE WHEN rnk < lo.leftover THEN 1 ELSE 0
       |    END)::BIGINT AS alloc
       |FROM ranked CROSS JOIN lo ORDER BY source""".stripMargin

  /** 32-step restoring integer square root of a non-negative BIGINT —
    * the classic bitwise algorithm (bit = 4^(31−step); accept the bit
    * when the remainder covers res+bit), every intermediate ≤ the
    * input so nothing overflows and every operand stays non-negative
    * (floor ≡ truncate across engines). The Spark fold; the DuckDB twin
    * is the same walk as a recursive CTE (lambda state there is a
    * single value — FIXTURES §C). */
  private[graft] def isqrtSpark(s: String): String =
    s"""aggregate(
       |  sequence(0, 31),
       |  named_struct('n', $s, 'r', cast(0 as bigint)),
       |  (acc, i) -> named_struct(
       |    'n', IF(acc.n >= acc.r + shiftleft(1L, 62 - 2 * cast(i as int)),
       |      acc.n - acc.r - shiftleft(1L, 62 - 2 * cast(i as int)), acc.n),
       |    'r', IF(acc.n >= acc.r + shiftleft(1L, 62 - 2 * cast(i as int)),
       |      (acc.r div 2) + shiftleft(1L, 62 - 2 * cast(i as int)),
       |      acc.r div 2)),
       |  acc -> acc.r)""".stripMargin

  /** X171 Neyman stratified-sample allocation (q245): the optimal
    * sample-size split of an audit budget across source strata
    * (Neyman 1934) — n_h ∝ N_h·σ_h — computed EXACTLY: the per-stratum
    * weight N_h·σ_h equals isqrt(N_h·Σx² − (Σx)²) on the nose (σ_h =
    * sqrt(S2_h)/N_h), so one integer square root per stratum replaces
    * any float path, and the budget lands via the q222 Hamilton
    * largest-remainder rule. The proportional allocation (q222's) is
    * recomputed in the same pass so every row carries the Neyman-vs-
    * proportional delta — the "sample variance-heavy strata harder"
    * correction a QA audit buys over naive proportional sampling; a
    * zero-variance stratum draws (near) nothing, which is Neyman
    * working as designed. All-constant corpora (total weight 0) fall
    * back to proportional. Value audited: n_chars.
    *
    * Domain bound: S2_h = N_h²·var_h ≤ (N_h·max_chars/2)², BIGINT-safe
    * to N_h·max_chars < 2⁶² (the decimal(38,0) guard covers the
    * intermediate products).
    *
    * Scale posture: one map-side stratum collapse (count/Σx/Σx²); the
    * isqrt fold and BOTH Hamilton rank triangles run on the
    * |sources|-row table (bounded-enforced broadcasts); output is one
    * row per stratum. */
  def neymanAllocation(spark: SparkSession, dir: String,
                       target: Long = 1000L): DataFrame = {
    require(target > 0, "neymanAllocation: target must be positive")
    val bb = graft.PlanAudit.Bounded
    val wtab = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"),
        sum(expr("n_chars * n_chars")).as("sxx"))
      .select(col("source"), col("n_docs"),
        expr("cast(cast(n_docs as decimal(38,0)) * sxx - " +
          "cast(sx as decimal(38,0)) * sx as bigint)").as("s2_num"))
      .select(col("source"), col("n_docs"), col("s2_num"),
        expr(isqrtSpark("s2_num")).as("w"))
    val tots = wtab.agg(sum(col("w")).as("wt"), sum(col("n_docs")).as("nt"))
    val base = wtab
      .crossJoin(bb.broadcastBounded("q245_neyman_allocation.totals", tots, 1L))
      .select(col("source"), col("n_docs"), col("s2_num"), col("w"),
        expr("IF(wt > 0, w, n_docs)").as("wu"),
        expr("IF(wt > 0, wt, nt)").as("wut"), col("nt"))
      .select(col("source"), col("n_docs"), col("s2_num"), col("w"),
        col("wu"), col("wut"), col("nt"),
        expr(s"wu * ${target}L div wut").as("bn"),
        expr(s"(wu * ${target}L) % wut").as("rn"),
        expr(s"n_docs * ${target}L div nt").as("bp"),
        expr(s"(n_docs * ${target}L) % nt").as("rp"))
    val lo = base.agg((lit(target) - sum(col("bn"))).as("ln"),
      (lit(target) - sum(col("bp"))).as("lp"))
    val tn = base.select(col("source").as("sn"), col("rn").as("r2n"))
    val tp = base.select(col("source").as("sp"), col("rp").as("r2p"))
    base
      .join(bb.broadcastBounded("q245_neyman_allocation.tri_n", tn, 1024L),
        expr("r2n > rn OR (r2n = rn AND sn < source)"), "left")
      .groupBy(base.columns.map(col): _*)
      .agg(count(col("sn")).as("rkn"))
      .join(bb.broadcastBounded("q245_neyman_allocation.tri_p", tp, 1024L),
        expr("r2p > rp OR (r2p = rp AND sp < source)"), "left")
      .groupBy((base.columns.map(col) :+ col("rkn")): _*)
      .agg(count(col("sp")).as("rkp"))
      .crossJoin(bb.broadcastBounded("q245_neyman_allocation.leftover", lo, 1L))
      .select(col("source"), col("n_docs"), col("s2_num"),
        col("w").as("neyman_weight"),
        expr("wu * 10000 div wut").as("weight_share_bp"),
        expr("bn + IF(rkn < ln, 1L, 0L)").as("alloc_neyman"),
        expr("bp + IF(rkp < lp, 1L, 0L)").as("alloc_prop"))
      .withColumn("delta",
        col("alloc_neyman") - col("alloc_prop"))
      .orderBy(col("source"))
  }

  def neymanAllocationSql(target: Long = 1000L): String =
    s"""WITH RECURSIVE st AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(n_chars)::BIGINT AS sx,
       |    sum(n_chars * n_chars)::BIGINT AS sxx
       |  FROM documents GROUP BY 1
       |), s2t AS (
       |  SELECT source, n_docs,
       |    (n_docs::HUGEINT * sxx - sx::HUGEINT * sx)::BIGINT AS s2_num
       |  FROM st
       |), f AS (
       |  SELECT source, n_docs, s2_num, s2_num AS num, 0::BIGINT AS res,
       |    0 AS i
       |  FROM s2t
       |  UNION ALL
       |  SELECT source, n_docs, s2_num,
       |    CASE WHEN num >= res + (1::BIGINT << (62 - 2 * i))
       |      THEN num - res - (1::BIGINT << (62 - 2 * i)) ELSE num END,
       |    CASE WHEN num >= res + (1::BIGINT << (62 - 2 * i))
       |      THEN res // 2 + (1::BIGINT << (62 - 2 * i)) ELSE res // 2 END,
       |    i + 1
       |  FROM f WHERE i < 32
       |), wtab AS (
       |  SELECT source, n_docs, s2_num, res AS w FROM f WHERE i = 32
       |), tots AS (
       |  SELECT sum(w)::BIGINT AS wt, sum(n_docs)::BIGINT AS nt FROM wtab
       |), base AS (
       |  SELECT source, n_docs, s2_num, w,
       |    CASE WHEN wt > 0 THEN w ELSE n_docs END AS wu,
       |    CASE WHEN wt > 0 THEN wt ELSE nt END AS wut, nt,
       |    (CASE WHEN wt > 0 THEN w ELSE n_docs END) * $target
       |      // (CASE WHEN wt > 0 THEN wt ELSE nt END) AS bn,
       |    ((CASE WHEN wt > 0 THEN w ELSE n_docs END) * $target)
       |      % (CASE WHEN wt > 0 THEN wt ELSE nt END) AS rn,
       |    n_docs * $target // nt AS bp,
       |    (n_docs * $target) % nt AS rp
       |  FROM wtab CROSS JOIN tots
       |), lo AS (
       |  SELECT ($target - sum(bn))::BIGINT AS ln,
       |    ($target - sum(bp))::BIGINT AS lp
       |  FROM base
       |), rkd AS (
       |  SELECT a.*,
       |    (SELECT count(*) FROM base b
       |     WHERE b.rn > a.rn OR (b.rn = a.rn AND b.source < a.source))
       |      AS rkn,
       |    (SELECT count(*) FROM base c
       |     WHERE c.rp > a.rp OR (c.rp = a.rp AND c.source < a.source))
       |      AS rkp
       |  FROM base a
       |)
       |SELECT source, n_docs, s2_num, w AS neyman_weight,
       |  (wu * 10000 // wut)::BIGINT AS weight_share_bp,
       |  (bn + CASE WHEN rkn < lo.ln THEN 1 ELSE 0 END)::BIGINT
       |    AS alloc_neyman,
       |  (bp + CASE WHEN rkp < lo.lp THEN 1 ELSE 0 END)::BIGINT
       |    AS alloc_prop,
       |  ((bn + CASE WHEN rkn < lo.ln THEN 1 ELSE 0 END) -
       |   (bp + CASE WHEN rkp < lo.lp THEN 1 ELSE 0 END))::BIGINT AS delta
       |FROM rkd CROSS JOIN lo ORDER BY source""".stripMargin

  /** Right-to-erasure sweep audit (q193): given a deterministic deletion
    * cohort (custkey ≡ 0 mod `modulus` — the stand-in for a GDPR/CCPA
    * deletion list), the exact per-table blast radius through the
    * referential cascade: customers in the cohort, their orders
    * (o_custkey FK), and those orders' lineitems (l_orderkey FK). Per
    * table: rows before, rows erased, rows after, erased share in bp.
    * This is the compliance op every data platform runs BEFORE the
    * actual delete — sizing the rewrite, proving the cascade reaches
    * every child table, and leaving an audit row; the q137 FK audit is
    * what guarantees the cascade edges are the complete set.
    *
    * Scale posture: the cohort predicate is a pure row filter
    * (pushable to the scan); orders mark membership with that same
    * filter — no join; lineitem resolves membership through ONE
    * LEFT SEMI join against the deleted-order keys (the only shuffle,
    * keyed on the high-cardinality order key); each table then folds
    * to a 1-row count pair and the three rows union post-agg. */
  def erasureSweep(spark: SparkSession, dir: String,
                   modulus: Long = 97L): DataFrame = {
    require(modulus > 0, "erasureSweep: modulus must be positive")
    def summarize(name: String, df: DataFrame,
                  deleted: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          sum(when(deleted, 1L).otherwise(0L)).as("n_erased"))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_erased"),
          (col("n_rows") - col("n_erased")).as("n_after"),
          expr("n_erased * 10000 div n_rows").as("erased_bp"))
    val cust = summarize("customer", Tables.customer(spark, dir),
      pmod(col("c_custkey"), lit(modulus)) === 0)
    val orders = summarize("orders", Tables.orders(spark, dir),
      pmod(col("o_custkey"), lit(modulus)) === 0)
    val deletedOrders = Tables.orders(spark, dir)
      .filter(pmod(col("o_custkey"), lit(modulus)) === 0)
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, dir)
      .join(deletedOrders.withColumn("_del", lit(1L)),
        col("l_orderkey") === col("o_orderkey"), "left")
    val lineitem = summarize("lineitem", li, col("_del").isNotNull)
    Seq(cust, orders, lineitem).reduce(_ unionByName _)
      .orderBy(col("table_name"))
  }

  def erasureSweepSql(modulus: Long = 97L): String =
    s"""WITH c AS (
       |  SELECT 'customer' AS table_name, count(*)::BIGINT AS n_rows,
       |    sum(CASE WHEN c_custkey % $modulus = 0 THEN 1 ELSE 0 END)::BIGINT
       |      AS n_erased
       |  FROM customer
       |), o AS (
       |  SELECT 'orders', count(*)::BIGINT,
       |    sum(CASE WHEN o_custkey % $modulus = 0 THEN 1 ELSE 0 END)::BIGINT
       |  FROM orders
       |), l AS (
       |  SELECT 'lineitem', count(*)::BIGINT,
       |    sum(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
       |  FROM lineitem
       |  LEFT JOIN (SELECT o_orderkey FROM orders
       |             WHERE o_custkey % $modulus = 0) d
       |    ON l_orderkey = d.o_orderkey
       |), u AS (
       |  SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
       |)
       |SELECT table_name, n_rows, n_erased,
       |  (n_rows - n_erased)::BIGINT AS n_after,
       |  (n_erased * 10000 // n_rows)::BIGINT AS erased_bp
       |FROM u ORDER BY table_name""".stripMargin

  def encodingHygieneSql: String = {
    val cp = HygieneChars.toMap
    def inj(m: Int, r: Int, tag: String): String =
      s"CASE WHEN doc_id % $m = $r THEN chr(${cp(tag)}) ELSE '' END"
    def cnt(tag: String): String =
      s"length(t) - length(replace(t, chr(${cp(tag)}), ''))"
    s"""WITH aug AS (
       |  SELECT lang, text || ${inj(3, 0, "repl")} || ${inj(4, 1, "ctrl")}
       |    || ${inj(5, 2, "nbsp")} || ${inj(7, 3, "zwsp")} AS t
       |  FROM documents
       |), c AS (
       |  SELECT lang,
       |    (${cnt("repl")})::BIGINT AS c_repl,
       |    (${cnt("ctrl")})::BIGINT AS c_ctrl,
       |    (${cnt("nbsp")})::BIGINT AS c_nbsp,
       |    (${cnt("zwsp")})::BIGINT AS c_zwsp
       |  FROM aug
       |)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN c_repl > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_repl,
       |  sum(CASE WHEN c_ctrl > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_ctrl,
       |  sum(CASE WHEN c_nbsp > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_nbsp,
       |  sum(CASE WHEN c_zwsp > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_zwsp,
       |  sum(c_repl + c_ctrl + c_nbsp + c_zwsp)::BIGINT AS n_bad_chars,
       |  sum(c_repl + c_ctrl + c_zwsp)::BIGINT AS n_chars_removed
       |FROM c GROUP BY 1 ORDER BY lang""".stripMargin
  }

  /** X155 D'Hondt highest-averages apportionment (q229): allocate the
    * same integer seat budget q222 apportions, but by Jefferson/D'Hondt
    * divisors — every source competes with the quotient ladder
    * votes/1, votes/2, …, and the top-`seats` quotients win. The OTHER
    * canonical apportionment family: largest-remainder (q222) is
    * quota-exact but suffers the Alabama paradox; highest-averages is
    * house-monotone but biased toward large sources — running both over
    * the same counts exposes exactly which small sources D'Hondt
    * starves (dev_bp < 0), the call a sampler makes when deciding
    * whether minority domains keep guaranteed representation.
    *
    * Quotients compare on the exact milli grid (votes·10⁶ div r) with
    * the total order (quotient, votes, source asc, rung asc) — the
    * divisor ladder is strictly decreasing per source, so the election
    * is deterministic in both engines.
    *
    * Scale posture: the corpus collapses once to |sources| counts (the
    * PlanCache'd q222 seam); the quotient ladder is |sources|·seats
    * rows (audit-sized at any corpus scale) and its ranking the q167
    * broadcast triangle; seats fold back per source. */
  def dhondtAllocation(spark: SparkSession, dir: String,
                       seats: Int = 100): DataFrame = {
    require(seats > 0 && 10000 % seats == 0,
      s"dhondtAllocation: seats must divide 10000 ($seats)")
    val src = graft.PlanCache.cached(spark, s"curation.srcCounts:$dir") {
      Tables.documents(spark, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    }
    val tot = src.agg(sum(col("n_docs")).as("total"))
    val quot = src
      .select(col("source"), col("n_docs"),
        explode(expr(s"sequence(1, $seats)")).as("r"))
      .select(col("source"), col("n_docs"), col("r"),
        expr("n_docs * 1000000L div r").as("qm"))
    val b = quot.select(col("qm").as("qm2"), col("n_docs").as("v2"),
      col("source").as("s2"), col("r").as("r2"))
    quot
      .join(broadcast(b),
        expr("qm2 > qm OR (qm2 = qm AND (v2 > n_docs OR (v2 = n_docs " +
          "AND (s2 < source OR (s2 = source AND r2 < r)))))"), "left")
      .groupBy(col("source"), col("n_docs"), col("r"))
      .agg(count(col("s2")).as("rnk"))
      .groupBy(col("source"), col("n_docs"))
      .agg(sum(when(col("rnk") < seats, 1L).otherwise(0L)).as("seats"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs").as("votes"),
        expr("n_docs * 10000 div total").as("share_bp"),
        col("seats"),
        expr(s"seats * 10000 div $seats").as("seat_bp"),
        (expr(s"seats * 10000 div $seats") -
          expr("n_docs * 10000 div total")).as("dev_bp"))
      .orderBy(col("source"))
  }

  def dhondtAllocationSql(seats: Int = 100): String =
    s"""WITH src AS (
       |  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
       |), tot AS (
       |  SELECT sum(n_docs)::BIGINT AS total FROM src
       |), q AS (
       |  SELECT source, n_docs, t.r::BIGINT AS r,
       |    (n_docs * 1000000 // t.r)::BIGINT AS qm
       |  FROM src CROSS JOIN range(1, ${seats + 1}) t(r)
       |), ranked AS (
       |  SELECT a.source, a.n_docs, a.r, count(b.source)::BIGINT AS rnk
       |  FROM q a LEFT JOIN q b
       |    ON b.qm > a.qm OR (b.qm = a.qm AND (b.n_docs > a.n_docs
       |      OR (b.n_docs = a.n_docs AND (b.source < a.source
       |      OR (b.source = a.source AND b.r < a.r)))))
       |  GROUP BY 1, 2, 3
       |), won AS (
       |  SELECT source, n_docs,
       |    sum(CASE WHEN rnk < $seats THEN 1 ELSE 0 END)::BIGINT AS seats
       |  FROM ranked GROUP BY 1, 2
       |)
       |SELECT source, n_docs AS votes,
       |  (n_docs * 10000 // total)::BIGINT AS share_bp, seats,
       |  (seats * 10000 // $seats)::BIGINT AS seat_bp,
       |  ((seats * 10000 // $seats) - (n_docs * 10000 // total))::BIGINT
       |    AS dev_bp
       |FROM won CROSS JOIN tot ORDER BY source""".stripMargin

  /** X166 modality-coverage audit (q240): per language, how much of the
    * text corpus actually HAS an embedding row (doc_id ↔ vec_id), plus
    * the orphan embeddings no document claims — the referential-
    * integrity read at the modality seam that q137's TPC-H FK audit
    * doesn't cover. Every retrieval/dedup operator downstream (q23,
    * q83, q94) silently restricts itself to the embedded subset; this
    * is the audit that says HOW restricted, per language — a lang with
    * low coverage_bp is invisible to semantic dedup and ANN retrieval
    * no matter how much text it contributes, and orphan vectors are
    * stale index entries an erasure sweep (q193) must also reach.
    *
    * Scale posture: ONE id-keyed join (docs left-join the projected
    * vec_id column — the only corpus shuffle) collapses straight to
    * |langs| rows with map-side combine; the orphan count is a
    * LEFT ANTI join on the same high-cardinality key folding to a
    * broadcast 1-row scalar. */
  def modalityCoverage(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val perLang = docs
      .join(vecs, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L))
          .as("n_with_embedding"))
    val orphans = vecs.join(docs, col("doc_id") === col("vec_id"),
        "left_anti")
      .agg(count(lit(1)).as("n_orphan_vecs"))
    perLang.crossJoin(graft.PlanAudit.Bounded
      .broadcastBounded("q240_modality_coverage.orphans", orphans, 1L))
      .select(col("lang"), col("n_docs"), col("n_with_embedding"),
        expr("n_with_embedding * 10000 div n_docs").as("coverage_bp"),
        col("n_orphan_vecs"))
      .orderBy(col("lang"))
  }

  def modalityCoverageSql: String =
    """WITH per AS (
      |  SELECT d.lang, count(*)::BIGINT AS n_docs,
      |    sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |      AS n_with_embedding
      |  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
      |  GROUP BY 1
      |), orph AS (
      |  SELECT count(*)::BIGINT AS n_orphan_vecs
      |  FROM embeddings e
      |  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
      |)
      |SELECT lang, n_docs, n_with_embedding,
      |  (n_with_embedding * 10000 // n_docs)::BIGINT AS coverage_bp,
      |  n_orphan_vecs
      |FROM per CROSS JOIN orph ORDER BY lang""".stripMargin
}
