package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Curation, Dedup, EventAnalytics, JsonOps, Multimodal, Packing, Relational, Similarity, TextAnalysis, TextPipeline, TimeWindows, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public surface: one named, parameterized
  * entry per implemented operator from SURVEY.md §2. `oracleSql` carries
  * the DuckDB twin for the driver's hash-match correctness gate; column
  * names/aliases are identical on both sides by construction.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 0) on sf0.001; driver smoke-checks
    * rows>0: language filter + track match + lexicon sentiment + grouped
    * counts — the reference's whole purpose as one Spark plan. */
  def entry(spark: SparkSession): DataFrame =
    TextPipeline.sentimentByLabel(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sentiment_track" -> ((s, d) => TextPipeline.sentimentByLabel(s, d)),
    "q02_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q03_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q04_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q05_semi_active_customers" -> ((s, d) => Relational.activeCustomersByNation(s, d)),
    "q06_anti_idle_customers" -> ((s, d) => Relational.idleCustomersBySegment(s, d)),
    "q07_rollup_lineitem" -> ((s, d) => Relational.lineitemRollup(s, d)),
    "q08_cube_orders" -> ((s, d) => Relational.ordersCube(s, d)),
    "q09_distinct_counts" -> ((s, d) => Relational.distinctPartsSupps(s, d)),
    "q10_setops_customers" -> ((s, d) => Relational.setOpsCustomers(s, d)),
    "q11_semi_priority" -> ((s, d) => Relational.priorityWithLateItems(s, d)),
    "q12_window_rank" -> ((s, d) => Windows.topOrderPerCustomer(s, d)),
    "q13_window_lag" -> ((s, d) => Windows.interEventGaps(s, d)),
    "q14_window_running" -> ((s, d) => Windows.runningOrderTotals(s, d)),
    "q15_token_stats" -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "q16_lang_id" -> ((s, d) => TextAnalysis.langIdConfusion(s, d)),
    "q17_quality_score" -> ((s, d) => TextAnalysis.qualityByLang(s, d)),
    "q18_fingerprints" -> ((s, d) => TextAnalysis.fingerprintSummary(s, d)),
    "q19_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "q20_minhash_neardup" -> ((s, d) => Dedup.minhashNearDup(s, d)),
    "q21_simhash_neardup" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "q22_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardNearDup(s, d)),
    "q23_cosine_topk" -> ((s, d) => Similarity.cosineTopK(s, d)),
    "q24_ann_lsh" -> ((s, d) => Similarity.annTopK(s, d)),
    "q25_embedding_neardup" -> ((s, d) => Similarity.embeddingNearDup(s, d)),
    "q26_tumbling_window" -> ((s, d) => TimeWindows.tumblingHourly(s, d)),
    "q27_sliding_window" -> ((s, d) => TimeWindows.slidingHourHalf(s, d)),
    "q28_session_window" -> ((s, d) => TimeWindows.userSessions(s, d)),
    "q29_hourly_profile" -> ((s, d) => TimeWindows.hourlyProfile(s, d)),
    "q30_json_extract" -> ((s, d) => JsonOps.propsExtract(s, d)),
    "q31_base64_codec" -> ((s, d) => JsonOps.base64Roundtrip(s, d)),
    "q32_range_join" -> ((s, d) => Relational.viewToPurchase(s, d)),
    "q33_grouping_sets" -> ((s, d) => Relational.docGroupingSets(s, d)),
    "q34_approx_distinct" -> ((s, d) => Relational.approxDistinctUsers(s, d)),
    "q35_media_summary" -> ((s, d) => Multimodal.mediaSummary(s, d)),
    "q36_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "q37_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q38_props_map" -> ((s, d) => JsonOps.propsMapStats(s, d)),
    "q39_outer_coverage" -> ((s, d) => Relational.customerOrderCoverage(s, d)),
    "q40_full_outer" -> ((s, d) => Relational.nationSupplierCoverage(s, d)),
    "q41_pivot" -> ((s, d) => Relational.docsPivotByLang(s, d)),
    "q42_value_stats" -> ((s, d) => Relational.eventValueStats(s, d)),
    "q43_train_split" -> ((s, d) => Curation.trainSplit(s, d)),
    "q44_normalize" -> ((s, d) => Curation.normalizeSummary(s, d)),
    "q45_contamination" -> ((s, d) => Curation.contamination(s, d)),
    "q46_revenue_preagg" -> ((s, d) => Relational.revenueByNationPreAgg(s, d)),
    // synthetic corpus has no '#'; track semantics make it optional (F2),
    // so every token is a candidate tag — same plan as the '#\w+' default
    "q47_hashtag_sentiment" -> ((s, d) => TextPipeline.hashtagSentiment(s, d, tagPattern = "\\w+")),
    "q48_ivf_multiprobe" -> ((s, d) => Similarity.ivfMultiProbeTopK(s, d)),
    "q49_repetition" -> ((s, d) => TextAnalysis.repetitionSummary(s, d)),
    // exact result identical to q45 — the bloom stage is a bandwidth
    // optimization, so the q45 oracle applies verbatim
    "q50_contamination_bloom" -> ((s, d) => Curation.contaminationBloom(s, d)),
    "q51_asof_join" -> ((s, d) => Relational.asofViewPurchase(s, d)),
    "q52_kfold_split" -> ((s, d) => Curation.kfoldSplit(s, d)),
    "q53_tfidf_topterms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "q54_incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "q55_order_distribution" -> ((s, d) => Windows.orderDistribution(s, d)),
    "q56_editdist_neardup" -> ((s, d) => Dedup.editDistanceNearDup(s, d)),
    "q57_mix_resample" -> ((s, d) => Curation.mixResample(s, d)),
    "q58_funnel" -> ((s, d) => EventAnalytics.funnel(s, d)),
    "q59_retention" -> ((s, d) => EventAnalytics.retention(s, d)),
    "q60_scrub_audit" -> ((s, d) => Curation.scrubAudit(s, d)),
    "q61_resize_dims" -> ((s, d) => Multimodal.resizeSummary(s, d)),
    "q62_frame_sample" -> ((s, d) => Multimodal.frameSummary(s, d)),
    "q63_partitioned_daily" -> ((s, d) => graft.sources.Formats.dailyPrunedSummary(s, d)),
    "q64_dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "q65_quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "q66_quantization_audit" -> ((s, d) => Similarity.quantizationAudit(s, d)),
    "q67_bigram_fluency" -> ((s, d) => TextAnalysis.bigramFluency(s, d)),
    // oracles for q68/q69 are the PLAIN joins: salting and bucketing are
    // physical levers that must be invisible in query results
    "q68_salted_join" -> ((s, d) => graft.operators.Scale.saltedJoinSummary(s, d)),
    "q69_bucketed_join" -> ((s, d) => graft.operators.Scale.bucketedJoinSummary(s, d)),
    "q70_pq_adc" -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "q71_seq_packing" -> ((s, d) => Packing.packingSummary(s, d)),
    "q72_snapshot_upsert" -> ((s, d) => Curation.snapshotUpsertSummary(s, d)),
    "q73_dup_ngrams" -> ((s, d) => TextAnalysis.duplicatedNgrams(s, d)),
    "q74_contamination_overlap" -> ((s, d) => Curation.contaminationOverlap(s, d)),
    "q75_stratified_sample" -> ((s, d) => Curation.stratifiedSample(s, d)),
    "q76_rolling_active" -> ((s, d) => EventAnalytics.rollingActiveUsers(s, d)),
    // the COMPOSED pipeline (dedup→scrub→quality→split→pack) as one
    // oracle row: gates stage hand-offs, not just the stages
    "q77_curation_pipeline" -> ((s, d) => graft.operators.CurationPipeline.summary(s, d)),
    "q78_corpus_shuffle" -> ((s, d) => Curation.corpusShuffle(s, d)),
    // the reference's DEFAULT '#\w+' extraction path (q47 runs '\w+'
    // because the synthetic corpus has no '#'): tags injected in-query
    "q79_hashtag_literal" -> ((s, d) => TextPipeline.hashtagSentimentTagged(s, d)),
    // chunking = the SPLIT complement of q71's packing: long docs →
    // overlapping fixed-token windows; content gated by a chunk-text hash
    "q80_doc_chunking" -> ((s, d) => Packing.chunkSummary(s, d)),
    // provenance-priority dedup: mirror/scrape copies injected in-query
    // (corpus has no exact dups); keep rule = min (source priority, doc_id)
    "q81_priority_dedup" -> ((s, d) => Dedup.priorityDedup(s, d)),
    // data selection under a token budget: per-lang greedy by quality,
    // two-phase histogram plan (full corpus never sorts)
    "q82_token_budget" -> ((s, d) => Curation.tokenBudgetSelect(s, d)),
    // SemDeDup: within-k-means-cluster cosine dedup over embeddings
    "q83_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    // Okapi BM25 retrieval over a fixed query-term set; integer-scaled
    // scores so the per-doc sum is order-free across engines
    "q84_bm25_topk" -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    // tokenizer vocabulary election (bounded-heap top-V) + per-lang OOV
    "q85_vocab_oov" -> ((s, d) => TextAnalysis.vocabOov(s, d)),
    // domain-mixture resample to target source shares, md5-deterministic
    "q86_mixture_resample" -> ((s, d) => Curation.mixtureResample(s, d)),
    // doc-level boilerplate contamination: fraction of a doc's 5-grams
    // shared with >=2 docs, per-lang rollup
    "q87_boilerplate_share" -> ((s, d) => TextAnalysis.boilerplateShare(s, d)),
    // context-length election: chunk-vs-pad cost frontier across
    // candidate lengths, integer basis-point fill like q71
    "q88_context_frontier" -> ((s, d) => Packing.contextFrontier(s, d)),
    // label-noise audit: own-centroid vs best-other-centroid cosine
    // margin per label, micro-unit-integer margins
    "q89_label_purity" -> ((s, d) => Similarity.labelPurity(s, d)),
    // multilingual tokenizer fairness: chars/token by lang vs the corpus
    // rate, exact integer cross-ratio in basis points
    "q90_tokenizer_fairness" -> ((s, d) => TextAnalysis.tokenizerFairness(s, d)),
    // contrastive positives: near-dup components -> star (anchor, member)
    // pairs, audited per anchor lang
    "q91_contrastive_pairs" -> ((s, d) => Dedup.contrastivePairs(s, d)),
    // hard negatives: LSH-bucket collisions BELOW the dedup threshold
    "q92_hard_negatives" -> ((s, d) => Dedup.hardNegatives(s, d)),
    // index quality: recall@k of IVF (nprobe 1 and 2) vs exact top-k
    "q93_ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    // leakage: near-dup components straddling the train/val/test cut
    "q94_split_leakage" -> ((s, d) => Curation.splitLeakage(s, d)),
    // DSIR-shaped importance selection: hashed-unigram target affinity
    // in integer micro-units, top quota per language
    "q95_importance_selection" -> ((s, d) => Curation.importanceSelection(s, d)),
    // component-anchored split: near-dup siblings inherit the anchor's
    // split — the fix the q94 leakage audit motivates
    "q96_component_split" -> ((s, d) => Curation.componentSplit(s, d)),
    // the MODERN composed pipeline (priority dedup → importance
    // selection → component split → pack) as one oracle row — the
    // round-7..11 stages' hand-offs gated like q77 gates the classic
    "q97_modern_pipeline" -> ((s, d) => graft.operators.CurationPipeline.modernSummary(s, d)),
    // length-bucketed batching: padding-waste audit for non-packed
    // (one-doc-one-sequence) training batches, integer basis points
    "q98_bucketed_batching" -> ((s, d) => Packing.batchingSummary(s, d)),
    // per-lang quality-decile cutoffs via the two-phase histogram —
    // the corpus never sorts, only the (lang, rounded-score) table does
    "q99_quality_calibration" -> ((s, d) => TextAnalysis.qualityCalibration(s, d)),
    // epoch/repetition schedule: mixture-share token allocations vs the
    // 4-epoch data-constrained ceiling, exact micro-epoch integers
    "q100_epoch_schedule" -> ((s, d) => Curation.epochSchedule(s, d)),
    // DPO-style preference pairs: best-vs-worst quality member per
    // near-dup component, micro-unit margins + elected-id sums as gate
    "q101_preference_pairs" -> ((s, d) => Dedup.preferencePairs(s, d)),
    // curriculum phases: per-lang quality-quartile bands (docs/tokens/
    // micro-score per phase) via the q99 histogram — corpus never sorts
    "q102_curriculum_schedule" -> ((s, d) => Curation.curriculumSchedule(s, d)),
    // corpus datasheet: per-lang size/redundancy/quality-mass/provenance
    // report, all integer or micro-unit columns
    "q103_corpus_datasheet" -> ((s, d) => Curation.corpusDatasheet(s, d)),
    // vocab coverage frontier: token-occurrence share covered by top-K
    // terms per candidate K — bounded-heap slice, term table never sorts
    "q104_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverageFrontier(s, d)),
    // exact-substring span scrub: per-lang token mass a repeated-span
    // dedup pass (ExactSubstr rule) would cut — positional coverage
    "q105_span_scrub" -> ((s, d) => TextAnalysis.spanScrub(s, d)),
    // DoReMi-shaped domain-weight election: multiplicative-weights update
    // on token shares from per-domain quality deficit, uniform-smoothed
    "q106_doremi_reweight" -> ((s, d) => Curation.doremiReweight(s, d)),
    // embedding snapshot drift: per-label centroid cosine + exact L2
    // shift between the even-/odd-vec_id snapshots — the re-embed monitor
    "q107_snapshot_drift" -> ((s, d) => Similarity.snapshotDrift(s, d)),
    // UniMax water-filling: equal-share multilingual token allocation
    // under a per-language epoch cap — windowless closed form
    "q108_unimax_allocation" -> ((s, d) => Curation.unimaxAllocation(s, d)),
    // count-min sketch audit: 4x1024 portable-hash sketch vs exact
    // counts on the top-k tokens — overestimate is provably >= 0
    "q109_cms_heavy_hitters" -> ((s, d) => TextAnalysis.cmsHeavyHitters(s, d)),
    // LSH banding recall audit: probe-sampled exact Jaccard truth vs
    // the shared banded candidate table, by similarity bucket
    "q110_lsh_recall" -> ((s, d) => Dedup.lshRecallAudit(s, d)),
    // composed eval-set builder: decontaminate -> exact dedup -> per-lang
    // exact-k sample, with an order-free sampled-id membership gate
    "q111_eval_set" -> ((s, d) => Curation.evalSetBuild(s, d)),
    // contamination severity triage: exact shared-ngram flags vs
    // whole-document near-dup-of-benchmark flags, per language
    "q112_fuzzy_contamination" -> ((s, d) => Dedup.fuzzyContamination(s, d)),
    // corpus snapshot diff: per-lang size/quality/turnover deltas
    // between the even/odd-doc_id ingest snapshots
    "q113_corpus_diff" -> ((s, d) => Curation.corpusDiff(s, d)),
    "q114_temperature_sampling" -> ((s, d) => Curation.temperatureAllocation(s, d)),
    "q115_shard_manifest" -> ((s, d) => Curation.shardManifest(s, d)),
    "q116_incremental_neardup" -> ((s, d) => Dedup.snapshotNearDupIntake(s, d)),
    "q117_hybrid_retrieval" -> ((s, d) => TextAnalysis.hybridRetrieval(s, d)),
    "q118_redundancy_quality" -> ((s, d) => Dedup.redundancyQualityAudit(s, d)),
    "q119_scaling_ladder" -> ((s, d) => Curation.scalingLadder(s, d)),
    "q120_split_divergence" -> ((s, d) => Curation.splitDivergence(s, d)),
    "q121_gate_ablation" -> ((s, d) => Curation.gateAblation(s, d)),
    "q122_transition_matrix" -> ((s, d) => EventAnalytics.transitionMatrix(s, d)),
    "q123_effective_size" -> ((s, d) => Dedup.effectiveSize(s, d)),
    "q124_bucket_occupancy" -> ((s, d) => Dedup.bucketOccupancy(s, d)),
    "q125_list_occupancy" -> ((s, d) => Similarity.listOccupancy(s, d)),
    "q126_threshold_curve" -> ((s, d) => Dedup.thresholdSensitivity(s, d)),
    "q127_session_gaps" -> ((s, d) => EventAnalytics.sessionGaps(s, d)),
    "q128_quality_attribution" -> ((s, d) => TextAnalysis.qualityComponents(s, d)),
    "q129_dup_flow" -> ((s, d) => Dedup.dupFlowMatrix(s, d)),
    "q130_conversion_latency" -> ((s, d) => EventAnalytics.conversionLatency(s, d)),
    "q131_norm_audit" -> ((s, d) => Similarity.normAudit(s, d)),
    "q132_value_percentiles" -> ((s, d) => EventAnalytics.valuePercentiles(s, d)),
    "q133_manifest_delta" -> ((s, d) => Dedup.dedupManifestDelta(s, d)),
    "q134_collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    "q135_skew_keys" -> ((s, d) => graft.operators.Scale.skewKeys(s, d)),
    "q136_diversity_profile" -> ((s, d) => TextAnalysis.diversityProfile(s, d)),
    "q137_integrity_audit" -> ((s, d) => Relational.integrityAudit(s, d)),
    "q138_quality_trend" -> ((s, d) => Curation.sourceQualityTrend(s, d)),
    // oracle is the PLAIN join (the q68 device): electing hot keys from
    // the q135 table and salting only those must be invisible in results
    "q139_targeted_salt" -> ((s, d) => graft.operators.Scale.targetedSaltSummary(s, d)),
    "q140_perplexity_filter" -> ((s, d) => TextAnalysis.perplexityFilter(s, d)),
    "q141_ppx_calibration" -> ((s, d) => TextAnalysis.perplexityCalibration(s, d)),
    "q142_rule_filter" -> ((s, d) => TextAnalysis.ruleFilterAudit(s, d)),
    "q143_filter_chain" -> ((s, d) => graft.operators.CurationPipeline.crawlFilterChain(s, d)),
    "q144_dim_variance" -> ((s, d) => Similarity.dimensionVariance(s, d)),
    "q145_stickiness" -> ((s, d) => EventAnalytics.stickiness(s, d)),
    "q146_media_percentiles" -> ((s, d) => Multimodal.mediaBytePercentiles(s, d)),
    "q147_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowthCurve(s, d)),
    "q148_zipf_audit" -> ((s, d) => TextAnalysis.zipfAudit(s, d)),
    "q149_vocab_overlap" -> ((s, d) => TextAnalysis.vocabOverlap(s, d)),
    "q150_join_forecast" -> ((s, d) => graft.operators.Scale.joinCardinalityForecast(s, d)),
    "q151_domain_kl" -> ((s, d) => TextAnalysis.domainShiftKl(s, d)),
    "q152_ppx_by_source" -> ((s, d) => TextAnalysis.perplexityBySource(s, d)),
    "q153_kmv_sketch" -> ((s, d) => TextAnalysis.kmvSketch(s, d)),
    "q154_source_lang_mi" -> ((s, d) => TextAnalysis.sourceLangMi(s, d)),
    "q155_novelty_election" -> ((s, d) => TextAnalysis.vocabNoveltyElection(s, d)),
    "q156_containment" -> ((s, d) => Dedup.containmentNearDup(s, d)),
    "q157_rep_bands" -> ((s, d) => TextAnalysis.repetitionProfile(s, d)),
    "q158_sketch_overlap" -> ((s, d) => TextAnalysis.sketchOverlap(s, d)),
    "q159_quantile_sketch" -> ((s, d) => EventAnalytics.quantileSketchAudit(s, d)),
    "q160_blocklist" -> ((s, d) => TextAnalysis.blocklistDensity(s, d)),
    "q161_trunc_families" -> ((s, d) => Dedup.truncationFamilies(s, d)),
    "q162_weighted_sample" -> ((s, d) => Curation.weightedSample(s, d)),
    "q163_vocab_entropy" -> ((s, d) => TextAnalysis.vocabEntropy(s, d)),
    "q164_volume_anomaly" -> ((s, d) => EventAnalytics.volumeAnomaly(s, d)),
    "q165_media_dedup" -> ((s, d) => Multimodal.mediaDedup(s, d)),
    "q166_rank_agreement" -> ((s, d) => TextAnalysis.rankAgreement(s, d)),
    "q167_length_drift" -> ((s, d) => TextAnalysis.lengthDrift(s, d)),
    "q168_token_gini" -> ((s, d) => TextAnalysis.tokenGini(s, d)),
    "q169_cooccurrence" -> ((s, d) => EventAnalytics.cooccurrenceLift(s, d)),
    "q170_mattr" -> ((s, d) => TextAnalysis.mattrDiversity(s, d)),
    "q171_vocab_diff" -> ((s, d) => TextAnalysis.vocabDiff(s, d)),
    "q172_burstiness" -> ((s, d) => EventAnalytics.burstiness(s, d)),
    "q173_vocab_richness" -> ((s, d) => TextAnalysis.vocabRichness(s, d)),
    "q174_winnowing" -> ((s, d) => TextAnalysis.winnowing(s, d)),
    "q175_attribution" -> ((s, d) => EventAnalytics.attribution(s, d)),
    "q176_rfm_segments" -> ((s, d) => Relational.rfmSegments(s, d)),
    "q177_readability" -> ((s, d) => TextAnalysis.readabilityProfile(s, d)),
    "q178_confusability" -> ((s, d) => Similarity.labelConfusability(s, d)),
    "q179_sessionization" -> ((s, d) => EventAnalytics.sessionization(s, d)),
    "q180_robust_stats" -> ((s, d) => EventAnalytics.robustValueStats(s, d)),
    "q181_benford" -> ((s, d) => Relational.benfordAudit(s, d)),
    "q182_hygiene" -> ((s, d) => Curation.encodingHygiene(s, d)),
    "q183_fd_audit" -> ((s, d) => Relational.fdAudit(s, d)),
    "q184_basket_pairs" -> ((s, d) => Relational.basketPairs(s, d)),
    "q185_seasonality" -> ((s, d) => EventAnalytics.weeklySeasonality(s, d)),
    "q186_new_returning" -> ((s, d) => EventAnalytics.newVsReturning(s, d)),
    "q187_supplier_hhi" -> ((s, d) => Relational.supplierHhi(s, d)),
    "q188_conversion_survival" -> ((s, d) => EventAnalytics.conversionSurvival(s, d)),
    "q189_mann_kendall" -> ((s, d) => EventAnalytics.mannKendallTrend(s, d)),
    "q190_purchase_gaps" -> ((s, d) => Relational.repeatPurchaseGaps(s, d)),
    "q191_ab_readout" -> ((s, d) => EventAnalytics.abReadout(s, d)),
    "q192_state_dwell" -> ((s, d) => EventAnalytics.stateDwell(s, d)),
    "q193_erasure_sweep" -> ((s, d) => Curation.erasureSweep(s, d)),
    "q194_triplet_margin" -> ((s, d) => Similarity.tripletMargin(s, d)),
    "q195_cohort_ltv" -> ((s, d) => EventAnalytics.cohortLtv(s, d)),
    "q196_active_streaks" -> ((s, d) => EventAnalytics.activeStreaks(s, d)),
    "q197_pii_audit" -> ((s, d) => Curation.piiAudit(s, d)),
    "q198_packing_election" -> ((s, d) => Packing.packingElection(s, d)),
    "q199_k_anonymity" -> ((s, d) => Curation.kAnonymity(s, d)),
    "q200_zorder_layout" -> ((s, d) => graft.operators.Scale.zorderElection(s, d)),
    "q201_media_ahash" -> ((s, d) => Multimodal.mediaAhashNearDup(s, d)),
    "q202_bpe_merges" -> ((s, d) => TextAnalysis.bpeFirstMerges(s, d)),
    "q203_burst_panel" -> ((s, d) => EventAnalytics.decayedBurstPanel(s, d)),
    "q204_incremental_refresh" -> ((s, d) => Relational.incrementalRefreshAudit(s, d)),
    "q205_bloom_sizing" -> ((s, d) => graft.operators.Scale.bloomSizing(s, d)),
    "q206_comovement" -> ((s, d) => EventAnalytics.comovementMatrix(s, d)),
    "q207_value_migration" -> ((s, d) => EventAnalytics.valueMigration(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_sentiment_track" -> TextPipeline.sentimentByLabelSql(),
    "q02_pricing_summary" -> Relational.pricingSummarySql,
    "q03_revenue_by_nation" -> Relational.revenueByNationSql,
    "q04_top_orders" -> Relational.topOrdersSql(),
    "q05_semi_active_customers" -> Relational.activeCustomersByNationSql,
    "q06_anti_idle_customers" -> Relational.idleCustomersBySegmentSql,
    "q07_rollup_lineitem" -> Relational.lineitemRollupSql,
    "q08_cube_orders" -> Relational.ordersCubeSql,
    "q09_distinct_counts" -> Relational.distinctPartsSuppsSql,
    "q10_setops_customers" -> Relational.setOpsCustomersSql,
    "q11_semi_priority" -> Relational.priorityWithLateItemsSql,
    "q12_window_rank" -> Windows.topOrderPerCustomerSql,
    "q13_window_lag" -> Windows.interEventGapsSql,
    "q14_window_running" -> Windows.runningOrderTotalsSql,
    "q15_token_stats" -> TextAnalysis.tokenStatsSql,
    "q16_lang_id" -> TextAnalysis.langIdConfusionSql,
    "q17_quality_score" -> TextAnalysis.qualityByLangSql,
    "q18_fingerprints" -> TextAnalysis.fingerprintSummarySql,
    "q19_exact_dedup" -> Dedup.exactDedupSql,
    "q20_minhash_neardup" -> Dedup.minhashNearDupSql(),
    "q21_simhash_neardup" -> Dedup.simhashNearDupSql(),
    "q22_ngram_jaccard" -> Dedup.ngramJaccardNearDupSql(),
    "q23_cosine_topk" -> Similarity.cosineTopKSql(),
    "q24_ann_lsh" -> Similarity.annTopKSql(),
    "q25_embedding_neardup" -> Similarity.embeddingNearDupSql(),
    "q26_tumbling_window" -> TimeWindows.tumblingHourlySql,
    "q27_sliding_window" -> TimeWindows.slidingHourHalfSql,
    "q28_session_window" -> TimeWindows.userSessionsSql,
    "q29_hourly_profile" -> TimeWindows.hourlyProfileSql,
    "q30_json_extract" -> JsonOps.propsExtractSql,
    "q31_base64_codec" -> JsonOps.base64RoundtripSql,
    "q32_range_join" -> Relational.viewToPurchaseSql,
    "q33_grouping_sets" -> Relational.docGroupingSetsSql,
    // q34 hashes exact counts + an each-engine-validates-its-own-sketch
    // 0/1 bound; the raw HLL estimate is engine-specific and stays out.
    "q34_approx_distinct" -> Relational.approxDistinctUsersSql,
    "q35_media_summary" -> Multimodal.mediaSummarySql,
    "q36_label_centroids" -> Similarity.labelCentroidsSql,
    "q37_ivf_topk" -> Similarity.ivfTopKSql(),
    "q38_props_map" -> JsonOps.propsMapStatsSql,
    "q39_outer_coverage" -> Relational.customerOrderCoverageSql,
    "q40_full_outer" -> Relational.nationSupplierCoverageSql,
    "q41_pivot" -> Relational.docsPivotByLangSql,
    "q42_value_stats" -> Relational.eventValueStatsSql,
    "q43_train_split" -> Curation.trainSplitSql,
    "q44_normalize" -> Curation.normalizeSummarySql,
    "q45_contamination" -> Curation.contaminationSql(),
    "q46_revenue_preagg" -> Relational.revenueByNationPreAggSql,
    "q47_hashtag_sentiment" -> TextPipeline.hashtagSentimentSql(tagPattern = "\\w+"),
    "q48_ivf_multiprobe" -> Similarity.ivfMultiProbeTopKSql(),
    "q49_repetition" -> TextAnalysis.repetitionSummarySql(),
    "q50_contamination_bloom" -> Curation.contaminationSql(),
    "q51_asof_join" -> Relational.asofViewPurchaseSql,
    "q52_kfold_split" -> Curation.kfoldSplitSql(),
    "q53_tfidf_topterms" -> TextAnalysis.tfidfTopTermsSql(),
    "q54_incremental_dedup" -> Dedup.incrementalDedupSql(),
    "q55_order_distribution" -> Windows.orderDistributionSql,
    "q56_editdist_neardup" -> Dedup.editDistanceNearDupSql(),
    "q57_mix_resample" -> Curation.mixResampleSql(),
    "q58_funnel" -> EventAnalytics.funnelSql,
    "q59_retention" -> EventAnalytics.retentionSql,
    "q60_scrub_audit" -> Curation.scrubAuditSql(),
    "q61_resize_dims" -> Multimodal.resizeSummarySql(),
    "q62_frame_sample" -> Multimodal.frameSummarySql(),
    // oracle reads the ORIGINAL events table: the partitioned layout
    // rewrite must be invisible in query results
    "q63_partitioned_daily" -> graft.sources.Formats.dailyPrunedSummarySql(),
    "q64_dedup_clusters" -> Dedup.dedupClustersSql(),
    "q65_quality_filter" -> TextAnalysis.qualityFilterSql,
    "q66_quantization_audit" -> Similarity.quantizationAuditSql,
    "q67_bigram_fluency" -> TextAnalysis.bigramFluencySql,
    "q68_salted_join" -> graft.operators.Scale.saltedJoinSummarySql,
    "q69_bucketed_join" -> graft.operators.Scale.bucketedJoinSummarySql,
    "q70_pq_adc" -> Similarity.pqAdcTopKSql(),
    "q71_seq_packing" -> Packing.packingSummarySql(),
    "q72_snapshot_upsert" -> Curation.snapshotUpsertSummarySql(),
    "q73_dup_ngrams" -> TextAnalysis.duplicatedNgramsSql(),
    "q74_contamination_overlap" -> Curation.contaminationOverlapSql(),
    "q75_stratified_sample" -> Curation.stratifiedSampleSql(),
    "q76_rolling_active" -> EventAnalytics.rollingActiveUsersSql(),
    "q77_curation_pipeline" -> graft.operators.CurationPipeline.summarySql(),
    "q78_corpus_shuffle" -> Curation.corpusShuffleSql(),
    "q79_hashtag_literal" -> TextPipeline.hashtagSentimentTaggedSql(),
    "q80_doc_chunking" -> Packing.chunkSummarySql(),
    "q81_priority_dedup" -> Dedup.priorityDedupSql,
    "q82_token_budget" -> Curation.tokenBudgetSelectSql(),
    "q83_semantic_dedup" -> Similarity.semanticDedupSql(),
    "q84_bm25_topk" -> TextAnalysis.bm25TopKSql(),
    "q85_vocab_oov" -> TextAnalysis.vocabOovSql(),
    "q86_mixture_resample" -> Curation.mixtureResampleSql(),
    "q87_boilerplate_share" -> TextAnalysis.boilerplateShareSql(),
    "q88_context_frontier" -> Packing.contextFrontierSql(),
    "q89_label_purity" -> Similarity.labelPuritySql,
    "q90_tokenizer_fairness" -> TextAnalysis.tokenizerFairnessSql,
    "q91_contrastive_pairs" -> Dedup.contrastivePairsSql(),
    "q92_hard_negatives" -> Dedup.hardNegativesSql(),
    "q93_ann_recall" -> Similarity.annRecallSql(),
    "q94_split_leakage" -> Curation.splitLeakageSql(),
    "q95_importance_selection" -> Curation.importanceSelectionSql(),
    "q96_component_split" -> Curation.componentSplitSql(),
    "q97_modern_pipeline" -> graft.operators.CurationPipeline.modernSummarySql(),
    "q98_bucketed_batching" -> Packing.batchingSummarySql(),
    "q99_quality_calibration" -> TextAnalysis.qualityCalibrationSql,
    "q100_epoch_schedule" -> Curation.epochScheduleSql(),
    "q101_preference_pairs" -> Dedup.preferencePairsSql(),
    "q102_curriculum_schedule" -> Curation.curriculumScheduleSql(),
    "q103_corpus_datasheet" -> Curation.corpusDatasheetSql,
    "q104_vocab_coverage" -> TextAnalysis.vocabCoverageFrontierSql(),
    "q105_span_scrub" -> TextAnalysis.spanScrubSql(),
    "q106_doremi_reweight" -> Curation.doremiReweightSql,
    "q107_snapshot_drift" -> Similarity.snapshotDriftSql,
    "q108_unimax_allocation" -> Curation.unimaxAllocationSql,
    "q109_cms_heavy_hitters" -> TextAnalysis.cmsHeavyHittersSql(),
    "q110_lsh_recall" -> Dedup.lshRecallAuditSql(),
    "q111_eval_set" -> Curation.evalSetBuildSql(),
    "q112_fuzzy_contamination" -> Dedup.fuzzyContaminationSql(),
    "q113_corpus_diff" -> Curation.corpusDiffSql,
    "q114_temperature_sampling" -> Curation.temperatureAllocationSql,
    "q115_shard_manifest" -> Curation.shardManifestSql(),
    "q116_incremental_neardup" -> Dedup.snapshotNearDupIntakeSql,
    "q117_hybrid_retrieval" -> TextAnalysis.hybridRetrievalSql(),
    "q118_redundancy_quality" -> Dedup.redundancyQualityAuditSql(),
    "q119_scaling_ladder" -> Curation.scalingLadderSql(),
    "q120_split_divergence" -> Curation.splitDivergenceSql(),
    "q121_gate_ablation" -> Curation.gateAblationSql(),
    "q122_transition_matrix" -> EventAnalytics.transitionMatrixSql,
    "q123_effective_size" -> Dedup.effectiveSizeSql(),
    "q124_bucket_occupancy" -> Dedup.bucketOccupancySql,
    "q125_list_occupancy" -> Similarity.listOccupancySql,
    "q126_threshold_curve" -> Dedup.thresholdSensitivitySql,
    "q127_session_gaps" -> EventAnalytics.sessionGapsSql,
    "q128_quality_attribution" -> TextAnalysis.qualityComponentsSql,
    "q129_dup_flow" -> Dedup.dupFlowMatrixSql(),
    "q130_conversion_latency" -> EventAnalytics.conversionLatencySql,
    "q131_norm_audit" -> Similarity.normAuditSql,
    "q132_value_percentiles" -> EventAnalytics.valuePercentilesSql,
    "q133_manifest_delta" -> Dedup.dedupManifestDeltaSql(),
    "q134_collocations" -> TextAnalysis.collocationsSql(),
    "q135_skew_keys" -> graft.operators.Scale.skewKeysSql(),
    "q136_diversity_profile" -> TextAnalysis.diversityProfileSql,
    "q137_integrity_audit" -> Relational.integrityAuditSql,
    "q138_quality_trend" -> Curation.sourceQualityTrendSql,
    "q139_targeted_salt" -> graft.operators.Scale.targetedSaltSummarySql,
    "q140_perplexity_filter" -> TextAnalysis.perplexityFilterSql(),
    "q141_ppx_calibration" -> TextAnalysis.perplexityCalibrationSql(),
    "q142_rule_filter" -> TextAnalysis.ruleFilterAuditSql,
    "q143_filter_chain" -> graft.operators.CurationPipeline.crawlFilterChainSql(),
    "q144_dim_variance" -> Similarity.dimensionVarianceSql,
    "q145_stickiness" -> EventAnalytics.stickinessSql(),
    "q146_media_percentiles" -> Multimodal.mediaBytePercentilesSql,
    "q147_vocab_growth" -> TextAnalysis.vocabGrowthCurveSql,
    "q148_zipf_audit" -> TextAnalysis.zipfAuditSql(),
    "q149_vocab_overlap" -> TextAnalysis.vocabOverlapSql,
    "q150_join_forecast" -> graft.operators.Scale.joinCardinalityForecastSql(),
    "q151_domain_kl" -> TextAnalysis.domainShiftKlSql,
    "q152_ppx_by_source" -> TextAnalysis.perplexityBySourceSql(),
    "q153_kmv_sketch" -> TextAnalysis.kmvSketchSql(),
    "q154_source_lang_mi" -> TextAnalysis.sourceLangMiSql,
    "q155_novelty_election" -> TextAnalysis.vocabNoveltyElectionSql,
    "q156_containment" -> Dedup.containmentNearDupSql(),
    "q157_rep_bands" -> TextAnalysis.repetitionProfileSql,
    "q158_sketch_overlap" -> TextAnalysis.sketchOverlapSql(),
    "q159_quantile_sketch" -> EventAnalytics.quantileSketchAuditSql,
    "q160_blocklist" -> TextAnalysis.blocklistDensitySql(),
    "q161_trunc_families" -> Dedup.truncationFamiliesSql(),
    "q162_weighted_sample" -> Curation.weightedSampleSql(),
    "q163_vocab_entropy" -> TextAnalysis.vocabEntropySql,
    "q164_volume_anomaly" -> EventAnalytics.volumeAnomalySql(),
    "q165_media_dedup" -> Multimodal.mediaDedupSql,
    "q166_rank_agreement" -> TextAnalysis.rankAgreementSql,
    "q167_length_drift" -> TextAnalysis.lengthDriftSql,
    "q168_token_gini" -> TextAnalysis.tokenGiniSql,
    "q169_cooccurrence" -> EventAnalytics.cooccurrenceLiftSql,
    "q170_mattr" -> TextAnalysis.mattrDiversitySql(),
    "q171_vocab_diff" -> TextAnalysis.vocabDiffSql,
    "q172_burstiness" -> EventAnalytics.burstinessSql,
    "q173_vocab_richness" -> TextAnalysis.vocabRichnessSql,
    "q174_winnowing" -> TextAnalysis.winnowingSql(),
    "q175_attribution" -> EventAnalytics.attributionSql,
    "q176_rfm_segments" -> Relational.rfmSegmentsSql,
    "q177_readability" -> TextAnalysis.readabilityProfileSql,
    "q178_confusability" -> Similarity.labelConfusabilitySql,
    "q179_sessionization" -> EventAnalytics.sessionizationSql,
    "q180_robust_stats" -> EventAnalytics.robustValueStatsSql,
    "q181_benford" -> Relational.benfordAuditSql,
    "q182_hygiene" -> Curation.encodingHygieneSql,
    "q183_fd_audit" -> Relational.fdAuditSql,
    "q184_basket_pairs" -> Relational.basketPairsSql(),
    "q185_seasonality" -> EventAnalytics.weeklySeasonalitySql,
    "q186_new_returning" -> EventAnalytics.newVsReturningSql,
    "q187_supplier_hhi" -> Relational.supplierHhiSql,
    "q188_conversion_survival" -> EventAnalytics.conversionSurvivalSql,
    "q189_mann_kendall" -> EventAnalytics.mannKendallTrendSql,
    "q190_purchase_gaps" -> Relational.repeatPurchaseGapsSql,
    "q191_ab_readout" -> EventAnalytics.abReadoutSql,
    "q192_state_dwell" -> EventAnalytics.stateDwellSql,
    "q193_erasure_sweep" -> Curation.erasureSweepSql(),
    "q194_triplet_margin" -> Similarity.tripletMarginSql(),
    "q195_cohort_ltv" -> EventAnalytics.cohortLtvSql,
    "q196_active_streaks" -> EventAnalytics.activeStreaksSql,
    "q197_pii_audit" -> Curation.piiAuditSql,
    "q198_packing_election" -> Packing.packingElectionSql(),
    "q199_k_anonymity" -> Curation.kAnonymitySql(),
    "q200_zorder_layout" -> graft.operators.Scale.zorderElectionSql,
    "q201_media_ahash" -> Multimodal.mediaAhashNearDupSql,
    "q202_bpe_merges" -> TextAnalysis.bpeFirstMergesSql(),
    "q203_burst_panel" -> EventAnalytics.decayedBurstPanelSql,
    "q204_incremental_refresh" -> Relational.incrementalRefreshAuditSql(),
    "q205_bloom_sizing" -> graft.operators.Scale.bloomSizingSql,
    "q206_comovement" -> EventAnalytics.comovementMatrixSql,
    "q207_value_migration" -> EventAnalytics.valueMigrationSql
  )
}
