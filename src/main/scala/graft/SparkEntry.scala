package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Graph, Layout, Multimodal, Relational, Similarity, TextAnalysis, TimeSeries}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ beyond-reference
    * operators). Names map 1:1 to [[oracleSql]] keys.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_full_scan" -> (Relational.fullScan _),
    "s2_user_query" -> (Relational.userQuery _),
    "f1_partition_daily" -> (Relational.partitionDaily _),
    "f1_partition_monthly" -> (Relational.partitionMonthly _),
    "f1_partition_hourly" -> (Relational.partitionHourly _),
    "x1_range_split_union" -> (Relational.rangeSplitUnion _),
    "l1_limit_topk" -> (Relational.limitTopK _),
    "s4_minmax_bounds" -> (Relational.minMaxBounds _),
    "p4_type_projection" -> (Relational.typeProjection _),
    "a2_count" -> (Relational.countAll _),
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join_agg" -> (Relational.q3JoinAgg _),
    "w1_window_topk" -> (Relational.windowTopK _),
    // same contract via the bounded-heap aggregate (map-side partial top-k)
    "q_grouped_topk" -> (Relational.groupedTopK _),
    "set_except" -> (Relational.setExcept _),
    "q_full_outer" -> (Relational.fullOuterJoin _),
    "q_unpivot" -> (Relational.unpivotMetrics _),
    "set_union" -> (Relational.setUnion _),
    "set_intersect_all" -> (Relational.setIntersectAll _),
    "set_except_all" -> (Relational.setExceptAll _),
    "events_hourly_agg" -> (Relational.eventsHourlyAgg _),
    "events_sessionize" -> ((s, d) => EventStream.sessionizeBatch(s, d)),
    // the NATIVE session_window operator (same state-store expression runs
    // in streaming) — distinct from the window-function chain above
    "events_session_window" -> ((s, d) => EventStream.sessionWindowBatch(s, d)),
    "events_interval_left_join" -> ((s, d) => EventStream.intervalLeftJoinBatch(s, d)),
    "text_token_count" -> (TextAnalysis.tokenCount _),
    "text_token_budget" -> ((s, d) => TextAnalysis.selectTokenBudget(s, d)),
    "text_quality" -> (TextAnalysis.qualityScore _),
    // Gopher rule battery: named per-rule flags + composed keep, all
    // thresholds in integer arithmetic (r9)
    "text_gopher_rules" -> (TextAnalysis.gopherRules _),
    // C4-style chain: gopher keep -> exact fp dedup -> langid -> rollup (r9)
    "pipeline_c4" -> (TextAnalysis.pipelineC4 _),
    // provenance dashboard keyed on the source column (r9)
    "text_source_stats" -> (TextAnalysis.sourceStats _),
    // per-source unigram KL from the corpus blend, micro-nat exact (r9)
    "text_domain_shift" -> (TextAnalysis.domainShift _),
    // apply the trained BPE table to every doc: per-doc token accounting
    // under a broadcast merge table bounded by the numMerges parameter (r9)
    "text_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    // distributed lossless round trip: rebuild every word from its tokens
    "text_bpe_encode_check" -> ((s, d) => TextAnalysis.bpeEncodeCheck(s, d)),
    // same encode through the persisted merge-table artifact (train once,
    // apply everywhere); spec pins store == direct bit-equal
    "text_bpe_encode_store" -> ((s, d) => {
      val store = java.nio.file.Files.createTempDirectory("graft-bpe-store").toString
      TextAnalysis.writeBpeModel(s, d, store)
      TextAnalysis.bpeEncodeViaStore(s, d, store)
    }),
    // first-fit-decreasing whole-document packing into capacity-token bins
    "text_pack_bins" -> ((s, d) => TextAnalysis.packBins(s, d)),
    // gate: zero overfilled bins + bin count within 2*LB+1 per chunk
    "text_pack_bins_check" -> ((s, d) => TextAnalysis.packBinsCheck(s, d)),
    "text_langid" -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_pii" -> (TextAnalysis.piiFilter _),
    "sample_split" -> (TextAnalysis.sampleSplit _),
    // r10: deterministic training shuffle + shard/position assignment
    "sample_shuffle_shards" -> ((s, d) => TextAnalysis.shuffleShards(s, d)),
    // r10: per-shard doc/token/byte manifest (shuffle ∘ token counting)
    "pipeline_shard_manifest" -> ((s, d) => TextAnalysis.shardManifest(s, d)),
    "text_decontaminate" -> ((s, d) => TextAnalysis.decontaminate(s, d)),
    "text_contamination_score" -> ((s, d) => TextAnalysis.contaminationScore(s, d)),
    // Bloom twin for the large-eval-set regime: fixed-size filter, map-side
    // probe, superset mark; no_oracle (DuckDB can't run the filter) — the
    // recall/FPR gate below is the oracle-checked pair
    "text_decontaminate_bloom" -> ((s, d) => TextAnalysis.decontaminateBloom(s, d)),
    "text_decontaminate_bloom_check" -> ((s, d) => TextAnalysis.decontaminateBloomCheck(s, d)),
    // CCNet-style corpus-self-trained bigram LM cross-entropy (micro-nats)
    "text_lm_xent" -> ((s, d) => TextAnalysis.lmCrossEntropy(s, d)),
    // top-K-successors pruned LM twin: model capped at (K+1)|contexts|
    // rows; pruned occurrences take the context's backoff cost (r9)
    "text_lm_xent_pruned" -> ((s, d) => TextAnalysis.lmCrossEntropyPruned(s, d)),
    // CCNet head/middle/tail perplexity terciles with value-atomic
    // boundaries; histogram-decomposed cum counts, map-only assign (r9)
    "pipeline_ppl_buckets" -> ((s, d) => TextAnalysis.pipelinePplBuckets(s, d)),
    // per-source CCNet-style calibrated keep rate off the same xent (r10)
    "text_quality_calibrated" -> ((s, d) => TextAnalysis.qualityCalibrated(s, d)),
    // delta gate: zero monotonicity violations + total delta <= 450 permille
    // (the sf fixture's successor fan-out is near-UNIFORM -- ~30/context --
    // the worst case for pruning; Zipfian real text sits far under this)
    "text_lm_xent_pruned_check" -> ((s, d) => TextAnalysis.lmCrossEntropyPrunedCheck(s, d)),
    // DSIR hashed-ngram importance weights toward the en slice (r8)
    "text_dsir" -> ((s, d) => TextAnalysis.dsirWeights(s, d)),
    // composed: weights -> heap top-200 -> per-lang rollup, one oracle (r8)
    "pipeline_dsir" -> ((s, d) => TextAnalysis.pipelineDsirSelect(s, d)),
    // distributed BPE tokenizer training: per-round argmax pair merge (r8)
    "text_bpe" -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    // gate: independent in-memory reference reproduces the merge table
    "text_bpe_check" -> ((s, d) => TextAnalysis.bpeCheck(s, d)),
    "text_pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "text_domain_mix" -> (TextAnalysis.domainMix _),
    "text_repetition" -> (TextAnalysis.repetition _),
    // C4-style corpus-level line (word-segment) dedup
    "text_line_dedup" -> ((s, d) => TextAnalysis.lineDedup(s, d)),
    // Lee-et-al sliding-window verbatim duplication fraction per doc (r7)
    "text_substring_dup" -> ((s, d) => TextAnalysis.substringDupScore(s, d)),
    // RAG chunking: overlapping fixed-size character windows per doc
    "text_chunk" -> ((s, d) => TextAnalysis.chunk(s, d)),
    // hashing-trick vectorization (sparse signed token counts per bucket)
    "text_hash_embedding" -> ((s, d) => TextAnalysis.hashEmbedding(s, d)),
    // the operators composed end to end under a single oracle
    "pipeline_summary" -> (TextAnalysis.pipelineSummary _),
    // round-4 chain: line dedup -> hashing-trick vectorization -> rollup
    "pipeline_vectorize" -> (TextAnalysis.pipelineVectorize _),
    "q_window_lead_lag" -> (Relational.eventLeadLag _),
    // time-based RANGE frame (trailing 1-hour per-user aggregates)
    "q_range_frame" -> (Relational.rangeFrameTrailing _),
    // hot-key guards for the window family: time-chunked rewrites that are
    // EXACT (they share their plain twins' oracles) with bounded per-task
    // partitions — see Relational.rangeFrameTrailingSkewSafe scaladoc
    "q_range_frame_skew" -> ((s, d) => Relational.rangeFrameTrailingSkewSafe(s, d)),
    "q_window_lead_lag_skew" -> ((s, d) => Relational.eventLeadLagSkewSafe(s, d)),
    "events_sessionize_skew" -> ((s, d) => EventStream.sessionizeSkewSafe(s, d)),
    "q_ntile" -> (Relational.ntileDeciles _),
    // r10: dense_rank/percent_rank/cume_dist in one window pass, plus the
    // value-histogram skew twin sharing the oracle verbatim
    "q_rank_family" -> ((s, d) => Relational.qRankFamily(s, d)),
    "q_rank_family_skew" -> ((s, d) => Relational.qRankFamilySkewSafe(s, d)),
    // low-cardinality ranked-window guards (round 7): exact histogram-
    // boundary rewrites sharing the plain forms' oracles — no window task
    // ever sorts a constant fraction of the table
    "q_ntile_skew" -> (Relational.ntileDecilesSkewSafe _),
    "q_percentile_disc_skew" -> (Relational.percentileDiscSkewSafe _),
    "text_domain_mix_scale" -> ((s, d) => TextAnalysis.domainMixScale(s, d)),
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashNearDups(s, d)),
    // EXACT prefix-filtering twin (AllPairs/PPJoin): same contract with no
    // probabilistic step — shares the minhash oracle verbatim (r9)
    "dedup_jaccard_exact" -> ((s, d) => Dedup.jaccardPrefixNearDups(s, d)),
    // routed through the O(log n) large-star/small-star CC (spec-proven
    // equal to the min-label BSP, which remains available as
    // Dedup.nearDupClusters)
    "dedup_clusters" -> ((s, d) => Dedup.nearDupClustersStar(s, d)),
    "dedup_exact_hash" -> (Dedup.exactByFingerprint _),
    // nightly snapshot diff: added/removed/changed via 16-byte fps (r7)
    "corpus_diff" -> (Dedup.corpusDiff _),
    // daily-increment dedup: new docs vs existing corpus, never corpus²
    "dedup_incremental" -> ((s, d) => Dedup.incrementalNearDups(s, d)),
    // same contract through a persisted parquet signature store round trip
    "dedup_incremental_store" -> ((s, d) => Dedup.incrementalNearDupsViaStore(s, d)),
    // end-to-end dedup: drop near-dups, keep min-id representative per group
    "dedup_canonical" -> ((s, d) => Dedup.canonicalDocs(s, d)),
    "dedup_canonical_best" -> ((s, d) => Dedup.canonicalDocsBest(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDups(s, d)),
    // SemDeDup: CC over the exact embedding near-dup graph
    "dedup_semantic_clusters" -> ((s, d) => Dedup.semanticClusters(s, d)),
    // one representative per semantic cluster + unique pass-through
    "dedup_semantic" -> ((s, d) => Dedup.semanticCanonical(s, d)),
    "ann_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    // r10: semi-hard negative mining for contrastive training (banded
    // exact top-k — same bounded-heap plan as ann_topk)
    "ann_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    // r10 continuation: Artetxe-Schwenk ratio-margin bitext mining with
    // mutual-best acceptance over the mod-10 side split
    "ann_margin_mining" -> ((s, d) => Similarity.marginMining(s, d)),
    // r10: greedy farthest-point diversity coreset (+ its gate: radii
    // recomputed with independent arithmetic)
    "sample_coreset" -> ((s, d) => Similarity.kCenterCoreset(s, d)),
    "sample_coreset_check" -> ((s, d) => Similarity.kCenterCoresetCheck(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.lshTopK(s, d)),
    "multimodal_meta" -> (Multimodal.binaryMeta _),
    "q_rollup" -> (Relational.rollupAgg _),
    "q_cube" -> (Relational.cubeAgg _),
    "q_percentile_disc" -> (Relational.percentileDisc _),
    "q_pivot" -> (Relational.pivotAgg _),
    "events_json_extract" -> (Relational.jsonExtractAgg _),
    // r9: the as-of catalog family defaults to the NATIVE AsOfJoinExec
    // (backward strict); the window form (Relational.asofLastPurchase)
    // and the time-chunked twin (asofLastPurchaseSkewSafe) remain as
    // bit-equal oracle twins, asserted in WindowSkewSpec
    "events_asof_purchase" -> (Relational.asofLastPurchaseNative _),
    // the native AsOfJoinExec (custom LogicalPlan + SparkStrategy +
    // SparkPlan): click -> first purchase at-or-after, streamed merge (r8)
    "events_asof_native" -> (Relational.asofNativeNextPurchase _),
    // same exec, backward scan rule: last purchase at-or-before (r8)
    "events_asof_native_backward" -> (Relational.asofNativeLastPurchase _),
    // the TOLERANCE clause: match only within 1 hour, else nulls (r9)
    "events_asof_tolerance" -> ((s, d) => Relational.asofNativeNextPurchaseTolerance(s, d)),
    // same native path under the hot-key fixture contract: the exec is
    // skew-proof by construction (one linear merge pass per partition)
    "events_asof_purchase_skew" -> (Relational.asofLastPurchaseNative _),
    // backward as-of against a reference-shaped workload: last-touch
    // attribution purchases->clicks with a synthesized hot user (r9)
    "events_attribution_lasttouch" -> (Relational.attributionLastTouch _),
    // cohort retention triangle: one user_id exchange builds cohort week +
    // calendar-bounded active-week set in the same aggregate (r9)
    "events_retention" -> (Relational.eventsRetention _),
    // record linkage: multi-probe blocking + integer agreement scoring +
    // per-record argmax resolution over a deterministic dirty feed (r9)
    "link_customers" -> (Relational.linkCustomers _),
    // median/MAD hourly-count anomaly monitor, calendar-bounded windows (r9)
    "events_anomaly_mad" -> (Relational.eventsAnomalyMad _),
    // per-user transition matrix with integer-permille conditionals (r9)
    "events_markov" -> (Relational.eventsMarkov _),
    // p01/p99 value-atomic clipping via the chunked value histogram (r9)
    "stats_winsorize" -> ((s, d) => Relational.statsWinsorize(s, d)),
    // SCD2 validity intervals via gaps-and-islands, one user_id exchange (r9)
    "events_scd2" -> (Relational.eventsScd2 _),
    // batch rollup states merged through a parquet store == full rescan (r9)
    "agg_incremental_merge" -> ((s, d) => Relational.incrementalAggMerge(s, d)),
    // min/max chunk-pruning simulation: natural vs z-order layout (r9)
    "layout_skipping" -> ((s, d) => Layout.skippingGain(s, d)),
    // declarative DQ constraints: one scan for row-local checks (r9)
    "dq_battery" -> (Relational.dqBattery _),
    // quasi-identifier group-size audit for publish gating (r9)
    "dq_kanonymity" -> ((s, d) => Relational.kAnonymity(s, d)),
    // staleness lag vs a pinned as-of instant, budget-gated (r9)
    "dq_freshness" -> ((s, d) => Relational.dqFreshness(s, d)),
    // RFM quintile segmentation, total-order deterministic ntiles (r9)
    "customer_rfm" -> (Relational.customerRfm _),
    // Lorenz curve: decile revenue concentration, triangular cumsum (r9)
    "orders_lorenz" -> (Relational.ordersLorenz _),
    // TPC-H Q16 shape: two-phase distinct, no Expand in the plan (r9)
    "q16_supplier_variety" -> (Relational.q16SupplierVariety _),
    // FastSS deletion-neighborhood fuzzy join, oracle = brute force (r9)
    "link_fuzzy_names" -> (Relational.fuzzyNameJoin _),
    // CDC compaction: latest per key via max-struct, no window sort (r9)
    "events_compact_latest" -> (Relational.eventsCompactLatest _),
    // BM25 retrieval scoring, exact rational k1/b in one int division (r9)
    "text_bm25" -> ((s, d) => TextAnalysis.bm25(s, d)),
    // calendar densify + exact integer lerp over hourly gaps (r9)
    "events_gapfill" -> (Relational.eventsGapfill _),
    // linear multi-touch attribution, exact micro-credit conservation (r9)
    "events_attribution_linear" -> ((s, d) => Relational.attributionLinear(s, d)),
    // step-function time-weighted average, integer cents x micros (r9)
    "events_twap" -> (Relational.eventsTwap _),
    // interval census: per-hour peak live sessions, two-level sweep (r9)
    "events_concurrency" -> (Relational.eventsConcurrency _),
    // top session paths: per-session type sequence -> heavy paths (r9)
    "events_top_paths" -> ((s, d) => Relational.eventsTopPaths(s, d)),
    // least-squares hourly-volume slope, explicit floor division (r9)
    "stats_trend" -> (Relational.statsTrend _),
    // NATIVE keyed interval join (custom exec #2): same-user prior-30min
    // density via the streamed sweep with a sliding buffer (r9)
    "events_range_join_native" -> (Relational.rangeJoinNative _),
    // TPC-H Q8 shape: 6-table tree, integer cents x percent revenue (r9)
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    // TPC-H Q17 shape: decorrelated per-part avg, one reused exchange (r9)
    "q17_small_qty" -> ((s, d) => Relational.q17SmallQty(s, d)),
    // r10 TPC-H shape batch: the remaining classic plan shapes (see the
    // Relational section comment) — correlated min, EXISTS semi,
    // left-outer count histogram, max-of-agg, HAVING join-back,
    // EXISTS+NOT-EXISTS, scalar-avg + anti join
    "q2_min_cost_supplier" -> ((s, d) => Relational.q2MinCostSupplier(s, d)),
    // r10: one-pass integer-moment correlation matrix
    "stats_correlation" -> ((s, d) => Relational.statsCorrelation(s, d)),
    // r10: exact integer EWMA (sequential fold, bit-equal across engines)
    "events_ewma" -> ((s, d) => Relational.eventsEwma(s, d)),
    // r10 completion batch: with these, every TPC-H query shape (1-22,
    // partsupp-free adaptations where the fixture lacks the table) has a
    // bit-exact catalog row
    "q6_forecast_revenue" -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
    "q7_nation_volume" -> ((s, d) => Relational.q7NationVolume(s, d)),
    "q9_profit_by_nation" -> ((s, d) => Relational.q9ProfitByNation(s, d)),
    "q10_returned_items" -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q11_important_share" -> ((s, d) => Relational.q11ImportantShare(s, d)),
    "q12_shipmode_priority" -> ((s, d) => Relational.q12ShipmodePriority(s, d)),
    "q14_promo_share" -> ((s, d) => Relational.q14PromoShare(s, d)),
    "q19_discounted_revenue" -> ((s, d) => Relational.q19DiscountedRevenue(s, d)),
    "q20_excess_suppliers" -> ((s, d) => Relational.q20ExcessSuppliers(s, d)),
    "q4_priority_wait" -> ((s, d) => Relational.q4PriorityWait(s, d)),
    "q13_custdist" -> ((s, d) => Relational.q13CustDist(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q21_waiting_supplier" -> ((s, d) => Relational.q21WaitingSupplier(s, d)),
    "q22_global_sales" -> ((s, d) => Relational.q22GlobalSales(s, d)),
    // r10 continuation: time-series family over calendar-bounded hourly
    // counts (ACF, CUSUM changepoint, seasonality, OHLC, rolling median)
    "events_acf" -> ((s, d) => TimeSeries.eventsAcf(s, d)),
    "events_cusum" -> ((s, d) => TimeSeries.eventsCusum(s, d)),
    "events_seasonality" -> ((s, d) => TimeSeries.eventsSeasonality(s, d)),
    "events_ohlc" -> ((s, d) => TimeSeries.eventsOhlc(s, d)),
    "events_rolling_median" -> ((s, d) => TimeSeries.eventsRollingMedian(s, d)),
    // classical additive trend/seasonal/residual split, milli-exact (r10)
    "events_decompose" -> ((s, d) => TimeSeries.eventsDecompose(s, d)),
    // r10 continuation: data-quality audits (Benford first-digit screen,
    // l-diversity privacy gate)
    "dq_benford" -> ((s, d) => Relational.dqBenford(s, d)),
    "dq_ldiversity" -> ((s, d) => Relational.dqLdiversity(s, d)),
    // r10 continuation: wedge-enumerated resource-allocation link scores
    "graph_link_predict" -> ((s, d) => Graph.linkPredict(s, d)),
    // r10 continuation: synchronous deterministic LPA over the same
    // median-sparsified co-service graph
    "graph_lpa" -> ((s, d) => Graph.lpaCommunities(s, d)),
    // r10 continuation: positional inverted-index phrase probe and the
    // prefix-filtered exact containment join
    "text_phrase_search" -> ((s, d) => TextAnalysis.phraseSearch(s, d)),
    "text_containment" -> ((s, d) => TextAnalysis.containmentJoin(s, d)),
    // r10 continuation: MOSS winnowing fingerprints (per-doc summary +
    // the shared-hash overlap detector they exist for), distinct-n
    // corpus-diversity rollup
    "text_winnowing" -> ((s, d) => TextAnalysis.winnowing(s, d)),
    "text_winnowing_overlap" -> ((s, d) => TextAnalysis.winnowingOverlap(s, d)),
    "text_distinct_ngrams" -> ((s, d) => TextAnalysis.distinctNgrams(s, d)),
    // iterative graph family: fixed-iteration integer Pregel supersteps (r9)
    "graph_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "graph_reach" -> ((s, d) => Graph.reachability(s, d)),
    "graph_components" -> ((s, d) => Graph.components(s, d)),
    // r10: oriented two-join triangle count over the supplier co-service
    // projection (strength-thresholded), exact clustering coefficient
    "graph_triangles" -> ((s, d) => Graph.triangles(s, d)),
    // a-priori-pruned frequent-pair mining, parameter-bounded space (r9)
    "text_cooccur" -> ((s, d) => TextAnalysis.cooccurrence(s, d)),
    // Efraimidis-Spirtakis weighted sampling, integer exponential clocks (r9)
    "sample_weighted" -> ((s, d) => TextAnalysis.sampleWeighted(s, d)),
    // 3-step funnel composed from TWO native as-of execs (r9)
    "events_funnel3_native" -> (Relational.eventsFunnel3Native _),
    // two-step funnel: first click -> first purchase at-or-after it (r7)
    "events_funnel" -> (Relational.eventsFunnel _),
    // time-chunked twin: hot-user window bounded by chunk volume
    "events_funnel_skew" -> ((s, d) => Relational.eventsFunnelSkewSafe(s, d)),
    // the funnel IS a forward as-of from the per-user first click - the
    // native exec answers it with one min-struct agg + streamed merge (r9)
    "events_funnel_native" -> (Relational.eventsFunnelNative _),
    "ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "ann_pq" -> ((s, d) => Similarity.pqTopK(s, d)),
    // the FAISS IndexIVFPQ composition: coarse cells prune the scan, PQ
    // codes score inside probed cells, raw vectors only for the re-rank (r8)
    "ann_ivfpq" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "q_semi_join" -> (Relational.semiJoin _),
    "q_anti_join" -> (Relational.antiJoin _),
    "q_scalar_subquery" -> (Relational.scalarSubquery _),
    "q_count_distinct" -> (Relational.countDistinctAgg _),
    "w2_running_sum" -> (Relational.runningSum _),
    "q5_multi_join" -> (Relational.q5MultiJoin _),
    "events_range_join" -> (Relational.rangeJoinDensity _),
    "q_grouping_sets" -> (Relational.groupingSets _),
    "set_intersect" -> (Relational.setIntersect _),
    "dedup_ngram" -> ((s, d) => Dedup.ngramNearDups(s, d)),
    "multimodal_frames" -> (Multimodal.frameSample _),
    "dedup_edit_distance" -> ((s, d) => Dedup.editDistancePairs(s, d)),
    "text_term_stats" -> (TextAnalysis.termStats _),
    // TF-IDF keyword extraction, micro-nat-quantized idf (r9)
    "text_tfidf" -> ((s, d) => TextAnalysis.tfIdfTop(s, d)),
    // Unicode NFC normalization (native graft_nfc) over planted
    // decomposed combining sequences (r9)
    "text_normalize" -> (TextAnalysis.normalizeText _),
    "embedding_centroid" -> (Similarity.labelCentroids _),
    // approximate → no SQL oracle; accuracy spec-checked in KllSpec
    "sketch_quantiles" -> (Relational.sketchQuantiles _),
    // approximate → no SQL oracle; accuracy spec-checked in FreqSpec AND
    // oracle-gated by the paired sketch_freq_check rows below
    "sketch_topk_terms" -> (TextAnalysis.topkTermsSketch _),
    // a green row == the freq sketch honored its no-false-negative and
    // error-bound guarantees on every heavy token (DuckDB recomputes the
    // exact counts and asserts the booleans TRUE)
    "sketch_freq_check" -> (TextAnalysis.freqSketchCheck _),
    // approximate → no SQL oracle; accuracy spec-checked in ThetaSpec
    "sketch_theta_overlap" -> (Relational.thetaOverlap _),
    // persisted-blob merge round trips: per-shard sketch blobs → parquet →
    // read back → merge → gate vs exact (the ann_ivf_store_check recipe
    // applied to sketches — the cross-day rollup a 100 TB pipeline runs)
    // exact integer Gram matrix via the bounded-buffer aggregate (r9)
    "embedding_gram" -> (Similarity.embeddingGram _),
    "sketch_hll_merge_check" -> (Relational.hllStoreMergeCheck _),
    "sketch_freq_merge_check" -> (Relational.freqStoreMergeCheck _),
    "sketch_kll_merge_check" -> (Relational.kllStoreMergeCheck _),
    "sketch_theta_merge_check" -> (Relational.thetaStoreMergeCheck _),
    "events_salted_join" -> (Relational.eventsSaltedJoin _),
    // Z-order (Morton) interleave for multi-dimensional data skipping
    "layout_zorder" -> (Layout.zorderQuery _),
    // Hilbert-curve layout key via the native codegen graft_hilbert; the
    // oracle replays the xy2d recurrence as a recursive CTE (r9)
    "layout_hilbert" -> (Layout.hilbertQuery _),
    // explicit runtime filter: broadcast bloom prune + exact semi-join
    "q_bloom_semi_join" -> (Relational.bloomSemiJoin _),
    // bloom no-false-negative / FPR gate (sketch_*_check pattern)
    "bloom_fpr_check" -> (Relational.bloomFprCheck _),
    // exact per-column profiling in one scan + one aggregate
    "stats_profile" -> (Relational.statsProfile _),
    // equi-width histogram, pure integer bucket arithmetic
    "stats_histogram" -> ((s, d) => Relational.statsHistogram(s, d)),
    // equi-DEPTH histogram via the value-histogram percentile recipe (r7)
    "stats_histogram_eqdepth" -> ((s, d) => Relational.statsHistogramEquiDepth(s, d)),
    // fixed-count per-language sample in portable-hash order
    "sample_stratified" -> ((s, d) => TextAnalysis.sampleStratified(s, d)),
    "sample_mixture" -> ((s, d) => TextAnalysis.sampleMixture(s, d)),
    // mC4-style temperature sampling: targets DERIVED from observed counts
    // (integer-exact T=2 flattening), filled in portable-hash order (r7)
    "sample_temperature" -> ((s, d) => TextAnalysis.sampleTemperature(s, d)),
    // the same sample via the bounded-heap aggregate (the 100 TB form)
    "sample_stratified_topk" -> ((s, d) => TextAnalysis.sampleStratifiedTopK(s, d)),
    // round-5 chain: quality filter -> stratified sample -> chunk -> rollup
    "pipeline_chunks" -> ((s, d) => TextAnalysis.pipelineChunks(s, d)),
    // round-7 chain: substring-dup filter -> temperature mix -> rollup
    "pipeline_curate" -> ((s, d) => TextAnalysis.pipelineCurate(s, d)),
    // stub decode/resize dataflow, but every output column is derivable
    // from the text bytes → hard oracle rows for the mapPartitions plumbing
    "multimodal_decode" -> (Multimodal.decodePipelineQuery _),
    "multimodal_resize" -> (Multimodal.resizeQuery _),
    // real JPEG/PNG/GIF header parsing round-tripped against planted
    // payloads, with corrupt rows proving the quarantine path
    "multimodal_headers" -> (Multimodal.plantedHeaderQuery _),
    // REAL audio feature extraction: WAV PCM bytes built per doc, int16
    // samples decoded back, exact integer features; torn files quarantine (r8)
    "mm_audio_pcm" -> (Multimodal.audioPcmQuery _),
    // REAL pixel decode: planted 9x8 BMPs parsed byte-by-byte back to
    // pixels, reduced to the 64-bit perceptual dHash; torn files -1 (r9)
    "mm_image_dhash" -> (Multimodal.imageDhashQuery _),
    // the PPM leg: planted P6 payloads (comment in header) decoded back
    // to pixels, reduced to channel sums + position-weighted checksum (r9)
    "mm_image_ppm" -> (Multimodal.imagePpmQuery _),
    // frame-level twin: fixed 32-sample windows -> per-frame energy rows
    "mm_audio_frames" -> ((s, d) => Multimodal.audioFrameQuery(s, d)),
    // REAL radix-2 FFT per frame; Parseval + DC fold the spectrum back to
    // integers the oracle derives from the planted samples (r9)
    "mm_audio_spectrum" -> ((s, d) => Multimodal.audioSpectrumQuery(s, d)),
    // a green row == proof that LSH ANN achieved recall 1.0 vs brute force
    "ann_recall" -> ((s, d) => Similarity.lshRecallTable(s, d)),
    // SQ8 scalar quantization: 1 byte/dim, min/max quantizer (r9)
    "ann_sq" -> ((s, d) => Similarity.sqTopK(s, d)),
    "ann_sq_check" -> ((s, d) => Similarity.sqRecallFloor(s, d)),
    "ann_sq_store_check" -> ((s, d) => Similarity.sqStoreRecallFloor(s, d)),
    "ann_ivf_check" -> ((s, d) => Similarity.ivfRecallFloor(s, d)),
    // same floor through the PERSISTED index round trip (build -> parquet
    // -> read back -> query; bit-equal to the direct path by spec) (r7)
    "ann_ivf_store_check" -> ((s, d) => Similarity.ivfStoreRecallFloor(s, d)),
    // PQ gate: 8-byte codes + ADC + shortlist re-rank recovers >=5/10
    "ann_pq_check" -> ((s, d) => Similarity.pqRecallFloor(s, d)),
    // same floor through the persisted compressed index (codebooks + codes
    // parquet round trip; bit-equal to the direct path by spec) (r7)
    "ann_pq_store_check" -> ((s, d) => Similarity.pqStoreRecallFloor(s, d)),
    // IVF-PQ gate: >=3/10 true neighbors survive coarse pruning + 8-byte
    // quantization + shortlist (r8)
    "ann_ivfpq_check" -> ((s, d) => Similarity.ivfPqRecallFloor(s, d)),
    // same floor through the persisted composed index (centroids +
    // codebooks + 16-byte/vector coded corpus round trip) (r8)
    "ann_ivfpq_store_check" -> ((s, d) => Similarity.ivfPqStoreRecallFloor(s, d)),
    // r10: incremental index maintenance — build on 90%, append the newest
    // 10% with FROZEN quantizers, recall floor across the append seam
    "ann_ivfpq_append_check" -> ((s, d) => Similarity.ivfPqAppendRecallFloor(s, d)),
    // a green row == proof the sign-LSH embedding-dedup path (the 100 TB
    // route) recovers every planted near-dup pair the exact grid finds
    "dedup_embedding_lsh_check" -> ((s, d) => Dedup.embeddingLshRecall(s, d)),
    // scale-path semantic clusters: CC over sign-LSH pairs (no grid)
    "dedup_semantic_lsh" -> ((s, d) => Dedup.semanticClustersLsh(s, d)),
    // nightly-increment dedup for the EMBEDDING family: planted increment
    // vs corpus via sign-LSH buckets, new side broadcast (round 7)
    "dedup_embedding_incremental" -> ((s, d) => Dedup.embeddingIncrementalPlanted(s, d)),
    // same contract through the persisted parquet bucket-store round trip
    "dedup_embedding_incremental_store" ->
      ((s, d) => Dedup.embeddingIncrementalPlantedViaStore(s, d)),
    // approximate → no SQL oracle (engine-specific estimates); accuracy is
    // spec-checked against exact counts in HllSpec
    "sketch_distinct" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("graft_li")
      s.sql("SELECT l_returnflag, graft_hll_distinct(l_partkey) AS approx_parts, " +
        "graft_hll_distinct(l_orderkey) AS approx_orders FROM graft_li GROUP BY l_returnflag")
    }),
    // sketch ACCURACY as oracle rows (the ann_recall pattern): the booleans
    // are computed from sketch-vs-exact inside Spark; the DuckDB oracle
    // computes the exact values and asserts TRUE — a sketch drifting out of
    // bound hash-mismatches the driver row.
    "sketch_distinct_check" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("graft_li")
      s.sql(
        """WITH g AS (
          | SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS exact_parts,
          |  count(DISTINCT l_orderkey) AS exact_orders,
          |  graft_hll_distinct(l_partkey) AS est_parts,
          |  graft_hll_distinct(l_orderkey) AS est_orders
          | FROM graft_li GROUP BY l_returnflag)
          |SELECT l_returnflag,
          | CAST(exact_parts AS BIGINT) AS exact_parts,
          | CAST(exact_orders AS BIGINT) AS exact_orders,
          | abs(est_parts - exact_parts) <= 0.05 * exact_parts AS parts_within_5pct,
          | abs(est_orders - exact_orders) <= 0.05 * exact_orders AS orders_within_5pct
          |FROM g""".stripMargin)
    }),
    "sketch_theta_check" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      graft.operators.Relational.events(s, d).createOrReplaceTempView("graft_events")
      s.sql(
        """WITH sk AS (
          | SELECT event_type, graft_theta_sketch(user_id) AS sk
          | FROM graft_events GROUP BY event_type),
          |est AS (
          | SELECT a.event_type AS type_a, b.event_type AS type_b,
          |  graft_theta_intersect_est(a.sk, b.sk) AS est_both,
          |  graft_theta_union_est(a.sk, b.sk) AS est_either
          | FROM sk a JOIN sk b ON a.event_type < b.event_type),
          |du AS (SELECT DISTINCT event_type, user_id FROM graft_events),
          |cnt AS (SELECT event_type, count(*) AS n FROM du GROUP BY event_type),
          |ex AS (
          | SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS exact_both
          | FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
          | GROUP BY x.event_type, y.event_type)
          |SELECT e.type_a, e.type_b,
          | CAST(ex.exact_both AS BIGINT) AS exact_both,
          | CAST(ca.n + cb.n - ex.exact_both AS BIGINT) AS exact_either,
          | abs(e.est_both - ex.exact_both) <= 0.05 * ex.exact_both + 1.0 AS both_within_5pct,
          | abs(e.est_either - (ca.n + cb.n - ex.exact_both)) <= 0.05 * (ca.n + cb.n - ex.exact_both) + 1.0 AS either_within_5pct
          |FROM est e
          | JOIN ex ON e.type_a = ex.type_a AND e.type_b = ex.type_b
          | JOIN cnt ca ON ca.event_type = e.type_a
          | JOIN cnt cb ON cb.event_type = e.type_b""".stripMargin)
    }),
    "sketch_quantile_check" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("graft_li")
      s.sql(
        """WITH q AS (
          | SELECT l_returnflag,
          |  element_at(graft_kll_quantiles(l_quantity, array(0.5D)), 1) AS q50
          | FROM graft_li GROUP BY l_returnflag),
          |r AS (
          | SELECT l_returnflag, l_quantity,
          |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
          |  count(*) OVER (PARTITION BY l_returnflag) AS n
          | FROM graft_li),
          |b AS (
          | SELECT l_returnflag,
          |  max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN l_quantity END) AS lo,
          |  max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN l_quantity END) AS hi
          | FROM r GROUP BY l_returnflag)
          |SELECT q.l_returnflag, b.lo, b.hi,
          | q.q50 >= b.lo AND q.q50 <= b.hi AS q50_within_rank_bounds
          |FROM q JOIN b ON q.l_returnflag = b.l_returnflag""".stripMargin)
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Exact all-pairs new-vs-corpus ground truth, shared verbatim by
    * `dedup_incremental` and `dedup_incremental_store`.
    */
  private val IncrementalDedupOracle: String =
    """WITH sh AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
      | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      | WHERE len(w) >= 3)
      |SELECT * FROM (
      | SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
      |  CAST(len(list_intersect(n.s, c.s)) AS BIGINT) AS n_inter,
      |  CAST(len(list_intersect(n.s, c.s)) AS DOUBLE)
      |    / CAST(len(n.s) + len(c.s) - len(list_intersect(n.s, c.s)) AS DOUBLE) AS jaccard
      | FROM sh n JOIN sh c ON n.doc_id >= 400 AND c.doc_id < 400)
      |WHERE jaccard >= 0.6""".stripMargin

  /** Ground truth shared verbatim by `q_ntile` and its skew-safe twin —
    * bound once so the pair can never drift apart (the
    * [[IncrementalDedupOracle]] pattern).
    */
  private val NtileOracle: String =
    """SELECT c_custkey, c_mktsegment, cents,
      | CAST(ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY cents DESC, c_custkey) AS BIGINT) AS decile
      |FROM (SELECT c_custkey, c_mktsegment,
      | CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer)""".stripMargin

  /** Shared verbatim by `q_rank_family` and its histogram skew twin. The
    * window orders by price ALONE — dense_rank/percent_rank/cume_dist are
    * tie-invariant, so no unique tiebreak is needed for determinism and
    * dense_rank keeps real semantics (see the operator scaladoc).
    */
  private val RankFamilyOracle: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(dense_rank() OVER w AS BIGINT) AS dense_rk,
      | CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_micros,
      | CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_dist_micros
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)""".stripMargin

  /** Shared by `q_percentile_disc` and its skew-safe twin. */
  private val PercentileDiscOracle: String =
    """SELECT l_returnflag,
      | max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN l_quantity END) AS p50_qty,
      | max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN l_quantity END) AS p95_qty,
      | CAST(max(n) AS BIGINT) AS n
      |FROM (
      | SELECT l_returnflag, l_quantity,
      |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |  count(*) OVER (PARTITION BY l_returnflag) AS n
      | FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin

  /** Shared by `text_domain_mix` and `text_domain_mix_scale` (the scale twin
    * consumes it projected to (doc_id, lang, kept): computing a global
    * `mix_rank` for EVERY row is inherently a full per-language ranking —
    * selection needs only the kept flag).
    */
  private val DomainMixOracle: String =
    """WITH d AS (
      | SELECT doc_id, lang,
      |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (acc, x) -> (acc * 43 + x) % 1000000007) AS h
      | FROM documents),
      |cap AS (SELECT min(n) AS cap FROM (SELECT count(*) AS n FROM d GROUP BY lang)),
      |r AS (SELECT doc_id, lang,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS mix_rank
      | FROM d)
      |SELECT doc_id, lang, mix_rank, mix_rank <= cap AS kept FROM r, cap""".stripMargin

  /** Exact all-pairs increment-vs-corpus ground truth on the planted-copy
    * embedding corpus, shared verbatim by `dedup_embedding_incremental` and
    * its bucket-store round trip (the [[IncrementalDedupOracle]] pattern).
    * Sound for the LSH path because verified pairs ⊆ exact pairs and
    * `dedup_embedding_lsh_check` proves recall 1.0 on this corpus.
    */
  private val EmbeddingIncrementalOracle: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
      |planted AS (
      | SELECT vec_id + 100000 AS vec_id,
      |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
      | FROM base WHERE vec_id < 20),
      |n AS (
      | SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |    (acc, x) -> acc + x)) AS norm
      | FROM planted),
      |c AS (
      | SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |    (acc, x) -> acc + x)) AS norm
      | FROM base)
      |SELECT * FROM (
      | SELECT n.vec_id AS id_new, c.vec_id AS id_corpus,
      |  list_reduce(list_transform(range(1, len(n.embedding) + 1),
      |    i -> CAST(n.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
      |    (acc, x) -> acc + x) / (n.norm * c.norm) AS cosine
      | FROM n CROSS JOIN c
      | WHERE n.norm > 0 AND c.norm > 0)
      |WHERE cosine >= 0.7""".stripMargin

  /** Gopher rule battery ground truth — shared by `text_gopher_rules`,
    * the composed `pipeline_c4` chain, and `text_source_stats`.
    */
  private val GopherOracle: String =
    """WITH g AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    t -> len(t))) AS BIGINT) AS sum_word_chars,
        |  CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_symbols,
        |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> regexp_matches(ltrim(l), '^[-*]'))) AS BIGINT) AS n_bullet_lines,
        |  CAST(len(list_filter(string_split(text, chr(10)),
        |    l -> rtrim(l) LIKE '%...')) AS BIGINT) AS n_ellipsis_lines,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS BIGINT) AS n_stopword_hits,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words
        | FROM documents)
        |SELECT *,
        | (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio AND
        |  rule_bullet_lines AND rule_ellipsis_lines AND rule_stopwords AND
        |  rule_alpha_words) AS keep
        |FROM (
        | SELECT *,
        |  n_words >= 50 AND n_words <= 100000 AS rule_word_count,
        |  sum_word_chars >= n_words * 3 AND sum_word_chars <= n_words * 10 AS rule_mean_word_len,
        |  n_symbols * 10 <= n_words AS rule_symbol_ratio,
        |  n_bullet_lines * 10 <= n_lines * 9 AS rule_bullet_lines,
        |  n_ellipsis_lines * 10 <= n_lines * 3 AS rule_ellipsis_lines,
        |  n_stopword_hits >= 2 AS rule_stopwords,
        |  n_alpha_words * 5 >= n_words * 4 AS rule_alpha_words
        | FROM g)""".stripMargin

  /** All-pairs exact word-3-gram Jaccard ground truth at τ=0.6 — shared by
    * `dedup_minhash` (LSH candidates + exact verify) and
    * `dedup_jaccard_exact` (prefix filtering, deterministic): the two
    * algorithms answer the identical contract, so sharing the SQL verbatim
    * proves they cannot drift from each other either.
    */
  private val JaccardPairsOracle: String =
    """WITH sh AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
      | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      | WHERE len(w) >= 3)
      |SELECT * FROM (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
      | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.6""".stripMargin

  /** Shared by `events_asof_purchase` and its time-chunked skew twin. */
  private val AsofOracle: String =
    """SELECT event_id, user_id, ts,
      | max(CASE WHEN event_type = 'purchase' THEN ts END)
      |  OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
      |FROM events""".stripMargin

  /** Shared by `events_funnel` and its time-chunked skew-safe twin. */
  private val FunnelOracle: String =
    """WITH x AS (
      | SELECT user_id, event_id, ts, event_type,
      |  min(CASE WHEN event_type = 'click' THEN ts END)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fc
      | FROM events),
      |agg AS (
      | SELECT user_id,
      |  min(CASE WHEN event_type = 'click' THEN ts END) AS first_click_ts,
      |  min(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL THEN ts END)
      |   AS first_conversion_ts
      | FROM x GROUP BY user_id)
      |SELECT user_id, first_click_ts, first_conversion_ts,
      | first_conversion_ts IS NOT NULL AS converted,
      | CASE WHEN first_conversion_ts IS NOT NULL
      |  THEN CAST(epoch_us(first_conversion_ts) - epoch_us(first_click_ts) AS BIGINT)
      | END AS conversion_us
      |FROM agg""".stripMargin

  /** Shared by `text_dsir` and the composed `pipeline_dsir` (which selects
    * on top of these exact weights), so the two rows cannot drift.
    */
  /** Exact corpus-self-trained bigram-LM cross-entropy (micro-nats). */
  private val LmXentOracle: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |v AS (SELECT count(DISTINCT tok) AS vocab FROM (SELECT unnest(w) AS tok FROM t)),
      |b AS (
      | SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |   i -> [w[CAST(i AS INTEGER)], w[CAST(i AS INTEGER) + 1]])) AS bg
      | FROM t WHERE len(w) >= 2),
      |bb AS (SELECT doc_id, bg[1] AS prev, bg[1] || ' ' || bg[2] AS bigram FROM b),
      |cp AS (SELECT bigram, count(*) AS c_pair FROM bb GROUP BY 1),
      |cx AS (SELECT prev, count(*) AS c_prev FROM bb GROUP BY 1),
      |cost AS (
      | SELECT bb.doc_id,
      |  CAST(round(ln((cp.c_pair + 1.0) / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT) AS c
      | FROM bb JOIN cp USING (bigram) JOIN cx USING (prev) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST((-sum(c)) // count(*) AS BIGINT) AS xent_micronats
      |FROM cost GROUP BY doc_id""".stripMargin

  /** The pruned-LM twin: top-8 successors per context by (count desc,
    * 60-bit fingerprint asc) — the fingerprint (mirroring
    * `Portable.polyHash60Native`: base-31 mod 1e9+7 shifted by 2^30,
    * plus base-37 mod 998244353 low bits) exists ONLY to replicate
    * `graft_topk`'s id tie-break; pruned occurrences cost the add-one
    * backoff `ln(1/(c_prev+V))`. K = 16 mirrors the Spark default.
    */
  private val LmXentPrunedOracle: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |v AS (SELECT count(DISTINCT tok) AS vocab FROM (SELECT unnest(w) AS tok FROM t)),
      |b AS (
      | SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |   i -> [w[CAST(i AS INTEGER)], w[CAST(i AS INTEGER) + 1]])) AS bg
      | FROM t WHERE len(w) >= 2),
      |bb AS (SELECT doc_id, bg[1] AS prev, bg[1] || ' ' || bg[2] AS bigram FROM b),
      |cp AS (SELECT bigram, min(prev) AS prev, count(*) AS c_pair FROM bb GROUP BY 1),
      |cx AS (SELECT prev, count(*) AS c_prev FROM bb GROUP BY 1),
      |fp AS (
      | SELECT bigram,
      |  (list_reduce(list_transform(string_split(bigram, ''), c -> CAST(ascii(c) AS BIGINT)),
      |     (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824)
      |  + (list_reduce(list_transform(string_split(bigram, ''), c -> CAST(ascii(c) AS BIGINT)),
      |     (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824) AS fp_pair
      | FROM cp),
      |kept AS (
      | SELECT bigram FROM (
      |  SELECT cp.bigram,
      |   row_number() OVER (PARTITION BY cp.prev ORDER BY cp.c_pair DESC, fp.fp_pair ASC) AS rn
      |  FROM cp JOIN fp USING (bigram))
      | WHERE rn <= 16),
      |cost AS (
      | SELECT bb.doc_id,
      |  CASE WHEN kept.bigram IS NOT NULL
      |   THEN CAST(round(ln((cp.c_pair + 1.0) / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT)
      |   ELSE CAST(round(ln(1.0 / (cx.c_prev + v.vocab)) * 1000000) AS BIGINT) END AS c
      | FROM bb JOIN cp USING (bigram) JOIN cx ON bb.prev = cx.prev
      |  LEFT JOIN kept USING (bigram) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      | CAST((-sum(c)) // count(*) AS BIGINT) AS xent_micronats
      |FROM cost GROUP BY doc_id""".stripMargin

  private val DsirOracle: String =
    """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |uni AS (SELECT doc_id, lang, unnest(w) AS f FROM t),
      |bi AS (
      | SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
      |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1])) AS f
      | FROM t WHERE len(w) >= 2),
      |hb AS (
      | SELECT doc_id, lang,
      |  list_reduce(list_transform(string_split(f, ''), c -> CAST(ascii(c) AS BIGINT)),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) % 1024 AS b
      | FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) WHERE f != ''),
      |raw AS (SELECT b, count(*) AS c_r FROM hb GROUP BY b),
      |tgt AS (SELECT b, count(*) AS c_t FROM hb WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT (SELECT count(*) FROM hb) AS r_tot,
      |        (SELECT count(*) FROM hb WHERE lang = 'en') AS t_tot),
      |cost AS (
      | SELECT raw.b,
      |  CAST(round(ln((COALESCE(tgt.c_t, 0) + 1.0) / (tot.t_tot + 1024)) * 1000000) AS BIGINT)
      |  - CAST(round(ln((raw.c_r + 1.0) / (tot.r_tot + 1024)) * 1000000) AS BIGINT) AS c
      | FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot)
      |SELECT hb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
      | CAST(sum(cost.c) AS BIGINT) AS logw_micronats
      |FROM hb JOIN cost USING (b) GROUP BY hb.doc_id""".stripMargin

  private val baseOracleSql: Map[String, String] = Map(
    "s1_full_scan" -> "SELECT * FROM lineitem",
    "s2_user_query" ->
      "SELECT * FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0) as user_sql_query WHERE 1=1",
    "f1_partition_daily" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-11-05' AND l_shipdate < TIMESTAMP '1997-11-06'",
    "f1_partition_monthly" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-11-01' AND l_shipdate < TIMESTAMP '1997-12-01'",
    "f1_partition_hourly" ->
      "SELECT event_id, user_id, event_type, ts FROM events WHERE ts >= TIMESTAMP '2024-01-01 06:00:00' AND ts < TIMESTAMP '2024-01-01 07:00:00'",
    "x1_range_split_union" -> "SELECT * FROM lineitem",
    "l1_limit_topk" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "s4_minmax_bounds" ->
      "SELECT MIN(l_orderkey) AS min_s, MAX(l_orderkey) AS max_s FROM lineitem",
    "p4_type_projection" ->
      "SELECT l_orderkey, l_linenumber, CAST(epoch_ms(l_shipdate) AS BIGINT) AS ship_ms, CAST(l_linenumber AS BIGINT) AS line_long, l_returnflag = 'R' AS is_return FROM lineitem",
    "a2_count" -> "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_agg" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "w1_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    // identical ground truth as w1 — the heap aggregate must reproduce the
    // window-function ranks exactly (score desc, id asc tiebreak)
    "q_grouped_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "set_except" ->
      "SELECT o_custkey FROM orders EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    "q_full_outer" ->
      """WITH c AS (
        | SELECT c_nationkey AS nk_c, CAST(count(*) AS BIGINT) AS n_rich_cust
        | FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey),
        |s AS (
        | SELECT s_nationkey AS nk_s, CAST(count(*) AS BIGINT) AS n_supp
        | FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        | coalesce(n_rich_cust, 0) AS n_rich_cust,
        | coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        | SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_centi,
        |  CAST(count(*) AS BIGINT) AS n_rows
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty_centi' AS metric, qty_centi AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM w""".stripMargin,
    "set_union" ->
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0",
    "set_intersect_all" ->
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "set_except_all" ->
      "SELECT o_custkey FROM orders EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    "events_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | CAST(count(*) AS BIGINT) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    // native session_window semantics: merge while gap <= 30 min (probed:
    // an event exactly gap-after MERGES), session_end = last event + gap
    "events_session_window" ->
      """WITH x AS (
        | SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y)
        |SELECT user_id,
        | min(ts) AS session_start,
        | max(ts) + INTERVAL 30 MINUTE AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(list_sum(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), p -> p != ''),
        |   p -> CAST(ceil(len(p) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est,
        | CAST(len(text) AS BIGINT) AS n_chars_measured
        |FROM documents""".stripMargin,
    "text_token_budget" ->
      """WITH q AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        |  CAST(len(text) AS BIGINT) AS n_chars
        | FROM documents WHERE len(text) > 0),
        |c AS (
        | SELECT *, n_alpha * 1000 // n_chars AS quality_key,
        |  sum(n_tokens) OVER (ORDER BY n_alpha * 1000 // n_chars DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM q)
        |SELECT doc_id, n_tokens, n_alpha, n_chars, quality_key
        |FROM c WHERE cum <= 20000""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | CAST(len(text) AS BIGINT) AS n_chars,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |   t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS BIGINT) AS n_stopwords,
        | CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        | CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |   t -> list_contains(['the','a','an','and','or','of','to','in','is','it','on','for','with','as','at'], lower(t)))) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE) / len(text) AS alpha_ratio,
        | CAST(len(text) - (len(regexp_split_to_array(trim(text), '\s+')) - 1) AS DOUBLE)
        |   / len(regexp_split_to_array(trim(text), '\s+')) AS mean_word_len
        |FROM documents""".stripMargin,
    "text_gopher_rules" -> GopherOracle,
    // the composed chain: gopher keep -> exact dedup (min-id per text) ->
    // langid -> per-language rollup; every stage shares its standalone
    // row's SQL so composition == composition of the pieces
    "pipeline_c4" ->
      s"""WITH g AS ($GopherOracle),
        |k AS (
        | SELECT d.doc_id, d.text FROM documents d
        | JOIN g ON d.doc_id = g.doc_id WHERE g.keep),
        |c AS (SELECT min(doc_id) AS doc_id, text FROM k GROUP BY text),
        |l AS (
        | SELECT doc_id, text,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS n_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b')) AS BIGINT) AS n_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|una)\b')) AS BIGINT) AS n_es,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|est|une|dans)\b')) AS BIGINT) AS n_fr
        | FROM c)
        |SELECT CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
        |            WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
        |            WHEN n_es >= n_fr THEN 'es'
        |            ELSE 'fr' END AS lang_pred,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        |FROM l GROUP BY 1""".stripMargin,
    // per-source accounting: counts, token share and alpha ratio in
    // integer permille, gopher keep counts — the provenance dashboard
    "text_source_stats" ->
      s"""WITH g AS ($GopherOracle),
        |j AS (
        | SELECT d.source, d.text, g.n_words, g.keep,
        |  CAST(len(regexp_extract_all(d.text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        |  CAST(len(d.text) AS BIGINT) AS n_chars
        | FROM documents d JOIN g ON d.doc_id = g.doc_id),
        |s AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(n_alpha) AS BIGINT) AS sum_alpha,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        | FROM j GROUP BY source),
        |t AS (SELECT sum(n_tokens) AS corpus_tokens FROM s)
        |SELECT source, n_docs, n_tokens, n_kept,
        | CAST(n_tokens * 1000 // corpus_tokens AS BIGINT) AS token_share_permille,
        | CAST(sum_alpha * 1000 // sum_chars AS BIGINT) AS alpha_permille
        |FROM s CROSS JOIN t""".stripMargin,
    "text_langid" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS n_en,
        | CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b')) AS BIGINT) AS n_de,
        | CAST(len(regexp_extract_all(lower(text), '\b(el|la|los|que|es|una)\b')) AS BIGINT) AS n_es,
        | CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|est|une|dans)\b')) AS BIGINT) AS n_fr,
        | CASE WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
        |      WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
        |      WHEN n_es >= n_fr THEN 'es'
        |      ELSE 'fr' END AS lang_pred
        |FROM documents""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |   (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31,
        | list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |   (acc, x) -> (acc * 37 + x) % 998244353) AS fp37,
        | list_min(list_transform(range(1, greatest(len(text) - 4, 1) + 1),
        |   i -> list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 5), ''), c -> CAST(ascii(c) AS BIGINT)),
        |     (acc, x) -> (acc * 31 + x) % 1000000007))) AS fp_min5gram
        |FROM documents""".stripMargin,
    "sample_split" ->
      """SELECT doc_id, lang, bucket,
        | CASE WHEN bucket < 10 THEN 'test' WHEN bucket < 20 THEN 'valid' ELSE 'train' END AS split,
        | bucket % 5 = 0 AS in_stratified_20pct
        |FROM (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 41 + x) % 999999937) % 100 AS bucket
        | FROM documents)""".stripMargin,
    "text_pii" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        | CAST(len(regexp_extract_all(text, '\b[0-9]+\b')) AS BIGINT) AS n_number_tokens,
        | CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+\b')) AS BIGINT) AS n_capitalized,
        | regexp_replace(text, 'spark', '[TERM]', 'g') AS redacted,
        | len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) = 0 AS pii_clean
        |FROM documents""".stripMargin,
    "dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY text",
    "dedup_exact_hash" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies, fp31, fp37 FROM (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37
        | FROM documents)
        |GROUP BY fp31, fp37""".stripMargin,
    "corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        | SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        | FROM v1 WHERE doc_id % 17 != 0
        | UNION ALL
        | SELECT doc_id + 500000, text FROM v1 WHERE doc_id % 19 = 0),
        |f1 AS (SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31_old,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37_old
        | FROM v1),
        |f2 AS (SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31_new,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37_new
        | FROM v2)
        |SELECT doc_id, status, fp31_old, fp31_new FROM (
        | SELECT doc_id,
        |  CASE WHEN fp31_new IS NULL THEN 'removed'
        |       WHEN fp31_old IS NULL THEN 'added'
        |       WHEN fp31_old = fp31_new AND fp37_old = fp37_new THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  fp31_old, fp31_new
        | FROM f1 FULL JOIN f2 USING (doc_id))
        |WHERE status != 'unchanged'""".stripMargin,
    "dedup_minhash" -> JaccardPairsOracle,
    "dedup_jaccard_exact" -> JaccardPairsOracle,
    // exact ground truth for the incremental path: every new×corpus pair
    "dedup_incremental" -> IncrementalDedupOracle,
    // the store round trip must be lossless: the SAME ground-truth value,
    // bound once so the two oracles can never drift apart
    "dedup_incremental_store" -> IncrementalDedupOracle,
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        | WHERE jaccard >= 0.6),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    "dedup_canonical" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        | WHERE jaccard >= 0.6),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |reps AS (
        | SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS group_size
        | FROM clusters GROUP BY cluster_id)
        |SELECT doc_id, group_size FROM reps
        |UNION ALL
        |SELECT d.doc_id, CAST(1 AS BIGINT) AS group_size
        |FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL""".stripMargin,
    "dedup_canonical_best" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        | WHERE jaccard >= 0.6),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |q AS (
        | SELECT doc_id,
        |  CASE WHEN len(text) = 0 THEN CAST(-1 AS BIGINT)
        |   ELSE CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 1000 // len(text)
        |  END AS quality_key
        | FROM documents),
        |ranked AS (
        | SELECT c.cluster_id, c.doc_id, q.quality_key,
        |  row_number() OVER (PARTITION BY c.cluster_id
        |    ORDER BY q.quality_key DESC, c.doc_id ASC) AS rn,
        |  count(*) OVER (PARTITION BY c.cluster_id) AS group_size
        | FROM clusters c JOIN q USING (doc_id))
        |SELECT doc_id, quality_key, CAST(group_size AS BIGINT) AS group_size
        |FROM ranked WHERE rn = 1
        |UNION ALL
        |SELECT q.doc_id, q.quality_key, CAST(1 AS BIGINT) AS group_size
        |FROM q LEFT JOIN clusters c ON q.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL""".stripMargin,
    "text_decontaminate" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
        | COALESCE(h.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    "text_contamination_score" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
        | CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
        | CAST(COALESCE(h.n, 0) AS DOUBLE) / len(g.grams) AS contamination_frac
        |FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
        |WHERE g.doc_id >= 20""".stripMargin,
    // the booleans are the gate (recall 1.0, FPR under budget); the exact
    // column is the contaminated-doc count the Bloom superset must cover
    "text_decontaminate_bloom_check" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 6),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]
        |      || ' ' || w[CAST(i+3 AS INTEGER)] || ' ' || w[CAST(i+4 AS INTEGER)] || ' ' || w[CAST(i+5 AS INTEGER)]
        |      || ' ' || w[CAST(i+6 AS INTEGER)] || ' ' || w[CAST(i+7 AS INTEGER)])) AS grams
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 8),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 20),
        |hits AS (
        | SELECT t.doc_id, count(*) AS n
        | FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 20) t
        | JOIN eg USING (gram) GROUP BY t.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_contaminated,
        | TRUE AS no_false_negatives, TRUE AS fp_frac_bounded
        |FROM hits WHERE n > 0""".stripMargin,
    // bigram LM cross-entropy: identical tokenization, counts, smoothing and
    // micro-nat quantization — the exact-string form of the engine's
    // fingerprinted plan, so a fingerprint collision would hash-mismatch
    "text_lm_xent" -> LmXentOracle,
    "text_lm_xent_pruned" -> LmXentPrunedOracle,
    // shares LmXentOracle verbatim as its CTE so the scores cannot drift;
    // value-atomic terciles: b_k = smallest xent whose cumulative count
    // (RANGE frame — peers included) reaches k*n/3
    // r10 continuation: per-source calibrated keep — shares LmXentOracle
    // verbatim; value-atomic milli-nat threshold via integer cross-multiply
    "text_quality_calibrated" ->
      s"""WITH ppl AS ($LmXentOracle),
        |j AS (
        | SELECT p.doc_id, d.source, p.xent_micronats, p.xent_micronats // 1000 AS xent_milli
        | FROM ppl p JOIN documents d ON d.doc_id = p.doc_id),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1),
        |h AS (SELECT source, xent_milli, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
        |cc AS (
        | SELECT source, xent_milli,
        |  sum(c) OVER (PARTITION BY source ORDER BY xent_milli ASC) AS cum
        | FROM h),
        |thr AS (
        | SELECT cc.source, min(xent_milli) AS thr_milli
        | FROM cc JOIN n ON n.source = cc.source
        | WHERE cum * 1000 >= n.n * 300
        | GROUP BY 1)
        |SELECT j.doc_id, j.source, j.xent_micronats, j.xent_milli, thr.thr_milli,
        | j.xent_milli <= thr.thr_milli AS kept
        |FROM j JOIN thr ON thr.source = j.source""".stripMargin,
    "pipeline_ppl_buckets" ->
      s"""WITH ppl AS ($LmXentOracle),
        |c AS (
        | SELECT *, count(*) OVER (ORDER BY xent_micronats) AS cum,
        |  count(*) OVER () AS n
        | FROM ppl),
        |b AS (
        | SELECT min(CASE WHEN cum * 3 >= n THEN xent_micronats END) AS b1,
        |  min(CASE WHEN cum * 3 >= n * 2 THEN xent_micronats END) AS b2
        | FROM c)
        |SELECT doc_id, n_bigrams, xent_micronats,
        | CASE WHEN xent_micronats <= b1 THEN 'head'
        |      WHEN xent_micronats <= b2 THEN 'middle'
        |      ELSE 'tail' END AS ppl_bucket
        |FROM ppl CROSS JOIN b""".stripMargin,
    // integer delta rollup of the two scorers above — all-integer, so the
    // monotone invariant (violations = 0) and the permille bound are exact
    "text_lm_xent_pruned_check" ->
      s"""WITH e AS ($LmXentOracle), p AS ($LmXentPrunedOracle)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN p.xent_micronats < e.xent_micronats THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_violations,
        | CAST(sum(e.xent_micronats) AS BIGINT) AS sum_exact,
        | CAST(sum(p.xent_micronats - e.xent_micronats) AS BIGINT) AS sum_delta,
        | sum(p.xent_micronats - e.xent_micronats) * 1000 <= sum(e.xent_micronats) * 450
        |  AS delta_within_bound
        |FROM e JOIN p USING (doc_id)""".stripMargin,
    // mirrors dsirWeights bit-for-bit: same poly-hash buckets, same
    // per-bucket micro-nat quantization of both lns before the difference
    "text_dsir" -> DsirOracle,
    // the merge table itself has no single-statement SQL form (iterative
    // argmax); the gate pins 16 productive merges + reference equality
    "text_bpe_check" ->
      """SELECT CAST(16 AS BIGINT) AS n_merges,
        | TRUE AS merge_table_matches_reference""".stripMargin,
    // encode itself has no single-statement SQL form (iterative rank-order
    // merging); the gate pins the lossless round trip over every word
    "text_bpe_encode_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(0 AS BIGINT) AS n_roundtrip_mismatches,
        | TRUE AS encoder_lossless
        |FROM documents""".stripMargin,
    // FFD assignment itself has no SQL form; n_docs/n_oversize are
    // independently derivable and the two invariants are pinned TRUE
    "text_pack_bins_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 1024
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
        | TRUE AS zero_overflow_bins,
        | TRUE AS bins_within_2x
        |FROM documents""".stripMargin,
    // the composed selection: exact top-N docs by those weights (ties to
    // lower doc_id — the heap's order), rolled up per lang
    "pipeline_dsir" ->
      s"""WITH w AS ($DsirOracle),
        |sel AS (SELECT doc_id FROM w ORDER BY logw_micronats DESC, doc_id LIMIT 200)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_selected,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents JOIN sel USING (doc_id) GROUP BY lang""".stripMargin,
    "text_pack_sequences" ->
      """SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard, n_tokens, start_offset,
        | start_offset // 1024 AS bin_id
        |FROM (
        | SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        | FROM (SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents))""".stripMargin,
    "text_domain_mix" -> DomainMixOracle,
    "text_domain_mix_scale" -> s"SELECT doc_id, lang, kept FROM ($DomainMixOracle)",
    "pipeline_summary" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        | WHERE jaccard >= 0.6),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |survivors AS (
        | SELECT min(doc_id) AS doc_id FROM clusters GROUP BY cluster_id
        | UNION ALL
        | SELECT d.doc_id FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        | WHERE c.doc_id IS NULL),
        |q AS (
        | SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents
        | WHERE 2 * len(regexp_extract_all(text, '[a-zA-Z]')) >= len(text))
        |SELECT q.lang, CAST(count(*) AS BIGINT) AS n_kept,
        | CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
        | (CAST(sum(q.n_tokens) AS BIGINT) + 1023) // 1024 AS n_bins
        |FROM q JOIN survivors s ON q.doc_id = s.doc_id
        |GROUP BY q.lang""".stripMargin,
    // round-4 composition: boilerplate-intact docs -> hashing-trick
    // vectors -> per-lang L1/dimension rollup
    "pipeline_vectorize" ->
      """WITH base AS (
        | SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
        |  CAST(ceil(len(string_split(coalesce(text, ''), ' ')) / 10.0) AS BIGINT) AS n_segments
        | FROM documents),
        |segs AS (
        | SELECT doc_id,
        |  array_to_string(list_slice(w, CAST(k * 10 + 1 AS BIGINT), CAST(k * 10 + 10 AS BIGINT)), ' ') AS seg
        | FROM (SELECT doc_id, w, unnest(range(n_segments)) AS k FROM base)),
        |boiler AS (
        | SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
        |intact AS (
        | SELECT doc_id FROM base WHERE doc_id NOT IN (
        |  SELECT DISTINCT doc_id FROM segs WHERE seg IN (SELECT seg FROM boiler))),
        |tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
        | FROM tok WHERE token != ''),
        |emb AS (
        | SELECT doc_id, hv % 16 AS dim_idx,
        |  CAST(sum(CASE WHEN (hv // 16) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        | FROM h GROUP BY doc_id, hv % 16),
        |l1 AS (
        | SELECT doc_id, CAST(sum(abs(weight)) AS BIGINT) AS l1,
        |  CAST(count(*) AS BIGINT) AS n_dims
        | FROM emb GROUP BY doc_id)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(coalesce(l1.l1, 0)) AS BIGINT) AS total_l1,
        | CAST(sum(coalesce(l1.n_dims, 0)) AS BIGINT) AS total_dims
        |FROM documents d JOIN intact USING (doc_id) LEFT JOIN l1 USING (doc_id)
        |GROUP BY d.lang""".stripMargin,
    "sketch_distinct_check" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "sketch_freq_merge_check" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n,
        | TRUE AS estimate_exact
        |FROM events GROUP BY event_type""".stripMargin,
    "sketch_hll_merge_check" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | TRUE AS parts_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "sketch_kll_merge_check" ->
      """WITH r AS (
        | SELECT l_returnflag, l_quantity,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN l_quantity END) AS lo,
        | max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN l_quantity END) AS hi,
        | TRUE AS q50_within_rank_bounds
        |FROM r GROUP BY l_returnflag""".stripMargin,
    "sketch_theta_merge_check" ->
      """SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        | TRUE AS users_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,
    "sketch_freq_check" ->
      """WITH tok AS (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |hh AS (SELECT 'hh_' || CAST(i % 4 AS VARCHAR) AS token FROM range(16000) t(i)),
        |allt AS (SELECT token FROM tok UNION ALL SELECT token FROM hh),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM allt),
        |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS true_cnt
        |          FROM allt GROUP BY token)
        |SELECT e.token, e.true_cnt, n.n AS stream_len,
        | TRUE AS present_in_sketch, TRUE AS bounds_hold,
        | TRUE AS error_within_threshold
        |FROM exact e CROSS JOIN n WHERE e.true_cnt * 16 > n.n""".stripMargin,
    "sketch_theta_check" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |cnt AS (SELECT event_type, count(*) AS n FROM du GROUP BY event_type),
        |ex AS (
        | SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS exact_both
        | FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
        | GROUP BY x.event_type, y.event_type)
        |SELECT ex.type_a, ex.type_b,
        | CAST(ex.exact_both AS BIGINT) AS exact_both,
        | CAST(ca.n + cb.n - ex.exact_both AS BIGINT) AS exact_either,
        | TRUE AS both_within_5pct, TRUE AS either_within_5pct
        |FROM ex
        | JOIN cnt ca ON ca.event_type = ex.type_a
        | JOIN cnt cb ON cb.event_type = ex.type_b""".stripMargin,
    "sketch_quantile_check" ->
      """WITH r AS (
        | SELECT l_returnflag, l_quantity,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN l_quantity END) AS lo,
        | max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN l_quantity END) AS hi,
        | TRUE AS q50_within_rank_bounds
        |FROM r GROUP BY l_returnflag""".stripMargin,
    "text_repetition" ->
      """SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
        | CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
        | CASE WHEN len(g) > 0
        |   THEN CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
        |   ELSE 0.0 END AS dup_ratio
        |FROM (
        | SELECT doc_id, CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])
        |  ELSE CAST([] AS VARCHAR[]) END AS g
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents))""".stripMargin,
    // C4-style line dedup: "lines" are aligned 10-word segments; a segment
    // in >= 2 distinct docs is boilerplate and removed everywhere
    "text_line_dedup" ->
      """WITH base AS (
        | SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
        |  CAST(ceil(len(string_split(coalesce(text, ''), ' ')) / 10.0) AS BIGINT) AS n_segments
        | FROM documents),
        |segs AS (
        | SELECT doc_id, CAST(k AS BIGINT) AS pos,
        |  array_to_string(list_slice(w, CAST(k * 10 + 1 AS BIGINT), CAST(k * 10 + 10 AS BIGINT)), ' ') AS seg
        | FROM (SELECT doc_id, w, unnest(range(n_segments)) AS k FROM base)),
        |boiler AS (
        | SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (
        | SELECT segs.doc_id, segs.pos, segs.seg FROM segs ANTI JOIN boiler USING (seg)),
        |agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(seg, ' ' ORDER BY pos) AS clean_text
        | FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, b.n_segments,
        | COALESCE(a.n_kept, 0) AS n_kept,
        | b.n_segments - COALESCE(a.n_kept, 0) AS n_removed,
        | md5(COALESCE(a.clean_text, '')) AS clean_md5
        |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "text_substring_dup" ->
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 25 + 2),
        |   i -> array_to_string(w[CAST(i AS INTEGER):CAST(i + 24 AS INTEGER)], ' ')))) AS gram
        | FROM w WHERE len(w) >= 25),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_windows,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        | CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |FROM g JOIN df USING (gram) GROUP BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH starts AS (
        | SELECT doc_id, text,
        |  unnest(range(1, greatest(len(text), 1) + 1, 150)) AS i
        | FROM documents)
        |SELECT doc_id,
        | CAST((i - 1) // 150 AS BIGINT) AS chunk_id,
        | CAST(i AS BIGINT) AS chunk_start,
        | substr(text, CAST(i AS INT), 200) AS chunk_text,
        | CAST(len(substr(text, CAST(i AS INT), 200)) AS BIGINT) AS chunk_len
        |FROM starts""".stripMargin,
    // the hashing trick is exact integer arithmetic — reproducible in SQL
    "text_hash_embedding" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(token, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS hv
        | FROM tok WHERE token != '')
        |SELECT doc_id, hv % 16 AS dim_idx,
        | CAST(sum(CASE WHEN (hv // 16) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        |FROM h GROUP BY doc_id, hv % 16""".stripMargin,
    "q_window_lead_lag" ->
      """SELECT user_id, event_id,
        | epoch_us(ts) - lag(epoch_us(ts), 1)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
        | lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin,
    // RANGE frame on epoch-µs so both engines use the identical value
    // offset (an INTERVAL frame on a ns timestamp would differ in unit)
    "q_range_frame" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        | RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_ntile" -> NtileOracle,
    "q_rank_family" -> RankFamilyOracle,
    "q_rank_family_skew" -> RankFamilyOracle, // histogram twin: oracle shared verbatim
    "q_ntile_skew" -> NtileOracle,
    "dedup_simhash" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]))) AS shingle
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824
        |  + (list_reduce(list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824) AS hh
        | FROM sh),
        |bits AS (
        | SELECT doc_id, j, sum(CASE WHEN (hh >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        | FROM h, range(60) r(j) GROUP BY doc_id, j)
        |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    "dedup_semantic_clusters" ->
      """WITH RECURSIVE e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |     i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |     (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        | WHERE cosine >= 0.4),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id)
        |SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    "dedup_semantic" ->
      """WITH RECURSIVE e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |     i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |     (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        | WHERE cosine >= 0.4),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id),
        |clusters AS (SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |reps AS (
        | SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS group_size
        | FROM clusters GROUP BY cluster_id)
        |SELECT vec_id, group_size FROM reps
        |UNION ALL
        |SELECT vec_id, CAST(1 AS BIGINT) FROM embeddings
        |ANTI JOIN clusters USING (vec_id)""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings)
        |SELECT * FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |    i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        | FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4""".stripMargin,
    // r10 continuation: ratio-margin mining — candidate pairs are the
    // union of forward/backward k-NN; neighborhood sums fold top-k
    // cosines in (c DESC, id ASC) rank order, matching graft_topk's
    // emission order exactly; ranks resolve on the micro-rounded margin
    "ann_margin_mining" ->
      """WITH n AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b)) AS nm
        | FROM embeddings),
        |x AS (SELECT vec_id AS xi, embedding AS xe, nm AS xn FROM n WHERE vec_id % 10 = 0),
        |y AS (SELECT vec_id AS yi, embedding AS ye, nm AS yn FROM n WHERE vec_id % 10 != 0),
        |s AS (
        | SELECT xi, yi,
        |  list_reduce(list_transform(range(1, len(xe) + 1),
        |    i -> CAST(xe[CAST(i AS INTEGER)] AS DOUBLE) * CAST(ye[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (a, b) -> a + b) / (xn * yn) AS c
        | FROM x CROSS JOIN y),
        |rx AS (SELECT xi, yi, c, row_number() OVER (PARTITION BY xi ORDER BY c DESC, yi ASC) AS rkx FROM s),
        |ry AS (SELECT xi, yi, c, row_number() OVER (PARTITION BY yi ORDER BY c DESC, xi ASC) AS rky FROM s),
        |dx AS (SELECT xi, list_reduce(list(c ORDER BY rkx), (a, b) -> a + b) AS dx FROM rx WHERE rkx <= 4 GROUP BY xi),
        |dy AS (SELECT yi, list_reduce(list(c ORDER BY rky), (a, b) -> a + b) AS dy FROM ry WHERE rky <= 4 GROUP BY yi),
        |cand AS (
        | SELECT xi, yi FROM rx WHERE rkx <= 4
        | UNION
        | SELECT xi, yi FROM ry WHERE rky <= 4),
        |m AS (
        | SELECT cand.xi, cand.yi,
        |  CAST(round(1000000.0 * (8 * s.c) / (dx.dx + dy.dy)) AS BIGINT) AS margin_micro
        | FROM cand JOIN s ON s.xi = cand.xi AND s.yi = cand.yi
        | JOIN dx ON dx.xi = cand.xi JOIN dy ON dy.yi = cand.yi),
        |r2 AS (
        | SELECT *,
        |  row_number() OVER (PARTITION BY xi ORDER BY margin_micro DESC, yi ASC) AS rkx,
        |  row_number() OVER (PARTITION BY yi ORDER BY margin_micro DESC, xi ASC) AS rky
        | FROM m),
        |best AS (SELECT xi, yi, margin_micro FROM r2 WHERE rkx = 1),
        |besty AS (SELECT yi, xi AS bx FROM r2 WHERE rky = 1)
        |SELECT best.xi AS x_id, best.yi AS y_id, best.margin_micro,
        | besty.bx = best.xi AS is_mutual
        |FROM best JOIN besty ON besty.yi = best.yi""".stripMargin,
    "ann_topk" ->
      """WITH e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)
        |SELECT q_id, neighbor_id, rank FROM (
        | SELECT q_id, vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        | FROM s)
        |WHERE rank <= 10""".stripMargin,
    // the ann_topk ground truth with the semi-hard band filter applied
    // before ranking — the mining contract is exact, not approximate
    "ann_hard_negatives" ->
      """WITH e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)
        |SELECT q_id, neighbor_id, rank FROM (
        | SELECT q_id, vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        | FROM s WHERE cosine >= 0.1 AND cosine < 0.3)
        |WHERE rank <= 10""".stripMargin,
    "pipeline_shard_manifest" ->
      """WITH keyed AS (
        | SELECT doc_id, text,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) % 8 AS shard
        | FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        | CAST(sum(list_sum(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), p -> p != ''),
        |   p -> CAST(ceil(len(p) / 4.0) AS BIGINT)))) AS BIGINT) AS n_subwords_est,
        | CAST(sum(len(text)) AS BIGINT) AS n_chars
        |FROM keyed GROUP BY shard""".stripMargin,
    "sample_shuffle_shards" ->
      """WITH keyed AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS skey
        | FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS BIGINT) AS shard,
        | CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM keyed""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS payload_md5,
        | substr(text, 1, 1) AS head_char
        |FROM documents""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_F,
        | CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_percentile_disc" -> PercentileDiscOracle,
    "q_percentile_disc_skew" -> PercentileDiscOracle,
    "events_asof_purchase" -> AsofOracle,
    // row-for-row semantics of the native as-of exec: first purchase with
    // (ts, event_id) at-or-after the click's, per user, LEFT OUTER
    "events_asof_native" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
        | ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE""".stripMargin,
    "events_asof_native_backward" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts < c.ts OR (p.ts = c.ts AND p.event_id <= c.event_id))
        | ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) p ON TRUE""".stripMargin,
    // the at-or-after match must also land within the 1-hour tolerance
    "events_asof_tolerance" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
        |  AND p.ts <= c.ts + INTERVAL 1 HOUR
        | ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE""".stripMargin,
    "events_asof_purchase_skew" -> AsofOracle,
    // last-touch attribution: per purchase, the last click at-or-before by
    // (ts, event_id) of the same HOT-COLLAPSED user (user_id%16==0 -> -1),
    // mirroring the Spark side's deterministic skew synthesis
    "events_attribution_lasttouch" ->
      """WITH e AS (
        | SELECT event_id, ts, event_type,
        |  CASE WHEN user_id % 16 = 0 THEN -1 ELSE user_id END AS uid
        | FROM events)
        |SELECT p.event_id AS purchase_id, p.uid AS user_id, p.ts AS purchase_ts,
        | c.click_id, c.click_ts
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        | SELECT event_id AS click_id, ts AS click_ts FROM e c
        | WHERE c.event_type = 'click' AND c.uid = p.uid
        |  AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id <= p.event_id))
        | ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE""".stripMargin,
    "events_retention" ->
      """WITH w AS (
        | SELECT user_id, epoch_us(ts) // CAST(604800000000 AS BIGINT) AS week
        | FROM events),
        |pu AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
        |act AS (
        | SELECT pu.cohort_week, dw.week - pu.cohort_week AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active_users
        | FROM (SELECT DISTINCT user_id, week FROM w) dw JOIN pu USING (user_id)
        | GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.n_active_users,
        | c.n_active_users AS cohort_size
        |FROM act a JOIN act c
        | ON a.cohort_week = c.cohort_week AND c.week_offset = 0""".stripMargin,
    // the 3-step funnel replayed as two LATERAL first-at-or-after probes
    // with the exec's (ts, event_id) lexicographic rule
    "events_funnel3_native" ->
      """WITH fv AS (
        | SELECT user_id, ts AS view_ts, event_id AS view_id FROM (
        |  SELECT user_id, ts, event_id,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type = 'view') WHERE rn = 1),
        |c AS (
        | SELECT fv.*, cl.ts AS click_ts, cl.event_id AS click_id
        | FROM fv LEFT JOIN LATERAL (
        |  SELECT ts, event_id FROM events e
        |  WHERE e.user_id = fv.user_id AND e.event_type = 'click'
        |   AND (e.ts > fv.view_ts OR (e.ts = fv.view_ts AND e.event_id >= fv.view_id))
        |  ORDER BY e.ts, e.event_id LIMIT 1) cl ON TRUE),
        |p AS (
        | SELECT c.*, pu.ts AS purchase_ts
        | FROM c LEFT JOIN LATERAL (
        |  SELECT ts FROM events e
        |  WHERE c.click_ts IS NOT NULL AND e.user_id = c.user_id AND e.event_type = 'purchase'
        |   AND (e.ts > c.click_ts OR (e.ts = c.click_ts AND e.event_id >= c.click_id))
        |  ORDER BY e.ts, e.event_id LIMIT 1) pu ON TRUE)
        |SELECT user_id, view_ts, click_ts, purchase_ts,
        | purchase_ts IS NOT NULL AS completed,
        | CASE WHEN purchase_ts IS NOT NULL
        |  THEN CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) END AS funnel_us
        |FROM p""".stripMargin,
    "q8_market_share" ->
      """WITH rev AS (
        | SELECT year(o.o_orderdate) AS o_year,
        |  CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
        |  sn.n_name AS sup_nation
        | FROM lineitem l
        | JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        | JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        | CAST(sum(CASE WHEN sup_nation = 'NATION_1' THEN rev ELSE 0 END) AS BIGINT) AS nation_rev,
        | CAST(sum(rev) AS BIGINT) AS total_rev,
        | CAST(sum(CASE WHEN sup_nation = 'NATION_1' THEN rev ELSE 0 END) * 1000
        |   // sum(rev) AS BIGINT) AS share_permille
        |FROM rev GROUP BY o_year""".stripMargin,
    "text_domain_shift" ->
      """WITH toks AS (
        | SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        | FROM documents WHERE len(text) > 0),
        |bs AS (
        | SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
        | FROM toks GROUP BY 1, 2),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
        |ts AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ts FROM bs GROUP BY 1),
        |terms AS (
        | SELECT bs.source, ts.ts,
        |  bs.cs * CAST(round(ln((bs.cs * CAST(t.t AS DOUBLE)) / (ts.ts * CAST(c.c AS DOUBLE))) * 1000000) AS BIGINT) AS term
        | FROM bs JOIN c USING (tok) JOIN ts USING (source) CROSS JOIN t)
        |SELECT source, CAST(max(ts) AS BIGINT) AS n_tokens,
        | count(*) AS n_terms,
        | CAST(sum(term) AS BIGINT) // CAST(max(ts) AS BIGINT) AS kl_micro
        |FROM terms GROUP BY source""".stripMargin,
    "stats_trend" ->
      """WITH counts AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |o AS (SELECT min(epoch_us(hour)) AS h0 FROM counts),
        |pts AS (
        | SELECT event_type, (epoch_us(hour) - h0) // 3600000000 AS x, y
        | FROM counts, o),
        |agg AS (
        | SELECT event_type, count(*) AS n_pts,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sx2
        | FROM pts GROUP BY event_type)
        |SELECT event_type, n_pts, sx, sy,
        | (1000 * (n_pts * sxy - sx * sy)) // (n_pts * sx2 - sx * sx) AS slope_milli
        |FROM agg""".stripMargin,
    "events_top_paths" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN prev_ts IS NULL
        |       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts, event_id, event_type,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y),
        |paths AS (
        | SELECT array_to_string(
        |   list_transform(
        |     (list({'et': event_type} ORDER BY ts, event_id))[1:8],
        |     e -> e.et), '>') AS path,
        |  count(*) > 8 AS truncated
        | FROM z GROUP BY user_id, session_seq)
        |SELECT path, truncated, count(*) AS n_sessions
        |FROM paths GROUP BY path, truncated
        |ORDER BY n_sessions DESC, path, truncated LIMIT 20""".stripMargin,
    "events_range_join_native" ->
      """SELECT a.event_id,
        | CAST(count(b.event_id) AS BIGINT) AS n_prior_30min
        |FROM events a LEFT JOIN events b
        | ON a.user_id = b.user_id
        | AND epoch_us(b.ts) >= epoch_us(a.ts) - 1800000000
        | AND epoch_us(b.ts) <= epoch_us(a.ts) - 1
        |GROUP BY a.event_id""".stripMargin,
    "events_concurrency" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y),
        |sess AS (
        | SELECT min(ts) AS session_start, max(ts) AS session_end
        | FROM z GROUP BY user_id, session_seq),
        |deltas AS (
        | SELECT session_start AS ts, 1 AS delta FROM sess
        | UNION ALL
        | SELECT session_end AS ts, -1 AS delta FROM sess),
        |runs AS (
        | SELECT ts, sum(delta) OVER (ORDER BY ts, delta DESC ROWS UNBOUNDED PRECEDING) AS run
        | FROM deltas)
        |SELECT date_trunc('hour', ts) AS hour,
        | CAST(max(run) AS BIGINT) AS peak_concurrency
        |FROM runs GROUP BY 1""".stripMargin,
    "events_twap" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        | FROM events),
        |a AS (
        | SELECT user_id,
        |  CAST(sum(CASE WHEN next_ts IS NOT NULL
        |   THEN cents * (epoch_us(next_ts) - epoch_us(ts)) ELSE 0 END) AS BIGINT) AS weighted,
        |  CAST(sum(COALESCE(epoch_us(next_ts) - epoch_us(ts), 0)) AS BIGINT) AS span_us,
        |  count(*) AS n_events
        | FROM x GROUP BY user_id)
        |SELECT user_id, weighted // span_us AS twap_cents, span_us, n_events
        |FROM a WHERE span_us > 0""".stripMargin,
    "events_attribution_linear" ->
      """WITH p AS (
        | SELECT event_id AS purchase_id, user_id, ts AS pts
        | FROM events WHERE event_type = 'purchase'),
        |c AS (
        | SELECT event_id AS click_id, user_id AS cuser, ts AS cts
        | FROM events WHERE event_type = 'click'),
        |pairs AS (
        | SELECT purchase_id, cuser, click_id, cts
        | FROM p JOIN c ON p.user_id = c.cuser
        |  AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 7 DAY),
        |w AS (
        | SELECT *,
        |  count(*) OVER (PARTITION BY purchase_id) AS n,
        |  row_number() OVER (PARTITION BY purchase_id ORDER BY cts, click_id) AS rk
        | FROM pairs),
        |credits AS (
        | SELECT cuser AS user_id, click_id,
        |  CASE WHEN rk = n THEN 1000000 - (1000000 // n) * (n - 1)
        |   ELSE 1000000 // n END AS credit_micro
        | FROM w)
        |SELECT user_id, click_id, CAST(sum(credit_micro) AS BIGINT) AS credit_micro,
        | count(*) AS n_purchases
        |FROM credits GROUP BY user_id, click_id""".stripMargin,
    "events_gapfill" ->
      """WITH counts AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |b AS (
        | SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        | FROM events),
        |grid AS (
        | SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
        | FROM (SELECT DISTINCT event_type FROM counts) t, b),
        |g AS (
        | SELECT grid.event_type, grid.hour, counts.n
        | FROM grid LEFT JOIN counts
        |  ON grid.event_type = counts.event_type AND grid.hour = counts.hour),
        |wnd AS (
        | SELECT event_type, hour, n,
        |  last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_n,
        |  last_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS)
        |   OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        |  first_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_n,
        |  first_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS)
        |   OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
        | FROM g)
        |SELECT event_type, hour, n AS n_raw,
        | CAST(CASE WHEN n IS NOT NULL THEN n
        |  WHEN prev_n IS NULL THEN next_n
        |  WHEN next_n IS NULL THEN prev_n
        |  ELSE (prev_n * (((epoch_us(next_h) - epoch_us(prev_h)) // 3600000000)
        |          - ((epoch_us(hour) - epoch_us(prev_h)) // 3600000000))
        |      + next_n * ((epoch_us(hour) - epoch_us(prev_h)) // 3600000000))
        |     // ((epoch_us(next_h) - epoch_us(prev_h)) // 3600000000)
        |  END AS BIGINT) AS n_filled,
        | n IS NULL AS filled
        |FROM wnd""".stripMargin,
    "text_bm25" ->
      """WITH d AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE len(text) > 0),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM d),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS tt FROM dl),
        |tf AS (
        | SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        | FROM toks WHERE tok IN ('spark', 'table', 'query') GROUP BY 1, 2),
        |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (
        | SELECT tf.doc_id,
        |  (CAST(round(ln(1.0 + (2 * nd - 2 * df + 1.0) / (2 * df + 1.0)) * 1000000) AS BIGINT)
        |    * 44 * tf * tt) // (20 * tf * tt + 6 * tt + 18 * dl.dl * nd) AS term_score_micro
        | FROM tf JOIN dfc USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus)
        |SELECT doc_id, CAST(sum(term_score_micro) AS BIGINT) AS bm25_micro,
        | count(*) AS n_query_terms
        |FROM s GROUP BY doc_id""".stripMargin,
    "events_compact_latest" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        | event_type AS current_type, CAST(n AS BIGINT) AS n_events
        |FROM (
        | SELECT *, count(*) OVER (PARTITION BY user_id) AS n,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1""".stripMargin,
    "link_fuzzy_names" ->
      """SELECT a.c_custkey AS key_a, a.c_name AS name_a,
        | b.c_custkey AS key_b, b.c_name AS name_b,
        | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        | ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY p_brand, p_size""".stripMargin,
    "orders_lorenz" ->
      """WITH per AS (
        | SELECT o_custkey AS custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |dec AS (
        | SELECT *, CAST(ntile(10) OVER (ORDER BY cents DESC, custkey) AS BIGINT) AS decile
        | FROM per),
        |byd AS (
        | SELECT decile, count(*) AS n_customers, CAST(sum(cents) AS BIGINT) AS cents
        | FROM dec GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM byd)
        |SELECT a.decile, CAST(a.n_customers AS BIGINT) AS n_customers,
        | a.cents AS decile_cents,
        | CAST(sum(b.cents) AS BIGINT) * 1000 // t.total AS cum_share_permille
        |FROM byd a JOIN byd b ON b.decile <= a.decile CROSS JOIN t
        |GROUP BY a.decile, a.n_customers, a.cents, t.total""".stripMargin,
    "customer_rfm" ->
      """WITH per AS (
        | SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
        |  count(*) AS frequency,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        | FROM orders GROUP BY 1),
        |sc AS (
        | SELECT *,
        |  CAST(ntile(5) OVER (ORDER BY last_order, custkey) AS BIGINT) AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary_cents, custkey) AS BIGINT) AS m_score
        | FROM per)
        |SELECT custkey, last_order, CAST(frequency AS BIGINT) AS frequency,
        | monetary_cents, r_score, f_score, m_score,
        | r_score * 100 + f_score * 10 + m_score AS rfm
        |FROM sc""".stripMargin,
    "dq_freshness" ->
      """SELECT event_type, max(ts) AS latest_ts,
        | count(*) AS n_rows,
        | (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(max(ts))) // 3600000000 AS lag_hours,
        | (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(max(ts))) // 3600000000 <= 24 AS fresh
        |FROM events GROUP BY event_type""".stripMargin,
    "dq_kanonymity" ->
      """WITH g AS (
        | SELECT c_nationkey, c_mktsegment, count(*) AS c
        | FROM customer GROUP BY 1, 2)
        |SELECT CAST(5 AS BIGINT) AS k,
        | count(*) AS n_groups,
        | CAST(sum(c) AS BIGINT) AS n_rows,
        | CAST(min(c) AS BIGINT) AS k_anonymity,
        | CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) AS rows_below_k,
        | CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) * 1000 // CAST(sum(c) AS BIGINT) AS permille_below
        |FROM g""".stripMargin,
    "dq_battery" ->
      """WITH b AS (
        | SELECT count(*) AS n,
        |  sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS nn,
        |  sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS dom,
        |  sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END) AS rng
        | FROM lineitem),
        |u AS (
        | SELECT sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS matched, sum(c) AS total
        | FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |r AS (
        | SELECT count(*) AS matched FROM lineitem
        | WHERE l_orderkey IN (SELECT o_orderkey FROM orders)),
        |rows_out AS (
        | SELECT 'not_null:l_shipdate' AS check_name, nn AS matched, n AS total FROM b
        | UNION ALL
        | SELECT 'domain:l_returnflag', dom, n FROM b
        | UNION ALL
        | SELECT 'range:l_quantity:1..50', rng, n FROM b
        | UNION ALL
        | SELECT 'unique:l_orderkey+l_linenumber', matched, total FROM u
        | UNION ALL
        | SELECT 'ref:l_orderkey->orders', r.matched, b.n FROM r, b)
        |SELECT check_name, CAST(matched AS BIGINT) AS matched,
        | CAST(total AS BIGINT) AS total,
        | CAST(matched AS BIGINT) * 1000 // CAST(total AS BIGINT) AS metric_permille,
        | matched = total AS passed
        |FROM rows_out""".stripMargin,
    "layout_skipping" ->
      s"""WITH li AS (
        | SELECT l_orderkey, l_partkey, l_suppkey,
        |  ${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")} AS zval
        | FROM lineitem),
        |b AS (
        | SELECT min(zval) AS zmin, max(zval) AS zmax,
        |  min(l_orderkey) AS omin, max(l_orderkey) AS omax,
        |  min(l_partkey) AS pmin, max(l_partkey) AS pmax,
        |  min(l_suppkey) AS smin, max(l_suppkey) AS smax
        | FROM li),
        |zc AS (
        | SELECT (li.zval - b.zmin) // greatest(1, (b.zmax - b.zmin + 32) // 32) AS chunk,
        |  min(l_partkey) AS cpmin, max(l_partkey) AS cpmax,
        |  min(l_suppkey) AS csmin, max(l_suppkey) AS csmax
        | FROM li, b GROUP BY 1),
        |oc AS (
        | SELECT (li.l_orderkey - b.omin) // greatest(1, (b.omax - b.omin + 32) // 32) AS chunk,
        |  min(l_partkey) AS cpmin, max(l_partkey) AS cpmax,
        |  min(l_suppkey) AS csmin, max(l_suppkey) AS csmax
        | FROM li, b GROUP BY 1),
        |pr AS (
        | SELECT CAST(i AS BIGINT) AS probe_id,
        |  b.pmin + (i * (b.pmax - b.pmin)) // 15 AS pk,
        |  b.smin + (((i * 7) % 16) * (b.smax - b.smin)) // 15 AS sk
        | FROM range(0, 16) t(i), b)
        |SELECT 'natural' AS layout, probe_id, pk, sk,
        | count(*) AS n_chunks,
        | CAST(sum(CASE WHEN cpmin <= pk AND pk <= cpmax
        |   AND csmin <= sk AND sk <= csmax THEN 1 ELSE 0 END) AS BIGINT) AS chunks_scanned
        |FROM pr CROSS JOIN oc GROUP BY 1, 2, 3, 4
        |UNION ALL
        |SELECT 'zorder' AS layout, probe_id, pk, sk,
        | count(*) AS n_chunks,
        | CAST(sum(CASE WHEN cpmin <= pk AND pk <= cpmax
        |   AND csmin <= sk AND sk <= csmax THEN 1 ELSE 0 END) AS BIGINT) AS chunks_scanned
        |FROM pr CROSS JOIN zc GROUP BY 1, 2, 3, 4""".stripMargin,
    "agg_incremental_merge" ->
      """SELECT l_returnflag,
        | CAST(sum(cents) AS BIGINT) AS sum_cents,
        | count(*) AS n,
        | CAST(min(cents) AS BIGINT) AS min_cents,
        | CAST(max(cents) AS BIGINT) AS max_cents,
        | CAST(sum(cents) AS BIGINT) // count(*) AS avg_cents
        |FROM (SELECT l_returnflag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,
    "events_scd2" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS chg
        | FROM x),
        |z AS (
        | SELECT user_id, ts, event_type,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS version
        | FROM y),
        |isl AS (
        | SELECT user_id, version, event_type,
        |  min(ts) AS valid_from, count(*) AS n_events
        | FROM z GROUP BY user_id, version, event_type)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        | valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        | CAST(n_events AS BIGINT) AS n_events
        |FROM isl""".stripMargin,
    "q17_small_qty" ->
      """WITH li AS (
        | SELECT l_partkey, p_brand,
        |  CAST(round(l_quantity) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#1'),
        |w AS (
        | SELECT p_brand, qty, cents,
        |  CAST(sum(qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty,
        |  count(*) OVER (PARTITION BY l_partkey) AS cnt
        | FROM li)
        |SELECT p_brand, count(*) AS n_small,
        | CAST(sum(cents) AS BIGINT) AS small_revenue_cents,
        | CAST(sum(cents) AS BIGINT) * 10 // 7 AS avg_yearly_decicents
        |FROM w WHERE qty * 5 * cnt < sum_qty
        |GROUP BY p_brand""".stripMargin,
    // sequential integer fold — DuckDB's list_reduce seeds from the first
    // element, matching the Spark sentinel branch; non-negative terms so
    // div == //
    "events_ewma" ->
      """WITH c AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(y ORDER BY hour) AS ys FROM c GROUP BY event_type)
        |SELECT event_type, CAST(len(ys) AS BIGINT) AS n_hours,
        | CAST(list_reduce(ys, (acc, y) -> (3 * acc + y) // 4) AS BIGINT) AS ewma_last,
        | ys[-1] AS last_hour_count,
        | CAST(list_sum(ys) AS BIGINT) AS total
        |FROM s""".stripMargin,
    // one-pass exact integer moments; r computed from identical bigint
    // sums on both engines, so the doubles downstream can't diverge
    "stats_correlation" ->
      """WITH li AS (
        | SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice / 100) AS BIGINT) AS prc,
        |  CAST(round(l_discount * 100) AS BIGINT) AS dsc,
        |  CAST(round(l_tax * 100) AS BIGINT) AS tax
        | FROM lineitem),
        |m AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(qty) AS BIGINT) AS s_qty, CAST(sum(prc) AS BIGINT) AS s_prc,
        |  CAST(sum(dsc) AS BIGINT) AS s_dsc, CAST(sum(tax) AS BIGINT) AS s_tax,
        |  CAST(sum(qty * qty) AS BIGINT) AS s_qty_qty, CAST(sum(qty * prc) AS BIGINT) AS s_qty_prc,
        |  CAST(sum(qty * dsc) AS BIGINT) AS s_qty_dsc, CAST(sum(qty * tax) AS BIGINT) AS s_qty_tax,
        |  CAST(sum(prc * prc) AS BIGINT) AS s_prc_prc, CAST(sum(prc * dsc) AS BIGINT) AS s_prc_dsc,
        |  CAST(sum(prc * tax) AS BIGINT) AS s_prc_tax, CAST(sum(dsc * dsc) AS BIGINT) AS s_dsc_dsc,
        |  CAST(sum(dsc * tax) AS BIGINT) AS s_dsc_tax, CAST(sum(tax * tax) AS BIGINT) AS s_tax_tax
        | FROM li)
        |SELECT 'qty' AS var_a, 'prc' AS var_b, CAST(round(1000.0 * (n * s_qty_prc - s_qty * s_prc) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)))) AS BIGINT) AS r_milli FROM m
        |UNION ALL SELECT 'qty', 'dsc', CAST(round(1000.0 * (n * s_qty_dsc - s_qty * s_dsc) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'qty', 'tax', CAST(round(1000.0 * (n * s_qty_tax - s_qty * s_tax) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'prc', 'dsc', CAST(round(1000.0 * (n * s_prc_dsc - s_prc * s_dsc) / (sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)) * sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'prc', 'tax', CAST(round(1000.0 * (n * s_prc_tax - s_prc * s_tax) / (sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'dsc', 'tax', CAST(round(1000.0 * (n * s_dsc_tax - s_dsc * s_tax) / (sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m""".stripMargin,
    // r10 completion batch: the remaining TPC-H shapes, same integral
    // conventions
    "q6_forecast_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents_pct
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        | AND l_quantity < 24""".stripMargin,
    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |  OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        | AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT)) -
        |  CAST(round(p_retailprice * 100) AS BIGINT) *
        |   CAST(round(l_quantity) AS BIGINT) * 80) AS BIGINT) AS sum_profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      """WITH rev AS (
        | SELECT o_custkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        | GROUP BY o_custkey)
        |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, revenue,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name
        |FROM rev JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_share" ->
      """WITH pp AS (
        | SELECT l_partkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        | FROM lineitem GROUP BY 1)
        |SELECT CAST(l_partkey AS BIGINT) AS p_partkey, value_cents FROM pp
        |WHERE value_cents * 10000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM pp) * 7""".stripMargin,
    "q12_shipmode_priority" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin,
    "q14_promo_share" ->
      """WITH x AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev, p_type
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_revenue,
        | CAST(sum(rev) AS BIGINT) AS total_revenue,
        | CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) * 1000
        |  // CAST(sum(rev) AS BIGINT) AS promo_permille
        |FROM x""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        | OR (p_brand = 'Brand#2' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        | OR (p_brand = 'Brand#3' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH ps AS (
        | SELECT l_suppkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_name LIKE '%red%'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | GROUP BY l_suppkey),
        |g AS (SELECT CAST(sum(qty) AS BIGINT) AS total_qty, CAST(count(*) AS BIGINT) AS n_supp FROM ps)
        |SELECT s_name, n_name, qty
        |FROM ps CROSS JOIN g
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE qty * n_supp > total_qty""".stripMargin,
    // r10 TPC-H batch — all money in integral cents, comparisons
    // cross-multiplied where an average appears, so both engines stay
    // on BIGINT arithmetic throughout
    "q2_min_cost_supplier" ->
      """WITH cost AS (
        | SELECT l_partkey, l_suppkey, s_name, n_name, p_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cost_cents
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        | WHERE r_name = 'ASIA' AND p_size = 15
        | GROUP BY l_partkey, l_suppkey, s_name, n_name, p_name),
        |mc AS (SELECT l_partkey AS k, min(cost_cents) AS m FROM cost GROUP BY 1)
        |SELECT CAST(l_partkey AS BIGINT) AS p_partkey, p_name, s_name, n_name, cost_cents
        |FROM cost JOIN mc ON l_partkey = k AND cost_cents = m""".stripMargin,
    "q4_priority_wait" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1996-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        | SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        | FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300)
        |SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
        | CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH pos AS (
        | SELECT l_orderkey, l_suppkey,
        |  CAST(max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |   THEN 1 ELSE 0 END) AS BIGINT) AS supp_late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'
        | GROUP BY l_orderkey, l_suppkey),
        |po AS (
        | SELECT l_orderkey AS k, count(*) AS n_supp,
        |  CAST(sum(supp_late) AS BIGINT) AS n_late
        | FROM pos GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM pos JOIN po ON l_orderkey = k
        | JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_late = 1 AND n_supp >= 2 AND n_late = 1
        |GROUP BY s_name""".stripMargin,
    "q22_global_sales" ->
      """WITH cust AS (
        | SELECT c_custkey, c_mktsegment,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        | FROM customer),
        |pa AS (
        | SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_pos,
        |  CAST(count(*) AS BIGINT) AS n_pos
        | FROM cust WHERE bal_cents > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        | CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM cust, pa
        |WHERE bal_cents * n_pos > sum_pos
        | AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |   AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    // value-atomic p01/p99 via RANGE-frame cumulative counts (peers
    // included), then clip-and-aggregate — all integers
    "stats_winsorize" ->
      """WITH x AS (
        | SELECT l_returnflag AS flag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem),
        |c AS (
        | SELECT flag, cents,
        |  count(*) OVER (PARTITION BY flag ORDER BY cents) AS cum,
        |  count(*) OVER (PARTITION BY flag) AS n
        | FROM x),
        |b AS (
        | SELECT flag,
        |  min(CASE WHEN cum * 100 >= n THEN cents END) AS p01_cents,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN cents END) AS p99_cents
        | FROM c GROUP BY flag)
        |SELECT x.flag, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN cents < p01_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        | CAST(sum(CASE WHEN cents > p99_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        | CAST(sum(greatest(p01_cents, least(p99_cents, cents))) AS BIGINT) AS sum_clipped_cents,
        | min(p01_cents) AS p01_cents, min(p99_cents) AS p99_cents
        |FROM x JOIN b ON x.flag = b.flag
        |GROUP BY x.flag""".stripMargin,
    "text_cooccur" ->
      """WITH d AS (
        | SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        | FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM d),
        |td AS (SELECT doc_id, unnest(toks) AS token FROM d),
        |dfc AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY token),
        |freq AS (SELECT token, df FROM dfc ORDER BY df DESC, token LIMIT 32),
        |h AS (SELECT td.doc_id, td.token, f.df FROM td JOIN freq f USING (token)),
        |p AS (
        | SELECT a.token AS tok_a, b.token AS tok_b,
        |  CAST(count(*) AS BIGINT) AS support, min(a.df) AS df_a, min(b.df) AS df_b
        | FROM h a JOIN h b ON a.doc_id = b.doc_id AND a.token < b.token
        | GROUP BY 1, 2)
        |SELECT tok_a, tok_b, support, df_a, df_b,
        | CAST(support * n_docs * 1000 // (df_a * df_b) AS BIGINT) AS lift_permille
        |FROM p CROSS JOIN n
        |WHERE support >= 10""".stripMargin,
    "events_markov" ->
      """WITH p AS (
        | SELECT event_type AS prev_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        | FROM events),
        |c AS (
        | SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        | FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        | CAST(n * 1000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_permille
        |FROM c""".stripMargin,
    // identical integer clock pipeline: Knuth hash -> exact rational u ->
    // quantized -ln(u) micro-nats -> scaled integer division by weight
    "sample_weighted" ->
      """WITH s AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
        | FROM documents),
        |c AS (
        | SELECT doc_id, w, (doc_id * 2654435761) % 1000000007 + 1 AS num FROM s),
        |k AS (
        | SELECT doc_id, w,
        |  CAST(round(-ln(CAST(num AS DOUBLE) / 1000000008) * 1000000) AS BIGINT) AS lnu_micro
        | FROM c),
        |r AS (
        | SELECT doc_id, w, (lnu_micro * 1048576) // w AS clock,
        |  row_number() OVER (ORDER BY (lnu_micro * 1048576) // w ASC, doc_id ASC) AS rank
        | FROM k)
        |SELECT doc_id, w, CAST(clock AS BIGINT) AS clock, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 100""".stripMargin,
    // lower medians selected by rank over the same deterministic
    // (value, hour) order — integer arithmetic end to end
    "events_anomaly_mad" ->
      """WITH hc AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |m AS (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n, hour) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n_hours
        | FROM hc),
        |med AS (
        | SELECT *, min(CASE WHEN rn * 2 >= n_hours THEN n END)
        |   OVER (PARTITION BY event_type) AS med
        | FROM m),
        |d AS (
        | SELECT *, abs(n - med) AS dev,
        |  row_number() OVER (PARTITION BY event_type ORDER BY abs(n - med), hour) AS rn2
        | FROM med),
        |mad AS (
        | SELECT *, min(CASE WHEN rn2 * 2 >= n_hours THEN dev END)
        |   OVER (PARTITION BY event_type) AS mad
        | FROM d)
        |SELECT event_type, hour, n, med, mad, dev > mad * 3 AS is_anomaly
        |FROM mad""".stripMargin,
    // linkage replayed without the key: same dirty derivation, same
    // blocks (both probe buckets), same integer weights, ROW_NUMBER
    // resolution with the identical (score desc, key asc) tie order
    "link_customers" ->
      """WITH c AS (
        | SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS mkt
        | FROM customer),
        |d AS (
        | SELECT k AS d_key,
        |  CASE WHEN k % 3 = 0 THEN lower(nm) ELSE nm END AS d_name,
        |  nat AS d_nat,
        |  cents + CASE WHEN k % 5 = 0 THEN 7 ELSE 0 END AS d_cents,
        |  CASE WHEN k % 11 = 0 THEN 'UNKNOWN' ELSE mkt END AS d_mkt
        | FROM c),
        |p AS (
        | SELECT d.*, unnest([(d_cents + 100000) // 10000, (d_cents + 100000) // 10000 - 1]) AS blk
        | FROM d),
        |s AS (
        | SELECT p.d_key, c.k AS cand_key,
        |  (CASE WHEN p.d_name = c.nm THEN 40
        |        WHEN p.d_name = lower(c.nm) THEN 30 ELSE 0 END
        |   + CASE WHEN p.d_cents = c.cents THEN 30
        |          WHEN abs(p.d_cents - c.cents) <= 10 THEN 25 ELSE 0 END
        |   + CASE WHEN p.d_mkt = c.mkt THEN 15 ELSE 0 END) AS score
        | FROM p JOIN c ON p.d_nat = c.nat AND p.blk = (c.cents + 100000) // 10000),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY d_key ORDER BY score DESC, cand_key ASC) AS rn,
        |  count(*) OVER (PARTITION BY d_key) AS n_candidates
        | FROM s)
        |SELECT d_key, cand_key AS best_key, CAST(score AS BIGINT) AS best_score,
        | n_candidates, score >= 45 AS matched
        |FROM r WHERE rn = 1""".stripMargin,
    "events_funnel" -> FunnelOracle,
    "events_funnel_skew" -> FunnelOracle,
    "events_funnel_native" -> FunnelOracle,
    "events_interval_left_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        | c.ts AS c_ts, p.ts AS p_ts
        |FROM events c LEFT JOIN events p
        | ON c.user_id = p.user_id AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click'""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2 *
        |   (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        | > 3 * (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |        FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,
    "q_count_distinct" ->
      """SELECT o_orderstatus,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        | CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_sum3
        |FROM orders""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "events_range_join" ->
      """SELECT e1.event_id, CAST(count(e2.event_id) AS BIGINT) AS n_prior_5min
        |FROM events e1 LEFT JOIN events e2
        | ON e2.ts >= e1.ts - INTERVAL 5 MINUTE AND e2.ts < e1.ts
        |GROUP BY e1.event_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "dedup_ngram" ->
      """WITH sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(text) - 4, 1) + 1),
        |   i -> substr(text, CAST(i AS INTEGER), 5))) AS s
        | FROM documents)
        |SELECT * FROM (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.6""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, n_frames, frame_idx,
        | md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5
        |FROM (
        | SELECT doc_id, text, CAST((len(text) + 63) // 64 AS BIGINT) AS n_frames,
        |  unnest(range(0, CAST((len(text) + 63) // 64 AS BIGINT), 10)) AS frame_idx
        | FROM documents)""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "dedup_edit_distance" ->
      """WITH sh AS (
        | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |pairs AS (
        | SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        | WHERE jaccard >= 0.6)
        |SELECT id_a, id_b,
        | CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        |FROM pairs
        | JOIN documents da ON da.doc_id = id_a
        | JOIN documents db ON db.doc_id = id_b""".stripMargin,
    "text_term_stats" ->
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY df DESC, token LIMIT 20""".stripMargin,
    // chr(769) = U+0301 combining acute, chr(778) = U+030A combining ring:
    // the same decomposed plants; nfc_normalize implements the same
    // Unicode standard as the engine's graft_nfc
    "text_normalize" ->
      """WITH a AS (
        | SELECT doc_id, text || CASE CAST(doc_id % 3 AS INTEGER)
        |   WHEN 0 THEN ' Cafe' || chr(769)
        |   WHEN 1 THEN ' A' || chr(778)
        |   ELSE '' END AS aug
        | FROM documents),
        |n AS (SELECT doc_id, aug, nfc_normalize(aug) AS norm FROM a)
        |SELECT doc_id, aug != norm AS changed,
        | CAST(len(aug) AS BIGINT) AS n_chars_raw,
        | CAST(len(norm) AS BIGINT) AS n_chars_nfc,
        | right(norm, 6) AS tail_nfc
        |FROM n""".stripMargin,
    "text_tfidf" ->
      """WITH d AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        | FROM documents WHERE len(text) > 0),
        |n AS (SELECT count(*) AS n FROM d),
        |tf AS (
        | SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        | FROM (SELECT doc_id, unnest(w) AS tok FROM d) GROUP BY 1, 2),
        |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |s AS (
        | SELECT tf.doc_id, tf.tok AS token, tf.tf, dfc.df,
        |  tf.tf * CAST(round(ln((n.n + 1.0) / (dfc.df + 1.0)) * 1000000) AS BIGINT) AS tfidf_micro
        | FROM tf JOIN dfc USING (tok) CROSS JOIN n),
        |r AS (
        | SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_micro DESC, token ASC) AS BIGINT) AS rank
        | FROM s)
        |SELECT doc_id, token, tf, df, tfidf_micro, rank FROM r WHERE rank <= 5""".stripMargin,
    "events_salted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | ${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")} AS zval
        |FROM lineitem""".stripMargin,
    // the identical xy2d recurrence replayed as a recursive CTE: per level
    // b the quadrant digit (3*rx) XOR ry weighs s^2 into d, then the
    // coordinates reflect/transpose into the canonical sub-quadrant
    "layout_hilbert" ->
      """WITH RECURSIVE hc AS (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(l_partkey AS BIGINT) & 65535 AS x, CAST(l_suppkey AS BIGINT) & 65535 AS y,
        |  15 AS b, CAST(0 AS BIGINT) AS d
        | FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END) ELSE x END,
        |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END) ELSE y END,
        |  b - 1,
        |  d + s * s * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END)
        | FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, x, y, b, d,
        |   CAST(1 AS BIGINT) << b AS s, (x >> b) & 1 AS rx, (y >> b) & 1 AS ry
        |  FROM hc WHERE b >= 0))
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, d AS hval
        |FROM hc WHERE b = -1""".stripMargin,
    // the bloom stage is pruning-only: output is the exact semi-join
    "q_bloom_semi_join" ->
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem SEMI JOIN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0) o
        | ON l_orderkey = o.o_orderkey
        |GROUP BY l_returnflag""".stripMargin,
    "stats_profile" ->
      """WITH c AS (
        | SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |  CAST(round(l_discount * 100) AS BIGINT) AS disc_cents
        | FROM lineitem)
        |SELECT 'l_quantity' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        | CAST(count(DISTINCT qty) AS BIGINT) AS n_distinct,
        | min(qty) AS min_val, max(qty) AS max_val FROM c
        |UNION ALL
        |SELECT 'l_extendedprice_cents', CAST(count(*) AS BIGINT),
        | CAST(sum(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT price_cents) AS BIGINT),
        | min(price_cents), max(price_cents) FROM c
        |UNION ALL
        |SELECT 'l_discount_cents', CAST(count(*) AS BIGINT),
        | CAST(sum(CASE WHEN disc_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT disc_cents) AS BIGINT),
        | min(disc_cents), max(disc_cents) FROM c""".stripMargin,
    "stats_histogram" ->
      """WITH c AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c)
        |SELECT CAST((cents - mn) * 32 // (mx - mn + 1) AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM c CROSS JOIN b
        |GROUP BY 1""".stripMargin,
    "pipeline_curate" ->
      """WITH w AS (
        | SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents),
        |g AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 25 + 2),
        |   i -> array_to_string(toks[CAST(i AS INTEGER):CAST(i + 24 AS INTEGER)], ' ')))) AS gram
        | FROM w WHERE len(toks) >= 25),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram),
        |dup AS (SELECT DISTINCT doc_id FROM g JOIN df USING (gram) WHERE nd >= 2),
        |surv AS (
        | SELECT w.doc_id, w.lang,
        |  list_reduce(list_transform(string_split(w.text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash,
        |  CAST(len(w.toks) AS BIGINT) AS n_tokens
        | FROM w ANTI JOIN dup USING (doc_id)),
        |wt AS (SELECT lang, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s
        |       FROM surv GROUP BY lang),
        |tgt AS (SELECT lang, (150 * s) // (SELECT sum(s) FROM wt) AS target FROM wt),
        |mix AS (
        | SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |   CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |    AS mix_rank
        |  FROM surv) r JOIN tgt USING (lang) WHERE mix_rank <= target)
        |SELECT m.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens
        |FROM mix m JOIN surv s ON m.doc_id = s.doc_id
        |GROUP BY m.lang""".stripMargin,
    "stats_histogram_eqdepth" ->
      """WITH h AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, count(*) AS cnt
        | FROM lineitem GROUP BY 1),
        |c AS (
        | SELECT cents, cnt,
        |  sum(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(cnt) OVER () AS n
        | FROM h)
        |SELECT CAST((cum * 8 + n - 1) // n AS BIGINT) AS bucket,
        | min(cents) AS lo_cents, max(cents) AS hi_cents,
        | CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1""".stripMargin,
    "pipeline_chunks" ->
      """WITH filtered AS (
        | SELECT doc_id, lang, text,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents
        | WHERE CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 2 >= len(text)),
        |sampled AS (
        | SELECT doc_id, lang, text
        | FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS rk
        |       FROM filtered)
        | WHERE rk <= 20),
        |chunks AS (
        | SELECT doc_id, lang,
        |  CAST(len(substr(text, CAST(i AS INT), 200)) AS BIGINT) AS chunk_len
        | FROM (SELECT doc_id, lang, text,
        |        unnest(range(1, greatest(len(text), 1) + 1, 150)) AS i
        |       FROM sampled))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(sum(chunk_len) AS BIGINT) AS total_chunk_chars,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM chunks GROUP BY lang""".stripMargin,
    "sample_stratified" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, rank_hash,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |  AS stratum_rank
        |FROM h
        |QUALIFY stratum_rank <= 20""".stripMargin,
    "sample_stratified_topk" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, rank_hash,
        | CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |  AS stratum_rank
        |FROM h
        |QUALIFY stratum_rank <= 20""".stripMargin,
    "sample_mixture" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents)
        |SELECT doc_id, lang, mix_rank FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |   AS mix_rank
        | FROM h)
        |WHERE mix_rank <= CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 30
        | WHEN 'de' THEN 30 WHEN 'es' THEN 15 WHEN 'fr' THEN 15 ELSE 0 END""".stripMargin,
    "sample_temperature" ->
      """WITH h AS (
        | SELECT doc_id, lang,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 43 + x) % 999999893) AS rank_hash
        | FROM documents),
        |w AS (
        | SELECT lang, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wt
        | FROM documents GROUP BY lang),
        |tgt AS (
        | SELECT lang, (200 * wt) // (SELECT sum(wt) FROM w) AS target FROM w)
        |SELECT doc_id, lang, mix_rank FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT)
        |   AS mix_rank
        | FROM h) r
        |JOIN tgt USING (lang)
        |WHERE mix_rank <= target""".stripMargin,
    "bloom_fpr_check" ->
      """SELECT
        | CAST(sum(CASE WHEN o_totalprice > 450000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
        | CAST(sum(CASE WHEN o_totalprice <= 450000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_non_members,
        | TRUE AS no_false_negatives,
        | TRUE AS fpr_bounded
        |FROM orders""".stripMargin,
    "multimodal_decode" ->
      """SELECT doc_id, 'text/fake' AS media_type,
        | CAST(length(text) AS BIGINT) AS byte_len,
        | CAST(16 + cs % 624 AS INTEGER) AS width,
        | CAST(16 + cs % 464 AS INTEGER) AS height,
        | cs AS checksum
        |FROM (
        | SELECT doc_id, text,
        |  CAST(COALESCE(list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), 0) AS BIGINT)
        |    % 1000000007 AS cs
        | FROM documents)""".stripMargin,
    // width/height are pure doc_id arithmetic; every 7th row is corrupt by
    // construction and must come back quarantined (-1 dims, parsed=false)
    "multimodal_headers" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INTEGER)
        |  WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png' ELSE 'image/gif'
        | END AS media_type,
        | CASE WHEN doc_id % 7 = 0 THEN -1
        |  ELSE CAST(16 + doc_id % 624 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 7 = 0 THEN -1
        |  ELSE CAST(16 + doc_id % 464 AS INTEGER) END AS height,
        | doc_id % 7 <> 0 AS parsed,
        | CASE WHEN doc_id % 3 = 2 AND doc_id % 7 <> 0
        |  THEN CAST(1 + doc_id % 5 AS INTEGER) ELSE -1 END AS frames,
        | CASE WHEN doc_id % 3 = 0 AND doc_id % 7 <> 0
        |  THEN CAST(1 + doc_id % 8 AS INTEGER) ELSE -1 END AS orientation
        |FROM documents""".stripMargin,
    // recomputes every PCM feature from the doc_id arithmetic the planted
    // WAV samples were built from — the engine must recover them from BYTES
    "mm_audio_pcm" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, 1 + doc_id % 2 AS ch,
        |  8000 + (doc_id % 5) * 1000 AS rate, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, i, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM par)),
        |z AS (
        | SELECT doc_id, sum(v * v) AS energy, sum(abs(v)) AS abs_sum,
        |  max(abs(v)) AS peak,
        |  sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS zc
        | FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM v)
        | GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.rate END AS BIGINT) AS sample_rate,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.ch END AS BIGINT) AS channels,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.n END AS BIGINT) AS n_samples,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.energy END AS BIGINT) AS energy,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.abs_sum END AS BIGINT) AS abs_sum,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.peak END AS BIGINT) AS peak,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.zc END AS BIGINT) AS zero_cross
        |FROM par p JOIN z USING (doc_id)""".stripMargin,
    // frequency-domain gate: energy_freq is computed THROUGH the FFT in
    // Spark (Parseval) but derived straight from the planted samples here
    // — equality proves the transform conserves energy; dc_sum pins X_0
    "mm_audio_spectrum" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, 32 * (n // 32))) AS i FROM par)),
        |z AS (
        | SELECT doc_id, sum(v * v) AS e, sum(v) AS dc FROM v GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE p.n // 32 END AS BIGINT) AS n_fft_frames,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.e END AS BIGINT) AS energy_time,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.e END AS BIGINT) AS energy_freq,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE z.dc END AS BIGINT) AS dc_sum
        |FROM par p JOIN z USING (doc_id)""".stripMargin,
    "mm_image_dhash" ->
      """WITH par AS (SELECT doc_id, doc_id % 7 = 0 AS corrupt FROM documents),
        |grid AS (
        | SELECT doc_id, tx.range AS x, ty.range AS y,
        |  (299 * ((doc_id * 5 + tx.range * 19 + ty.range * 29) % 256)
        |   + 587 * ((doc_id * 11 + tx.range * 17 + ty.range * 23) % 256)
        |   + 114 * ((doc_id * 7 + tx.range * 13 + ty.range * 31) % 256)) // 1000 AS gray
        | FROM par, range(0, 9) tx, range(0, 8) ty
        | WHERE NOT corrupt),
        |bits AS (
        | SELECT a.doc_id, a.x, a.y,
        |  CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
        | FROM grid a JOIN grid b
        |  ON a.doc_id = b.doc_id AND b.x = a.x + 1 AND b.y = a.y
        | WHERE a.x < 8),
        |hash AS (
        | SELECT doc_id,
        |  sum(CASE WHEN y < 4 THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END) AS hi,
        |  sum(CASE WHEN y >= 4 THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x)) ELSE 0 END) AS lo
        | FROM bits GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 9 END AS BIGINT) AS width,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 8 END AS BIGINT) AS height,
        | CAST(COALESCE(h.hi, -1) AS BIGINT) AS dhash_hi,
        | CAST(COALESCE(h.lo, -1) AS BIGINT) AS dhash_lo
        |FROM par p LEFT JOIN hash h USING (doc_id)""".stripMargin,
    "mm_image_ppm" ->
      """WITH par AS (SELECT doc_id, doc_id % 5 = 0 AS corrupt FROM documents),
        |px AS (
        | SELECT doc_id, tx.range AS x, ty.range AS y,
        |  (doc_id * 5 + tx.range * 19 + ty.range * 29) % 256 AS r,
        |  (doc_id * 11 + tx.range * 17 + ty.range * 23) % 256 AS g,
        |  (doc_id * 7 + tx.range * 13 + ty.range * 31) % 256 AS b
        | FROM par, range(0, 8) tx, range(0, 6) ty
        | WHERE NOT corrupt),
        |agg AS (
        | SELECT doc_id, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
        |  sum(((299 * r + 587 * g + 114 * b) // 1000) * (1 + x + 7 * y)) AS cks
        | FROM px GROUP BY doc_id)
        |SELECT p.doc_id, NOT p.corrupt AS parsed,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 8 END AS BIGINT) AS width,
        | CAST(CASE WHEN p.corrupt THEN -1 ELSE 6 END AS BIGINT) AS height,
        | CAST(COALESCE(a.sr, -1) AS BIGINT) AS sum_r,
        | CAST(COALESCE(a.sg, -1) AS BIGINT) AS sum_g,
        | CAST(COALESCE(a.sb, -1) AS BIGINT) AS sum_b,
        | CAST(COALESCE(a.cks, -1) AS BIGINT) AS luma_checksum
        |FROM par p LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "mm_audio_frames" ->
      """WITH par AS (
        | SELECT doc_id, 2 * (32 + doc_id % 64) AS n, doc_id % 7 = 0 AS corrupt
        | FROM documents),
        |v AS (
        | SELECT doc_id, i, ((doc_id * 31 + i * 131) % 2003) - 1001 AS v
        | FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM par WHERE NOT corrupt))
        |SELECT doc_id, CAST(i // 32 AS BIGINT) AS frame_idx,
        | CAST(count(*) AS BIGINT) AS n_in_frame,
        | CAST(sum(v * v) AS BIGINT) AS frame_energy
        |FROM v GROUP BY doc_id, i // 32""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
        | md5(array_to_string(list_transform(range(0, 256),
        |   i -> substr(text, CAST(i * length(text) // 256 AS INTEGER) + 1, 1)), '')) AS thumb_md5
        |FROM documents WHERE length(text) > 0""".stripMargin,
    "ann_recall" ->
      """WITH e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
        |topk AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM s)
        | WHERE rank <= 10)
        |SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits FROM topk GROUP BY q_id""".stripMargin,
    "ann_ivf_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivf_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_pq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_sq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_sq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_append_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "sample_coreset_check" ->
      """SELECT 'radii_consistent_independent_arithmetic' AS check_name, TRUE AS passed
        |UNION ALL SELECT 'radii_monotone', TRUE
        |UNION ALL SELECT 'centers_distinct', TRUE""".stripMargin,
    "ann_pq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    // recomputes the exact near-dup pairs of the planted-copy corpus and
    // asserts the LSH path found each one (recall 1.0, per-pair)
    "dedup_semantic_lsh" ->
      """WITH RECURSIVE base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        | SELECT vec_id + 100000 AS vec_id,
        |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
        | FROM base WHERE vec_id < 20),
        |aug AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM aug),
        |pairs AS (
        | SELECT id_a, id_b FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |     i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |     (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        | WHERE cosine >= 0.7),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id)
        |SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    "dedup_embedding_incremental" -> EmbeddingIncrementalOracle,
    "dedup_embedding_incremental_store" -> EmbeddingIncrementalOracle,
    "dedup_embedding_lsh_check" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        | SELECT vec_id + 100000 AS vec_id,
        |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
        | FROM base WHERE vec_id < 20),
        |aug AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM aug)
        |SELECT id_a, id_b, TRUE AS lsh_found FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |    i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        | FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.7""".stripMargin,
    "embedding_gram" ->
      """WITH e AS (
        | SELECT list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        | FROM embeddings),
        |p AS (
        | SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j
        | FROM range(0, 64) t(i), range(0, 64) u(j) WHERE i <= j)
        |SELECT p.i, p.j,
        | CAST(sum(e.q[CAST(p.i + 1 AS INTEGER)] * e.q[CAST(p.j + 1 AS INTEGER)]) AS BIGINT) AS sum_qq
        |FROM e, p GROUP BY p.i, p.j""".stripMargin,
    "embedding_gram" ->
      """WITH e AS (
        | SELECT list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        | FROM embeddings),
        |p AS (
        | SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j
        | FROM range(0, 64) t(i), range(0, 64) u(j) WHERE i <= j)
        |SELECT p.i, p.j,
        | CAST(sum(e.q[CAST(p.i + 1 AS INTEGER)] * e.q[CAST(p.j + 1 AS INTEGER)]) AS BIGINT) AS sum_qq
        |FROM e, p GROUP BY p.i, p.j""".stripMargin,
    "embedding_centroid" ->
      """SELECT label, dim,
        | CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
        | CAST(count(*) AS BIGINT) AS n
        |FROM (
        | SELECT label,
        |  unnest(range(0, len(embedding))) AS dim,
        |  unnest(list_transform(range(0, len(embedding)), i -> embedding[CAST(i + 1 AS INTEGER)])) AS x
        | FROM embeddings)
        |GROUP BY label, dim""".stripMargin
  )

  /** Shared CTE prefix for the graph oracles: the symmetric trade graph
    * (see [[graft.operators.Graph]]). */
  private val tradeGraphCtes: String =
    """e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin

  /** Unrolled fixed-iteration integer-PageRank oracle — the recursive-CTE-
    * free twin of [[graft.operators.Graph.pageRank]]: each superstep is one
    * CTE, so DuckDB executes literally the same integer recurrence.
    */
  private def pageRankOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         | CAST(150000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
         | FROM nodes n LEFT JOIN (
         |  SELECT ed.dst AS node, sum(r.pr // ed.outdeg) AS s
         |  FROM r${i - 1} r JOIN ed ON r.node = ed.src GROUP BY 1) c
         | ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCtes,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg ON e.src = deg.src),
       |nodes AS (SELECT c_custkey * 2 AS node FROM customer
       | UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |$steps
       |SELECT node, pr FROM r$iters""".stripMargin
  }

  /** Unrolled bounded-hop BFS oracle twin of
    * [[graft.operators.Graph.reachability]]. */
  private def reachOracle(maxHops: Int): String = {
    val steps = (1 to maxHops).map { i =>
      s"""f$i AS (SELECT DISTINCT e.dst AS node
         | FROM f${i - 1} JOIN e ON f${i - 1}.node = e.src
         | WHERE e.dst NOT IN (SELECT node FROM v${i - 1})),
         |v$i AS (SELECT * FROM v${i - 1}
         | UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCtes,
       |seeds AS (SELECT c_custkey * 2 AS node
       | FROM customer JOIN nation ON c_nationkey = n_nationkey
       | WHERE n_name = 'NATION_1'),
       |f0 AS (SELECT node FROM seeds),
       |v0 AS (SELECT node, CAST(0 AS BIGINT) AS hop FROM seeds),
       |$steps
       |SELECT node, hop FROM v$maxHops""".stripMargin
  }

  /** Unrolled k-superstep min-label-propagation oracle twin of
    * [[graft.operators.Graph.components]]. */
  private def componentsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT p.node,
         | least(p.label, COALESCE(m.nmin, p.label)) AS label
         | FROM c${i - 1} p LEFT JOIN (
         |  SELECT e.dst AS node, min(p2.label) AS nmin
         |  FROM c${i - 1} p2 JOIN e ON p2.node = e.src GROUP BY 1) m
         | ON p.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCtes,
       |nodes AS (SELECT c_custkey * 2 AS node FROM customer
       | UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
       |c0 AS (SELECT node, node AS label FROM nodes),
       |$steps
       |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
       |FROM c$iters""".stripMargin
  }

  /** The skew-safe window variants compute EXACTLY the same result as
    * their plain twins, so each shares its twin's oracle — a green row is
    * a driver-level proof the chunked rewrite changed the plan, not the
    * answer.
    */
  def oracleSql: Map[String, String] = baseOracleSql ++ Map(
    "q_range_frame_skew" -> baseOracleSql("q_range_frame"),
    "q_window_lead_lag_skew" -> baseOracleSql("q_window_lead_lag"),
    "events_sessionize_skew" -> baseOracleSql("events_sessionize"),
    "graph_pagerank" -> pageRankOracle(5),
    "graph_reach" -> reachOracle(3),
    "graph_components" -> componentsOracle(4),
    // r10 continuation: time-series family — all from the calendar-bounded
    // hourly-counts table, exact integer moments / window arithmetic
    "events_acf" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT a.event_type, l.lag, a.y AS x, b.y AS z
        | FROM c a, (VALUES (1), (2), (3)) l(lag)
        | JOIN c b ON b.event_type = a.event_type AND b.hr = a.hr + l.lag),
        |m AS (
        | SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS s_x, CAST(sum(z) AS BIGINT) AS s_z,
        |  CAST(sum(x * x) AS BIGINT) AS s_xx, CAST(sum(z * z) AS BIGINT) AS s_zz,
        |  CAST(sum(x * z) AS BIGINT) AS s_xz
        | FROM p GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
        | CASE WHEN n * s_xx - s_x * s_x > 0 AND n * s_zz - s_z * s_z > 0
        |  THEN CAST(round(1000.0 * (n * s_xz - s_x * s_z) /
        |   (sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE)) *
        |    sqrt(CAST(n * s_zz - s_z * s_z AS DOUBLE)))) AS BIGINT) END AS r_milli
        |FROM m""".stripMargin,
    // exact integer deviation statistic S_t = n*prefix - t*total; argmax
    // with the identical (|S| DESC, t ASC) tie order
    "events_cusum" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |s AS (
        | SELECT event_type, hr,
        |  CAST(row_number() OVER w AS BIGINT) AS t,
        |  CAST(sum(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours,
        |  CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS total
        | FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
        |d AS (
        | SELECT *, n_hours * prefix - t * total AS sv,
        |  row_number() OVER (PARTITION BY event_type ORDER BY abs(n_hours * prefix - t * total) DESC, t ASC) AS rk
        | FROM s)
        |SELECT event_type, n_hours, total, t AS cp_t, hr AS cp_hr,
        | sv AS s_at_cp, abs(sv) AS abs_s
        |FROM d WHERE rk = 1""".stripMargin,
    "events_seasonality" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT event_type, hr % 24 AS hod, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(y) AS BIGINT) AS total
        | FROM c GROUP BY 1, 2)
        |SELECT event_type, CAST(hod AS BIGINT) AS hod, n_hours, total,
        | 1000 * total // n_hours AS mean_milli,
        | row_number() OVER (PARTITION BY event_type ORDER BY total DESC, hod ASC) = 1 AS is_peak
        |FROM p""".stripMargin,
    // open/close under the (ts, event_id) total order — ties well-defined
    "events_ohlc" ->
      """WITH e AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000 ORDER BY ts ASC, event_id ASC) AS rn_a,
        |  row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000 ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events)
        |SELECT event_type, hr, CAST(count(*) AS BIGINT) AS volume,
        | CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
        | CAST(max(cents) AS BIGINT) AS high_cents,
        | CAST(min(cents) AS BIGINT) AS low_cents,
        | CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
        | CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY 1, 2""".stripMargin,
    // additive decomposition: centered 5h rolling-mean trend; seasonal
    // mean through the +n*B shift so the div numerator stays non-negative
    "events_decompose" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |t AS (
        | SELECT event_type, hr, y,
        |  CAST(sum(y) OVER w AS BIGINT) AS s_frame,
        |  CAST(count(*) OVER w AS BIGINT) AS n_frame
        | FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |d AS (
        | SELECT *, CAST(1000 * s_frame // n_frame AS BIGINT) AS trend_milli,
        |  CAST(1000 * y - 1000 * s_frame // n_frame AS BIGINT) AS d_milli
        | FROM t),
        |s AS (
        | SELECT event_type, hr % 24 AS hod,
        |  CAST((CAST(sum(d_milli) AS BIGINT) + count(*) * 1000000000) // count(*) - 1000000000 AS BIGINT) AS seasonal_milli
        | FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.hr, d.y, d.trend_milli, s.seasonal_milli,
        | CAST(d.d_milli - s.seasonal_milli AS BIGINT) AS residual_milli
        |FROM d JOIN s ON s.event_type = d.event_type AND s.hod = d.hr % 24""".stripMargin,
    // milli-scaled so the even-frame midpoint average is exact (mult of 500)
    "events_rolling_median" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, hr, y,
        | CAST(median(y * 1000) OVER (PARTITION BY event_type ORDER BY hr
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS med_milli
        |FROM c""".stripMargin,
    // r10 continuation: DQ audits — Benford expectations are LITERALS on
    // both engines (no log evaluated anywhere)
    "dq_benford" ->
      """WITH o AS (
        | SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        | FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM g)
        |SELECT digit, observed, 1000 * observed // total AS observed_milli,
        | CAST(CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125 WHEN 4 THEN 97
        |  WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46 END AS BIGINT) AS expected_milli,
        | abs(1000 * observed // total -
        |  CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125 WHEN 4 THEN 97
        |   WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46 END) AS dev_milli
        |FROM g, t""".stripMargin,
    // +10^8 cent shift keeps the bucket div non-negative on both engines
    "dq_ldiversity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment,
        | CAST(count(*) AS BIGINT) AS k,
        | CAST(count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) // 100000) AS BIGINT) AS l,
        | count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) // 100000) >= 3 AS is_diverse
        |FROM customer GROUP BY 1, 2""".stripMargin,
    // r10 continuation: wedge-enumerated RA link prediction; total order
    // (ra DESC, common DESC, u, v) makes the LIMIT deterministic
    "graph_link_predict" ->
      """WITH sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |ew AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(count(*) AS BIGINT) AS w
        | FROM sup a JOIN sup b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2),
        |h AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ew GROUP BY w),
        |rk AS (SELECT w, sum(c) OVER (ORDER BY w ASC) AS cum, sum(c) OVER () AS n FROM h),
        |thr AS (SELECT min(w) AS t FROM rk WHERE cum * 1000 >= n * 900),
        |e AS (SELECT u, v FROM ew, thr WHERE w > t),
        |adj AS (SELECT u AS mid, v AS nb FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT mid, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY mid),
        |sc AS (
        | SELECT a.nb AS u, b.nb AS v, CAST(count(*) AS BIGINT) AS n_common,
        |  CAST(sum(1000000 // d) AS BIGINT) AS ra_micros
        | FROM adj a JOIN adj b ON a.mid = b.mid AND a.nb < b.nb
        | JOIN deg ON deg.mid = a.mid
        | GROUP BY 1, 2)
        |SELECT u, v, n_common, ra_micros FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = sc.u AND e.v = sc.v)
        |ORDER BY ra_micros DESC, n_common DESC, u ASC, v ASC LIMIT 20""".stripMargin,
    // r10 continuation: 3 unrolled synchronous LPA supersteps over the
    // TOP-DECILE backbone (median graph too dense — one community);
    // argmax is the (count DESC, label ASC) rank = the min-struct order
    "graph_lpa" ->
      """WITH sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |ew AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(count(*) AS BIGINT) AS w
        | FROM sup a JOIN sup b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2),
        |h AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ew GROUP BY w),
        |rk AS (SELECT w, sum(c) OVER (ORDER BY w ASC) AS cum, sum(c) OVER () AS n FROM h),
        |thr AS (SELECT min(w) AS t FROM rk WHERE cum * 1000 >= n * 900),
        |e AS (SELECT u, v FROM ew, thr WHERE w > t),
        |adj AS (SELECT u AS v, v AS nb FROM e UNION ALL SELECT v, u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS lbl FROM adj),
        |c1 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l0 l ON l.v = a.nb GROUP BY 1, 2),
        |l1 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c1) WHERE r = 1),
        |c2 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l1 l ON l.v = a.nb GROUP BY 1, 2),
        |l2 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c2) WHERE r = 1),
        |c3 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l2 l ON l.v = a.nb GROUP BY 1, 2),
        |l3 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c3) WHERE r = 1)
        |SELECT v AS supplier, CAST(lbl AS BIGINT) AS community,
        | CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
        |FROM l3""".stripMargin,
    // r10 continuation: positional postings, phrase = adjacency join
    "text_phrase_search" ->
      """WITH tok AS (
        | SELECT doc_id, t.tok AS term, t.pos
        | FROM documents, LATERAL (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok,
        |   generate_subscripts(string_split(lower(text), ' '), 1) AS pos) t)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        | CAST(min(a.pos) AS BIGINT) AS first_pos
        |FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |WHERE a.term = 'fast' AND b.term = 'table'
        |GROUP BY 1""".stripMargin,
    // r10 continuation: brute-force containment ground truth — the Spark
    // side must reproduce it exactly through the prefix-filter cut;
    // shingles as the identical 60-bit poly-hash integers
    "text_containment" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 12), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824
        |  + list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 12), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824 AS s
        | FROM documents, LATERAL unnest(generate_series(1, len(text) - 11)) t(i)
        | WHERE len(text) >= 12),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS size_a FROM sh GROUP BY doc_id),
        |pair AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_common
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id != b.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, size_a, n_common, 1000 * n_common // size_a AS containment_milli
        |FROM pair JOIN sz ON a_id = sz.doc_id
        |WHERE 1000 * n_common // size_a >= 800""".stripMargin,
    // r10 continuation: MOSS winnowing — rightmost window-min selection
    // stated as the (h ASC, pos DESC) rank-1 rule; k=8, w=4
    "text_winnowing" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 11),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 8), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM d, LATERAL unnest(generate_series(1, len(text) - 7)) t(i)),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
        |wins AS (
        | SELECT doc_id, CAST(j AS BIGINT) AS j
        | FROM ng, LATERAL unnest(generate_series(1, n_grams - 3)) t(j)),
        |sel0 AS (
        | SELECT w.doc_id, w.j, g.pos, g.h,
        |  row_number() OVER (PARTITION BY w.doc_id, w.j ORDER BY g.h ASC, g.pos DESC) AS rk
        | FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.j AND w.j + 3),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM sel0 WHERE rk = 1)
        |SELECT s.doc_id, ng.n_grams, CAST(count(*) AS BIGINT) AS n_selected,
        | CAST(count(DISTINCT s.h) AS BIGINT) AS n_distinct_h,
        | CAST(sum(s.h) AS BIGINT) AS h_checksum,
        | 1000 * count(*) // (ng.n_grams - 3) AS density_milli
        |FROM sel s JOIN ng ON s.doc_id = ng.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "text_winnowing_overlap" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 11),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 8), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM d, LATERAL unnest(generate_series(1, len(text) - 7)) t(i)),
        |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
        |wins AS (
        | SELECT doc_id, CAST(j AS BIGINT) AS j
        | FROM ng, LATERAL unnest(generate_series(1, n_grams - 3)) t(j)),
        |sel0 AS (
        | SELECT w.doc_id, w.j, g.pos, g.h,
        |  row_number() OVER (PARTITION BY w.doc_id, w.j ORDER BY g.h ASC, g.pos DESC) AS rk
        | FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.j AND w.j + 3),
        |ph AS (SELECT DISTINCT doc_id, h FROM sel0 WHERE rk = 1),
        |df AS (SELECT h, CAST(count(*) AS BIGINT) AS dfreq FROM ph GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM ph),
        |keep AS (
        | SELECT ph.doc_id, ph.h FROM ph JOIN df USING (h), nd
        | WHERE dfreq * 1000 <= nd * 20),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM keep GROUP BY 1),
        |pair AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS n_shared
        | FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, n_shared,
        | 1000 * n_shared // least(ca.c, cb.c) AS shared_milli
        |FROM pair JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |WHERE least(ca.c, cb.c) >= 20
        | AND 1000 * n_shared // least(ca.c, cb.c) >= 500""".stripMargin,
    // r10 continuation: distinct-3 diversity per source over poly-hashed
    // word trigrams (the same hash-keyed dedup discipline as the dedups)
    "text_distinct_ngrams" ->
      """WITH tk AS (
        | SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS tk
        | FROM documents),
        |g AS (
        | SELECT source,
        |  list_reduce(list_transform(string_split(
        |    tk[CAST(i AS INTEGER)] || ' ' || tk[CAST(i + 1 AS INTEGER)] || ' ' || tk[CAST(i + 2 AS INTEGER)], ''),
        |    c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        | FROM tk, LATERAL unnest(generate_series(1, greatest(len(tk) - 2, 0))) t(i)),
        |agg AS (
        | SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_instances
        | FROM g GROUP BY 1),
        |tt AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(tk)) AS BIGINT) AS n_tokens
        | FROM tk GROUP BY 1)
        |SELECT tt.source, tt.n_docs, tt.n_tokens,
        | coalesce(agg.n_instances, 0) AS n_instances,
        | coalesce(agg.n_distinct, 0) AS n_distinct,
        | CASE WHEN coalesce(agg.n_instances, 0) > 0
        |  THEN 1000 * agg.n_distinct // agg.n_instances END AS distinct_milli
        |FROM tt LEFT JOIN agg ON tt.source = agg.source""".stripMargin,
    // oriented u<v edges stored once: each triangle a<b<c matches the
    // two-join exactly once; clustering in exact permille (all integers)
    "graph_triangles" ->
      """WITH sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |e AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM sup a JOIN sup b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |deg AS (
        | SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        |  SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
        |tri AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_tri
        | FROM e e1 JOIN e e2 ON e1.v = e2.u
        | WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.u = e1.u AND e3.v = e2.v))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        | (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        | (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        | (SELECT n_tri FROM tri) AS n_triangles,
        | 3 * (SELECT n_tri FROM tri) * 1000 //
        |  (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS clustering_permille""".stripMargin)
}
