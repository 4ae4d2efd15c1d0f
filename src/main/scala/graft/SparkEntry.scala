package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, IvfIndex, Multimodal, PqIndex, RelationalQueries, Similarity, TextAnalysis}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB oracle in
  * [[oracleSql]] (same column NAMES and cross-engine-deterministic
  * values — see RelationalQueries' determinism rules), unless the
  * operator is not SQL-expressible, in which case the driver records
  * a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.votesPerCandidate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "votes_per_candidate" -> (RelationalQueries.votesPerCandidate _),
    "turnout_by_location" -> (RelationalQueries.turnoutByLocation _),
    "dedup_votes" -> (RelationalQueries.dedupVotes _),
    "votes_windowed" -> (RelationalQueries.votesWindowed _),
    "q1_pricing_summary" -> (RelationalQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (RelationalQueries.q3ShippingPriority _),
    "q5_local_supplier" -> (RelationalQueries.q5LocalSupplier _),
    // bilateral-trade and product-type-profit join shapes (Q7/Q9)
    "q7_volume_shipping" -> (RelationalQueries.q7VolumeShipping _),
    "q9_product_profit" -> (RelationalQueries.q9ProductProfit _),
    // returned-item revenue per customer over a quarter, top 20
    // (TakeOrderedAndProject; corpus sides unhinted for AQE)
    "q10_returned_item" -> (RelationalQueries.q10ReturnedItem _),
    // Q18 large-volume orders: aggregate-once-then-join rewrite of
    // the textbook HAVING-subquery double scan
    "q18_large_orders" -> (RelationalQueries.q18LargeOrders _),
    // Q12's late-shipment priority split over the synthetic schema
    "q12_ship_priority" -> (RelationalQueries.q12ShipPriority _),
    // Q4 EXISTS → left-semi with a mixed-side residual predicate
    "q4_order_priority" -> (RelationalQueries.q4OrderPriority _),
    // Q13 zero-inclusive order-count histogram (outer join + double
    // aggregation)
    "q13_customer_distribution" -> (RelationalQueries.q13CustomerDistribution _),
    // Q6 pure scan-aggregate (pushdown showcase)
    "q6_revenue_forecast" -> (RelationalQueries.q6RevenueForecast _),
    // Q8 two-nation-role market share fraction per year
    "q8_market_share" -> (RelationalQueries.q8MarketShare _),
    // Q14 conditional-aggregate promo fraction
    "q14_promo_revenue" -> (RelationalQueries.q14PromoRevenue _),
    // Q15 revenue view + scalar-max equality join
    "q15_top_supplier" -> (RelationalQueries.q15TopSupplier _),
    // Q17 correlated per-part average, decorrelated form
    "q17_small_quantity" -> (RelationalQueries.q17SmallQuantityRevenue _),
    // Q19 disjunctive residual on an equi join
    "q19_discounted_revenue" -> (RelationalQueries.q19DiscountedRevenue _),
    // Q21 exists + not-exists double self-join (fault flag adapted)
    "q21_waiting_supplier" -> (RelationalQueries.q21WaitingSupplier _),
    // Q22 scalar-subquery threshold + anti join (country set adapted)
    "q22_global_sales" -> (RelationalQueries.q22GlobalSales _),
    // Q2/Q11/Q16/Q20 analogues over the derived partsupp relation
    // (no partsupp table in the corpus — see derivedPartsupp)
    "q2_mincost_supplier" -> (RelationalQueries.q2MinCostSupplier _),
    "q11_important_stock" -> (RelationalQueries.q11ImportantStock _),
    "q16_part_supplier" -> (RelationalQueries.q16PartSupplierCounts _),
    "q20_hot_part_suppliers" -> (RelationalQueries.q20HotPartSuppliers _),
    // Morton-tile locality spans vs the linear layout — the
    // measurement behind OPTIMIZE ... ZORDER BY
    "zorder_locality" -> (graft.operators.Bucketing.zorderLocality _),
    "top_orders" -> (RelationalQueries.topOrders _),
    "supplier_rank" -> (RelationalQueries.supplierRank _),
    "rollup_sales" -> (RelationalQueries.rollupSales _),
    "set_ops" -> (RelationalQueries.setOps _),
    "semi_anti_join" -> (RelationalQueries.semiAntiJoin _),
    "scalar_functions" -> (RelationalQueries.scalarFunctions _),
    "agg_functions" -> (RelationalQueries.aggFunctions _),
    "json_extraction" -> (RelationalQueries.jsonExtraction _),
    "outer_join" -> (RelationalQueries.outerJoin _),
    "asof_join" -> (RelationalQueries.asofJoinQuery _),
    "user_sessions" -> (RelationalQueries.userSessions _),
    "full_outer_join" -> (RelationalQueries.fullOuterJoin _),
    "cube_sales" -> (RelationalQueries.cubeSales _),
    "pivot_events" -> (RelationalQueries.pivotEvents _),
    "string_agg_dates" -> (RelationalQueries.stringAggDates _),
    "sql_subquery" -> (RelationalQueries.sqlSubquery _),
    "text_winnowing" -> (TextAnalysis.winnowingStats _),
    "having_filter" -> (RelationalQueries.havingFilter _),
    // co-bucketed warehouse join: write-once clustered tables, then a
    // zero-Exchange merge join (plan pinned in BucketingSpec)
    "bucketed_join" -> (graft.operators.Bucketing.bucketedJoinSummary _),
    // real Structured Streaming execution, oracle-checked against the
    // same SQL as the batch twins — all four run as ONE concurrent
    // bundle (StreamGate): votes/turnout fan out of a shared source
    // pass (the scan is paid once, not once per aggregate) while the
    // stateful windowed query (watermark + update mode + explicit
    // batch-id collapse) and the stream-static similarity scoring run
    // alongside, ST7-style
    "stream_votes_per_candidate" -> (graft.streaming.StreamGate.votesPerCandidate _),
    "stream_votes_windowed" -> (graft.streaming.StreamGate.votesWindowed _),
    "stream_similarity_topk" -> (graft.streaming.StreamGate.similarityTopK _),
    "stream_turnout_by_location" -> (graft.streaming.StreamGate.turnoutByLocation _),
    "stream_interval_join" -> (graft.streaming.StreamGate.intervalJoin _),
    // the production-sink gate family, run as a SECOND concurrent
    // bundle on the RocksDB state-store provider (the operational
    // backend for long-running stateful queries — state bounded by
    // disk, not executor memory): interval join + similarity appends
    // (same lineages as the main bundle's in-memory-provider runs),
    // streaming exact dedup (ST6 — each (user_id, event_type) key
    // emitted once on first arrival), and the one-pass two-sink
    // quality router (per-batch overwrite for exactly-once). Each
    // micro-batch lands on a distributed parquet sink; no row ever
    // visits the driver
    "stream_interval_join_sink" -> (graft.streaming.StreamGate.intervalJoinSink _),
    "stream_similarity_topk_sink" -> (graft.streaming.StreamGate.similarityTopKSink _),
    "stream_dedup_sink" -> (graft.streaming.StreamGate.streamDedupSink _),
    "stream_quality_route_sink" -> (graft.streaming.StreamGate.qualityRouteSink _),
    "multimodal_frames" -> (Multimodal.frameSample _),
    // LLM-data-pipeline extensions (SURVEY §7 north star)
    "text_token_stats" -> (TextAnalysis.tokenStats _),
    "text_quality" -> (TextAnalysis.qualityScores _),
    // hashed-feature linear model scoring (fasttext-shaped), all
    // integer — the classifier stage of a curation pipeline
    "text_classifier_score" -> (TextAnalysis.classifierScores _),
    "text_normalize" -> (TextAnalysis.normalizeStats _),
    "text_repetition" -> (TextAnalysis.repetitionStats _),
    "text_quality_filter" -> (TextAnalysis.gopherQualityFilter _),
    "text_blocklist_filter" -> (TextAnalysis.blocklistFilter _),
    // PII scrub tier: regex detect + redact over deterministically
    // injected synthetic PII (synthesis/detection independent — the
    // Multimodal pattern); map-only, no shuffle
    "text_pii_redact" -> (graft.operators.Pii.piiRedact _),
    "text_pii_stats" -> (graft.operators.Pii.piiStats _),
    // privacy tier: k-anonymity census + local generalization with
    // suppression over the (event_type, hour) quasi-identifier
    "privacy_k_anonymity" -> (graft.operators.Privacy.kAnonymityCensus _),
    "privacy_generalize" -> (graft.operators.Privacy.kAnonymityGeneralize _),
    "privacy_l_diversity" -> (graft.operators.Privacy.lDiversityCensus _),
    "privacy_t_closeness" -> (graft.operators.Privacy.tClosenessCensus _),
    "text_lang_id" -> (TextAnalysis.langIdConfusion _),
    // predicted-language mix per source vs the corpus-wide mix, as
    // exact scaled-integer shares and lift
    "lang_mix_drift" -> (TextAnalysis.langMixDrift _),
    // per-lang Herfindahl + effective source count (monoculture check)
    "source_concentration" -> (TextAnalysis.sourceConcentration _),
    // per-source type-token ratio + inverse-Simpson effective vocab
    "unigram_diversity" -> (TextAnalysis.unigramDiversity _),
    // per-lang top-10 tokens (WindowGroupLimit, not a global sort)
    "lang_top_tokens" -> ((s, d) => TextAnalysis.langTopTokens(s, d)),
    // pairwise vocabulary Jaccard between languages (bounded lists)
    "lang_vocab_overlap" -> (TextAnalysis.langVocabOverlap _),
    // robust (median/MAD) token-length census per PREDICTED language
    // — grouped twin of mad_outliers over the classifier's output
    "lang_robust_stats" -> (TextAnalysis.langRobustStats _),
    // approximate sketches under oracle: the ESTIMATE is
    // engine-specific, but the exact twin and the error-bound flag
    // are cross-engine facts — a sketch out of contract fails the gate
    "sketch_hll_bounds" -> (graft.operators.Sketches.hllBoundsGate _),
    "sketch_gk_bounds" -> (graft.operators.Sketches.gkBoundsGate _),
    "vocab_top_tokens" -> ((s, d) => TextAnalysis.vocabTopTokens(s, d)),
    "lm_bigram" -> ((s, d) => TextAnalysis.bigramLm(s, d)),
    "pack_length_buckets" -> ((s, d) => graft.operators.Packing.lengthBuckets(s, d)),
    "text_length_percentiles" -> (TextAnalysis.lengthPercentiles _),
    // sort-free histogram quantiles: the constant-memory production
    // path the exact rank-window percentiles validate
    "quantile_histogram" -> ((s, d) => TextAnalysis.quantileHistogram(s, d)),
    "text_tf_idf" -> (TextAnalysis.tfIdfTopTerms _),
    // BM25 top-10 per query over exact-rational fixed-point term
    // scores (k1=6/5, b=3/4 folded into one integer quotient)
    "bm25_search" -> ((s, d) => TextAnalysis.bm25Search(s, d)),
    // RM3 pseudo-relevance feedback: top-3 feedback docs -> top-5
    // expansion terms by summed tf (originals excluded) at weight 1
    // next to originals at weight 2 -> re-rank; rank-only output
    "bm25_rm3" -> ((s, d) => TextAnalysis.bm25Rm3Search(s, d)),
    // the retrieval index's maintenance audit: per-query top-10
    // overlap between the stored-era index and the folded full index
    // (df/dl/N statistics move with the era — the serving impact)
    "bm25_era_drift" -> ((s, d) => TextAnalysis.bm25EraDrift(s, d)),
    // Zipf rank×freq fit over the top-100 vocab (DECIMAL(38,0)
    // normalization product — 1e6·rank·freq wraps BIGINT for real
    // stop-word counts)
    "zipf_fit" -> ((s, d) => TextAnalysis.zipfFit(s, d)),
    // Good–Turing count-of-counts spectrum (|distinct freqs| rows;
    // the (r+1)·N_{r+1} product rides DECIMAL(38,0)/HUGEINT)
    "token_freq_of_freqs" -> (TextAnalysis.freqOfFreqs _),
    "vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    "lm_doc_novelty" -> (TextAnalysis.docNovelty _),
    // CCNet-style LM filtering signal: exact scaled-integer mean
    // bigram conditional probability per doc (one index exchange —
    // both count windows ride the hash(l) clustering)
    "lm_doc_score" -> (TextAnalysis.lmDocScores _),
    // CCNet head/middle/tail: per-lang LM-score terciles via the
    // histogram-quantile cut (never a per-lang corpus rank window)
    "lm_ppl_split" -> ((s, d) => TextAnalysis.lmPplSplit(s, d)),
    // query-likelihood retrieval with Dirichlet smoothing: the
    // LM-based BM25 alternative, per-factor integer floors
    "qlm_dirichlet_search" -> ((s, d) => TextAnalysis.qlmDirichletSearch(s, d)),
    // classifier-vs-novelty calibration: value-bucketed (never a
    // corpus rank window), pooled novelty per score bucket
    "quality_calibration" -> ((s, d) => TextAnalysis.qualityCalibration(s, d)),
    // tokenizer-training + sub-document-dedup surface: round-1 BPE
    // pair-merge frequencies and content-defined chunking stats
    "bpe_pair_stats" -> ((s, d) => TextAnalysis.bpePairStats(s, d)),
    "cdc_chunk_stats" -> (TextAnalysis.cdcChunkStats _),
    // chunk-level cross-doc exact dedup: the sub-document granularity
    // whole-doc hashing misses and set-similarity only scores
    "cdc_chunk_dedup" -> (TextAnalysis.cdcChunkDedup _),
    // RAG retrieval chunking: overlapping token windows, one row per
    // chunk with its content hash (the retrieval index key)
    "rag_chunks" -> ((s, d) => TextAnalysis.ragChunks(s, d)),
    "cdc_latest_per_key" -> (RelationalQueries.latestEventPerUser _),
    // MERGE INTO semantics: delete/update/insert branches as one
    // left join + one anti-join — what Delta/Iceberg MERGE plans
    "cdc_merge_upsert" -> (RelationalQueries.mergeUpsert _),
    // SCD Type-2 version intervals via a per-user lead window
    "scd2_intervals" -> (RelationalQueries.scd2Intervals _),
    // behavioral path census: first-3-event-type sequences per
    // 1h-gap session, top-k
    "session_paths" -> ((s, d) => RelationalQueries.sessionPaths(s, d)),
    "events_hourly_uniques" -> (RelationalQueries.hourlyUniques _),
    // analytics depth: exact-integer-sums Pearson correlation (a
    // native streaming corr() is summation-order-dependent and can
    // never hash-match), one-pass strict-ordering funnel, and
    // lag/ntile window analytics over a unique total order
    "stats_correlation" -> (RelationalQueries.statsCorrelation _),
    "funnel_steps" -> (RelationalQueries.funnelSteps _),
    "event_gap_quartiles" -> (RelationalQueries.eventGapQuartiles _),
    "event_transitions" -> (RelationalQueries.eventTransitions _),
    // unordered co-occurrence twin of the transition matrix
    // (association mining's first A-priori level)
    "itemset_pairs" -> (RelationalQueries.itemsetPairs _),
    "retention_cohorts" -> (RelationalQueries.retentionCohorts _),
    // growth dashboard: daily active/new/returning + running uniques
    // via first-touch counting (never a windowed COUNT DISTINCT)
    "daily_uniques_running" -> (RelationalQueries.dailyUniquesRunning _),
    // weekly avg-DAU/WAU ratio off one (week, day, user) distinct
    "stickiness_weekly" -> (RelationalQueries.stickinessWeekly _),
    // per-day peak concurrent sessions via a day-partitioned boundary
    // sweep + |days|-row carry (two-level prefix sum, no global sort)
    "concurrency_peaks" -> (RelationalQueries.concurrencyPeaks _),
    // robust (median/MAD) outlier census — exact rank-math medians
    "mad_outliers" -> (RelationalQueries.madOutliers _),
    // time-proximity dedup: same-key bursts within 10 min collapse
    // to their first event (gaps-and-islands, one exchange)
    "debounce_events" -> ((s, d) => RelationalQueries.debounceEvents(s, d)),
    // last-touch revenue attribution per channel
    "attribution_last_touch" -> (RelationalQueries.attributionLastTouch _),
    // decayed twin: power-of-two half-life weights keep every credit
    // an exact integer (float pow decay can never hash-match)
    "attribution_time_decay" -> ((s, d) => RelationalQueries.attributionTimeDecay(s, d)),
    // trailing-7-observed-days spike detection, exact integer ratios
    "daily_anomaly" -> (RelationalQueries.dailyAnomaly _),
    "zscore_outliers" -> (RelationalQueries.zscoreOutliers _),
    "pmi_collocations" -> ((s, d) => TextAnalysis.pmiCollocations(s, d)),
    "timeseries_gapfill" -> (RelationalQueries.hourlyGapFill _),
    "winsorized_stats" -> (RelationalQueries.winsorizedStats _),
    "chi2_contingency" -> (TextAnalysis.chi2Contingency _),
    "votes_sliding" -> (RelationalQueries.votesSlidingWindow _),
    // deterministic count-min: md5-bucketed counters make the sketch
    // itself oracle-checkable (est >= true, both exact integers)
    "countmin_topk" -> ((s, d) => TextAnalysis.countMinEstimates(s, d)),
    // two-phase salted aggregation twin — same oracle as the direct
    // groupBy, keeping the skew remedy inside the correctness surface
    "skew_salted_votes" -> (RelationalQueries.votesPerCandidateSalted _),
    "range_join_bands" -> ((s, d) => RelationalQueries.rangeJoinBands(s, d)),
    // the documented large-interval-table rewrite: bucket both sides,
    // equi-join + residual predicate — same oracle as the broadcast
    // probe formulation
    "range_join_bucketed" -> ((s, d) => RelationalQueries.rangeJoinBandsBucketed(s, d)),
    // replicated-dim salted join twin — the hot-key join remedy,
    // hash-matched against the plain-join oracle
    "skew_salted_join" -> (RelationalQueries.skewSaltedJoin _),
    // incrementally-maintained CDC view: stateful update-mode max_by,
    // same oracle as the batch compaction
    "stream_cdc_latest" -> (StreamingQueries.latestEventPerUserStream _),
    // live funnel: stateful update-mode per-user first-touch mins,
    // reduced on the read side — same oracle as the batch funnel
    "stream_funnel" -> (StreamingQueries.funnelStepsStream _),
    // stateful last-event chaining (flatMapGroupsWithState) through
    // the append sink — same oracle as the batch lag-window matrix
    "stream_transitions" -> ((s, d) => graft.streaming.Transitions.transitionsViaSink(s, d)),
    // live per-user co-occurrence sets (update-mode collect_set via
    // the sink path), expanded with the shared batch reducer — same
    // oracle as the batch itemset gate
    "stream_itemset_pairs" -> (StreamingQueries.itemsetPairsStream _),
    // A-priori level-2 closure: support, confidences, and lift per
    // type pair out of ONE tagged generator + hash aggregation
    "assoc_rules" -> (RelationalQueries.assocRules _),
    // the BPE iteration step: apply round-1's top merge, recount
    "bpe_merge_round2" -> ((s, d) => TextAnalysis.bpeMergeRound2(s, d)),
    // the full iterated BPE trainer: 3 greedy merge rounds over the
    // |vocab| word table, emitting the ordered merge table
    "bpe_merge_train" -> ((s, d) => TextAnalysis.bpeMergeTrain(s, d)),
    // the encode side: merges applied corpus-wide as literal replace
    // chains inside codegen; per-doc compression ratio
    "bpe_encode_stats" -> ((s, d) => TextAnalysis.bpeEncodeStats(s, d)),
    // live hourly-active-users gauge: in-stream (user, hour) dedup
    // appended to the sink, stateless per-hour count on the landed
    // first-sightings (streaming COUNT DISTINCT, the two-stage way)
    "stream_active_users" -> (StreamingQueries.activeUsersStream _),
    // ingest-time near-dup probe: arriving docs banded map-side and
    // probed against the stored corpus band index, stream-static
    "stream_incremental_dedup" -> (StreamingQueries.incrementalDedupViaSink _),
    // ingest-time PQ encode: arriving embeddings → codes appended to
    // the distributed index sink, row-identical to the batch artifact
    "stream_pq_encode" -> (StreamingQueries.pqEncodeViaSink _),
    // the refresh's re-encode delta streamed against the v2 codebook:
    // only arrived-since rows flow; landed == the fold's v2 slice
    "stream_pq_reencode" -> (StreamingQueries.pqReencodeViaSink _),
    // ingest-time PII scrub: arriving docs redacted map-side,
    // stateless, scrub records landed on the distributed sink
    "stream_pii_redact" -> (StreamingQueries.piiRedactViaSink _),
    // ingest-time quarantine: the dead-letter sink lands exactly the
    // batch gate's diverted rows (stateless per-row checks)
    "stream_quarantine" -> (StreamingQueries.quarantineViaSink _),
    // ingest-time winnowing probe: arriving docs' selected
    // fingerprints vs the stored MOSS index, stream-static, stateless
    "stream_winnow_probe" -> (StreamingQueries.winnowProbeViaSink _),
    // ingest-time boilerplate scrub: arriving docs' segments
    // anti-joined against the stored boilerplate index, kept
    // segments land — scrub-before-land, stateless
    "stream_boilerplate_scrub" -> (StreamingQueries.boilerplateScrubViaSink _),
    // ingest-time CCNet LM scoring: arriving docs scored against the
    // stored per-lang bigram LM, stream-static, OOV scores 0
    "stream_lm_score" -> (StreamingQueries.lmScoreViaSink _),
    // ingest-time edit-distance probe: arriving docs vs the stored
    // band index, levenshtein-verified, old x new slice lands
    "stream_edit_probe" -> (StreamingQueries.editProbeViaSink _),
    // ingest-time tf-index maintenance: arriving docs' postings land
    // map-side; the read-back (pos-replay-dedup'd) is the increment's
    // tf slice — appending it to the stored index IS the refresh
    "stream_tf_ingest" -> (StreamingQueries.tfIngestViaSink _),
    // ingest-time perceptual probe: arriving images fingerprint
    // map-side and probe the stored band index (stream-static join),
    // hamming-verified pairs land
    "stream_phash_probe" -> (StreamingQueries.phashProbeViaSink _),
    "doc_fingerprint" -> (TextAnalysis.fingerprintStats _),
    "dedup_exact" -> (Dedup.exactDedupStats _),
    "dedup_minhash_lsh" -> (Dedup.minhashLshPairsShared _),
    // feed-level duplication matrix: verified near-dup pairs per
    // unordered (source, source) cell, riding the pair artifact
    "dedup_source_matrix" -> (Dedup.sourceDupMatrix _),
    // sketch-quality audit: signature agreement vs bucketed true
    // Jaccard over the verified pairs ("is 12 hashes enough")
    "minhash_calibration" -> ((s, d) => Dedup.minhashCalibration(s, d)),
    // banding-recall audit vs the exact-Jaccard truth, per jaccard
    // decile — calibration sees only surfaced candidates; this
    // measures the pairs banding never surfaced (the S-curve)
    "dedup_minhash_recall" -> ((s, d) => Dedup.minhashRecallVsExact(s, d)),
    // increment-probes-index incremental dedup; result == full
    // pairs touching the increment (order-independent banding)
    "dedup_incremental_lsh" -> ((s, d) => Dedup.minhashIncrementalPairs(s, d)),
    // incremental cluster maintenance via contraction; result ==
    // the full-corpus transitive closure
    "dedup_clusters_incremental" -> ((s, d) => Dedup.lshClustersIncremental(s, d)),
    // the index-refresh loop: fold the landed increment into the
    // band index (append-only, old never rescanned), probe the NEXT
    // increment; folded ≡ rebuilt pinned in DedupClustersSpec
    "dedup_index_refresh" -> ((s, d) => Dedup.minhashRefreshFoldedProbe(s, d)),
    // the boilerplate-index maintenance loop: landed increment's df
    // partials fold into the stored count table (additivity over
    // disjoint eras), next era probes the refreshed index
    "boilerplate_index_refresh" -> ((s, d) => Dedup.boilerplateRefreshProbe(s, d)),
    // band-occupancy histogram: the hot-bucket audit run before a
    // 100× scale-up (pair expansion is quadratic per bucket)
    "lsh_band_stats" -> ((s, d) => Dedup.lshBandStats(s, d)),
    // exact-integer power iteration: dominant principal direction of
    // the embedding corpus, raw unnormalized v3 components
    "embedding_power_iteration" -> ((s, d) => Similarity.powerIteration(s, d)),
    // are the low-quality docs also the duplicated ones? fixed-bin
    // stopword-score buckets × exact-dup fraction
    "quality_dup_calibration" -> (Dedup.qualityDupCalibration _),
    "dedup_degree_stats" -> (Dedup.degreeHistogram _),
    "source_overlap" -> ((s, d) => Dedup.sourceShingleOverlap(s, d)),
    "dedup_clusters" -> (Dedup.nearDupClusters _),
    // graph analytics on the memoized near-dup pair graph: fixed-
    // iteration scaled-integer PageRank (canonical-doc centrality)
    // and the wedge/triangle census (duplication-structure shape)
    "graph_pagerank" -> ((s, d) => graft.operators.GraphOps.pagerank(s, d)),
    // Newman modularity of the source partition over the pair graph:
    // is duplication intra-source cleanup or cross-source leakage?
    "graph_modularity" -> ((s, d) => graft.operators.GraphOps.sourceModularity(s, d)),
    "graph_triangles" -> (graft.operators.GraphOps.triangleCensus _),
    // bounded-round seeded label spreading (hop distance + nearest
    // seed), distinct from the CC fixpoint
    "graph_label_prop" -> ((s, d) => graft.operators.GraphOps.labelPropagation(s, d)),
    // fixed-round 2-core peeling census on the shared pair graph
    "graph_kcore" -> ((s, d) => graft.operators.GraphOps.kCorePeeling(s, d)),
    // whole-cluster train/val/test assignment: a near-dup family
    // never straddles a split
    "sample_leakage_free" -> (graft.operators.Sampling.leakageFreeSplits _),
    "dedup_keep_best" -> (Dedup.keepBestDedup _),
    "dedup_simhash" -> (Dedup.simhashFingerprints _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashHammingPairs(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    // asymmetric |A∩B|/min(|A|,|B|) over the same inverted index —
    // catches short-doc-inside-long-doc families Jaccard misses
    "dedup_containment" -> ((s, d) => Dedup.ngramContainmentPairs(s, d)),
    // per-source duplicated-shingle fraction (with multiplicity) —
    // the scan-level "does this source need pairwise dedup" audit
    "dedup_shingle_mass" -> ((s, d) => Dedup.shingleDupMass(s, d)),
    // shingle-df histogram vs the stop-shingle cutoff — the recall
    // audit of the exact-Jaccard family (round-8 scale rehearsal:
    // past cutoff saturation the pair gates return zero rows at
    // their usual speed; this gate is how you see it)
    "dedup_shingle_df_stats" -> ((s, d) => Dedup.shingleDfStats(s, d)),
    "dedup_char_shingle_df_stats" -> ((s, d) => Dedup.charShingleDfStats(s, d)),
    // shared 5-token-prefix families (boilerplate-header detector)
    "dedup_prefix_families" -> ((s, d) => Dedup.prefixFamilies(s, d)),
    // span-level duplicate coverage (fraction of each doc's tokens
    // inside a cross-doc repeated k-token span) — the remove-the-span
    // dedup criterion set-similarity scores miss
    "dedup_span_coverage" -> ((s, d) => Dedup.spanCoverage(s, d)),
    // the removal step on top of the coverage measurement: drop every
    // token covered by a duplicated span, hash the scrubbed text
    "dedup_span_scrub" -> ((s, d) => Dedup.spanScrub(s, d)),
    // CCNet-style boilerplate removal: segment hashes shared by >= 2
    // docs scrubbed, clean text reassembled + pinned via md5
    "text_line_dedup" -> ((s, d) => Dedup.boilerplateScrub(s, d)),
    // edit-distance verification of the SAME LSH candidates: exact
    // levenshtein permille of the longer text, <= EditPermilleCutoff survives
    "dedup_edit_ratio" -> ((s, d) => Dedup.editRatioPairs(s, d)),
    // MOSS-style cross-doc winnowing fingerprint matches: pairs
    // sharing >= 2 selected fingerprints, containment-scored
    "dedup_winnow_pairs" -> ((s, d) => Dedup.winnowPairs(s, d)),
    // cumulative content-novelty per ingest-order bucket
    "dedup_yield_curve" -> ((s, d) => Dedup.dedupYieldCurve(s, d)),
    // the same novelty curve per SOURCE (which feed still pays),
    // cumulative windows partitioned by source — parallel prefix sums
    "source_yield_curves" -> ((s, d) => Dedup.sourceYieldCurves(s, d)),
    "dedup_char_ngram" -> ((s, d) => Dedup.charNgramJaccardPairs(s, d)),
    "similarity_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "similarity_ann_lsh" -> ((s, d) => Similarity.annLshTopK(s, d)),
    "similarity_ann_recall" -> ((s, d) => Similarity.annRecallAtK(s, d)),
    "similarity_ann_multiprobe" -> ((s, d) => Similarity.annLshTopKMultiProbe(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Similarity.embeddingNearDupPairs(s, d)),
    // contrastive triplet mining: per anchor, top-3 same-label
    // (positive) and top-3 cross-label (hard negative) neighbors
    // within its IVF cell — rank-only output, cell-blocked pairing
    "mine_hard_negatives" -> ((s, d) => Similarity.mineContrastive(s, d)),
    // the miner's APPROXIMATE regime: the corpus deterministically
    // replicated past the first SRP-staircase threshold, so the p>=1
    // block keys and sign bits are oracle-gated at every driver SF
    "mine_contrastive_scaled" -> ((s, d) => Similarity.mineContrastiveScaled(s, d)),
    // Matryoshka serving audit: full-dim top-5 overlap after 16/32-dim
    // prefix truncation (one pair pass, three metrics, rank-only)
    "similarity_matryoshka" -> ((s, d) => Similarity.dimTruncationAudit(s, d)),
    // graded serving-quality audit: nDCG@10 of the multi-probe ANN
    // ranking vs exact brute force, integer LUT discounts
    "similarity_ndcg" -> ((s, d) => Similarity.ndcgAudit(s, d)),
    // Great-Expectations-style warehouse contract audit: FK coverage,
    // ranges, uniqueness, column consistency as (check, counts, pass)
    "data_expectations" -> (graft.operators.Expectations.dataExpectations _),
    // the dead-letter channel: injected contract violations divert
    // with a typed reason (fixed precedence) instead of landing
    "events_quarantine" -> (graft.operators.Expectations.quarantine _),
    // SemDeDup policy: cosine pairs → transitive closure → keep the
    // component-min representative; full-corpus keep/retire verdicts
    "dedup_semantic_keep" -> ((s, d) => Similarity.semanticKeep(s, d)),
    // product-quantization family: codes (16 bytes/vec vs 256 for
    // floats — the 100-TB memory tier), ADC serving over codes only,
    // and the measured recall-vs-exact honesty gate
    "similarity_pq_codes" -> ((s, d) => PqIndex.codesTable(s, d)),
    "similarity_pq_adc" -> ((s, d) => PqIndex.adcTopK(s, d)),
    "similarity_pq_rerank" -> ((s, d) => PqIndex.adcRerankTopK(s, d)),
    "similarity_pq_recall" -> ((s, d) => PqIndex.adcRecallAtK(s, d)),
    // graded ordering audit for BOTH deployed PQ serving paths
    "similarity_pq_ndcg" -> ((s, d) => PqIndex.adcNdcgAtK(s, d)),
    // the composed FAISS-style index: probe nProbe coarse cells,
    // ADC-score only their codes
    "similarity_ivf_pq" -> ((s, d) => PqIndex.ivfPqTopK(s, d)),
    // the codebook maintenance loop: occupancy-drift monitor over the
    // stored v1 index, the version-tagged refresh fold (stored rows
    // keep v1 codes; the increment re-encodes against the refreshed
    // codebook iff the trigger fired), and the serving-shift audit
    "pq_refresh_drift" -> ((s, d) => PqIndex.codebookDrift(s, d)),
    "pq_codebook_refresh" -> ((s, d) => PqIndex.codebookRefreshCodes(s, d)),
    "pq_refresh_adc_shift" -> ((s, d) => PqIndex.refreshAdcShift(s, d)),
    // hybrid BM25+vector retrieval fused by integer reciprocal-rank
    // fusion (k0=60) — the two-tower RAG serving shape
    "hybrid_rrf_topk" -> ((s, d) => Similarity.hybridRrfTopK(s, d)),
    // same fusion with the vector tower served from the IVF+PQ index
    // — the deployed shape; the swap is rank-source-only
    "hybrid_rrf_ivfpq" -> ((s, d) => Similarity.hybridRrfIvfPqTopK(s, d)),
    "embedding_quantize" -> (Similarity.quantizeInt8 _),
    // per-label centroid alignment to the corpus mean over exact
    // integer sum vectors (cosine is scale-invariant)
    "embedding_centroid_drift" -> (Similarity.centroidDrift _),
    // per-source cosine between interleaved snapshot-half centroids
    // (embeddings ⋈ documents on the shared id domain)
    "source_snapshot_drift" -> (Similarity.sourceSnapshotDrift _),
    // per-dimension quantized moments (whitening / dead-dim table)
    "embedding_dim_stats" -> (Similarity.embeddingDimStats _),
    "sample_per_source_cap" -> ((s, d) => graft.operators.Sampling.perSourceCap(s, d)),
    "pack_sequences" -> ((s, d) => graft.operators.Packing.packSequences(s, d)),
    "ivf_assign" -> (IvfIndex.assignments _),
    // cluster-balanced selection: cap every IVF cell at Q=25 members,
    // picked in salted-hash order (deterministic, coordination-free)
    "sample_cluster_quota" -> ((s, d) => graft.operators.Sampling.clusterQuotaSample(s, d)),
    // confident-learning-shaped mislabeling audit: label vs IVF-cell majority
    "quality_label_noise" -> (Similarity.labelNoiseAudit _),
    "ivf_kmeans_iterated" -> ((s, d) => IvfIndex.kmeansIterated(s, d)),
    "session_windows" -> (RelationalQueries.sessionWindows _),
    "sample_hash_splits" -> (graft.operators.Sampling.hashSplitStats _),
    "sample_weighted_mix" -> (graft.operators.Sampling.weightedMixStats _),
    // mT5/XLM-R temperature sampling at T=2: exact-integer sqrt-share
    // targets + deterministic hash-threshold membership
    "sample_temperature_mix" -> ((s, d) => graft.operators.Sampling.temperatureMix(s, d)),
    "sample_top_quality" -> ((s, d) => graft.operators.Sampling.topQualityPerSource(s, d)),
    "sample_epoch_shuffle" -> ((s, d) => graft.operators.Sampling.epochShuffle(s, d)),
    "sample_stratified" -> (graft.operators.Sampling.stratifiedQualityMix _),
    // DSIR-shaped hashed-unigram importance weights vs the lang='en'
    // target domain (log-free monotone ratio, add-one smoothed)
    "sample_importance_weights" -> ((s, d) => graft.operators.Sampling.importanceWeights(s, d)),
    // the resampling step on top: accept with probability w/w_max via
    // the exact integer test h16·w_max < 65536·w — coordination-free
    "sample_importance_resample" -> ((s, d) => graft.operators.Sampling.importanceResample(s, d)),
    // largest-remainder token-budget apportionment: quotas sum
    // EXACTLY to the budget (per-source rounding can't)
    "token_budget_allocation" -> ((s, d) => graft.operators.Sampling.tokenBudgetAllocation(s, d)),
    "decontamination_overlap" -> ((s, d) => graft.operators.Sampling.trainTestShingleOverlap(s, d)),
    // near-dup (paraphrase-level) contamination across the hash
    // split boundary — only NEAR dups can cross it (exact dups
    // hash to the same split by construction)
    "decontamination_fuzzy" -> ((s, d) => graft.operators.Sampling.fuzzyDecontamination(s, d)),
    "decontamination_bloom" -> ((s, d) => graft.operators.Sampling.trainTestShingleOverlapBloom(s, d)),
    // embedding-space decontamination: train vectors that are cosine
    // near-dups of any test vector (the paraphrase leak the n-gram
    // legs miss), per-train-vector hit counts
    "decontamination_semantic" -> ((s, d) => graft.operators.Sampling.semanticDecontamination(s, d)),
    // the deployment cell shape: the same sweep blocked by (IVF cell
    // x SRP prefix bucket) with the prefix growing one plane per
    // corpus doubling — block count grows with N, pair work linear
    // (the measured replacement for the fixed-label-cell quadratic)
    "decontamination_semantic_ivf" ->
      ((s, d) => graft.operators.Sampling.semanticDecontaminationIvf(s, d)),
    // the ingest twin: arriving candidate vectors probe the FIXED
    // test bank stream-static before landing (scrub-before-train)
    "stream_decontamination" -> (StreamingQueries.decontaminationViaSink _),
    // the bank's maintenance loop: a new benchmark era FOLDS into the
    // stored test bank (append, never a corpus rescan) and the ingest
    // audit runs against the folded bank; the oracle computes the
    // rebuilt form, so the hash-match is the fold == rebuild proof
    "decontamination_bank_refresh" ->
      ((s, d) => graft.operators.Sampling.semanticBankRefreshProbe(s, d)),
    // watermark-driven state eviction, oracle-gated: era-ordered
    // file-stream batches deliver provably-late rows; evicted windows
    // and dropped rows shape the collapsed update-mode changelog
    "stream_late_eviction" -> (StreamingQueries.lateEvictionViaSink _),
    // MERGING-window eviction: session windows driven through
    // watermark-close over the same staged era stream, append mode —
    // late rows that would have extended an already-closed session
    // drop (or start a NEW session when they survive the late filter)
    "stream_session_eviction" -> (StreamingQueries.sessionEvictionViaSink _),
    // the APPEND-mode twin: a window emits exactly once, at eviction,
    // with whatever content merged by then — the sink holds exactly
    // the closed windows
    "stream_eviction_append" -> (StreamingQueries.evictionAppendViaSink _),
    "multimodal_features" -> (Multimodal.mediaFeatures _),
    // media-level exact dedup on the EXTRACTED payload bytes: content
    // identity across container wrappers, full-payload parser check
    "multimodal_payload_dedup" -> (Multimodal.payloadDedup _),
    // perceptual near-dup over decoded image payloads: 63-bit dHash
    // gradient fingerprint, pigeonhole-banded pairing (never
    // all-pairs), hamming <= 7
    "multimodal_phash_dedup" -> (Multimodal.perceptualNearDupPairsGate _),
    // audio corpus accounting: per (rate, channels) bucket — files,
    // PCM sample frames, integer-exact total duration
    "multimodal_audio_stats" -> (Multimodal.audioStats _),
    // perceptual keep policy: phash pairs closed under CC, exactly
    // the component-minimum media id survives per cluster
    "multimodal_phash_keep" -> (Multimodal.perceptualKeep _),
    // perceptual AUDIO near-dup: sign-of-delta over the frame-energy
    // envelope of decoded WAV PCM, banded like phash (pigeonhole
    // multi-index, adaptive grid, never all-pairs)
    "multimodal_audio_neardup" -> (Multimodal.audioNearDupPairsGate _),
    // the audio tier's keep policy: pair artifact closed under CC,
    // component-minimum clip survives, singletons implicit
    "multimodal_audio_keep" -> (Multimodal.audioKeep _),
    // the perceptual tier's maintenance loop: a new media era FOLDS
    // into the stored band index (append-only — old corpus never
    // re-fingerprinted); the next era probes the refreshed index.
    // Oracle computes the REBUILT index, so the hash-match is the
    // fold == rebuild proof (the bank-refresh convention)
    "phash_index_refresh" -> (Multimodal.phashRefreshFoldedProbe _),
    // the audio tier's refresh twin — both perceptual tiers now run
    // the full probe -> refresh -> audit maintenance loop
    "audio_index_refresh" -> (Multimodal.audioRefreshFoldedProbe _),
    // the audio tier's ingest loop: arriving clips fingerprint
    // map-side and probe the stored band index stream-static
    "stream_audio_probe" -> (StreamingQueries.audioProbeViaSink _),
    // capstone composition: quality filter + keep-best dedup + split
    // assignment → the per (source, split) provisioning table
    "curation_pipeline" -> (graft.operators.Curation.curationSummary _),
  )

  // DuckDB dialect notes (verified on DuckDB 1.0 locally):
  //  - exact money: CAST(round(sum(CAST(x AS DECIMAL(12,2))),2) AS DOUBLE)
  //    matches Spark's round(sum(decimal),2).cast(double) bit-for-bit;
  //  - count(*) is BIGINT = Spark LongType;
  //  - extract(...)/length() return BIGINT in DuckDB → cast to INT to
  //    match Spark's IntegerType.
  private val moneyVal = "CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)"
  private val revenue =
    "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)"

  // the derived partsupp relation shared by the Q2/Q11/Q16/Q20
  // analogues (no partsupp table in the corpus): exact integer
  // quantity-hundredths / price-cents, see RelationalQueries.derivedPartsupp
  private val psCte =
    """ps AS MATERIALIZED (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS ps_availqty_c,
      |         min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS ps_supplycost_c
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // the sink-path gates compute the same result through the
  // production parquet-sink plan, so they share their twins' oracles
  private val quarantineOracleSql: String =
    """SELECT event_id,
      |  CASE WHEN event_id % 131 = 0 THEN 'user_id_null'
      |       WHEN event_id % 97 = 0 THEN 'value_null'
      |       WHEN event_id % 113 = 0 THEN 'event_type_empty' END AS reason
      |FROM events
      |WHERE event_id % 131 = 0 OR event_id % 97 = 0 OR event_id % 113 = 0""".stripMargin

  def oracleSql: Map[String, String] = {
    val base = baseOracleSql ++ extensionOracleSql
    base ++ Map(
      "stream_interval_join_sink" -> base("stream_interval_join"),
      "stream_similarity_topk_sink" -> base("stream_similarity_topk"),
      // the ingest-time encoded index must equal the batch codes artifact
      "stream_pq_encode" -> base("similarity_pq_codes"),
      // the quarantine channel: same injected moduli, same reason
      // precedence as the engine's per-row expressions
      "events_quarantine" -> quarantineOracleSql,
      "stream_quarantine" -> quarantineOracleSql,
      // the streamed re-encode delta must equal the refresh fold's v2
      // slice (empty when the drift trigger does not fire)
      "stream_pq_reencode" ->
        s"""WITH $pqCtes,
           |$pqRefreshCtes,
           |$pqFoldCte
           |SELECT vec_id, cb_version, c0, c1, c2, c3, nrm FROM fold
           |WHERE cb_version = 2""".stripMargin,
      // the ingest-time scrub must land the batch scrub record exactly
      "stream_pii_redact" -> base("text_pii_redact"),
      // the incrementally-maintained view must equal the batch compaction
      "stream_cdc_latest" -> base("cdc_latest_per_key"),
      // salted two-phase agg must equal the direct groupBy
      "skew_salted_votes" -> base("votes_per_candidate"),
      // the bucketed rewrite must equal the broadcast range probe
      "range_join_bucketed" -> base("range_join_bands"),
      // the live streaming funnel must equal the batch recompute
      "stream_funnel" -> base("funnel_steps"),
      // the stateful last-event tracker must equal the batch lag window
      "stream_transitions" -> base("event_transitions"),
      // the live co-occurrence sets must expand to the batch pair census
      "stream_itemset_pairs" -> base("itemset_pairs"),
    )
  }

  private def baseOracleSql: Map[String, String] = Map(
    "votes_per_candidate" ->
      s"""SELECT event_type, $moneyVal AS total_votes, count(*) AS n_events
         |FROM events GROUP BY event_type""".stripMargin,
    "turnout_by_location" ->
      """SELECT n_name, count(*) AS turnout
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name""".stripMargin,
    "dedup_votes" ->
      s"""WITH firsts AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         |    FROM events) WHERE rn = 1)
         |SELECT event_type, count(*) AS n_first_events, $moneyVal AS first_event_value
         |FROM firsts GROUP BY event_type""".stripMargin,
    "votes_windowed" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |       event_type, $moneyVal AS total_value, count(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,
    "events_hourly_uniques" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       count(*) AS n_events, count(DISTINCT user_id) AS n_unique_users
        |FROM events GROUP BY 1""".stripMargin,
    // banded non-equi range join against a generated interval table
    "range_join_bands" ->
      s"""WITH bands AS (
         |  SELECT b AS band_id, CAST(b * 100 AS DOUBLE) AS lo,
         |         CAST((b + 1) * 100 AS DOUBLE) AS hi
         |  FROM (SELECT unnest(generate_series(0, 7)) AS b))
         |SELECT band_id, count(*) AS n_events, $moneyVal AS total_value
         |FROM events JOIN bands ON value >= lo AND value < hi
         |GROUP BY band_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(round(sum(CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |       o_orderpriority, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       year(l_shipdate) AS l_year, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_10', 'NATION_12')
         |  AND n2.n_name IN ('NATION_10', 'NATION_12')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year, $revenue AS revenue
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2""".stripMargin,
    // the textbook HAVING-subquery formulation (lineitem scanned
    // twice) — the Spark side's aggregate-once rewrite must match it;
    // (totalprice, o_orderkey) is a unique total order for the LIMIT
    "q18_large_orders" ->
      """WITH sq AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |  GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
        |       sq.sum_qty
        |FROM orders
        |JOIN sq ON o_orderkey = sq.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin,
    "q13_customer_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_custkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM co GROUP BY 1""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |  CAST(round(sum(CASE WHEN n2.n_name = 'NATION_10'
         |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) ELSE 0 END), 2) AS DOUBLE)
         |  / $revenue AS mkt_share,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |GROUP BY 1""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT 100.0 * CAST(round(sum(CASE WHEN p_type = 'PROMO'
         |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) ELSE 0 END), 2) AS DOUBLE)
         |  / $revenue AS promo_revenue_pct,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS MATERIALIZED (
         |  SELECT l_suppkey AS supplier_no, $revenue AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON supplier_no = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q17_small_quantity" ->
      """WITH aq AS (
        |  SELECT l_partkey AS aq_partkey,
        |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / count(*) AS avgq_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN aq ON l_partkey = aq_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS DOUBLE) < CAST(0.2 AS DOUBLE) * avgq_cents""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT $revenue AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q22_global_sales" ->
      """WITH c AS MATERIALIZED (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_cents,
        |         c_acctbal
        |  FROM customer WHERE c_nationkey IN (3, 7, 13, 17, 19)),
        |a AS (SELECT CAST(sum(bal_cents) AS DOUBLE) / count(*) AS avg_cents
        |      FROM c WHERE c_acctbal > CAST(0 AS DOUBLE))
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        |FROM c, a
        |WHERE CAST(bal_cents AS DOUBLE) > a.avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,
    "q2_mincost_supplier" ->
      s"""WITH $psCte,
         |rps AS MATERIALIZED (
         |  SELECT ps_partkey, ps_supplycost_c, s_acctbal, s_name, n_name
         |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'),
         |w AS (SELECT *, min(ps_supplycost_c) OVER (PARTITION BY ps_partkey) AS m_cost FROM rps)
         |SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal, s_name, n_name,
         |       p_partkey, p_brand, ps_supplycost_c AS supplycost_c
         |FROM w JOIN part ON ps_partkey = p_partkey
         |WHERE ps_supplycost_c = m_cost AND p_size <= 25 AND p_type = 'LARGE'
         |ORDER BY acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    "q11_important_stock" ->
      s"""WITH $psCte,
         |nps AS MATERIALIZED (
         |  SELECT ps_partkey, ps_supplycost_c * ps_availqty_c AS v
         |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name IN ('NATION_3', 'NATION_7')),
         |tot AS (SELECT sum(v) AS total_v, count(DISTINCT ps_partkey) AS npart FROM nps)
         |SELECT ps_partkey AS partkey, CAST(sum(v) AS BIGINT) AS value_c2
         |FROM nps, tot
         |GROUP BY 1, total_v, npart
         |HAVING sum(v) * npart > 2 * total_v""".stripMargin,
    "q16_part_supplier" ->
      s"""WITH $psCte
         |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM ps JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
         |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0 AS DOUBLE))
         |GROUP BY 1, 2, 3""".stripMargin,
    "q20_hot_part_suppliers" ->
      s"""WITH $psCte,
         |q96 AS MATERIALIZED (
         |  SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
         |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS qty96_c
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY 1, 2)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_12') AND s_suppkey IN (
         |  SELECT ps_suppkey FROM ps
         |  JOIN part ON ps_partkey = p_partkey
         |  JOIN q96 ON ps_partkey = q_partkey AND ps_suppkey = q_suppkey
         |  WHERE p_name LIKE '%bolt%' AND 2 * qty96_c > ps_availqty_c)""".stripMargin,
    "q12_ship_priority" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,
    // (revenue, c_custkey) is a unique total order, so the LIMIT 20
    // is deterministic; acctbal goes through DECIMAL(12,2) exactly
    // like the Spark side's dec2→cents→double discipline
    "q10_returned_item" ->
      s"""SELECT c_custkey, c_name,
         |       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
         |       n_name, $revenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    // bit-interleave replayed literally: disjoint bit positions sum
    // to the Morton code in both engines
    "zorder_locality" -> {
      val mortonSql = (0 until 10)
        .map(i => s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
         |m AS (SELECT x, y, $mortonSql AS z FROM t),
         |zb AS (
         |  SELECT z >> 12 AS bucket, count(*) AS n_rows,
         |         max(x) - min(x) + 1 AS x_span, max(y) - min(y) + 1 AS y_span
         |  FROM m GROUP BY 1),
         |lb AS (
         |  SELECT x >> 2 AS bucket, count(*) AS n_rows,
         |         max(x) - min(x) + 1 AS x_span, max(y) - min(y) + 1 AS y_span
         |  FROM m GROUP BY 1)
         |SELECT 'zorder' AS layout, bucket, n_rows, x_span, y_span FROM zb
         |UNION ALL
         |SELECT 'linear' AS layout, bucket, n_rows, x_span, y_span FROM lb""".stripMargin
    },
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "supplier_rank" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $revenue AS revenue
         |  FROM lineitem GROUP BY l_suppkey),
         |r AS (
         |  SELECT s_nationkey, l_suppkey, revenue,
         |         rank() OVER (PARTITION BY s_nationkey ORDER BY revenue DESC, l_suppkey) AS rnk
         |  FROM rev JOIN supplier ON l_suppkey = s_suppkey)
         |SELECT n_name, l_suppkey AS suppkey, revenue, CAST(rnk AS BIGINT) AS rnk
         |FROM r JOIN nation ON s_nationkey = n_nationkey
         |WHERE rnk <= 3""".stripMargin,
    "rollup_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "set_ops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, count(*) AS n
        |  FROM (SELECT k FROM buyers UNION SELECT k FROM rich)
        |UNION ALL
        |SELECT 'intersect', count(*)
        |  FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
        |UNION ALL
        |SELECT 'except', count(*)
        |  FROM (SELECT k FROM buyers EXCEPT SELECT k FROM rich)""".stripMargin,
    "semi_anti_join" ->
      """SELECT 'with_orders' AS kind, count(*) AS n
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders', count(*)
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "scalar_functions" ->
      """SELECT o_orderkey,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_priority,
        |  upper(o_orderpriority) AS upper_priority,
        |  substring(o_orderpriority, 1, 1) AS priority_digit,
        |  CAST(length(o_orderpriority) AS INT) AS priority_len,
        |  o_orderkey % 7 AS key_mod7,
        |  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS size_class,
        |  CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
        |  CAST(extract(month FROM o_orderdate) AS INT) AS order_month
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "agg_functions" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) / count(*) AS avg_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "stream_votes_per_candidate" ->
      s"""SELECT event_type, $moneyVal AS total_votes, count(*) AS n_events
         |FROM events GROUP BY event_type""".stripMargin,
    "stream_votes_windowed" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |       event_type, $moneyVal AS total_value, count(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,
  )

  // ---- extension oracles (text / dedup / similarity / multimodal) ----

  /** 3-word shingle CTEs shared by the near-dup oracles (DuckDB lists
    * are 1-indexed; LATERAL generate_series enumerates positions).
    *
    * `sh` is MATERIALIZED: DuckDB 1.0 inlines plain CTEs into every
    * reference, and each consumer of this block references `sh` at
    * least three times — without the hint the shingle expansion is
    * re-evaluated per reference (the same quadratic-recomputation
    * defect the Spark k-core peel had before its localCheckpoint).
    * MATERIALIZED is a semantics-free evaluation hint, so the oracle
    * rows are unchanged.
    */
  private val shingleCtes =
    """tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g)""".stripMargin

  /** Full CTE chain producing the verified MinHash-LSH near-dup pairs
    * as `lshpairs` — shared by the dedup_minhash_lsh oracle and the
    * dedup_clusters transitive-closure oracle.
    *
    * `sig`/`bands` are always MATERIALIZED (every consumer evaluates
    * them, and `bands` self-joins / `sig` double-joins in the
    * calibration oracle). The tail (`nsh`, `lshpairs`) is MATERIALIZED
    * only when `matTail` is set: DuckDB 1.0 EVALUATES a materialized
    * CTE even if unreferenced (probed), and `lsh_band_stats` stops at
    * `bands` — forcing the candidate-verification tail there would
    * charge the oracle for work its query never uses. Every consumer
    * that actually reads `lshpairs` passes the default.
    */
  /** The shared integer DCG discount LUT as a SQL CASE — the oracle
    * twin of Similarity.dcgW (both sides read the same driver-computed
    * values, so the one float never meets a comparator).
    */
  private def dcgCaseSql(rank: String, k: Int): String =
    Similarity
      .dcgDiscountLut(k)
      .zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }
      .mkString(s"CASE $rank ", " ", " ELSE 0 END")

  /** Non-overlapping 8-token segment rows — the oracle twin of
    * Dedup.segmentRows(width = 8), shared by the batch boilerplate
    * scrub and its streaming ingest twin.
    */
  private val segCtes: String =
    """segt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |seg AS MATERIALIZED (
      |  SELECT doc_id, CAST(i AS BIGINT) AS seg_pos,
      |         CAST(len(list_slice(ts, i + 1, i + 8)) AS BIGINT) AS n_tok,
      |         array_to_string(list_slice(ts, i + 1, i + 8), ' ') AS txt,
      |         md5(array_to_string(list_slice(ts, i + 1, i + 8), ' ')) AS h
      |  FROM segt, LATERAL (SELECT unnest(range(0, len(ts), 8)) AS i) g)""".stripMargin

  /** The LSH candidate-pair prefix of [[minhashPairCtes]] —
    * shingles → signatures → band keys → deduplicated candidate
    * pairs, WITHOUT the jaccard-verification tail. Shared with the
    * edit-ratio oracle, whose verification is levenshtein instead
    * (the same factoring as Dedup.lshCandidatePairs on the Spark
    * side).
    */
  private lazy val lshCandCtes: String =
    s"""$shingleCtes,
       |sig AS MATERIALIZED (
       |  SELECT doc_id, s, min(md5(s || '|' || shingle)) AS mh
       |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 11)) AS s) hs
       |  GROUP BY doc_id, s),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, b, md5(string_agg(mh, ',' ORDER BY s)) AS bkey
       |  FROM (SELECT doc_id, s, mh, s // 3 AS b FROM sig) GROUP BY doc_id, b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin

  private def minhashPairCtes(matTail: Boolean = true): String = {
    val m = if (matTail) "MATERIALIZED " else ""
    s"""$lshCandCtes,
       |nsh AS $m(SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |comm AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
       |  GROUP BY c.doc_a, c.doc_b),
       |lshpairs AS $m(
       |  SELECT c.doc_a, c.doc_b, n_common, na.n + nb.n - n_common AS n_union,
       |         CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
       |  FROM comm c JOIN nsh na ON na.doc_id = c.doc_a JOIN nsh nb ON nb.doc_id = c.doc_b
       |  WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.3)""".stripMargin
  }

  private def decontaminationSql: String =
    """WITH sp AS (SELECT doc_id, text,
      |   CASE WHEN substr(md5(text || '|split'), 1, 2) < 'cc' THEN 'train'
      |        WHEN substr(md5(text || '|split'), 1, 2) < 'e6' THEN 'val'
      |        ELSE 'test' END AS split
      |  FROM documents),
      |tok AS (SELECT doc_id, split, string_split(text, ' ') AS ts FROM sp
      |        WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, split, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |       FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g),
      |tests AS (SELECT DISTINCT shingle FROM sh WHERE split = 'test')
      |SELECT s.doc_id, count(*) AS n_shared_shingles
      |FROM sh s JOIN tests t USING (shingle)
      |WHERE s.split = 'train'
      |GROUP BY s.doc_id
      |HAVING count(*) >= 2""".stripMargin

  private val stopList = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
  private val stopCount =
    s"len(list_filter(string_split(text, ' '), x -> x IN ($stopList)))"
  private val fp = "md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))"

  // the langId marker-argmax replayed in SQL; two CTEs exposing
  // (source, lang, predicted) per document — shared by the lang-ID
  // confusion gate and the language-mix drift gate
  private lazy val langIdCtes: String = {
    val scores = TextAnalysis.markers
      .map { case (lang, ws) =>
        s"len(list_filter(string_split(text, ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS s_$lang"
      }
      .mkString(", ")
    val g = "greatest(" + TextAnalysis.markers.map("s_" + _._1).mkString(", ") + ")"
    val cases = TextAnalysis.markers
      .map { case (lang, _) => s"WHEN s_$lang = $g THEN '$lang'" }
      .mkString(" ")
    s"""lids AS (SELECT source, lang, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, $scores
       |         FROM documents),
       |lidp AS (SELECT source, lang, doc_id, n_tok,
       |         CASE WHEN $g = 0 THEN 'unknown' $cases
       |         ELSE 'unknown' END AS predicted FROM lids)""".stripMargin
  }

  // DSIR importance-weight CTE chain (hashed-unigram monotone ratio,
  // add-one smoothed, HUGEINT products) — ends with per-doc weights
  // in `dw`; shared by the weights gate and the resampling gate
  private val dsirWeightCtes: String =
    """dtok AS (
      |  SELECT doc_id, is_tgt, t AS w
      |  FROM (SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS is_tgt,
      |               unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> ''),
      |pdb AS MATERIALIZED (
      |  SELECT doc_id, is_tgt, substr(md5('dsir|' || w), 1, 3) AS bucket,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM dtok GROUP BY 1, 2, 3),
      |bc AS (
      |  SELECT bucket, CAST(sum(c) AS BIGINT) AS n_raw,
      |         CAST(sum(c * is_tgt) AS BIGINT) AS n_tgt
      |  FROM pdb GROUP BY 1),
      |dtot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS tot_raw,
      |               CAST(sum(n_tgt) AS BIGINT) AS tot_tgt FROM bc),
      |rt AS (
      |  SELECT bucket,
      |    CAST((1000000::HUGEINT * (n_tgt + 1) * (tot_raw + 4096))
      |      // ((n_raw + 1)::HUGEINT * (tot_tgt + 4096)) AS BIGINT) AS r_x1e6
      |  FROM bc, dtot),
      |dw AS (
      |  SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_feat,
      |         CAST(sum(p.c * rt.r_x1e6) // sum(p.c) AS BIGINT) AS weight_x1e6
      |  FROM pdb p JOIN rt USING (bucket) GROUP BY 1)""".stripMargin

  // BPE training CTE chain (census → top-1 → leftmost non-overlapping
  // merge, three rounds) — shared by the trainer gate and the encode
  // gate; ends with the three top-1 rows in t1/t2/t3
  private val bpeTrainCtes: String =
    """w0 AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wf AS MATERIALIZED (SELECT w, count(*) AS wf FROM w0 WHERE w <> '' GROUP BY w),
      |c1 AS (
      |  SELECT substr(w, i, 2) AS pair, CAST(sum(wf) AS BIGINT) AS n,
      |         CAST(count(DISTINCT w) AS BIGINT) AS n_words
      |  FROM wf, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
      |  WHERE length(w) >= 2 GROUP BY 1),
      |t1 AS MATERIALIZED (SELECT pair, n, n_words FROM c1 ORDER BY n DESC, pair LIMIT 1),
      |w2 AS MATERIALIZED (
      |  SELECT regexp_replace(w, (SELECT pair FROM t1), 'A', 'g') AS w, wf FROM wf),
      |c2 AS (
      |  SELECT substr(w, i, 2) AS pair, CAST(sum(wf) AS BIGINT) AS n,
      |         CAST(count(DISTINCT w) AS BIGINT) AS n_words
      |  FROM w2, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
      |  WHERE length(w) >= 2 GROUP BY 1),
      |t2 AS MATERIALIZED (SELECT pair, n, n_words FROM c2 ORDER BY n DESC, pair LIMIT 1),
      |w3 AS MATERIALIZED (
      |  SELECT regexp_replace(w, (SELECT pair FROM t2), 'B', 'g') AS w, wf FROM w2),
      |c3 AS (
      |  SELECT substr(w, i, 2) AS pair, CAST(sum(wf) AS BIGINT) AS n,
      |         CAST(count(DISTINCT w) AS BIGINT) AS n_words
      |  FROM w3, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
      |  WHERE length(w) >= 2 GROUP BY 1),
      |t3 AS MATERIALIZED (SELECT pair, n, n_words FROM c3 ORDER BY n DESC, pair LIMIT 1)""".stripMargin

  // BM25 ranking CTE chain (exact-rational fixed-point scores, k1=6/5
  // b=3/4 folded into one integer quotient) — shared by the
  // bm25_search gate, the hybrid RRF fusion gate, the RM3 expansion,
  // and (with a CTE-name suffix + an era filter) the stored leg of
  // the index-maintenance drift audit; ends with ranked rows in
  // `r<sfx>`. `docWhere` bounds the corpus the chain indexes — df,
  // dl totals, and N all derive from the bounded slice, mirroring
  // TextAnalysis.bm25ScoreOver's era semantics.
  private def bm25RankedCtesFor(sfx: String, docWhere: String): String = {
    val qvals = TextAnalysis.bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""q$sfx(query_id, token) AS (VALUES $qvals),
       |tok$sfx AS (
       |  SELECT doc_id, t AS token
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents$docWhere)
       |  WHERE t <> ''),
       |tf$sfx AS (SELECT doc_id, token, count(*) AS tf FROM tok$sfx GROUP BY 1, 2),
       |idx$sfx AS (
       |  SELECT doc_id, token, tf,
       |         CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl,
       |         CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
       |  FROM tf$sfx),
       |tot$sfx AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl0) AS BIGINT) AS tot_tok
       |  FROM (SELECT doc_id, sum(tf) AS dl0 FROM tf$sfx GROUP BY 1)),
       |s$sfx AS (
       |  SELECT q.query_id, i.doc_id,
       |    CAST((1000000::HUGEINT * 22 * t.n_docs * i.tf * (t.tot_tok // t.n_docs))
       |      // (i.df * (10 * i.tf * (t.tot_tok // t.n_docs)
       |                  + 3 * (t.tot_tok // t.n_docs) + 9 * i.dl)) AS BIGINT) AS sc
       |  FROM idx$sfx i JOIN q$sfx q USING (token), tot$sfx t),
       |agg$sfx AS (SELECT query_id, doc_id, CAST(sum(sc) AS BIGINT) AS bm25_x1e6
       |        FROM s$sfx GROUP BY 1, 2),
       |r$sfx AS (SELECT query_id, doc_id, bm25_x1e6,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY bm25_x1e6 DESC, doc_id) AS BIGINT) AS rk
       |      FROM agg$sfx)""".stripMargin
  }

  private lazy val bm25RankedCtes: String = bm25RankedCtesFor("", "")

  // Perceptual-hash fingerprint chain over the generated image
  // fixture (Multimodal.phashMediaTable / phashVariantRecord): md5
  // pixel texture, corpus-adaptive area-averaged downsample grid
  // (the Multimodal.phashGridBlocks staircase, derived from the same
  // media count on both engines), gradient bits packed into 8
  // pigeonhole band integers (band of bit i = least(i/w, 7), offset
  // i - band*w, w = (B-1)//8 — the dhashBands layout) — shared by
  // the batch pairing gate and the ingest-time probe; ends with
  // per-band rows in `bands` and the ordered band-value list in
  // `fparr` (hamming = sum of per-band XOR popcounts)
  // the corpus-adaptive grid staircase, one doubling per 256x media
  // growth (Multimodal.phashGridBlocks — both engines derive it from
  // the same count); the fixture surface grows WITH the grid
  // (2B + 64 + jitter px), so every tier is rehearsable and the
  // 64-block driver tier reproduces the historical 192-px floor
  private val phashGridCaseSql: String =
    """CASE WHEN 2 * (SELECT count(*) FROM documents) >= 12800000 THEN 256
      |     WHEN 2 * (SELECT count(*) FROM documents) >= 50000 THEN 128
      |     ELSE 64 END""".stripMargin
  private lazy val phashCtes: String =
    s"""grid AS (
      |  SELECT B, (B - 1) // 8 AS w FROM (
      |    SELECT $phashGridCaseSql AS B)),
      |m AS (
      |  SELECT d.doc_id * 2 + v.v AS id, d.doc_id AS base, v.v AS v,
      |         2 * g.B + 64 + d.doc_id % 101 AS n, g.B, g.w
      |  FROM documents d, (SELECT unnest([0, 1]) AS v) v, grid g),
      |px AS (
      |  SELECT id, (B * j + B - 1) // n AS i,
      |         ((strpos('0123456789abcdef',
      |             substr(md5(CAST(base AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1)) - 1) * 16
      |          + strpos('0123456789abcdef',
      |             substr(md5(CAST(base AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 2, 1)) - 1) % 200
      |           + CASE WHEN v = 1 AND (64 * j + 63) // n = base % 64
      |                  THEN 8 ELSE 0 END AS p
      |  FROM m, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS j) s),
      |bm AS MATERIALIZED (
      |  SELECT id, i, sum(p) // count(*) AS mn FROM px GROUP BY id, i),
      |bits AS (
      |  SELECT a.id, a.i AS bit, CASE WHEN b.mn > a.mn THEN 1 ELSE 0 END AS bv
      |  FROM bm a JOIN bm b ON b.id = a.id AND b.i = a.i + 1, grid g
      |  WHERE a.i < g.B - 1),
      |bandv AS MATERIALIZED (
      |  SELECT id, least(bit // g.w, 7) AS j,
      |         CAST(sum(bv * (1::BIGINT << (bit - least(bit // g.w, 7) * g.w))) AS BIGINT) AS bv
      |  FROM bits, grid g GROUP BY 1, 2),
      |fparr AS MATERIALIZED (
      |  SELECT id, list(bv ORDER BY j) AS bs FROM bandv GROUP BY id),
      |bands AS (SELECT id, j, bv FROM bandv)""".stripMargin

  // the per-pair hamming expression over two fparr legs fa/fb
  private lazy val phashHamSql: String =
    (1 to 8).map(i => s"bit_count(xor(fa.bs[$i], fb.bs[$i]))").mkString(" + ")

  // the audio tier's analytic fixture recompute: frame energies are
  // the sum of the first four md5 bytes of 'base|a|frame' (+100 in
  // the v=1 hot block), then the SAME block-mean / gradient-bit /
  // band algebra as phashCtes — the grid derives from the same media
  // count, so both tiers flip at identical corpus sizes
  private lazy val audioEnergySql: String =
    (0 until 4)
      .map(t =>
        s"((strpos('0123456789abcdef', substr(h, ${2 * t + 1}, 1)) - 1) * 16" +
          s" + strpos('0123456789abcdef', substr(h, ${2 * t + 2}, 1)) - 1)")
      .mkString(" + ")
  private lazy val audioCtes: String =
    s"""grid AS (
      |  SELECT B, (B - 1) // 8 AS w FROM (
      |    SELECT $phashGridCaseSql AS B)),
      |m AS (
      |  SELECT d.doc_id * 2 + v.v AS id, d.doc_id AS base, v.v AS v,
      |         greatest(256, 2 * g.B + 64) + d.doc_id % 101 AS n, g.B, g.w
      |  FROM documents d, (SELECT unnest([0, 1]) AS v) v, grid g),
      |fe AS (
      |  SELECT id, (B * k + B - 1) // n AS i,
      |         $audioEnergySql
      |           + CASE WHEN v = 1 AND (64 * k + 63) // n = base % 64
      |                  THEN 100 ELSE 0 END AS p
      |  FROM m, LATERAL (
      |    SELECT k, md5(CAST(base AS VARCHAR) || '|a|' || CAST(k AS VARCHAR)) AS h
      |    FROM (SELECT unnest(generate_series(0, n - 1)) AS k)) s),
      |bm AS MATERIALIZED (
      |  SELECT id, i, sum(p) // count(*) AS mn FROM fe GROUP BY id, i),
      |bits AS (
      |  SELECT a.id, a.i AS bit, CASE WHEN b.mn > a.mn THEN 1 ELSE 0 END AS bv
      |  FROM bm a JOIN bm b ON b.id = a.id AND b.i = a.i + 1, grid g
      |  WHERE a.i < g.B - 1),
      |bandv AS MATERIALIZED (
      |  SELECT id, least(bit // g.w, 7) AS j,
      |         CAST(sum(bv * (1::BIGINT << (bit - least(bit // g.w, 7) * g.w))) AS BIGINT) AS bv
      |  FROM bits, grid g GROUP BY 1, 2),
      |fparr AS MATERIALIZED (
      |  SELECT id, list(bv ORDER BY j) AS bs FROM bandv GROUP BY id),
      |bands AS (SELECT id, j, bv FROM bandv)""".stripMargin

  // ordered-fold vector math identical to graft.functions.VectorFunctions
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform($a, (x,i) -> CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"
  private def projSql(p: Int): String =
    s"list_sum(list_transform(embedding, (x,i) -> CAST(x AS DOUBLE) * " +
      s"(CASE WHEN substr(md5('$p|' || (i-1)), 1, 1) >= '8' THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)))"
  private val bucketSql =
    (0 until 6).map(p => s"(CASE WHEN ${projSql(p)} > 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")

  // Positional k=3 shingle postings + the df>=3 hot set, shared by
  // the span-coverage measurement and the span-scrub transform.
  // `p` and `hot` are each read once per consumer statement, so no
  // MATERIALIZED is needed on `tok`/`p` themselves — except `p`,
  // which both the hot aggregate and the join read: MATERIALIZED.
  private lazy val spanPostingCtes: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |p AS MATERIALIZED (
      |  SELECT doc_id, len(ts) AS n_tokens, i - 1 AS pos,
      |         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g),
      |hot AS (
      |  SELECT shingle FROM p GROUP BY shingle
      |  HAVING count(DISTINCT doc_id) >= 3)""".stripMargin

  // IVF round-1 assignment CTE chain (label-seeded centroids,
  // float-quantized means, deterministic argmax) shared by the
  // ivf_assign gate and the cluster-quota sampler built on it
  // Contrastive-mining oracle fragments shared by the plain and the
  // scaled gate. The staircase CASE is GENERATED from the same
  // constant (Similarity.MiningBlockThreshold) the Scala
  // miningPrefixPlanes derives from — both engines flip planes at
  // identical corpus sizes by construction, never by parallel edits.
  // Expects a 1-row relation in scope exposing the effective corpus
  // size as `n`.
  private lazy val miningStaircaseSql: String = {
    val t = graft.operators.Similarity.MiningBlockThreshold
    (0 until 8)
      .map(i => s"WHEN n < ${t << i} THEN $i")
      .mkString("CASE ", " ", " ELSE 8 END")
  }

  // the SRP sign-bit bucket under the selected prefix length `s.p`,
  // evaluated over `e.embedding` — the lshBucket twin
  private lazy val miningBktTermsSql: String =
    (0 until 8)
      .map(i => s"(CASE WHEN s.p >= ${i + 1} AND ${projSql(i)} > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  // block-pairing + per-(anchor, kind) top-3 rank chain over a `lab`
  // CTE of (vec_id, label, embedding, blk) — the tail both mining
  // oracles share verbatim
  private lazy val miningPairChainSql: String =
    s"""prs AS (
       |  SELECT x.vec_id AS anchor_id, y.vec_id AS cand_id,
       |         CASE WHEN x.label = y.label THEN 'pos' ELSE 'neg' END AS kind,
       |         ${cosSql("x.embedding", "y.embedding")} AS cos
       |  FROM lab x JOIN lab y ON x.blk = y.blk AND x.vec_id <> y.vec_id),
       |mrk AS (SELECT anchor_id, kind, cand_id,
       |        row_number() OVER (PARTITION BY anchor_id, kind ORDER BY cos DESC, cand_id) AS rank
       |        FROM prs)
       |SELECT anchor_id, kind, CAST(rank AS BIGINT) AS rank, cand_id AS neighbor_id
       |FROM mrk WHERE rank <= 3""".stripMargin

  private lazy val ivfAssignCtes: String =
    s"""WITH dims AS (
       |  SELECT label AS cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS m
       |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
       |  GROUP BY cell, i),
       |cents AS (SELECT cell, list(CAST(m AS FLOAT) ORDER BY i) AS centroid FROM dims GROUP BY cell),
       |scored AS (
       |  SELECT e.vec_id, c.cell, ${cosSql("e.embedding", "c.centroid")} AS sim
       |  FROM embeddings e CROSS JOIN cents c),
       |r AS (SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM scored),
       |asg AS (SELECT vec_id, cell AS assigned_cell FROM r WHERE rn = 1)""".stripMargin

  // Product-quantization CTE chain shared by the three PQ oracles
  // (PqIndex): floor-quantized integer corpus → per-(subspace, cell)
  // exact integer sums → one-division double means → min-L2 codes
  // (ties to the smaller cell, matching array_min's struct order).
  // MATERIALIZED where referenced more than once — DuckDB inlines
  // plain CTEs per reference (the label-prop oracle lesson).
  // the quantized corpus + its (subspace, sub-dim) long form — shared
  // by every codebook training chain (the default full-corpus one and
  // the refresh tier's era-bounded v1)
  private val pqBaseCtes: String = {
    val sub = graft.operators.PqIndex.subDim
    s"""pqq AS MATERIALIZED (
       |  SELECT vec_id, CAST(label AS INT) AS cell,
       |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q,
       |         sqrt(CAST(list_sum(list_transform(
       |           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
       |           y -> y * y)) AS DOUBLE)) AS nrm
       |  FROM embeddings),
       |pqd AS (
       |  SELECT vec_id, cell, (i - 1) // $sub AS s, (i - 1) % $sub AS sd, q[i] AS qv
       |  FROM pqq, LATERAL (SELECT unnest(generate_series(1, len(q))) AS i) g)""".stripMargin
  }

  /** One codebook-train + full-corpus-encode chain: train on the
    * `trainWhere`-filtered slice of pqd, encode EVERY pqq row against
    * it. Emits `${p}cb/${p}cm/${p}e/${p}r/${p}codes`; the default
    * prefix "pq" + unfiltered training reproduces the original chain
    * the whole PQ family shares, and the refresh gates add a second
    * era-bounded "p1" instance (graft.operators.PqIndex.storedCodebook
    * / v1Codes).
    */
  private def pqChainFor(p: String, trainWhere: String): String = {
    val sub = graft.operators.PqIndex.subDim
    val where = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    s"""${p}cb AS (SELECT s, cell, sd, sum(qv) AS sq, count(*) AS n FROM pqd$where GROUP BY 1, 2, 3),
       |${p}cm AS MATERIALIZED (
       |  SELECT s, cell, list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY sd) AS mean
       |  FROM ${p}cb GROUP BY s, cell),
       |${p}e AS (
       |  SELECT v.vec_id, c.s, c.cell,
       |         list_sum(list_transform(list_slice(v.q, c.s * $sub + 1, c.s * $sub + $sub),
       |           (x, i) -> (CAST(x AS DOUBLE) - c.mean[i]) * (CAST(x AS DOUBLE) - c.mean[i]))) AS d2
       |  FROM pqq v CROSS JOIN ${p}cm c),
       |${p}r AS (SELECT vec_id, s, cell,
       |        row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cell) AS rn FROM ${p}e),
       |${p}codes AS MATERIALIZED (
       |  SELECT r.vec_id,
       |         CAST(max(CASE WHEN r.s = 0 THEN r.cell END) AS INT) AS c0,
       |         CAST(max(CASE WHEN r.s = 1 THEN r.cell END) AS INT) AS c1,
       |         CAST(max(CASE WHEN r.s = 2 THEN r.cell END) AS INT) AS c2,
       |         CAST(max(CASE WHEN r.s = 3 THEN r.cell END) AS INT) AS c3,
       |         max(q.nrm) AS nrm
       |  FROM ${p}r r JOIN pqq q USING (vec_id) WHERE rn = 1 GROUP BY r.vec_id)""".stripMargin
  }

  private val pqCtes: String = s"$pqBaseCtes,\n${pqChainFor("pq", "")}"

  // per-query ADC lookup table over the codebook means (shared by
  // the full-corpus ADC chain and the IVF-probed variant), plus the
  // per-query quantized norm — the cosine denominator's query half
  /** Per-query LUT against one codebook's `${cm}` means CTE — the
    * refresh gates serve a second ("p1") instance for the stale tier.
    */
  private def pqLutFor(p: String, cm: String): String = {
    val sub = graft.operators.PqIndex.subDim
    s"""${p}lut AS MATERIALIZED (
       |  SELECT q.vec_id AS qid, c.s, c.cell,
       |         list_sum(list_transform(list_slice(q.embedding, c.s * $sub + 1, c.s * $sub + $sub),
       |           (x, i) -> CAST(x AS DOUBLE) * c.mean[i])) AS lutv
       |  FROM embeddings q CROSS JOIN $cm c WHERE q.vec_id < ${graft.operators.PqIndex.ServedQueryCutoff})""".stripMargin
  }

  private val pqLutCte: String =
    s"""${pqLutFor("pq", "pqcm")},
       |pqqn AS (SELECT vec_id AS qid, nrm AS qnrm FROM pqq WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff})""".stripMargin

  // The RRF fusion contract over `text_top`/`vec_top` CTEs — the part
  // the two hybrid gates exist to pin as IDENTICAL (a rank-source-only
  // swap), so it is single-sourced: a k0/tie-break/column edit cannot
  // silently diverge between hybrid_rrf_topk and hybrid_rrf_ivfpq
  private lazy val rrfFusionTailSql: String =
    """fused AS (
      |  SELECT CAST(COALESCE(t.query_id, v.query_id) AS BIGINT) AS query_id,
      |         COALESCE(t.doc_id, v.doc_id) AS doc_id,
      |         t.rk_text, v.rk_vec,
      |         CAST(COALESCE(1000000 // (60 + t.rk_text), 0)
      |              + COALESCE(1000000 // (60 + v.rk_vec), 0) AS BIGINT) AS rrf_x1e6,
      |         CAST(CASE WHEN t.rk_text IS NULL THEN 0 ELSE 1 END
      |              + CASE WHEN v.rk_vec IS NULL THEN 0 ELSE 1 END AS INT) AS n_modalities
      |  FROM text_top t FULL OUTER JOIN vec_top v
      |    ON t.query_id = v.query_id AND t.doc_id = v.doc_id),
      |f2 AS (SELECT query_id, doc_id, rk_text, rk_vec, rrf_x1e6, n_modalities,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY rrf_x1e6 DESC, doc_id) AS BIGINT) AS fused_rank
      |       FROM fused)
      |SELECT query_id, doc_id, rk_text, rk_vec, rrf_x1e6, n_modalities, fused_rank
      |FROM f2 WHERE fused_rank <= 10""".stripMargin

  // IVF+PQ continuation of pqCtes + pqLutCte: label-seeded centroids,
  // assignments, nProbe=3 probe, ADC over probed cells only, ranked
  // in `irk` — shared by similarity_ivf_pq and the hybrid gate
  private lazy val ivfPqRankCtes: String =
    s"""ivfd AS (
       |  SELECT label AS cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS m
       |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
       |  GROUP BY cell, i),
       |ivfc AS MATERIALIZED (SELECT cell, list(CAST(m AS FLOAT) ORDER BY i) AS centroid FROM ivfd GROUP BY cell),
       |ivfa AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN ivfc c) WHERE rn = 1),
       |probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.cell,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cosSql("q.embedding", "c.centroid")} DESC, c.cell) AS rn
       |    FROM embeddings q CROSS JOIN ivfc c WHERE q.vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}) WHERE rn <= 3),
       |isc AS (
       |  SELECT p.query_id, cd.vec_id AS neighbor_id,
       |         1000000.0 * (l0.lutv + l1.lutv + l2.lutv + l3.lutv) / (qn.qnrm * cd.nrm) AS score
       |  FROM pqcodes cd
       |  JOIN ivfa a ON a.vec_id = cd.vec_id
       |  JOIN probe p ON p.cell = a.cell
       |  JOIN pqlut l0 ON l0.qid = p.query_id AND l0.s = 0 AND l0.cell = cd.c0
       |  JOIN pqlut l1 ON l1.qid = p.query_id AND l1.s = 1 AND l1.cell = cd.c1
       |  JOIN pqlut l2 ON l2.qid = p.query_id AND l2.s = 2 AND l2.cell = cd.c2
       |  JOIN pqlut l3 ON l3.qid = p.query_id AND l3.s = 3 AND l3.cell = cd.c3
       |  JOIN pqqn qn ON qn.qid = p.query_id
       |  WHERE p.query_id <> cd.vec_id),
       |irk AS MATERIALIZED (SELECT query_id, neighbor_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk FROM isc)""".stripMargin

  // ADC continuation of pqCtes + pqLutCte: 4-term left-associated
  // lut sum normalized to a cosine estimate — 1e6·Σluts/(qnrm·nrm),
  // association matching Spark's (lit(1e6) * reduce(_ + _)) / (q·n)
  // exactly — then top-5
  /** One ADC score+rank chain against a codes CTE and a LUT CTE —
    * `${p}sc`/`${p}rk`; the refresh gates rank the stale ("st",
    * p1codes × p1lut) tier through the same template the default
    * full-corpus chain uses.
    */
  private def pqAdcChainFor(p: String, codes: String, lut: String): String =
    s"""${p}sc AS (
       |  SELECT l0.qid AS query_id, cd.vec_id AS neighbor_id,
       |         1000000.0 * (l0.lutv + l1.lutv + l2.lutv + l3.lutv) / (qn.qnrm * cd.nrm) AS score
       |  FROM $codes cd
       |  JOIN $lut l0 ON l0.s = 0 AND l0.cell = cd.c0
       |  JOIN $lut l1 ON l1.s = 1 AND l1.cell = cd.c1 AND l1.qid = l0.qid
       |  JOIN $lut l2 ON l2.s = 2 AND l2.cell = cd.c2 AND l2.qid = l0.qid
       |  JOIN $lut l3 ON l3.s = 3 AND l3.cell = cd.c3 AND l3.qid = l0.qid
       |  JOIN pqqn qn ON qn.qid = l0.qid
       |  WHERE l0.qid <> cd.vec_id),
       |${p}rk AS MATERIALIZED (SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk FROM ${p}sc)""".stripMargin

  // the original chain's names were pqsc/pqrk — the template emits
  // exactly those for prefix "pq"
  private val pqAdcCtes: String = pqAdcChainFor("pq", "pqcodes", "pqlut")

  // Codebook-refresh tier (PqIndex.refreshCutoff / storedCodebook /
  // codebookDrift / codebookRefreshCodes): the era cutoff, the
  // stored-era-trained v1 chain, the occupancy-drift monitor, and the
  // trigger — threshold interpolated from the one Scala constant
  private lazy val pqRefreshCtes: String =
    s"""cut AS (SELECT (7 * max(vec_id)) // 10 AS c FROM embeddings),
       |${pqChainFor("p1", "vec_id <= (SELECT c FROM cut)")},
       |p1long AS (
       |  SELECT vec_id, CAST(0 AS BIGINT) AS s, CAST(c0 AS BIGINT) AS cell FROM p1codes
       |  UNION ALL SELECT vec_id, CAST(1 AS BIGINT), CAST(c1 AS BIGINT) FROM p1codes
       |  UNION ALL SELECT vec_id, CAST(2 AS BIGINT), CAST(c2 AS BIGINT) FROM p1codes
       |  UNION ALL SELECT vec_id, CAST(3 AS BIGINT), CAST(c3 AS BIGINT) FROM p1codes),
       |occ AS (
       |  SELECT s, cell,
       |         CAST(sum(CASE WHEN vec_id <= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS BIGINT) AS n_stored,
       |         CAST(sum(CASE WHEN vec_id > (SELECT c FROM cut) THEN 1 ELSE 0 END) AS BIGINT) AS n_inc
       |  FROM p1long GROUP BY 1, 2),
       |driftx AS MATERIALIZED (
       |  SELECT s, cell, n_stored, n_inc, pm_stored, pm_inc,
       |         CAST((pm_stored - pm_inc) * (pm_stored - pm_inc) AS BIGINT) AS drift2
       |  FROM (SELECT s, cell, n_stored, n_inc,
       |          CAST((1000 * n_stored) // (sum(n_stored) OVER (PARTITION BY s)) AS BIGINT) AS pm_stored,
       |          CAST((1000 * n_inc) // (sum(n_inc) OVER (PARTITION BY s)) AS BIGINT) AS pm_inc
       |        FROM occ)),
       |trg AS (SELECT sum(drift2) > ${graft.operators.PqIndex.RefreshDriftThreshold} AS fire
       |        FROM driftx)""".stripMargin

  // the version-tagged fold: stored rows keep v1 codes; increment
  // rows take the full-corpus (v2) codes iff the trigger fired
  private lazy val pqFoldCte: String =
    s"""fold AS MATERIALIZED (
       |  SELECT a.vec_id,
       |         CAST(CASE WHEN a.vec_id > (SELECT c FROM cut) AND (SELECT fire FROM trg)
       |              THEN 2 ELSE 1 END AS BIGINT) AS cb_version,
       |         CASE WHEN a.vec_id > (SELECT c FROM cut) AND (SELECT fire FROM trg)
       |              THEN b.c0 ELSE a.c0 END AS c0,
       |         CASE WHEN a.vec_id > (SELECT c FROM cut) AND (SELECT fire FROM trg)
       |              THEN b.c1 ELSE a.c1 END AS c1,
       |         CASE WHEN a.vec_id > (SELECT c FROM cut) AND (SELECT fire FROM trg)
       |              THEN b.c2 ELSE a.c2 END AS c2,
       |         CASE WHEN a.vec_id > (SELECT c FROM cut) AND (SELECT fire FROM trg)
       |              THEN b.c3 ELSE a.c3 END AS c3,
       |         a.nrm
       |  FROM p1codes a JOIN pqcodes b USING (vec_id))""".stripMargin

  // re-rank continuation: ADC shortlist (top-50) → exact cosine over
  // just those rows — the two-tier serving shape
  private val pqRerankCtes: String =
    s"""pqshort AS (SELECT query_id, neighbor_id FROM pqrk WHERE rnk <= 50),
       |pqex AS (SELECT sh.query_id, sh.neighbor_id, ${cosSql("q.embedding", "c.embedding")} AS cos
       |         FROM pqshort sh JOIN embeddings q ON q.vec_id = sh.query_id
       |         JOIN embeddings c ON c.vec_id = sh.neighbor_id),
       |pqrr AS (SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM pqex)""".stripMargin

  // SimHash: 4 hex chars → 16-bit token value; ±1 votes per bit
  private val hvSql = (0 until 4)
    .map(i => s"(strpos('0123456789abcdef', substr(md5(tok), ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
    .mkString(" + ")
  private val votesSql = (0 until 16)
    .map(j => s"sum(CASE WHEN (v & ${1 << j}) > 0 THEN 1 ELSE -1 END) AS s_$j")
    .mkString(", ")
  private val fpBitsSql = (0 until 16)
    .map(j => s"(CASE WHEN s_$j > 0 THEN ${1 << j} ELSE 0 END)")
    .mkString(" + ")

  // 64-bit SimHash, as two unsigned 32-bit halves so every value fits
  // a signed BIGINT (the full 64-bit value would overflow at bit 63):
  // hi = md5 hex chars 1-8 (digest bytes 0-3 = hv bits 32-63),
  // lo = chars 9-16 (bytes 4-7 = bits 0-31) — exactly
  // SimHash16Expr.compute64's big-endian fold. hamming(a,b) =
  // bit_count(xor(hi)) + bit_count(xor(lo)).
  private def nib64(i: Int) =
    s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
  private val vhi64Sql = (0 until 8).map(i => s"${nib64(i + 1)} * ${1L << (4 * (7 - i))}").mkString(" + ")
  private val vlo64Sql = (0 until 8).map(i => s"${nib64(i + 9)} * ${1L << (4 * (7 - i))}").mkString(" + ")
  private val votes64Sql = (0 until 32)
    .map(j =>
      s"sum(CASE WHEN (vhi & ${1L << j}) > 0 THEN 1 ELSE -1 END) AS h_$j, " +
        s"sum(CASE WHEN (vlo & ${1L << j}) > 0 THEN 1 ELSE -1 END) AS l_$j")
    .mkString(", ")
  private val fhi64Sql = (0 until 32).map(j => s"(CASE WHEN h_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
  private val flo64Sql = (0 until 32).map(j => s"(CASE WHEN l_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  private def extensionOracleSql: Map[String, String] = Map(
    // exact 128-bit integer sums (DuckDB: sum(BIGINT) accumulates in
    // HUGEINT) cast to double, then the identical IEEE formula —
    // bit-identical r without any engine-native corr()
    "stats_correlation" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |s AS (
        |  SELECT c_mktsegment, count(*) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM j GROUP BY 1)
        |SELECT c_mktsegment, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |        sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         AS corr_price_balance
        |FROM s""".stripMargin,
    "session_paths" ->
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM o),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 3600000000 THEN 1 ELSE 0 END AS news FROM l),
        |g AS (SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |                                   ORDER BY us, event_id) AS rk FROM g),
        |p AS (
        |  SELECT user_id, sid, string_agg(event_type, '->' ORDER BY rk) AS path
        |  FROM r WHERE rk <= 3 GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,
    "scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        |  SELECT event_type, us,
        |         lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
        |  FROM e)
        |SELECT event_type, count(*) AS n_versions,
        |       CAST(sum(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_current,
        |       CAST(sum(COALESCE(valid_to_us - us, 0)) AS BIGINT) AS total_duration_us
        |FROM v GROUP BY event_type""".stripMargin,
    // MERGE branches replicated with the same latest-change CTE:
    // delete on 'error', update matched, insert unmatched
    "cdc_merge_upsert" ->
      """WITH ch AS (
        |  SELECT user_id, last_type, last_vc FROM (
        |    SELECT user_id, event_type AS last_type,
        |           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS last_vc,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1),
        |base AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal
        |  FROM customer),
        |kept AS (
        |  SELECT b.c_mktsegment AS segment,
        |         COALESCE(ch.last_vc, b.bal) AS bal,
        |         CASE WHEN ch.last_type IS NOT NULL THEN 1 ELSE 0 END AS updated
        |  FROM base b LEFT JOIN ch ON b.c_custkey = ch.user_id
        |  WHERE ch.last_type IS NULL OR ch.last_type <> 'error'),
        |ins AS (
        |  SELECT 'NEW' AS segment, ch.last_vc AS bal, 0 AS updated
        |  FROM ch LEFT JOIN base b ON ch.user_id = b.c_custkey
        |  WHERE ch.last_type <> 'error' AND b.c_custkey IS NULL),
        |m AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        |SELECT segment, count(*) AS n_rows,
        |       CAST(sum(updated) AS BIGINT) AS n_updated,
        |       CAST(sum(bal) AS DOUBLE) / 100 AS total_balance
        |FROM m GROUP BY segment""".stripMargin,
    // each event lands in exactly the two 30-min-grid window starts
    // covering it; window start re-derived from integer micros
    "votes_sliding" ->
      """WITH e AS (
        |  SELECT event_type, CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
        |         epoch_us(ts) AS us
        |  FROM events),
        |w AS (
        |  SELECT event_type, vc,
        |         (us // 1800000000) * 1800000000 - k * 1800000000 AS ws
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 1)) AS k) g)
        |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type,
        |       CAST(sum(vc) AS DOUBLE) / 100 AS total_value,
        |       count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,
    "countmin_topk" ->
      """WITH tc AS (
        |  SELECT w AS token, count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |tb AS (
        |  SELECT token, n, s,
        |         substr(md5(CAST(s AS VARCHAR) || '|' || token), 1, 2) AS bucket
        |  FROM tc, LATERAL (SELECT unnest(generate_series(0, 3)) AS s) g),
        |counters AS (
        |  SELECT s, bucket, CAST(sum(n) AS BIGINT) AS cnt FROM tb GROUP BY 1, 2)
        |SELECT tb.token, CAST(max(tb.n) AS BIGINT) AS n, min(c.cnt) AS est_n
        |FROM tb JOIN counters c ON c.s = tb.s AND c.bucket = tb.bucket
        |GROUP BY tb.token ORDER BY n DESC, tb.token LIMIT 20""".stripMargin,
    // exact rank-position percentiles + exact clamped-integer-sum
    // means — every double is an integer quotient
    "winsorized_stats" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |r AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |cuts AS (
        |  SELECT event_type,
        |         max(CASE WHEN rk = ((n - 1) * 5) // 100 + 1 THEN vc END) AS p05_cents,
        |         max(CASE WHEN rk = ((n - 1) * 95) // 100 + 1 THEN vc END) AS p95_cents
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n_events,
        |       any_value(c.p05_cents) AS p05_cents,
        |       any_value(c.p95_cents) AS p95_cents,
        |       CAST(sum(e.vc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS raw_mean_cents,
        |       CAST(sum(least(greatest(e.vc, c.p05_cents), c.p95_cents)) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS wins_mean_cents
        |FROM e JOIN cuts c ON e.event_type = c.event_type
        |GROUP BY e.event_type""".stripMargin,
    // per-cell chi-square contributions (a cross-row double sum is
    // summation-order-dependent; per-cell expressions are portable)
    "chi2_contingency" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM cells)
        |SELECT c.lang, c.source, c.n_docs,
        |       (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / CAST(nn.nn AS DOUBLE)
        |         AS expected,
        |       (CAST(c.n_docs AS DOUBLE) -
        |        (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / CAST(nn.nn AS DOUBLE)) *
        |       (CAST(c.n_docs AS DOUBLE) -
        |        (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / CAST(nn.nn AS DOUBLE)) /
        |       ((CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)) / CAST(nn.nn AS DOUBLE))
        |         AS chi2_contrib
        |FROM cells c
        |JOIN rt ON rt.lang = c.lang
        |JOIN ct ON ct.source = c.source
        |CROSS JOIN nn""".stripMargin,
    // plain-join oracle for the replicated-dim salted join twin
    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / 100
        |    AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
    // the oracle uses the classic distinct self-join formulation the
    // Spark side deliberately avoids — results are identical
    "itemset_pairs" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_users
        |FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,
    // support/confidence/lift per unordered pair; the lift numerator
    // rides HUGEINT exactly like the Spark side's DECIMAL(38,0)
    "assoc_rules" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT count(DISTINCT user_id) AS nut FROM d),
        |nt AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
        |  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, na.n AS n_a, nb.n AS n_b, p.n_ab,
        |  CAST((1000000::HUGEINT * n_ab) // na.n AS BIGINT) AS conf_ab_x1e6,
        |  CAST((1000000::HUGEINT * n_ab) // nb.n AS BIGINT) AS conf_ba_x1e6,
        |  CAST((1000000::HUGEINT * n_ab * nu.nut) // (na.n::HUGEINT * nb.n) AS BIGINT)
        |    AS lift_x1e6
        |FROM p
        |JOIN nt na ON na.event_type = type_a
        |JOIN nt nb ON nb.event_type = type_b
        |CROSS JOIN nu""".stripMargin,
    "event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |  FROM e),
        |c AS (
        |  SELECT prev_type, event_type, count(*) AS n FROM p
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT c.prev_type, c.event_type, c.n,
        |       CAST((1000000 * c.n) // t.n_from AS BIGINT) AS p_x1e6
        |FROM c JOIN t ON c.prev_type = t.prev_type""".stripMargin,
    "retention_cohorts" ->
      """WITH ad AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |co AS (SELECT user_id, min(day) AS cohort_day FROM ad GROUP BY 1)
        |SELECT strftime(co.cohort_day, '%Y-%m-%d') AS cohort,
        |       CAST(ad.day - co.cohort_day AS BIGINT) AS day_offset,
        |       count(*) AS n_active_users
        |FROM ad JOIN co ON ad.user_id = co.user_id
        |GROUP BY 1, 2""".stripMargin,
    "debounce_events" ->
      """WITH t AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_type, event_id, us,
        |         lag(us) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY us, event_id) AS prev
        |  FROM t),
        |f AS (
        |  SELECT user_id, event_type, event_id, us,
        |         CASE WHEN prev IS NULL OR us - prev > 600000000 THEN 1 ELSE 0 END
        |           AS new_burst
        |  FROM g),
        |i AS (
        |  SELECT user_id, event_type, event_id, new_burst,
        |         CAST(sum(new_burst) OVER (PARTITION BY user_id, event_type
        |           ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS burst
        |  FROM f)
        |SELECT user_id, event_type, burst,
        |       max(CASE WHEN new_burst = 1 THEN event_id END) AS kept_event_id,
        |       count(*) AS n_collapsed
        |FROM i GROUP BY 1, 2, 3""".stripMargin,
    "daily_uniques_running" ->
      """WITH ad AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |fd AS (SELECT user_id, day,
        |              min(day) OVER (PARTITION BY user_id) AS first_day
        |       FROM ad),
        |d AS (SELECT day, count(*) AS n_active,
        |        CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_new
        |      FROM fd GROUP BY day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, n_active, n_new,
        |       n_active - n_new AS n_returning,
        |       CAST(sum(n_new) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_uniques
        |FROM d""".stripMargin,
    // both unique curves derive from one DISTINCT (week, day, user)
    // set, mirroring the Spark lineage; date - date is integer days
    "stickiness_weekly" ->
      """WITH du AS (
        |  SELECT DISTINCT (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS week,
        |         CAST(ts AS DATE) - DATE '2024-01-01' AS dayn, user_id
        |  FROM events),
        |d AS (SELECT week, dayn, count(*) AS dau FROM du GROUP BY 1, 2),
        |wk AS (SELECT week, count(*) AS n_days, CAST(sum(dau) AS BIGINT) AS dau_sum
        |       FROM d GROUP BY 1),
        |wa AS (SELECT week, count(*) AS wau
        |       FROM (SELECT DISTINCT week, user_id FROM du) GROUP BY 1)
        |SELECT CAST(week AS BIGINT) AS week, n_days, dau_sum, wau,
        |       CAST((1000000 * dau_sum) // (n_days * wau) AS BIGINT) AS stickiness_x1e6
        |FROM wk JOIN wa USING (week)""".stripMargin,
    // both medians replay the percentile_disc rank rule on integer
    // cents with the (value, event_id) unique order; money via the
    // standard cents→double discipline
    "mad_outliers" ->
      """WITH ty AS (
        |  SELECT event_type, event_id,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |r1 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n FROM ty),
        |med AS (SELECT event_type, max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN vc END) AS med_c
        |        FROM r1 GROUP BY 1),
        |dv AS (SELECT ty.event_type, ty.event_id, ty.vc, med.med_c,
        |         abs(ty.vc - med.med_c) AS dev
        |       FROM ty JOIN med USING (event_type)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rk,
        |         count(*) OVER (PARTITION BY event_type) AS n FROM dv),
        |mad AS (SELECT event_type, max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN dev END) AS mad_c
        |        FROM r2 GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_events,
        |       CAST(max(d.med_c) AS DOUBLE) / 100.0 AS median_value,
        |       CAST(max(m.mad_c) AS DOUBLE) / 100.0 AS mad_value,
        |       CAST(sum(CASE WHEN d.dev > 3 * m.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dv d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY 1""".stripMargin,
    // same session islands as user_sessions; the boundary sweep rides
    // the identical (us, delta DESC, user_id) unique order, and the
    // carry CTE mirrors the Spark side's |days|-row cumulative
    "concurrency_peaks" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM o),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 3600000000 THEN 1 ELSE 0 END AS news FROM l),
        |g AS (SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m),
        |s AS (SELECT user_id, min(us) AS start_us, max(us) AS end_us FROM g GROUP BY user_id, sid),
        |b AS (SELECT user_id, start_us AS us, CAST(1 AS BIGINT) AS delta FROM s
        |      UNION ALL
        |      SELECT user_id, end_us AS us, CAST(-1 AS BIGINT) AS delta FROM s),
        |d AS (SELECT *, us // 86400000000 AS dayn FROM b),
        |rs AS (SELECT *, sum(delta) OVER (PARTITION BY dayn
        |         ORDER BY us, delta DESC, user_id ROWS UNBOUNDED PRECEDING) AS rs
        |       FROM d),
        |p AS (SELECT dayn,
        |        CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |        CAST(max(rs) AS BIGINT) AS local_peak,
        |        CAST(sum(delta) AS BIGINT) AS tot
        |      FROM rs GROUP BY 1),
        |c AS (SELECT *, coalesce(sum(tot) OVER (ORDER BY dayn
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
        |      FROM p)
        |SELECT dayn, n_starts, CAST(carry + local_peak AS BIGINT) AS peak_concurrency
        |FROM c""".stripMargin,
    // the IGNORE NULLS carry-forward window is the same total order
    // as the Spark side: (epoch micros, event_id)
    "attribution_last_touch" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |w AS (
        |  SELECT event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |           IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM t)
        |SELECT COALESCE(touch, 'direct') AS channel, count(*) AS n_purchases,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
        |         AS attributed_value
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    // same carry-forward total order; the decay weight is the exact
    // integer 2^(20-k), summed in HUGEINT, one final division on
    // identical integers
    "attribution_time_decay" ->
      """WITH t AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
        |  FROM events),
        |w AS (
        |  SELECT event_type, value, us,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |           IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN us END
        |           IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
        |  FROM t),
        |p AS (
        |  SELECT COALESCE(touch, 'direct') AS channel,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
        |         CASE WHEN touch_us IS NULL THEN 0
        |              ELSE least((us - touch_us) // 1800000000, 20) END AS k
        |  FROM w WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_purchases,
        |       CAST(sum(vc * (CAST(1 AS BIGINT) << CAST(20 - k AS INT))) AS DOUBLE)
        |         / 104857600.0 AS decayed_value
        |FROM p GROUP BY 1""".stripMargin,
    // trailing window counts OBSERVED days (ROWS frame), ratio only
    // with a full 7-day baseline — exact floor division both sides
    "daily_anomaly" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n_events,
        |         CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trailing_n,
        |         count(*) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_days
        |  FROM d)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events, trailing_n,
        |       CAST(CASE WHEN n_days = 7
        |                 THEN (7000000 * n_events) // trailing_n END AS BIGINT)
        |         AS ratio_x1e6,
        |       CAST(CASE WHEN n_days = 7
        |                  AND (7000000 * n_events) // trailing_n >= 2000000
        |                 THEN 1 ELSE 0 END AS INT) AS is_spike
        |FROM w""".stripMargin,
    // μ and σ from exact integer sums (HUGEINT accumulation), the
    // per-row |z| > 2 comparison in identical IEEE doubles
    "zscore_outliers" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |s AS (
        |  SELECT event_type, count(*) AS n, sum(vc) AS sx, sum(vc * vc) AS sxx
        |  FROM e GROUP BY 1),
        |st AS (
        |  SELECT event_type, n,
        |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu_cents,
        |         sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
        |              (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma_cents
        |  FROM s)
        |SELECT e.event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN abs(CAST(e.vc AS DOUBLE) - st.mu_cents)
        |                          > 2.0 * st.sigma_cents THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       any_value(st.mu_cents) AS mu_cents,
        |       any_value(st.sigma_cents) AS sigma_cents
        |FROM e JOIN st ON e.event_type = st.event_type
        |GROUP BY e.event_type""".stripMargin,
    "pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY w),
        |nn AS (SELECT CAST(sum(len(ts)) AS BIGINT) AS nn FROM toks),
        |big AS (
        |  SELECT ts[i] AS w1, ts[i+1] AS w2, count(*) AS cxy
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        |  WHERE len(ts) >= 2
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.cxy,
        |       (CAST(b.cxy AS DOUBLE) * CAST(nn.nn AS DOUBLE)) /
        |       (CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)) AS pmi_ratio
        |FROM big b
        |JOIN uni ux ON ux.w = b.w1
        |JOIN uni uy ON uy.w = b.w2
        |CROSS JOIN nn
        |ORDER BY pmi_ratio DESC, b.w1, b.w2 LIMIT 20""".stripMargin,
    "timeseries_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
        |         epoch_us(ts) AS us, event_id
        |  FROM events),
        |hr AS (
        |  SELECT user_id, hour, vc,
        |         row_number() OVER (PARTITION BY user_id, hour
        |                            ORDER BY us DESC, event_id DESC) AS rk
        |  FROM e),
        |hlast AS (SELECT user_id, hour, vc AS last_vc FROM hr WHERE rk = 1),
        |hcnt AS (SELECT user_id, hour, count(*) AS n_ev FROM e GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |u AS (SELECT DISTINCT user_id FROM e),
        |f AS (
        |  SELECT u.user_id, hours.hour, hcnt.n_ev,
        |         last_value(hlast.last_vc IGNORE NULLS)
        |           OVER (PARTITION BY u.user_id ORDER BY hours.hour
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_vc
        |  FROM u CROSS JOIN hours
        |  LEFT JOIN hlast ON hlast.user_id = u.user_id AND hlast.hour = hours.hour
        |  LEFT JOIN hcnt ON hcnt.user_id = u.user_id AND hcnt.hour = hours.hour)
        |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       CAST(sum(CASE WHEN n_ev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_active_users,
        |       CAST(sum(CASE WHEN n_ev IS NULL AND carried_vc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_carried_users,
        |       CAST(sum(COALESCE(carried_vc, 0)) AS DOUBLE) / 100 AS carried_value
        |FROM f GROUP BY 1""".stripMargin,
    "funnel_steps" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS ta,
        |         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tb,
        |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tc
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END AS s1,
        |         CASE WHEN ta IS NOT NULL AND tb > ta THEN 1 ELSE 0 END AS s2,
        |         CASE WHEN ta IS NOT NULL AND tb > ta AND tc > tb THEN 1 ELSE 0 END AS s3
        |  FROM pu),
        |tot AS (SELECT CAST(sum(s1) AS BIGINT) AS n_signup,
        |               CAST(sum(s2) AS BIGINT) AS n_click,
        |               CAST(sum(s3) AS BIGINT) AS n_purchase FROM st)
        |SELECT n_signup, n_click, n_purchase,
        |       CAST(CASE WHEN n_signup > 0 THEN (1000000 * n_click) // n_signup ELSE 0 END AS BIGINT)
        |         AS conv_click_x1e6,
        |       CAST(CASE WHEN n_click > 0 THEN (1000000 * n_purchase) // n_click ELSE 0 END AS BIGINT)
        |         AS conv_purchase_x1e6
        |FROM tot""".stripMargin,
    "event_gap_quartiles" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
        |         epoch_us(ts) AS us
        |  FROM events),
        |g AS (
        |  SELECT *,
        |         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap,
        |         CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY vc, event_id) AS BIGINT) AS quartile
        |  FROM e)
        |SELECT event_type, quartile, count(*) AS n_events,
        |       CAST(sum(COALESCE(gap, 0)) AS BIGINT) AS sum_gap_us,
        |       CAST(max(gap) AS BIGINT) AS max_gap_us,
        |       CAST(sum(vc) AS DOUBLE) / 100 AS total_value
        |FROM g GROUP BY 1, 2""".stripMargin,
    // the bucketed warehouse join is bucketing-invariant by
    // construction, so the oracle is the plain join of the same
    // parquet tables
    "bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "json_extraction" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "asof_join" ->
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_order_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |       strftime(od.o_orderdate, '%Y-%m-%d') AS order_day,
        |       od.last_order_key
        |FROM events e ASOF JOIN od
        |  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts""".stripMargin,
    "user_sessions" ->
      """WITH o AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM o),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 3600000000 THEN 1 ELSE 0 END AS news FROM l),
        |g AS (SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM m)
        |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "outer_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  count(o_custkey) AS n_buyers,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_non_buyers
        |FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "full_outer_join" ->
      """SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
        |            WHEN o_custkey IS NULL THEN 'customer_only'
        |            ELSE 'both' END AS side, count(*) AS n
        |FROM (SELECT DISTINCT c_custkey FROM customer) c
        |FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "cube_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "having_filter" ->
      s"""SELECT l_suppkey, $revenue AS revenue
         |FROM lineitem GROUP BY l_suppkey
         |HAVING $revenue > 1000000""".stripMargin,
    "pivot_events" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view")
        .map(tp => s"CAST(sum(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS $tp")
        .mkString(", ")
      s"SELECT user_id % 10 AS bucket, $cols FROM events GROUP BY 1"
    },
    // identical SQL text runs on both engines (RelationalQueries.subquerySql)
    "sql_subquery" -> graft.operators.RelationalQueries.subquerySql,
    "string_agg_dates" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |  count(*) AS n,
        |  CAST(min(date_diff('day', DATE '1995-01-01', o_orderdate)) AS INT) AS min_day_offset,
        |  CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS INT) AS max_day_offset
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // the ingest-time probe's oracle: the old×new slice of the winnow
    // pair table, df cutoff computed over the EXISTING slice only
    // (that is what a stored index can know at build time)
    // ingest-time boilerplate scrub: the landed segments are exactly
    // the increment's segments minus the stored-index hits (hashes
    // duplicated across >= 2 existing docs)
    "stream_boilerplate_scrub" ->
      s"""WITH $segCtes,
        |cut AS (SELECT 9 * max(doc_id) // 10 AS c FROM documents),
        |hot AS (
        |  SELECT s.h FROM seg s, cut WHERE s.doc_id <= cut.c
        |  GROUP BY s.h HAVING count(DISTINCT s.doc_id) >= 2)
        |SELECT s.doc_id, s.seg_pos, s.n_tok, s.h
        |FROM seg s, cut
        |WHERE s.doc_id > cut.c AND s.h NOT IN (SELECT h FROM hot)""".stripMargin,
    // the edit-verified old x new slice of the shared LSH candidate
    // table (banding order-independence), same projection + permille
    "stream_edit_probe" ->
      s"""WITH $lshCandCtes,
        |cut AS (SELECT 9 * max(doc_id) // 10 AS c FROM documents),
        |pj AS (SELECT doc_id, regexp_replace(text, '[^[:ascii:]]', '?', 'g') AS text
        |       FROM documents),
        |lv AS (
        |  SELECT c.doc_a, c.doc_b,
        |         CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
        |         CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS max_len
        |  FROM cand c
        |  JOIN pj a ON a.doc_id = c.doc_a
        |  JOIN pj b ON b.doc_id = c.doc_b, cut
        |  WHERE c.doc_a <= cut.c AND c.doc_b > cut.c)
        |SELECT doc_a, doc_b, lev, max_len,
        |       CAST((1000 * lev) // max_len AS BIGINT) AS edit_permille
        |FROM lv WHERE (1000 * lev) // max_len <= ${Dedup.EditPermilleCutoff}""".stripMargin,
    // unordered source cells over the verified pair table
    "dedup_source_matrix" ->
      s"""WITH ${minhashPairCtes()},
        |sp AS (
        |  SELECT least(da.source, db.source) AS source_a,
        |         greatest(da.source, db.source) AS source_b
        |  FROM lshpairs p
        |  JOIN documents da ON da.doc_id = p.doc_a
        |  JOIN documents db ON db.doc_id = p.doc_b)
        |SELECT source_a, source_b, count(*) AS n_pairs
        |FROM sp GROUP BY 1, 2""".stripMargin,
    // arriving docs scored against the stored-era per-lang bigram LM;
    // unseen bigrams score 0 (OOV convention, both engines)
    "stream_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |cut AS (SELECT 9 * max(doc_id) // 10 AS c FROM documents),
        |go AS (
        |  SELECT t.lang, ts[i] AS l, ts[i+1] AS r
        |  FROM t, cut, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x
        |  WHERE t.doc_id <= cut.c),
        |clr AS (SELECT lang, l, r, count(*) AS cnt_lr FROM go GROUP BY 1, 2, 3),
        |cl AS (SELECT lang, l, count(*) AS cnt_l FROM go GROUP BY 1, 2),
        |gn AS (
        |  SELECT t.doc_id, t.lang, ts[i] AS l, ts[i+1] AS r
        |  FROM t, cut, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x
        |  WHERE t.doc_id > cut.c),
        |s AS (
        |  SELECT g.doc_id,
        |         CASE WHEN clr.cnt_lr IS NOT NULL AND cl.cnt_l IS NOT NULL
        |              THEN CAST((1000000::HUGEINT * clr.cnt_lr) // cl.cnt_l AS BIGINT)
        |              ELSE 0 END AS q
        |  FROM gn g
        |  LEFT JOIN cl ON cl.lang = g.lang AND cl.l = g.l
        |  LEFT JOIN clr ON clr.lang = g.lang AND clr.l = g.l AND clr.r = g.r)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(q) // count(*) AS BIGINT) AS lm_score_x1e6
        |FROM s GROUP BY doc_id""".stripMargin,
    // folded df counts == rebuilt df counts by additivity over
    // doc_id-disjoint eras, so the oracle computes the rebuilt form
    "boilerplate_index_refresh" ->
      s"""WITH $segCtes,
        |cut AS (SELECT 7 * max(doc_id) // 10 AS c1, 85 * max(doc_id) // 100 AS c2
        |        FROM documents),
        |hot AS (
        |  SELECT s.h FROM seg s, cut WHERE s.doc_id <= cut.c2
        |  GROUP BY s.h HAVING count(DISTINCT s.doc_id) >= 2)
        |SELECT s.doc_id, s.seg_pos, s.n_tok, s.h
        |FROM seg s, cut
        |WHERE s.doc_id > cut.c2 AND s.h NOT IN (SELECT h FROM hot)""".stripMargin,
    "stream_winnow_probe" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 7),
        |grams AS (
        |  SELECT doc_id, i,
        |         substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 8) AS g
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 3)) AS i) z),
        |wins AS (
        |  SELECT doc_id, i,
        |         min(g) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
        |         count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM grams),
        |sel AS MATERIALIZED (SELECT DISTINCT doc_id, m AS fp FROM wins WHERE i <= ng - 3),
        |cut AS (SELECT 9 * max(doc_id) // 10 AS c FROM documents),
        |selo AS MATERIALIZED (SELECT s.doc_id, s.fp FROM sel s, cut WHERE s.doc_id <= cut.c),
        |seln AS MATERIALIZED (SELECT s.doc_id, s.fp FROM sel s, cut WHERE s.doc_id > cut.c),
        |nfpo AS (SELECT doc_id, count(*) AS nfp FROM selo GROUP BY 1),
        |nfpn AS (SELECT doc_id, count(*) AS nfp FROM seln GROUP BY 1),
        |good AS (SELECT fp FROM selo GROUP BY fp HAVING count(*) <= 50),
        |hits AS (SELECT o.doc_id AS doc_a, n.doc_id AS doc_b, o.fp
        |         FROM selo o JOIN seln n USING (fp) JOIN good USING (fp)),
        |pairs AS (SELECT doc_a, doc_b, CAST(count(DISTINCT fp) AS BIGINT) AS n_shared
        |          FROM hits GROUP BY 1, 2 HAVING count(DISTINCT fp) >= 2)
        |SELECT p.doc_a, p.doc_b, p.n_shared,
        |       CAST((1000000 * p.n_shared) // least(a.nfp, b.nfp) AS BIGINT) AS overlap_x1e6
        |FROM pairs p JOIN nfpo a ON p.doc_a = a.doc_id
        |JOIN nfpn b ON p.doc_b = b.doc_id""".stripMargin,
    // cross-doc winnowing matches: same selection CTE chain as
    // text_winnowing, then postings -> df cutoff -> pair counts;
    // containment over the smaller selected-fingerprint set
    "dedup_winnow_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 7),
        |grams AS (
        |  SELECT doc_id, i,
        |         substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 8) AS g
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 3)) AS i) z),
        |wins AS (
        |  SELECT doc_id, i,
        |         min(g) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
        |         count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM grams),
        |sel AS MATERIALIZED (SELECT DISTINCT doc_id, m AS fp FROM wins WHERE i <= ng - 3),
        |nfp AS MATERIALIZED (SELECT doc_id, count(*) AS nfp FROM sel GROUP BY 1),
        |post AS (SELECT fp, count(*) AS df FROM sel GROUP BY 1),
        |good AS (SELECT fp FROM post WHERE df BETWEEN 2 AND 50),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  JOIN good g ON g.fp = a.fp
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.doc_a, p.doc_b, p.n_shared,
        |       CAST((1000000 * p.n_shared) // least(na.nfp, nb.nfp) AS BIGINT) AS overlap_x1e6
        |FROM pairs p JOIN nfp na ON p.doc_a = na.doc_id
        |JOIN nfp nb ON p.doc_b = nb.doc_id""".stripMargin,
    "text_winnowing" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 7),
        |grams AS (
        |  SELECT doc_id, i,
        |         substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]), 1, 8) AS g
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 3)) AS i) z),
        |wins AS (
        |  SELECT doc_id, i,
        |         min(g) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
        |         count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM grams),
        |sel AS (SELECT DISTINCT doc_id, m FROM wins WHERE i <= ng - 3)
        |SELECT doc_id, count(*) AS n_fingerprints, min(m) AS min_fp
        |FROM sel GROUP BY doc_id""".stripMargin,
    // the injection fragment is the SHARED dialect-neutral arithmetic
    // (Pii.injectSql — `%`, `||`, CASE, CAST AS STRING only); the
    // extraction/redaction side is recomputed here independently with
    // DuckDB's own regex engine ('g' flag: DuckDB replaces first-only
    // by default, Spark replaces all)
    "text_pii_redact" ->
      s"""WITH inj AS (SELECT doc_id, ${graft.operators.Pii.injectSql} AS t FROM documents),
         |r AS (SELECT doc_id, t,
         |        regexp_replace(regexp_replace(regexp_replace(t,
         |          '${graft.operators.Pii.emailPat}', '<EMAIL>', 'g'),
         |          '${graft.operators.Pii.phonePat}', '<PHONE>', 'g'),
         |          '${graft.operators.Pii.ipPat}', '<IP>', 'g') AS red
         |      FROM inj)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${graft.operators.Pii.emailPat}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${graft.operators.Pii.phonePat}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '${graft.operators.Pii.ipPat}')) AS BIGINT) AS n_ips,
         |  CAST(length(t) AS BIGINT) AS len_in,
         |  CAST(length(red) AS BIGINT) AS len_red,
         |  md5(red) AS red_md5
         |FROM r""".stripMargin,
    "text_pii_stats" ->
      s"""WITH inj AS (SELECT doc_id, ${graft.operators.Pii.injectSql} AS t FROM documents),
         |c AS (SELECT doc_id,
         |        len(regexp_extract_all(t, '${graft.operators.Pii.emailPat}')) AS ne,
         |        len(regexp_extract_all(t, '${graft.operators.Pii.phonePat}')) AS np,
         |        len(regexp_extract_all(t, '${graft.operators.Pii.ipPat}')) AS ni
         |      FROM inj)
         |SELECT 'email' AS pii_type, CAST(sum(ne) AS BIGINT) AS n_matches,
         |       CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM c
         |UNION ALL
         |SELECT 'phone', CAST(sum(np) AS BIGINT),
         |       CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM c
         |UNION ALL
         |SELECT 'ip', CAST(sum(ni) AS BIGINT),
         |       CAST(sum(CASE WHEN ni > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM c""".stripMargin,
    "privacy_k_anonymity" ->
      s"""SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(CASE WHEN count(DISTINCT user_id) >= ${graft.operators.Privacy.K}
        |       THEN 1 ELSE 0 END AS INT) AS meets_k
        |FROM events GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,
    "privacy_l_diversity" ->
      s"""SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT)
        |    AS n_sensitive,
        |  CAST(CASE WHEN count(DISTINCT CAST(json_extract_string(props, '$$.k') AS INT)) >= ${graft.operators.Privacy.L}
        |       THEN 1 ELSE 0 END AS INT) AS meets_l
        |FROM events GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,
    "privacy_t_closeness" ->
      s"""WITH b AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         CAST(json_extract_string(props, '$$.k') AS INT) AS sens
        |  FROM events),
        |cs AS (SELECT event_type, hr, sens, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
        |-- n_c attaches BEFORE the sens join, like the Spark window over the
        |-- aggregate: a NULL-sens row counts toward its class size on both
        |-- engines even though the inner join then drops it from the L1 terms
        |csn AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type, hr) AS n_c FROM cs),
        |m AS (SELECT sens, count(*) AS cnt_s FROM b GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM b),
        |j AS (SELECT csn.event_type, csn.hr, csn.cnt, csn.n_c, m.cnt_s, tot.n_total
        |      FROM csn JOIN m USING (sens) CROSS JOIN tot),
        |d AS (SELECT event_type, hr, n_c, n_total,
        |        sum(abs(CAST(cnt AS HUGEINT) * n_total - CAST(cnt_s AS HUGEINT) * n_c)) AS pres,
        |        sum(cnt_s) AS pres_cnt_s
        |      FROM j GROUP BY 1, 2, 3, 4)
        |SELECT event_type,
        |  strftime(hr, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(n_c AS BIGINT) AS n_rows,
        |  CAST((1000000 * (pres + CAST(n_total - pres_cnt_s AS HUGEINT) * n_c))
        |       // (2 * CAST(n_c AS HUGEINT) * n_total) AS BIGINT) AS t_dist,
        |  CAST(CASE WHEN (1000000 * (pres + CAST(n_total - pres_cnt_s AS HUGEINT) * n_c))
        |       // (2 * CAST(n_c AS HUGEINT) * n_total) <= ${graft.operators.Privacy.T_SCALED}
        |       THEN 1 ELSE 0 END AS INT) AS meets_t
        |FROM d""".stripMargin,
    "privacy_generalize" ->
      s"""WITH h AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |         count(*) AS n_rows, count(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY 1, 2),
        |hp AS (SELECT 'hour' AS level, event_type,
        |         strftime(hr, '%Y-%m-%d %H:%M:%S') AS bucket, n_rows, n_users
        |       FROM h WHERE n_users >= ${graft.operators.Privacy.K}),
        |f AS (SELECT event_type, hr FROM h WHERE n_users < ${graft.operators.Privacy.K}),
        |fr AS (SELECT e.event_type, e.ts, e.user_id FROM events e
        |       JOIN f ON e.event_type = f.event_type AND date_trunc('hour', e.ts) = f.hr),
        |d AS MATERIALIZED (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |        count(*) AS n_rows, count(DISTINCT user_id) AS n_users
        |  FROM fr GROUP BY 1, 2)
        |SELECT level, event_type, bucket,
        |       CAST(n_rows AS BIGINT) AS n_rows, CAST(n_users AS BIGINT) AS n_users FROM hp
        |UNION ALL SELECT 'day', event_type, strftime(day, '%Y-%m-%d'),
        |       CAST(n_rows AS BIGINT), CAST(n_users AS BIGINT) FROM d WHERE n_users >= ${graft.operators.Privacy.K}
        |UNION ALL SELECT 'suppressed', event_type, strftime(day, '%Y-%m-%d'),
        |       CAST(n_rows AS BIGINT), CAST(n_users AS BIGINT) FROM d WHERE n_users < ${graft.operators.Privacy.K}""".stripMargin,
    "text_blocklist_filter" -> {
      val terms = TextAnalysis.blocklist.map(t => s"'$t'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |b AS (SELECT doc_id, ts,
         |        list_filter(ts, x -> x IN ($terms)) AS bad FROM t)
         |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(len(bad) AS BIGINT) AS n_bad,
         |  CAST(len(list_distinct(bad)) AS BIGINT) AS n_bad_distinct,
         |  CAST(CASE WHEN len(bad) = 0 THEN 1 ELSE 0 END AS INT) AS keep_doc
         |FROM b""".stripMargin
    },
    // hashed-feature linear scoring: md5 hex nibbles → integer
    // weights (strpos idiom, the simhash oracle's hex→int path);
    // all-integer so the score is bit-portable
    "text_classifier_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |uni AS (SELECT doc_id, unnest(ts) AS feature FROM tok),
        |bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS feature
        |       FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        |       WHERE len(ts) >= 2),
        |f AS (SELECT doc_id, feature FROM uni WHERE feature <> ''
        |      UNION ALL SELECT doc_id, feature FROM bi WHERE feature <> ''),
        |b AS (SELECT doc_id, md5('w|' || substr(md5('clf|' || feature), 1, 3)) AS wh FROM f),
        |w AS (SELECT doc_id,
        |        (((strpos('0123456789abcdef', substr(wh, 1, 1)) - 1) * 4096 +
        |          (strpos('0123456789abcdef', substr(wh, 2, 1)) - 1) * 256 +
        |          (strpos('0123456789abcdef', substr(wh, 3, 1)) - 1) * 16 +
        |          (strpos('0123456789abcdef', substr(wh, 4, 1)) - 1)) % 2001) - 1000 AS w
        |      FROM b)
        |SELECT doc_id, count(*) AS n_features, CAST(sum(w) AS BIGINT) AS score,
        |       CAST(CASE WHEN sum(w) >= 0 THEN 1 ELSE 0 END AS INT) AS accepted
        |FROM w GROUP BY doc_id""".stripMargin,
    "text_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS total_alpha_tokens,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) / count(*) AS avg_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, lang,
         |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         |  CAST(length(text) AS INT) AS n_chars,
         |  CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
         |  CAST($stopCount AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
         |  CASE WHEN len(string_split(text, ' ')) < 20 THEN 'too_short'
         |       WHEN CAST($stopCount AS DOUBLE) / len(string_split(text, ' ')) > 0.2 THEN 'stopword_heavy'
         |       ELSE 'ok' END AS quality_class
         |FROM documents""".stripMargin,
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents)
        |SELECT doc_id, md5(nt) AS norm_hash, CAST(length(nt) AS BIGINT) AS n_chars_norm
        |FROM n""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS gram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x)
        |SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT gram) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT gram) AS DOUBLE) / count(*) AS dup_ratio
        |FROM g GROUP BY doc_id""".stripMargin,
    // ties at the top-k boundary break lexicographically in both
    // engines, so the selected token set is identical
    "vocab_top_tokens" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, count(*) AS n FROM t WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    // rank over the top-100 table only; the normalization product in
    // HUGEINT mirrors the Spark DECIMAL(38,0) discipline
    "zipf_fit" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS n FROM t WHERE token <> '' GROUP BY token),
        |top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100),
        |r AS (
        |  SELECT token, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
        |         max(n) OVER () AS n1
        |  FROM top)
        |SELECT rank, token, n, rank * n AS rank_x_freq,
        |       CAST((CAST(1000000 AS HUGEINT) * rank * n) // n1 AS BIGINT)
        |         AS c_norm_x1e6
        |FROM r""".stripMargin,
    // lead() over the |distinct freqs|-row spectrum; 0 marks the
    // empty-next-bin gap of the unsmoothed estimator
    "token_freq_of_freqs" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY 1),
        |sp AS (SELECT freq, count(*) AS n_types FROM tf GROUP BY 1),
        |l AS (SELECT freq, n_types,
        |        lead(n_types) OVER (ORDER BY freq) AS next_n,
        |        lead(freq) OVER (ORDER BY freq) AS next_f
        |      FROM sp)
        |SELECT freq, n_types,
        |  CAST(CASE WHEN next_f = freq + 1
        |       THEN CAST((1000000::HUGEINT * (freq + 1) * next_n) // n_types AS BIGINT)
        |       ELSE 0 END AS BIGINT) AS good_turing_x1e6
        |FROM l""".stripMargin,
    // adjacent char pairs over the DISTINCT word table weighted by
    // word frequency — integer counts, lexicographic tie-break
    "bpe_pair_stats" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS wf FROM w WHERE w <> '' GROUP BY w),
        |p AS (
        |  SELECT wf, substr(w, i, 2) AS pair
        |  FROM wf, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
        |  WHERE length(w) >= 2)
        |SELECT pair, CAST(sum(wf) AS BIGINT) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // round 2: the top round-1 merge applied via leftmost
    // non-overlapping regexp_replace (= BPE greedy order), pairs
    // recounted over the merged symbol strings
    "bpe_merge_round2" ->
      """WITH w0 AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS wf FROM w0 WHERE w <> '' GROUP BY w),
        |r1 AS (
        |  SELECT substr(w, i, 2) AS pair, sum(wf) AS n
        |  FROM wf, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
        |  WHERE length(w) >= 2 GROUP BY 1),
        |top AS (SELECT pair FROM r1 ORDER BY n DESC, pair LIMIT 1),
        |m AS (SELECT regexp_replace(w, (SELECT pair FROM top), 'A', 'g') AS w2, wf
        |      FROM wf),
        |r2 AS (
        |  SELECT substr(w2, i, 2) AS pair, CAST(sum(wf) AS BIGINT) AS n
        |  FROM m, LATERAL (SELECT unnest(generate_series(1, length(w2) - 1)) AS i) g
        |  WHERE length(w2) >= 2 GROUP BY 1)
        |SELECT pair, n FROM r2 ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // the iterated trainer, unrolled (the ivf_kmeans_iterated idiom):
    // census → top-1 → leftmost non-overlapping merge, three times
    "bpe_merge_train" ->
      s"""WITH $bpeTrainCtes
         |SELECT CAST(1 AS BIGINT) AS round, pair, n, n_words FROM t1
         |UNION ALL SELECT CAST(2 AS BIGINT), pair, n, n_words FROM t2
         |UNION ALL SELECT CAST(3 AS BIGINT), pair, n, n_words FROM t3""".stripMargin,
    // the encode side: apply the trained merges in order to every
    // document (no cross-token matches possible — pairs never contain
    // a space) and report the symbol-count compression
    "bpe_encode_stats" ->
      s"""WITH $bpeTrainCtes,
         |enc AS (
         |  SELECT doc_id,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_sym_raw,
         |    CAST(length(replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(text, (SELECT pair FROM t1), 'A', 'g'),
         |          (SELECT pair FROM t2), 'B', 'g'),
         |        (SELECT pair FROM t3), 'C', 'g'),
         |      ' ', '')) AS BIGINT) AS n_sym_bpe
         |  FROM documents)
         |SELECT doc_id, n_sym_raw, n_sym_bpe,
         |  CAST(CASE WHEN n_sym_raw = 0 THEN 1000000
         |       ELSE (1000000 * n_sym_bpe) // n_sym_raw END AS BIGINT) AS compression_x1e6
         |FROM enc""".stripMargin,
    // content-defined chunk segmentation: break after words whose md5
    // starts with '0'; chunk id = breaks strictly before the word
    "cdc_chunk_stats" ->
      """WITH t AS (
        |  SELECT doc_id, ts[i] AS w, i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        |  WHERE ts[i] <> ''),
        |m AS (
        |  SELECT doc_id, i,
        |         CASE WHEN substr(md5(w), 1, 1) = '0' THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |c AS (
        |  SELECT doc_id,
        |         COALESCE(sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM m),
        |cl AS (SELECT doc_id, chunk, count(*) AS len FROM c GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS n_chunks,
        |       CAST(sum(len) AS BIGINT) AS n_words,
        |       CAST(max(len) AS BIGINT) AS max_chunk_len,
        |       CAST((100 * sum(len)) // count(*) AS BIGINT) AS avg_chunk_x100
        |FROM cl GROUP BY doc_id""".stripMargin,
    // chunk content re-assembles with string_agg(… ORDER BY i) — the
    // SQL twin of Spark's sorted-collect_list join; dedup keys on the
    // chunk md5, duplicated = present in >= 2 distinct docs
    "cdc_chunk_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, ts[i] AS w, i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        |  WHERE ts[i] <> ''),
        |m AS (
        |  SELECT doc_id, w, i,
        |         CASE WHEN substr(md5(w), 1, 1) = '0' THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |c AS (
        |  SELECT doc_id, w, i,
        |         COALESCE(sum(brk) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM m),
        |ch AS (SELECT doc_id, chunk, md5(string_agg(w, ' ' ORDER BY i)) AS chunk_hash
        |       FROM c GROUP BY 1, 2),
        |hd AS (SELECT chunk_hash, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
        |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |       CAST((1000000 * sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
        |         AS dup_frac_x1e6
        |FROM ch JOIN hd USING (chunk_hash) GROUP BY ch.doc_id""".stripMargin,
    // DuckDB range() excludes the end, Spark sequence(0, n-1, s)
    // includes n-1: both enumerate starts 0, s, 2s, … < n_tokens;
    // list_slice's inclusive end start+32 matches Spark's length-32
    // slice; md5 hex is identical across engines
    "rag_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start_tok
        |  FROM t)
        |SELECT doc_id, start_tok,
        |       CAST(len(list_slice(toks, start_tok + 1, start_tok + 32)) AS BIGINT)
        |         AS n_tok_chunk,
        |       md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 32), ' '))
        |         AS chunk_hash
        |FROM s""".stripMargin,
    // p divides the same two BIGINT counts in both engines → the
    // IEEE quotient is bit-identical
    "lm_bigram" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT ts[i] AS left_token, ts[i+1] AS right_token
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x),
        |c AS (
        |  SELECT left_token, right_token, count(*) AS n FROM g GROUP BY 1, 2)
        |SELECT left_token, right_token, n,
        |       CAST(sum(n) OVER (PARTITION BY left_token) AS BIGINT) AS n_left,
        |       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY left_token) AS BIGINT) AS p
        |FROM c""".stripMargin,
    // coverage against the same deterministic top-20 vocabulary
    "vocab_coverage" ->
      """WITH v AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS n
        |    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |    WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT 20)),
        |t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |j AS (
        |  SELECT doc_id, CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END AS iv
        |  FROM t LEFT JOIN v ON t.token = v.token WHERE t.token <> ''),
        |a AS (
        |  SELECT doc_id, count(*) AS n_tok, CAST(sum(iv) AS BIGINT) AS n_in_vocab
        |  FROM j GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_in_vocab, n_tok - n_in_vocab AS n_oov,
        |       CAST(n_in_vocab AS DOUBLE) / n_tok AS coverage
        |FROM a""".stripMargin,
    // the same two count windows as the Spark side; q and the mean are
    // floor divisions over exact integers (1e6 product in HUGEINT via
    // DECIMAL(38,0) to match the engine's overflow headroom)
    "lm_doc_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT doc_id, ts[i] AS l, ts[i+1] AS r
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x),
        |w AS (
        |  SELECT doc_id,
        |         CAST((1000000::HUGEINT * count(*) OVER (PARTITION BY l, r))
        |              // (count(*) OVER (PARTITION BY l)) AS BIGINT) AS q
        |  FROM g)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(q) // count(*) AS BIGINT) AS lm_score_x1e6
        |FROM w GROUP BY doc_id""".stripMargin,
    // per-lang LM terciles: the same per-lang count windows, the same
    // histogram cut (bounded bin table, descending cumulative, the
    // crossing bin = max bin with cum >= ceil(N/3)); every value an
    // exact integer, HUGEINT floor-divides throughout
    "lm_ppl_split" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT doc_id, lang, ts[i] AS l, ts[i+1] AS r
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x),
        |w AS (
        |  SELECT doc_id, lang,
        |         CAST((1000000::HUGEINT * count(*) OVER (PARTITION BY lang, l, r))
        |              // (count(*) OVER (PARTITION BY lang, l)) AS BIGINT) AS q
        |  FROM g),
        |sc AS (SELECT doc_id, lang, count(*) AS n_bigrams,
        |         CAST(sum(q) // count(*) AS BIGINT) AS s
        |       FROM w GROUP BY 1, 2),
        |b AS (SELECT doc_id, lang, n_bigrams, s, s // 500 AS bin FROM sc),
        |hist AS (SELECT lang, bin, count(*) AS n_docs FROM b GROUP BY 1, 2),
        |cm AS (SELECT lang, bin, n_docs,
        |         sum(n_docs) OVER (PARTITION BY lang ORDER BY bin DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(n_docs) OVER (PARTITION BY lang) AS n_total
        |       FROM hist),
        |cuts AS (SELECT lang,
        |           max(CASE WHEN cum >= (n_total + 2) // 3 THEN bin END) AS cut_head,
        |           max(CASE WHEN cum >= (2 * n_total + 2) // 3 THEN bin END) AS cut_mid
        |         FROM cm GROUP BY 1)
        |SELECT b.lang,
        |       CASE WHEN b.bin >= c.cut_head THEN 'head'
        |            WHEN b.bin >= c.cut_mid THEN 'middle'
        |            ELSE 'tail' END AS bucket,
        |       count(*) AS n_docs, CAST(sum(b.n_bigrams) AS BIGINT) AS n_bigrams,
        |       min(b.s) AS min_score_x1e6, max(b.s) AS max_score_x1e6
        |FROM b JOIN cuts c USING (lang)
        |GROUP BY 1, 2""".stripMargin,
    // the same per-factor integer floors; cf/|C| computed in-plan
    // here, spliced as literals on the Spark side — identical
    // integers by determinism of the counts
    "qlm_dirichlet_search" -> {
      val mu = TextAnalysis.DirichletMu
      val qvals = TextAnalysis.bm25Queries
        .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (t, i) => s"($qid, '$t', $i)" } }
        .mkString(", ")
      s"""WITH q(query_id, token, slot) AS (VALUES $qvals),
        |tok AS (
        |  SELECT doc_id, t AS token
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |tf AS MATERIALIZED (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |cf AS (SELECT token, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |qcf AS (SELECT q.query_id, q.slot, coalesce(cf.cf, 0) AS cf
        |        FROM q LEFT JOIN cf USING (token)),
        |dls AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS c FROM tf),
        |matched AS (SELECT q.query_id, t.doc_id, q.slot, t.tf FROM tf t JOIN q USING (token)),
        |cand AS (SELECT query_id, doc_id,
        |           max(CASE WHEN slot = 0 THEN tf END) AS tf0m,
        |           max(CASE WHEN slot = 1 THEN tf END) AS tf1m
        |         FROM matched GROUP BY 1, 2),
        |s AS (SELECT c.query_id, c.doc_id,
        |        CAST((1000000::HUGEINT * (coalesce(c.tf0m, 0)::HUGEINT * t.c + $mu * f0.cf))
        |             // ((d.dl + $mu)::HUGEINT * t.c) AS BIGINT) AS q0,
        |        CAST((1000000::HUGEINT * (coalesce(c.tf1m, 0)::HUGEINT * t.c + $mu * f1.cf))
        |             // ((d.dl + $mu)::HUGEINT * t.c) AS BIGINT) AS q1
        |      FROM cand c
        |      JOIN dls d USING (doc_id)
        |      JOIN qcf f0 ON f0.query_id = c.query_id AND f0.slot = 0
        |      JOIN qcf f1 ON f1.query_id = c.query_id AND f1.slot = 1, tot t),
        |r AS (SELECT query_id, doc_id, CAST(q0 * q1 AS BIGINT) AS qlm_x1e12,
        |        CAST(row_number() OVER (PARTITION BY query_id
        |          ORDER BY q0 * q1 DESC, doc_id) AS BIGINT) AS rk
        |      FROM s)
        |SELECT query_id, doc_id, qlm_x1e12, rk FROM r WHERE rk <= 10""".stripMargin
    },
    // corpus-unique positional bigrams per document; same count
    // window as the Spark side
    "lm_doc_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x),
        |c AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY bigram) AS cnt FROM g),
        |a AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_unique,
        |       CAST(n_unique AS DOUBLE) / n_bigrams AS novelty
        |FROM a""".stripMargin,
    // classifier CTEs ∪ novelty CTEs joined on doc_id; value buckets
    // via truncating division (identical for negative scores)
    "quality_calibration" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |uni AS (SELECT doc_id, unnest(ts) AS feature FROM tok),
        |bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS feature
        |       FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        |       WHERE len(ts) >= 2),
        |f AS (SELECT doc_id, feature FROM uni WHERE feature <> ''
        |      UNION ALL SELECT doc_id, feature FROM bi WHERE feature <> ''),
        |b AS (SELECT doc_id, md5('w|' || substr(md5('clf|' || feature), 1, 3)) AS wh FROM f),
        |w AS (SELECT doc_id,
        |        (((strpos('0123456789abcdef', substr(wh, 1, 1)) - 1) * 4096 +
        |          (strpos('0123456789abcdef', substr(wh, 2, 1)) - 1) * 256 +
        |          (strpos('0123456789abcdef', substr(wh, 3, 1)) - 1) * 16 +
        |          (strpos('0123456789abcdef', substr(wh, 4, 1)) - 1)) % 2001) - 1000 AS w
        |      FROM b),
        |cs AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score FROM w GROUP BY 1),
        |nt AS (SELECT doc_id, ts FROM tok WHERE len(ts) >= 2),
        |ng AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
        |       FROM nt, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) x),
        |nc AS (SELECT doc_id, count(*) OVER (PARTITION BY bigram) AS cnt FROM ng),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |       FROM nc GROUP BY doc_id)
        |SELECT cs.score // 2000 AS score_bucket, count(*) AS n_docs,
        |       CAST(sum(cs.score) AS BIGINT) AS score_sum,
        |       CAST((1000000 * sum(na.n_unique)) // sum(na.n_bigrams) AS BIGINT)
        |         AS mean_novelty_x1e6
        |FROM cs JOIN na USING (doc_id) GROUP BY 1""".stripMargin,
    // percentile_disc positions computed with the same integer
    // arithmetic on both sides — no interpolation
    "text_length_percentiles" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT lang, n_tok,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS BIGINT) AS rk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM t)
        |SELECT lang, n,
        |       max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN n_tok END) AS p50_tok,
        |       max(CASE WHEN rk = ((n - 1) * 90) // 100 + 1 THEN n_tok END) AS p90_tok,
        |       max(CASE WHEN rk = ((n - 1) * 99) // 100 + 1 THEN n_tok END) AS p99_tok
        |FROM r GROUP BY lang, n""".stripMargin,
    // same single-rational scoring; HUGEINT stands in for DECIMAL(38,0)
    "bm25_search" ->
      s"""WITH $bm25RankedCtes
         |SELECT query_id, doc_id, bm25_x1e6, rk FROM r WHERE rk <= 10""".stripMargin,
    // the expanded second round rides the same chain: feedback from
    // `r`, expansion terms mined from `tf`, round-2 scores over the
    // shared `idx`/`tot` with integer weights applied AFTER the floor
    "bm25_rm3" ->
      s"""WITH $bm25RankedCtes,
         |fb AS (SELECT query_id, doc_id FROM r WHERE rk <= 3),
         |e0 AS (
         |  SELECT f.query_id, t.token, CAST(sum(t.tf) AS BIGINT) AS etf
         |  FROM fb f JOIN tf t USING (doc_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.query_id = f.query_id AND q.token = t.token)
         |  GROUP BY 1, 2),
         |e1 AS (SELECT query_id, token,
         |        row_number() OVER (PARTITION BY query_id ORDER BY etf DESC, token) AS trk
         |       FROM e0),
         |q2 AS (SELECT query_id, token, 2 AS wgt FROM q
         |       UNION ALL SELECT query_id, token, 1 FROM e1 WHERE trk <= 5),
         |s2 AS (
         |  SELECT q2.query_id, i.doc_id,
         |    q2.wgt * CAST((1000000::HUGEINT * 22 * t.n_docs * i.tf * (t.tot_tok // t.n_docs))
         |      // (i.df * (10 * i.tf * (t.tot_tok // t.n_docs)
         |                  + 3 * (t.tot_tok // t.n_docs) + 9 * i.dl)) AS BIGINT) AS sc
         |  FROM idx i JOIN q2 USING (token), tot t),
         |a2 AS (SELECT query_id, doc_id, CAST(sum(sc) AS BIGINT) AS b2 FROM s2 GROUP BY 1, 2),
         |r2 AS (SELECT query_id, doc_id,
         |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY b2 DESC, doc_id) AS BIGINT) AS rank
         |       FROM a2)
         |SELECT query_id, rank, doc_id FROM r2 WHERE rank <= 10""".stripMargin,
    "quantile_histogram" ->
      """WITH b AS (
        |  SELECT len(string_split(text, ' ')) // 8 AS bin FROM documents),
        |h AS (SELECT bin, count(*) AS n_docs FROM b GROUP BY bin),
        |c AS (SELECT bin, n_docs,
        |        CAST(sum(n_docs) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_docs,
        |        CAST(sum(n_docs) OVER () AS BIGINT) AS n_total
        |      FROM h)
        |SELECT bin, bin * 8 AS bin_lo, n_docs, cum_docs,
        |  CAST(cum_docs >= (50 * n_total + 99) // 100
        |       AND cum_docs - n_docs < (50 * n_total + 99) // 100 AS INT) AS is_p50_bin,
        |  CAST(cum_docs >= (90 * n_total + 99) // 100
        |       AND cum_docs - n_docs < (90 * n_total + 99) // 100 AS INT) AS is_p90_bin,
        |  CAST(cum_docs >= (99 * n_total + 99) // 100
        |       AND cum_docs - n_docs < (99 * n_total + 99) // 100 AS INT) AS is_p99_bin
        |FROM c""".stripMargin,
    // log-free idf: score = tf·N/df — an integer product divided by
    // an integer, bit-identical cross-engine; ties break on token
    "text_tf_idf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY 1, 2),
        |df AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT f.doc_id, f.token, f.tf, d.df,
        |         CAST(f.tf * n.n AS DOUBLE) / d.df AS score
        |  FROM tf f JOIN df d USING (token) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
        |  FROM s)
        |SELECT doc_id, token AS top_token, tf, df, score FROM r WHERE rk = 1""".stripMargin,
    "text_quality_filter" ->
      s"""WITH f AS (
         |  SELECT source,
         |    len(string_split(text, ' ')) AS nt,
         |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS meanlen,
         |    len(list_filter([$stopList], w -> list_contains(string_split(text, ' '), w))) AS nstop
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN nt < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_short,
         |  CAST(sum(CASE WHEN nt > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_long,
         |  CAST(sum(CASE WHEN meanlen < 3.0 OR meanlen > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_meanword,
         |  CAST(sum(CASE WHEN nstop < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopword,
         |  CAST(sum(CASE WHEN nt >= 20 AND nt <= 1000 AND meanlen >= 3.0 AND meanlen <= 10.0
         |                     AND nstop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |FROM f GROUP BY source""".stripMargin,
    "text_lang_id" ->
      s"""WITH $langIdCtes
         |SELECT lang, predicted, count(*) AS n FROM lidp GROUP BY lang, predicted""".stripMargin,
    // lift product in HUGEINT (oracle) / DECIMAL(38,0) (Spark): both
    // exact; the plain x1e6 shares stay inside BIGINT
    // HHI and its inverse off one (lang, source) count table; squares
    // and the 1e6-scaled ratios ride HUGEINT end to end
    "source_concentration" ->
      """WITH s AS (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
        |a AS (SELECT lang, count(*) AS n_sources, CAST(sum(c) AS BIGINT) AS n_docs,
        |        sum(CAST(c AS HUGEINT) * c) AS sq
        |      FROM s GROUP BY 1)
        |SELECT lang, n_docs, n_sources,
        |  CAST((1000000::HUGEINT * sq) // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
        |    AS hhi_x1e6,
        |  CAST((1000000::HUGEINT * n_docs * n_docs) // sq AS BIGINT) AS eff_sources_x1e6
        |FROM a""".stripMargin,
    // inverse Simpson over (source, token) counts — same exact
    // integer pipeline as the Spark side
    "unigram_diversity" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT source, token, count(*) AS c FROM tok WHERE token <> '' GROUP BY 1, 2),
        |a AS (SELECT source, count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        sum(CAST(c AS HUGEINT) * c) AS sq
        |      FROM tf GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |  CAST((1000000::HUGEINT * n_types) // n_tokens AS BIGINT) AS ttr_x1e6,
        |  CAST((1000000::HUGEINT * n_tokens * n_tokens) // sq AS BIGINT) AS eff_vocab_x1e6
        |FROM a""".stripMargin,
    // row_number() is BIGINT in DuckDB → INT to match Spark's rank
    "lang_top_tokens" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT lang, token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY 1, 2),
        |r AS (SELECT lang, token, cnt,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rk
        |      FROM tf)
        |SELECT lang, rk, token, cnt FROM r WHERE rk <= 10""".stripMargin,
    // the join formulation of the bounded-list pair expansion; the
    // final jaccard is one double division of identical integers
    "lang_vocab_overlap" ->
      """WITH lt AS (
        |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |lt2 AS (SELECT lang, token FROM lt WHERE token <> ''),
        |ns AS (SELECT lang, count(*) AS n FROM lt2 GROUP BY 1),
        |comm AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_common
        |  FROM lt2 a JOIN lt2 b ON a.token = b.token AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT c.lang_a, c.lang_b, c.n_common,
        |       na.n + nb.n - c.n_common AS n_union,
        |       CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) AS jaccard
        |FROM comm c
        |JOIN ns na ON na.lang = c.lang_a
        |JOIN ns nb ON nb.lang = c.lang_b""".stripMargin,
    // the sketch gates hash-compare only cross-engine facts: the
    // exact twin plus the guarantee flag (constant true while the
    // sketch honors its error contract)
    "sketch_hll_bounds" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |       true AS within_bound
        |FROM events GROUP BY 1""".stripMargin,
    "sketch_gk_bounds" ->
      """WITH v AS (
        |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc, event_id
        |  FROM events),
        |r AS (SELECT vc, CAST(row_number() OVER (ORDER BY vc, event_id) AS BIGINT) AS rk,
        |        count(*) OVER () AS n FROM v),
        |e AS (SELECT
        |  max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN vc END) AS ex_50,
        |  max(CASE WHEN rk = ((n - 1) * 90) // 100 + 1 THEN vc END) AS ex_90,
        |  max(CASE WHEN rk = ((n - 1) * 99) // 100 + 1 THEN vc END) AS ex_99
        | FROM r)
        |SELECT CAST(50 AS BIGINT) AS p, CAST(ex_50 AS DOUBLE) / 100.0 AS exact_value,
        |       true AS within_bound FROM e
        |UNION ALL SELECT 90, CAST(ex_90 AS DOUBLE) / 100.0, true FROM e
        |UNION ALL SELECT 99, CAST(ex_99 AS DOUBLE) / 100.0, true FROM e""".stripMargin,
    // the mad_outliers rank-rule medians replayed over the langId
    // CTE's predicted column; every compared quantity is an integer
    "lang_robust_stats" ->
      s"""WITH $langIdCtes,
         |r1 AS (SELECT predicted, doc_id, n_tok,
         |         CAST(row_number() OVER (PARTITION BY predicted ORDER BY n_tok, doc_id) AS BIGINT) AS rk,
         |         count(*) OVER (PARTITION BY predicted) AS n FROM lidp),
         |med AS (SELECT predicted, max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN n_tok END) AS med_tok
         |        FROM r1 GROUP BY 1),
         |dv AS (SELECT l.predicted, l.doc_id, l.n_tok, med.med_tok,
         |         abs(l.n_tok - med.med_tok) AS dev
         |       FROM lidp l JOIN med ON l.predicted = med.predicted),
         |r2 AS (SELECT predicted, doc_id, dev,
         |         CAST(row_number() OVER (PARTITION BY predicted ORDER BY dev, doc_id) AS BIGINT) AS rk,
         |         count(*) OVER (PARTITION BY predicted) AS n FROM dv),
         |mad AS (SELECT predicted, max(CASE WHEN rk = ((n - 1) * 50) // 100 + 1 THEN dev END) AS mad_tok
         |        FROM r2 GROUP BY 1)
         |SELECT d.predicted, count(*) AS n_docs,
         |       max(d.med_tok) AS median_tok,
         |       max(m.mad_tok) AS mad_tok,
         |       CAST(sum(CASE WHEN d.dev > 3 * m.mad_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dv d JOIN mad m ON d.predicted = m.predicted
         |GROUP BY 1""".stripMargin,
    "lang_mix_drift" ->
      s"""WITH $langIdCtes,
         |cells AS (
         |  SELECT source, predicted, count(*) AS n_docs FROM lidp GROUP BY 1, 2),
         |m AS (
         |  SELECT source, predicted, n_docs,
         |         sum(n_docs) OVER (PARTITION BY source) AS n_src,
         |         sum(n_docs) OVER (PARTITION BY predicted) AS n_lang,
         |         sum(n_docs) OVER () AS nn
         |  FROM cells)
         |SELECT source, predicted, n_docs,
         |       CAST((1000000 * n_docs) // n_src AS BIGINT) AS share_x1e6,
         |       CAST((1000000 * n_lang) // nn AS BIGINT) AS global_share_x1e6,
         |       CAST((1000000::HUGEINT * n_docs * nn) // (n_src * n_lang) AS BIGINT)
         |         AS lift_x1e6
         |FROM m""".stripMargin,
    "doc_fingerprint" ->
      s"""SELECT source, count(*) AS n_docs,
         |  count(DISTINCT $fp) AS n_distinct_fp,
         |  min($fp) AS min_fp
         |FROM documents GROUP BY source""".stripMargin,
    "dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct,
        |  count(*) - count(DISTINCT md5(text)) AS n_exact_dups
        |FROM documents GROUP BY source""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH ${minhashPairCtes()}
         |SELECT doc_a, doc_b, n_common, n_union, jaccard FROM lshpairs""".stripMargin,
    // incremental cluster maintenance must land on the SAME labels a
    // full recompute yields — the oracle is the full-corpus closure
    // (dedup_clusters' reach CTE, assignments only)
    "dedup_clusters_incremental" ->
      s"""WITH RECURSIVE ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src)
         |SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    // incremental dedup == full-corpus pairs touching the id-suffix
    // increment (banding is order-independent, so the oracle is the
    // full pair table filtered at the same 90%-of-max cutoff;
    // doc_a < doc_b makes "touches the increment" ⟺ doc_b > cutoff)
    "dedup_incremental_lsh" ->
      s"""WITH ${minhashPairCtes()},
         |t AS (SELECT (9 * max(doc_id)) // 10 AS cutoff FROM documents)
         |SELECT p.doc_a, p.doc_b, p.n_common, p.n_union, p.jaccard
         |FROM lshpairs p, t WHERE p.doc_b > t.cutoff""".stripMargin,
    // the refreshed-index probe of the NEXT era (> 85% of max):
    // banding is order-independent, so a folded index probes exactly
    // like a rebuilt one — the output is the full pair table
    // restricted to pairs touching that increment
    "dedup_index_refresh" ->
      s"""WITH ${minhashPairCtes()},
         |t AS (SELECT (85 * max(doc_id)) // 100 AS cutoff FROM documents)
         |SELECT p.doc_a, p.doc_b, p.n_common, p.n_union, p.jaccard
         |FROM lshpairs p, t WHERE p.doc_b > t.cutoff""".stripMargin,
    // the streaming probe lands exactly the old×new slice (banding
    // is order-independent; new×new is the next index rebuild's job)
    "stream_incremental_dedup" ->
      s"""WITH ${minhashPairCtes()},
         |t AS (SELECT (9 * max(doc_id)) // 10 AS cutoff FROM documents)
         |SELECT p.doc_a, p.doc_b, p.n_common, p.n_union, p.jaccard
         |FROM lshpairs p, t WHERE p.doc_a <= t.cutoff AND p.doc_b > t.cutoff""".stripMargin,
    // LSH banding recall vs the exact inverted-index truth, per
    // jaccard decile + a -1 total row; recall as integer permille
    // (integer division — a rounded double ratio is not portable).
    // `rare`/`f`/`commx` rebuild the dedup_ngram_jaccard truth side
    // on the shared `sh`/`nsh` CTEs minhashPairCtes provides.
    "dedup_minhash_recall" ->
      s"""WITH ${minhashPairCtes()},
         |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 50),
         |f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |commx AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truthp AS (
         |  SELECT doc_a, doc_b,
         |         CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
         |  FROM commx JOIN nsh na ON na.doc_id = doc_a JOIN nsh nb ON nb.doc_id = doc_b
         |  WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.3),
         |j AS (
         |  SELECT LEAST(CAST(floor(t.jaccard * 10) AS BIGINT), 9) AS jaccard_decile,
         |         CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM truthp t LEFT JOIN lshpairs l USING (doc_a, doc_b)),
         |perdec AS MATERIALIZED (
         |  SELECT jaccard_decile, count(*) AS n_truth_pairs,
         |         CAST(sum(hit) AS BIGINT) AS n_lsh_found
         |  FROM j GROUP BY 1),
         |withtot AS (
         |  SELECT * FROM perdec
         |  UNION ALL
         |  SELECT -1, CAST(sum(n_truth_pairs) AS BIGINT), CAST(sum(n_lsh_found) AS BIGINT) FROM perdec)
         |SELECT jaccard_decile, n_truth_pairs, n_lsh_found,
         |       (1000 * n_lsh_found) // n_truth_pairs AS recall_permille
         |FROM withtot""".stripMargin,
    // fixed-iteration PageRank on the verified pair graph, ALL in
    // scaled-integer arithmetic (rank × 1e6, floor division): integer
    // sums are order-independent, so three chained CTE rounds here
    // equal Spark's three join+sum rounds bit-for-bit
    "graph_pagerank" ->
      s"""WITH ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a, doc_b FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |deg AS MATERIALIZED (SELECT doc_a, count(*) AS deg FROM edges GROUP BY 1),
         |pr0 AS (SELECT doc_a AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |pr1 AS (SELECT e.doc_b AS node,
         |               150000 + (85 * sum(p.pr // d.deg)) // 100 AS pr
         |        FROM edges e JOIN deg d ON e.doc_a = d.doc_a
         |        JOIN pr0 p ON e.doc_a = p.node GROUP BY 1),
         |pr2 AS (SELECT e.doc_b AS node,
         |               150000 + (85 * sum(p.pr // d.deg)) // 100 AS pr
         |        FROM edges e JOIN deg d ON e.doc_a = d.doc_a
         |        JOIN pr1 p ON e.doc_a = p.node GROUP BY 1),
         |pr3 AS (SELECT e.doc_b AS node,
         |               150000 + (85 * sum(p.pr // d.deg)) // 100 AS pr
         |        FROM edges e JOIN deg d ON e.doc_a = d.doc_a
         |        JOIN pr2 p ON e.doc_a = p.node GROUP BY 1)
         |SELECT node AS doc_id, CAST(pr AS BIGINT) AS pr_scaled FROM pr3""".stripMargin,
    // signed scaled modularity: Spark div and DuckDB // both truncate
    // toward zero, so negative q_c contributions are portable
    "graph_modularity" ->
      s"""WITH ${minhashPairCtes()},
         |src AS (SELECT doc_id, source FROM documents),
         |lab AS (SELECT p.doc_a, p.doc_b, a.source AS sa, b.source AS sb
         |        FROM lshpairs p JOIN src a ON p.doc_a = a.doc_id
         |        JOIN src b ON p.doc_b = b.doc_id),
         |mm AS (SELECT count(*) AS m FROM lshpairs),
         |edges AS (SELECT doc_a FROM lshpairs UNION ALL SELECT doc_b FROM lshpairs),
         |deg AS (SELECT doc_a AS doc_id, count(*) AS deg FROM edges GROUP BY 1),
         |ds AS (SELECT s.source, CAST(sum(d.deg) AS BIGINT) AS d_c
         |       FROM deg d JOIN src s USING (doc_id) GROUP BY 1),
         |ic AS (SELECT sa AS source, CAST(count(*) AS BIGINT) AS e_c
         |       FROM lab WHERE sa = sb GROUP BY 1)
         |SELECT ds.source, COALESCE(ic.e_c, 0) AS e_c, ds.d_c,
         |  CAST((1000000::HUGEINT * (4::HUGEINT * mm.m * COALESCE(ic.e_c, 0) - ds.d_c::HUGEINT * ds.d_c))
         |    // (4::HUGEINT * mm.m * mm.m) AS BIGINT) AS q_c_x1e6
         |FROM ds LEFT JOIN ic USING (source), mm""".stripMargin,
    // wedge/triangle census of the pair graph; clustering coefficient
    // as an exact scaled-integer ratio. Triangles close ordered
    // wedges a<b<c against the oriented edge list
    "graph_triangles" ->
      s"""WITH ${minhashPairCtes()},
         |edges AS (SELECT doc_a, doc_b FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |deg AS MATERIALIZED (SELECT doc_a, count(*) AS deg FROM edges GROUP BY 1),
         |tri AS MATERIALIZED (
         |  SELECT count(*) AS n_triangles FROM lshpairs ab
         |  JOIN lshpairs bc ON ab.doc_b = bc.doc_a
         |  JOIN lshpairs ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b)
         |SELECT (SELECT count(*) FROM deg) AS n_nodes,
         |       (SELECT count(*) FROM lshpairs) AS n_edges,
         |       (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         |       (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles,
         |       (SELECT CAST(CASE WHEN sum(deg * (deg - 1) // 2) > 0
         |                    THEN (3 * (SELECT n_triangles FROM tri) * 1000000)
         |                         // sum(deg * (deg - 1) // 2)
         |                    ELSE 0 END AS BIGINT) FROM deg) AS clustering_x1e6""".stripMargin,
    // the bands CTE re-grouped to occupancies; matTail = false keeps
    // the unused cand/lshpairs tail lazy (a MATERIALIZED but
    // unreferenced CTE is still evaluated in DuckDB 1.0)
    "lsh_band_stats" ->
      s"""WITH ${minhashPairCtes(matTail = false)},
         |bsz AS (SELECT b AS band, bkey, count(*) AS sz FROM bands GROUP BY 1, 2)
         |SELECT band, sz AS bucket_size, count(*) AS n_buckets
         |FROM bsz GROUP BY 1, 2""".stripMargin,
    // the Aᵀ(A·v) chain replayed as per-vec/per-dim sum CTEs; HUGEINT
    // stands in for DECIMAL(38,0) at every accumulation, and each
    // step's output takes the same exact toward-zero 10³ rescale as
    // the Spark side (DuckDB `//` truncates toward zero, matching
    // Spark's `(v - v % 1000) / 1000`), and the emission takes one
    // more — raw v3 crossed ±9.2e18 at the sf10e rehearsal point —
    // so the final components fit BIGINT at every SF
    "embedding_power_iteration" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS HUGEINT) AS qv
        |  FROM embeddings,
        |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
        |v1 AS (SELECT dim, sum(qv) AS v FROM q GROUP BY 1),
        |s2 AS (SELECT vec_id, sum(q.qv * v1.v) AS dot
        |       FROM q JOIN v1 USING (dim) GROUP BY 1),
        |v2 AS (SELECT dim, sum(q.qv * s2.dot) // 1000 AS v
        |       FROM q JOIN s2 USING (vec_id) GROUP BY 1),
        |s3 AS (SELECT vec_id, sum(q.qv * v2.v) AS dot
        |       FROM q JOIN v2 USING (dim) GROUP BY 1),
        |v3 AS (SELECT dim, sum(q.qv * s3.dot) // 1000 AS v
        |       FROM q JOIN s3 USING (vec_id) GROUP BY 1)
        |SELECT dim, CAST(v // 1000 AS BIGINT) AS pc1_raw FROM v3""".stripMargin,
    // the sig CTE's per-seed minhashes joined per verified pair;
    // every matrix coordinate is an integer (agreement count, integer
    // Jaccard bucket)
    "minhash_calibration" ->
      s"""WITH ${minhashPairCtes()},
         |ag AS (
         |  SELECT p.doc_a, p.doc_b, p.n_common, p.n_union,
         |         CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         |  FROM lshpairs p
         |  JOIN sig sa ON sa.doc_id = p.doc_a
         |  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.s = sa.s
         |  GROUP BY 1, 2, 3, 4)
         |SELECT n_agree, (10 * n_common) // n_union AS true_bucket,
         |       count(*) AS n_pairs
         |FROM ag GROUP BY 1, 2""".stripMargin,
    // fixed 100-wide stopword-score bins × dup-family count window
    "quality_dup_calibration" ->
      s"""WITH s AS (
         |  SELECT doc_id, md5(text) AS h,
         |         (1000 * $stopCount) // len(string_split(text, ' ')) AS sx
         |  FROM documents),
         |f AS (SELECT *, count(*) OVER (PARTITION BY h) AS fam FROM s)
         |SELECT sx // 100 AS q_bucket, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN fam >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |       CAST((1000000::HUGEINT * sum(CASE WHEN fam >= 2 THEN 1 ELSE 0 END))
         |            // count(*) AS BIGINT) AS dup_x1e6
         |FROM f GROUP BY 1""".stripMargin,
    // degree histogram over the same verified pair set
    "dedup_degree_stats" ->
      s"""WITH ${minhashPairCtes()},
         |deg AS (
         |  SELECT doc_id, count(*) AS degree FROM (
         |    SELECT doc_a AS doc_id FROM lshpairs
         |    UNION ALL SELECT doc_b FROM lshpairs)
         |  GROUP BY doc_id)
         |SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree""".stripMargin,
    // distinct (source, shingle) sets → exact pairwise Jaccard; the
    // self-join formulation counts each shared shingle once per
    // ordered source pair, same as the posting-list expansion
    "source_overlap" ->
      """WITH tok AS (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g),
        |ns AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |comm AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT c.src_a, c.src_b, c.n_common,
        |       na.n + nb.n - c.n_common AS n_union,
        |       CAST(c.n_common AS DOUBLE) / (na.n + nb.n - c.n_common) AS jaccard
        |FROM comm c
        |JOIN ns na ON na.source = c.src_a
        |JOIN ns nb ON nb.source = c.src_b""".stripMargin,
    // transitive closure of the LSH pair graph: WITH RECURSIVE with a
    // UNION (set semantics) fixpoint — each step extends every
    // reached (node, label) across one edge, so min(label) per node
    // is the component minimum, exactly the Spark min-label fixpoint
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
         |cc AS MATERIALIZED (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |sz AS (SELECT cluster_id, count(*) AS n_members FROM cc GROUP BY cluster_id)
         |SELECT cc.doc_id, cc.cluster_id, sz.n_members,
         |       CAST(CASE WHEN cc.doc_id = cc.cluster_id THEN 1 ELSE 0 END AS INT) AS is_canonical
         |FROM cc JOIN sz USING (cluster_id)""".stripMargin,
    // 3 chained frontier rounds over the pair graph; (dist, seed)
    // packed as dist·10^12 + seed so min() is the lexicographic min
    // three peel rounds as chained CTEs; n_nodes counts the degree
    // survivors of each round, n_edges the pairs with both ends kept
    "graph_kcore" ->
      s"""WITH ${minhashPairCtes()},
         |e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM lshpairs),
         |s0 AS (SELECT doc_a AS a FROM e0 UNION ALL SELECT doc_b FROM e0),
         |k1 AS MATERIALIZED (SELECT a FROM s0 GROUP BY a HAVING count(*) >= 2),
         |e1 AS MATERIALIZED (SELECT doc_a, doc_b FROM e0
         |       WHERE doc_a IN (SELECT a FROM k1) AND doc_b IN (SELECT a FROM k1)),
         |s1 AS (SELECT doc_a AS a FROM e1 UNION ALL SELECT doc_b FROM e1),
         |k2 AS MATERIALIZED (SELECT a FROM s1 GROUP BY a HAVING count(*) >= 2),
         |e2 AS MATERIALIZED (SELECT doc_a, doc_b FROM e1
         |       WHERE doc_a IN (SELECT a FROM k2) AND doc_b IN (SELECT a FROM k2)),
         |s2 AS (SELECT doc_a AS a FROM e2 UNION ALL SELECT doc_b FROM e2),
         |k3 AS MATERIALIZED (SELECT a FROM s2 GROUP BY a HAVING count(*) >= 2),
         |e3 AS MATERIALIZED (SELECT doc_a, doc_b FROM e2
         |       WHERE doc_a IN (SELECT a FROM k3) AND doc_b IN (SELECT a FROM k3))
         |SELECT 1 AS round, (SELECT count(*) FROM k1) AS n_nodes,
         |       (SELECT count(*) FROM e1) AS n_edges
         |UNION ALL
         |SELECT 2, (SELECT count(*) FROM k2), (SELECT count(*) FROM e2)
         |UNION ALL
         |SELECT 3, (SELECT count(*) FROM k3), (SELECT count(*) FROM e3)""".stripMargin,
    "graph_label_prop" ->
      s"""WITH ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS enc FROM edges
         |       JOIN documents ON src = doc_id
         |       WHERE substr(md5(text || '|lpseed'), 1, 1) IN ('0','1','2','3')),
         |l1 AS MATERIALIZED (SELECT id, min(enc) AS enc FROM (
         |  SELECT e.dst AS id, l.enc + 1000000000000 AS enc
         |  FROM edges e JOIN l0 l ON l.id = e.src
         |  UNION ALL SELECT id, enc FROM l0) GROUP BY id),
         |l2 AS MATERIALIZED (SELECT id, min(enc) AS enc FROM (
         |  SELECT e.dst AS id, l.enc + 1000000000000 AS enc
         |  FROM edges e JOIN l1 l ON l.id = e.src
         |  UNION ALL SELECT id, enc FROM l1) GROUP BY id),
         |l3 AS (SELECT id, min(enc) AS enc FROM (
         |  SELECT e.dst AS id, l.enc + 1000000000000 AS enc
         |  FROM edges e JOIN l2 l ON l.id = e.src
         |  UNION ALL SELECT id, enc FROM l2) GROUP BY id)
         |SELECT id AS doc_id, enc // 1000000000000 AS dist,
         |       enc % 1000000000000 AS seed_id
         |FROM l3""".stripMargin,
    // split decided by the cluster representative's hash, so every
    // near-dup family lands in exactly one split
    "sample_leakage_free" ->
      s"""WITH RECURSIVE ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
         |cc AS MATERIALIZED (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |j AS (SELECT d.doc_id, cc.cluster_id,
         |             COALESCE(cc.cluster_id, d.doc_id) AS rep
         |      FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
         |s AS (SELECT cluster_id, rep,
         |        CASE WHEN substr(md5(CAST(rep AS VARCHAR) || '|csplit'), 1, 2) < 'cc' THEN 'train'
         |             WHEN substr(md5(CAST(rep AS VARCHAR) || '|csplit'), 1, 2) < 'e6' THEN 'val'
         |             ELSE 'test' END AS split
         |      FROM j)
         |SELECT split, count(*) AS n_docs, count(DISTINCT rep) AS n_groups,
         |       CAST(sum(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_clustered_docs
         |FROM s GROUP BY split""".stripMargin,
    // keep/drop decision per document: quality-ranked survivor per
    // near-dup cluster (longest doc, tie → smaller id), singletons
    // kept with their own id as cluster_id
    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
         |cc AS MATERIALIZED (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |ranked AS (
         |  SELECT cc.doc_id, cc.cluster_id,
         |         row_number() OVER (PARTITION BY cc.cluster_id
         |                            ORDER BY d.n_chars DESC, cc.doc_id) AS rn
         |  FROM cc JOIN documents d ON d.doc_id = cc.doc_id)
         |SELECT doc_id, cluster_id,
         |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM ranked
         |UNION ALL
         |SELECT d.doc_id, d.doc_id AS cluster_id, CAST(1 AS INT) AS keep
         |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
         |WHERE cc.doc_id IS NULL""".stripMargin,
    // the composed pipeline: keep-best survivors (full-corpus dedup) ∩
    // quality-filtered docs, split-assigned, summarized per source
    "curation_pipeline" ->
      s"""WITH RECURSIVE ${minhashPairCtes()},
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM lshpairs
         |          UNION ALL SELECT doc_b, doc_a FROM lshpairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
         |cc AS MATERIALIZED (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
         |ranked AS (
         |  SELECT cc.doc_id,
         |         row_number() OVER (PARTITION BY cc.cluster_id
         |                            ORDER BY d.n_chars DESC, cc.doc_id) AS rn
         |  FROM cc JOIN documents d ON d.doc_id = cc.doc_id),
         |keepers AS (
         |  SELECT doc_id FROM ranked WHERE rn = 1
         |  UNION ALL
         |  SELECT d.doc_id FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
         |  WHERE cc.doc_id IS NULL),
         |q AS (
         |  SELECT doc_id, source,
         |    CASE WHEN substr(md5(text || '|split'), 1, 2) < 'cc' THEN 'train'
         |         WHEN substr(md5(text || '|split'), 1, 2) < 'e6' THEN 'val'
         |         ELSE 'test' END AS split,
         |    len(string_split(text, ' ')) AS n_tok
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= 20
         |    AND len(string_split(text, ' ')) <= 1000
         |    AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |          / len(string_split(text, ' ')) >= 3.0
         |    AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |          / len(string_split(text, ' ')) <= 10.0
         |    AND len(list_filter([$stopList], w -> list_contains(string_split(text, ' '), w))) >= 2)
         |SELECT q.source, q.split, count(*) AS n_docs, CAST(sum(q.n_tok) AS BIGINT) AS n_tokens
         |FROM q JOIN keepers k ON k.doc_id = q.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |hv AS (SELECT doc_id, $hvSql AS v FROM tok),
         |votes AS (SELECT doc_id, $votesSql FROM hv GROUP BY doc_id)
         |SELECT doc_id, $fpBitsSql AS simhash FROM votes""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |hv AS (SELECT doc_id, $vhi64Sql AS vhi, $vlo64Sql AS vlo FROM tok),
         |votes AS (SELECT doc_id, $votes64Sql FROM hv GROUP BY doc_id),
         |fp AS (SELECT d.source, d.doc_id, $fhi64Sql AS fhi, $flo64Sql AS flo
         |       FROM votes v JOIN documents d ON d.doc_id = v.doc_id)
         |SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.fhi, b.fhi)) + bit_count(xor(a.flo, b.flo)) AS INT) AS hamming
         |FROM fp a JOIN fp b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fhi, b.fhi)) + bit_count(xor(a.flo, b.flo)) <= 7""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCtes,
         |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 50),
         |f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |comm AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |       CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
         |FROM comm JOIN nsh na ON na.doc_id = doc_a JOIN nsh nb ON nb.doc_id = doc_b
         |WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.3""".stripMargin,
    // shingle-df histogram vs the maxDf=50 cutoff; ≤ 51 bins, the
    // overflow bin (51) carries the dropped posting mass
    "dedup_shingle_df_stats" ->
      s"""WITH $shingleCtes,
         |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
         |b AS (SELECT CASE WHEN df <= 50 THEN df ELSE 51 END AS df_bin,
         |        count(*) AS n_shingles, CAST(sum(df) AS BIGINT) AS posting_mass
         |      FROM dfq GROUP BY 1)
         |SELECT df_bin, n_shingles, posting_mass,
         |       (df_bin BETWEEN 2 AND 50) AS kept
         |FROM b""".stripMargin,
    // the char-5-gram twin of the df audit (the char family's own
    // cutoff; same bounded-bin shape)
    "dedup_char_shingle_df_stats" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 4)) AS i) g
        |  WHERE length(text) >= 5),
        |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
        |b AS (SELECT CASE WHEN df <= 50 THEN df ELSE 51 END AS df_bin,
        |        count(*) AS n_shingles, CAST(sum(df) AS BIGINT) AS posting_mass
        |      FROM dfq GROUP BY 1)
        |SELECT df_bin, n_shingles, posting_mass,
        |       (df_bin BETWEEN 2 AND 50) AS kept
        |FROM b""".stripMargin,
    // same inverted-index CTEs; only the score differs (exact
    // scaled-integer floor division, min set size in the denominator)
    // first-occurrence via the same min-over-hash window; cumulative
    // sums run on the |buckets|-row frame
    "dedup_yield_curve" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |f AS (SELECT *, min(doc_id) OVER (PARTITION BY h) AS first_id FROM d),
        |b AS (SELECT doc_id // 1000 AS bucket, count(*) AS n_docs,
        |        CAST(sum(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |      FROM f GROUP BY 1),
        |c AS (SELECT *,
        |        CAST(sum(n_docs) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
        |        CAST(sum(n_novel) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_novel
        |      FROM b)
        |SELECT bucket, n_docs, n_novel, cum_docs, cum_novel,
        |       CAST((1000000::HUGEINT * cum_novel) // cum_docs AS BIGINT) AS novelty_x1e6
        |FROM c""".stripMargin,
    // same min-over-hash first occurrence (GLOBAL — a source
    // re-crawling another's content earns no novelty), cumulative
    // windows partitioned by source
    "source_yield_curves" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |f AS (SELECT *, min(doc_id) OVER (PARTITION BY h) AS first_id FROM d),
        |b AS (SELECT source, doc_id // 1000 AS bucket, count(*) AS n_docs,
        |        CAST(sum(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |      FROM f GROUP BY 1, 2),
        |c AS (SELECT *,
        |        CAST(sum(n_docs) OVER (PARTITION BY source ORDER BY bucket
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
        |        CAST(sum(n_novel) OVER (PARTITION BY source ORDER BY bucket
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_novel
        |      FROM b)
        |SELECT source, bucket, n_docs, n_novel, cum_docs, cum_novel,
        |       CAST((1000000::HUGEINT * cum_novel) // cum_docs AS BIGINT) AS novelty_x1e6
        |FROM c""".stripMargin,
    // family sizes via the same one-pass count window; list slice
    // ts[1:5] caps at the list end exactly like Spark's slice
    "dedup_prefix_families" ->
      """WITH p AS (
        |  SELECT source, array_to_string(string_split(text, ' ')[1:5], ' ') AS prefix
        |  FROM documents),
        |f AS (SELECT source, prefix, count(*) OVER (PARTITION BY prefix) AS fam FROM p)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN fam >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_family,
        |  CAST(count(DISTINCT CASE WHEN fam >= 2 THEN prefix END) AS BIGINT) AS n_families,
        |  CAST(max(CASE WHEN fam >= 2 THEN fam ELSE 0 END) AS BIGINT) AS max_family
        |FROM f GROUP BY 1""".stripMargin,
    // shingles WITH multiplicity (no DISTINCT — unlike shingleCtes):
    // total vs distinct per source gives the duplicated mass
    // covered-length rule: hot-span starts are strictly increasing,
    // so union length is sum(least(k, pos - prev_pos)), first span
    // contributing k via the lag default
    "dedup_span_coverage" ->
      s"""$spanPostingCtes,
        |hp AS (
        |  SELECT p.doc_id, p.n_tokens, p.pos,
        |         LEAST(3, p.pos - LAG(p.pos, 1, p.pos - 3)
        |           OVER (PARTITION BY p.doc_id ORDER BY p.pos)) AS covered
        |  FROM p JOIN hot USING (shingle))
        |SELECT doc_id, max(n_tokens) AS n_tokens, count(*) AS n_hot_spans,
        |       CAST(sum(covered) AS BIGINT) AS covered_tokens,
        |       CAST((1000000 * CAST(sum(covered) AS BIGINT)) // max(n_tokens) AS BIGINT)
        |         AS covered_x1e6
        |FROM hp GROUP BY doc_id""".stripMargin,
    "dedup_span_scrub" ->
      s"""$spanPostingCtes,
        |cov AS (
        |  SELECT DISTINCT p.doc_id, p.pos + j.j AS cpos
        |  FROM p JOIN hot USING (shingle),
        |       LATERAL (SELECT unnest(generate_series(0, 2)) AS j) j),
        |alltok AS (
        |  SELECT doc_id, i - 1 AS pos, ts[i] AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t,
        |       LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g),
        |keep AS (
        |  SELECT t.doc_id, t.pos, t.w FROM alltok t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |  WHERE c.cpos IS NULL),
        |agg AS (
        |  SELECT doc_id, count(*) AS kept,
        |         string_agg(w, ' ' ORDER BY pos) AS scrubbed
        |  FROM keep GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.kept, 0) AS BIGINT) AS kept_tokens,
        |  CAST(len(string_split(d.text, ' ')) - coalesce(a.kept, 0) AS BIGINT)
        |    AS removed_tokens,
        |  md5(coalesce(a.scrubbed, '')) AS scrub_md5
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // segment-hash boilerplate removal: df over DISTINCT docs, kept
    // segments reassembled in seg_pos order, pinned via md5 (empty
    // string when a doc is all boilerplate — string_agg skips NULLs
    // and aggregates-to-NULL over zero rows on both engines)
    "text_line_dedup" ->
      s"""WITH $segCtes,
        |hot AS (SELECT h FROM seg GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |fl AS (
        |  SELECT s.doc_id, s.seg_pos, s.n_tok, s.txt,
        |         CASE WHEN hot.h IS NOT NULL THEN 1 ELSE 0 END AS bp
        |  FROM seg s LEFT JOIN hot ON s.h = hot.h)
        |SELECT doc_id, count(*) AS n_seg,
        |       CAST(sum(1 - bp) AS BIGINT) AS n_seg_kept,
        |       CAST(sum(CASE WHEN bp = 0 THEN n_tok ELSE 0 END) AS BIGINT) AS n_tok_kept,
        |       md5(coalesce(
        |         string_agg(CASE WHEN bp = 0 THEN txt END, ' ' ORDER BY seg_pos), ''))
        |         AS clean_md5
        |FROM fl GROUP BY doc_id""".stripMargin,
    // same LSH candidates as the minhash pair family, verified by
    // exact unit-cost levenshtein as an integer permille of the
    // longer text — over the ASCII projection (Spark levenshtein
    // counts code points, DuckDB counts bytes; '?'-projecting every
    // non-ASCII code point makes the two identical)
    "dedup_edit_ratio" ->
      s"""WITH $lshCandCtes,
        |pj AS (SELECT doc_id, regexp_replace(text, '[^[:ascii:]]', '?', 'g') AS text
        |       FROM documents),
        |lv AS (
        |  SELECT c.doc_a, c.doc_b,
        |         CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
        |         CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS max_len
        |  FROM cand c
        |  JOIN pj a ON a.doc_id = c.doc_a
        |  JOIN pj b ON b.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, lev, max_len,
        |       CAST((1000 * lev) // max_len AS BIGINT) AS edit_permille
        |FROM lv WHERE (1000 * lev) // max_len <= ${Dedup.EditPermilleCutoff}""".stripMargin,
    "dedup_shingle_mass" ->
      """WITH tok AS (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g),
        |g2 AS (SELECT source, shingle, count(*) AS c FROM sh GROUP BY 1, 2),
        |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_shingles,
        |        count(*) AS n_distinct
        |      FROM g2 GROUP BY 1)
        |SELECT source, n_shingles, n_distinct,
        |  CAST((1000000::HUGEINT * (n_shingles - n_distinct)) // n_shingles AS BIGINT)
        |    AS dup_frac_x1e6
        |FROM a""".stripMargin,
    "dedup_containment" ->
      s"""WITH $shingleCtes,
         |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 50),
         |f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |comm AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |       CAST((1000000 * n_common) // least(na.n, nb.n) AS BIGINT)
         |         AS containment_x1e6
         |FROM comm JOIN nsh na ON na.doc_id = doc_a JOIN nsh nb ON nb.doc_id = doc_b
         |WHERE (1000000 * n_common) // least(na.n, nb.n) >= 500000""".stripMargin,
    "dedup_char_ngram" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 5) AS shingle
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 4)) AS i) g
        |  WHERE length(text) >= 5),
        |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 50),
        |f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        |comm AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM f a JOIN f b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |       CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
        |FROM comm JOIN nsh na ON na.doc_id = doc_a JOIN nsh nb ON nb.doc_id = doc_b
        |WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.2""".stripMargin,
    "stream_similarity_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 5""".stripMargin,
    "similarity_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 5""".stripMargin,
    // RRF needs only ranks, so the fused score is the exact integer
    // Σ 1e6 // (60 + rank) — float BM25/cosine never meet a comparator
    "hybrid_rrf_topk" -> {
      val qidList = TextAnalysis.bm25Queries.map(_._1).mkString(", ")
      s"""WITH $bm25RankedCtes,
         |text_top AS (SELECT query_id, doc_id, rk AS rk_text FROM r WHERE rk <= 10),
         |vq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
         |       WHERE vec_id IN ($qidList)),
         |vc AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |vscored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |  FROM vq, vc WHERE query_id <> neighbor_id),
         |vr AS (SELECT query_id, neighbor_id AS doc_id,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk_vec
         |       FROM vscored),
         |vec_top AS (SELECT query_id, doc_id, rk_vec FROM vr WHERE rk_vec <= 10),
         |$rrfFusionTailSql""".stripMargin
    },
    "similarity_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 8),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM r WHERE rank <= 5""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b
         |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4""".stripMargin,
    "dedup_semantic_keep" ->
      s"""WITH RECURSIVE p AS MATERIALIZED (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         |edges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM p
         |          UNION ALL SELECT vb, va FROM p),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
         |cc AS MATERIALIZED (SELECT id, min(lbl) AS cl FROM reach GROUP BY id)
         |SELECT e.vec_id, COALESCE(cc.cl, e.vec_id) AS semantic_cluster,
         |       CAST(CASE WHEN COALESCE(cc.cl, e.vec_id) = e.vec_id THEN 1 ELSE 0 END AS INT) AS is_kept
         |FROM embeddings e LEFT JOIN cc ON e.vec_id = cc.id""".stripMargin,
    "similarity_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |sb AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM q, c WHERE query_id <> neighbor_id),
         |rb AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM sb),
         |bf AS (SELECT query_id, neighbor_id FROM rb WHERE rnk <= 5),
         |bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |qa AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM bk WHERE vec_id < 8),
         |ca AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM bk),
         |sa AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM qa JOIN ca USING (bucket) WHERE query_id <> neighbor_id),
         |ra AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM sa),
         |ann AS (SELECT query_id, neighbor_id FROM ra WHERE rnk <= 5)
         |SELECT bf.query_id, count(ann.neighbor_id) AS n_hits, count(*) AS k
         |FROM bf LEFT JOIN ann
         |  ON bf.query_id = ann.query_id AND bf.neighbor_id = ann.neighbor_id
         |GROUP BY bf.query_id""".stripMargin,
    "similarity_ann_multiprobe" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 8),
         |probes AS (
         |  SELECT query_id, qe,
         |         CASE WHEN p = 0 THEN bucket ELSE xor(bucket, 1 << (p - 1)) END AS bucket
         |  FROM q, LATERAL (SELECT unnest(generate_series(0, 6)) AS p) g),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |  FROM probes JOIN c USING (bucket) WHERE query_id <> neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM scored)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM r WHERE rnk <= 5""".stripMargin,
    "similarity_pq_codes" ->
      s"""WITH $pqCtes
         |SELECT vec_id, c0, c1, c2, c3, nrm FROM pqcodes""".stripMargin,
    "similarity_pq_adc" ->
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$pqAdcCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM pqrk WHERE rnk <= 5""".stripMargin,
    "similarity_pq_rerank" ->
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$pqAdcCtes,
         |$pqRerankCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM pqrr WHERE rnk <= 5""".stripMargin,
    "similarity_pq_recall" ->
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$pqAdcCtes,
         |$pqRerankCtes,
         |pqann AS (SELECT query_id, neighbor_id FROM pqrk WHERE rnk <= 5),
         |pqannrr AS (SELECT query_id, neighbor_id FROM pqrr WHERE rnk <= 5),
         |bq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}),
         |bc AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |bs AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM bq, bc WHERE query_id <> neighbor_id),
         |br AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM bs),
         |bf AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= 5)
         |SELECT bf.query_id, count(pqann.neighbor_id) AS n_hits_adc,
         |       count(pqannrr.neighbor_id) AS n_hits_rerank, count(*) AS k
         |FROM bf LEFT JOIN pqann
         |  ON bf.query_id = pqann.query_id AND bf.neighbor_id = pqann.neighbor_id
         |LEFT JOIN pqannrr
         |  ON bf.query_id = pqannrr.query_id AND bf.neighbor_id = pqannrr.neighbor_id
         |GROUP BY bf.query_id""".stripMargin,
    // graded twin of similarity_pq_recall: the same pqrk/pqrr rank
    // lists scored by the shared integer discount LUT
    "similarity_pq_ndcg" -> {
      val k = Similarity.NdcgK
      def w(rank: String): String = dcgCaseSql(rank, k)
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$pqAdcCtes,
         |$pqRerankCtes,
         |adcl AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS ann_rank
         |         FROM pqrk WHERE rnk <= $k),
         |rrl AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS ann_rank
         |        FROM pqrr WHERE rnk <= $k),
         |bq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
         |       WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}),
         |bc AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |bs AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM bq, bc WHERE query_id <> neighbor_id),
         |br AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM bs),
         |bf AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS bf_rank FROM br WHERE rnk <= $k),
         |idcg AS (SELECT query_id,
         |           CAST(sum((${k + 1} - bf_rank) * ${w("bf_rank")}) AS BIGINT) AS idcg
         |         FROM bf GROUP BY 1),
         |da AS (SELECT a.query_id,
         |         CAST(coalesce(sum(CASE WHEN b.bf_rank IS NOT NULL
         |           THEN (${k + 1} - b.bf_rank) * ${w("a.ann_rank")} ELSE 0 END), 0) AS BIGINT) AS dcg_adc
         |       FROM adcl a LEFT JOIN bf b
         |         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |       GROUP BY 1),
         |dr AS (SELECT a.query_id,
         |         CAST(coalesce(sum(CASE WHEN b.bf_rank IS NOT NULL
         |           THEN (${k + 1} - b.bf_rank) * ${w("a.ann_rank")} ELSE 0 END), 0) AS BIGINT) AS dcg_rr
         |       FROM rrl a LEFT JOIN bf b
         |         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |       GROUP BY 1)
         |SELECT i.query_id,
         |       CAST(coalesce(da.dcg_adc, 0) AS BIGINT) AS dcg_adc,
         |       CAST(coalesce(dr.dcg_rr, 0) AS BIGINT) AS dcg_rr, i.idcg,
         |       CAST((1000 * coalesce(da.dcg_adc, 0)) // i.idcg AS BIGINT) AS ndcg_adc_permille,
         |       CAST((1000 * coalesce(dr.dcg_rr, 0)) // i.idcg AS BIGINT) AS ndcg_rr_permille
         |FROM idcg i LEFT JOIN da ON i.query_id = da.query_id
         |LEFT JOIN dr ON i.query_id = dr.query_id""".stripMargin
    },
    // the composed IVF+PQ serving path: the ivf_assign centroids /
    // assignment (float-quantized means, same ULP-margin argument),
    // a top-nProbe probe list per query, and the ADC LUT sum
    // restricted to codes in probed cells
    "similarity_ivf_pq" ->
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$ivfPqRankCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM irk WHERE rnk <= 5""".stripMargin,
    // the drift monitor alone: per (subspace, cell) era occupancy in
    // exact integer permille + the squared gap (Σ = the trigger stat)
    "pq_refresh_drift" ->
      s"""WITH $pqBaseCtes,
         |$pqRefreshCtes
         |SELECT s, cell, n_stored, n_inc, pm_stored, pm_inc, drift2 FROM driftx""".stripMargin,
    // the refresh fold: version-tagged codes (stored era keeps v1;
    // the increment re-encodes against the full-corpus codebook iff
    // the occupancy-drift trigger fired)
    "pq_codebook_refresh" ->
      s"""WITH $pqCtes,
         |$pqRefreshCtes,
         |$pqFoldCte
         |SELECT vec_id, cb_version, c0, c1, c2, c3, nrm FROM fold""".stripMargin,
    // did the refresh change serving? per query: overlap of the stale
    // (all-v1) ADC top-5 with the refreshed (version-matched LUT) one
    "pq_refresh_adc_shift" -> {
      val vlutLegs =
        """vlut AS (SELECT CAST(1 AS BIGINT) AS v, qid, s, cell, lutv FROM p1lut
          |         UNION ALL SELECT CAST(2 AS BIGINT), qid, s, cell, lutv FROM pqlut)""".stripMargin
      s"""WITH $pqCtes,
         |$pqRefreshCtes,
         |$pqFoldCte,
         |$pqLutCte,
         |${pqLutFor("p1", "p1cm")},
         |$vlutLegs,
         |${pqAdcChainFor("st", "p1codes", "p1lut")},
         |rfsc AS (
         |  SELECT l0.qid AS query_id, cd.vec_id AS neighbor_id,
         |         1000000.0 * (l0.lutv + l1.lutv + l2.lutv + l3.lutv) / (qn.qnrm * cd.nrm) AS score
         |  FROM fold cd
         |  JOIN vlut l0 ON l0.v = cd.cb_version AND l0.s = 0 AND l0.cell = cd.c0
         |  JOIN vlut l1 ON l1.v = cd.cb_version AND l1.s = 1 AND l1.cell = cd.c1 AND l1.qid = l0.qid
         |  JOIN vlut l2 ON l2.v = cd.cb_version AND l2.s = 2 AND l2.cell = cd.c2 AND l2.qid = l0.qid
         |  JOIN vlut l3 ON l3.v = cd.cb_version AND l3.s = 3 AND l3.cell = cd.c3 AND l3.qid = l0.qid
         |  JOIN pqqn qn ON qn.qid = l0.qid
         |  WHERE l0.qid <> cd.vec_id),
         |rfrk AS MATERIALIZED (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk FROM rfsc),
         |st_top AS (SELECT query_id, neighbor_id FROM strk WHERE rnk <= 5),
         |rf_top AS (SELECT query_id, neighbor_id FROM rfrk WHERE rnk <= 5)
         |SELECT st.query_id, count(rf.neighbor_id) AS n_hits, count(*) AS k
         |FROM st_top st LEFT JOIN rf_top rf
         |  ON st.query_id = rf.query_id AND st.neighbor_id = rf.neighbor_id
         |GROUP BY st.query_id""".stripMargin
    },
    // the deployed two-tower hybrid: BM25 tower ⊕ the IVF+PQ-served
    // vector tower, fused by the same integer RRF (the serving swap
    // is rank-source-only — CTE chains shared with both parents)
    "hybrid_rrf_ivfpq" -> {
      val qidList = TextAnalysis.bm25Queries.map(_._1).mkString(", ")
      s"""WITH $pqCtes,
         |$pqLutCte,
         |$ivfPqRankCtes,
         |$bm25RankedCtes,
         |text_top AS (SELECT query_id, doc_id, rk AS rk_text FROM r WHERE rk <= 10),
         |vec_top AS (SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id AS doc_id,
         |              CAST(rnk AS BIGINT) AS rk_vec
         |            FROM irk WHERE rnk <= 10 AND query_id IN ($qidList)),
         |$rrfFusionTailSql""".stripMargin
    },
    "ivf_assign" ->
      s"""$ivfAssignCtes
         |SELECT vec_id, assigned_cell FROM asg""".stripMargin,
    // one pair pass, three metric legs, rank windows, flag overlap —
    // cosines order the windows and never reach the output
    "similarity_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
         |           WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |m AS (
         |  SELECT query_id, neighbor_id, 'full' AS metric, ${cosSql("qe", "ce")} AS cos
         |  FROM q, c WHERE query_id <> neighbor_id
         |  UNION ALL
         |  SELECT query_id, neighbor_id, 'd16',
         |         ${cosSql("list_slice(qe, 1, 16)", "list_slice(ce, 1, 16)")}
         |  FROM q, c WHERE query_id <> neighbor_id
         |  UNION ALL
         |  SELECT query_id, neighbor_id, 'd32',
         |         ${cosSql("list_slice(qe, 1, 32)", "list_slice(ce, 1, 32)")}
         |  FROM q, c WHERE query_id <> neighbor_id),
         |r AS (SELECT metric, query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY metric, query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM m),
         |t AS (SELECT metric, query_id, neighbor_id FROM r WHERE rnk <= 5),
         |f AS (SELECT query_id, neighbor_id,
         |        max(CASE WHEN metric = 'full' THEN 1 ELSE 0 END) AS in_full,
         |        max(CASE WHEN metric = 'd16' THEN 1 ELSE 0 END) AS in_16,
         |        max(CASE WHEN metric = 'd32' THEN 1 ELSE 0 END) AS in_32
         |      FROM t GROUP BY 1, 2)
         |SELECT query_id, CAST(sum(in_full) AS BIGINT) AS k,
         |       CAST(sum(CASE WHEN in_full = 1 AND in_16 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_d16,
         |       CAST(sum(CASE WHEN in_full = 1 AND in_32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_d32
         |FROM f GROUP BY query_id""".stripMargin,
    // graded ANN ordering audit: both lists rank with the same
    // (cos DESC, id) tiebreak; every DCG value is integer arithmetic
    // over the shared driver-computed discount LUT — the one float
    // (the log) never meets a comparator
    "similarity_ndcg" -> {
      val k = Similarity.NdcgK
      def w(rank: String): String = dcgCaseSql(rank, k)
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
         |           WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
         |sb AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM q, c WHERE query_id <> neighbor_id),
         |rb AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM sb),
         |bf AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS bf_rank FROM rb WHERE rnk <= $k),
         |bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |qa AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM bk
         |       WHERE vec_id < ${graft.operators.PqIndex.ServedQueryCutoff}),
         |probes AS (
         |  SELECT query_id, qe,
         |         CASE WHEN p = 0 THEN bucket ELSE xor(bucket, 1 << (p - 1)) END AS bucket
         |  FROM qa, LATERAL (SELECT unnest(generate_series(0, 6)) AS p) g),
         |ca AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM bk),
         |sa AS (SELECT query_id, neighbor_id, ${cosSql("qe", "ce")} AS cos
         |       FROM probes JOIN ca USING (bucket) WHERE query_id <> neighbor_id),
         |ra AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM sa),
         |ann AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS ann_rank FROM ra WHERE rnk <= $k),
         |idcg AS (SELECT query_id,
         |           CAST(sum((${k + 1} - bf_rank) * ${w("bf_rank")}) AS BIGINT) AS idcg
         |         FROM bf GROUP BY 1),
         |d AS (SELECT a.query_id, CAST(count(b.bf_rank) AS BIGINT) AS n_hits,
         |        CAST(coalesce(sum(CASE WHEN b.bf_rank IS NOT NULL
         |          THEN (${k + 1} - b.bf_rank) * ${w("a.ann_rank")} ELSE 0 END), 0) AS BIGINT) AS dcg
         |      FROM ann a LEFT JOIN bf b
         |        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |      GROUP BY 1)
         |SELECT i.query_id, CAST(coalesce(d.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(d.dcg, 0) AS BIGINT) AS dcg, i.idcg,
         |       CAST((1000 * coalesce(d.dcg, 0)) // i.idcg AS BIGINT) AS ndcg_permille
         |FROM idcg i LEFT JOIN d ON i.query_id = d.query_id""".stripMargin
    },
    // each leg mirrors one engine-side check; counts are exact
    "data_expectations" ->
      """WITH chk AS (
        |  SELECT 'orders_custkey_fk' AS check_name, (SELECT count(*) FROM orders) AS n_rows,
        |         (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk', (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'orders_totalprice_positive', (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders WHERE o_totalprice <= 0.0)
        |  UNION ALL
        |  SELECT 'orders_orderdate_not_null', (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
        |  UNION ALL
        |  SELECT 'lineitem_quantity_range', (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem WHERE l_quantity < 1.0 OR l_quantity > 50.0)
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 1.0)
        |  UNION ALL
        |  SELECT 'customer_custkey_unique', (SELECT count(*) FROM customer),
        |         (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
        |  UNION ALL
        |  SELECT 'events_ts_not_null', (SELECT count(*) FROM events),
        |         (SELECT count(*) FROM events WHERE ts IS NULL)
        |  UNION ALL
        |  SELECT 'events_value_not_null', (SELECT count(*) FROM events),
        |         (SELECT count(*) FROM events WHERE value IS NULL)
        |  UNION ALL
        |  SELECT 'documents_docid_unique', (SELECT count(*) FROM documents),
        |         (SELECT count(*) - count(DISTINCT doc_id) FROM documents)
        |  UNION ALL
        |  SELECT 'documents_nchars_consistent', (SELECT count(*) FROM documents),
        |         (SELECT count(*) FROM documents WHERE length(text) <> n_chars)
        |  UNION ALL
        |  SELECT 'embeddings_dim64', (SELECT count(*) FROM embeddings),
        |         (SELECT count(*) FROM embeddings WHERE len(embedding) <> 64))
        |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS pass
        |FROM chk""".stripMargin,
    // contrastive mining over the same assignment chain: within-cell
    // pairs, kind by label agreement, rank-only output (cos orders
    // the window, never reaches the result)
    "mine_hard_negatives" -> {
      s"""$ivfAssignCtes,
         |psel AS (SELECT $miningStaircaseSql AS p
         |FROM (SELECT count(*) AS n FROM embeddings)),
         |lab AS MATERIALIZED (
         |  SELECT e.vec_id, e.label, e.embedding,
         |         CAST(a.assigned_cell AS BIGINT) * 256 + ($miningBktTermsSql) AS blk
         |  FROM embeddings e JOIN asg a USING (vec_id), psel s),
         |$miningPairChainSql""".stripMargin
    },
    // the scaled miner's oracle: the SAME expansion (R = ceil(T/N)
    // replicas, labels rotated mod 10, replicas inherit their
    // original's cell and SRP bucket — the embedding is unchanged)
    // and the SAME staircase evaluated over N*R, so both engines run
    // the p >= 1 approximate regime at identical sizes; the pair
    // chain is shared verbatim with the plain miner's oracle
    "mine_contrastive_scaled" -> {
      val t = graft.operators.Similarity.MiningBlockThreshold
      s"""$ivfAssignCtes,
         |rsel AS MATERIALIZED (
         |  SELECT n0, (${t - 1} + n0) // n0 AS r, n0 * ((${t - 1} + n0) // n0) AS n
         |  FROM (SELECT count(*) AS n0 FROM embeddings)),
         |psel AS (SELECT r, $miningStaircaseSql AS p FROM rsel),
         |reps AS (SELECT unnest(generate_series(0, r - 1)) AS rep FROM rsel),
         |lab AS MATERIALIZED (
         |  SELECT e.vec_id * s.r + rep AS vec_id,
         |         (CAST(e.label AS INT) + rep) % 10 AS label, e.embedding,
         |         CAST(a.assigned_cell AS BIGINT) * 256 + ($miningBktTermsSql) AS blk
         |  FROM embeddings e JOIN asg a USING (vec_id), psel s, reps),
         |$miningPairChainSql""".stripMargin
    },
    "sample_cluster_quota" ->
      s"""$ivfAssignCtes,
         |rk AS (SELECT vec_id, assigned_cell,
         |         row_number() OVER (PARTITION BY assigned_cell
         |           ORDER BY md5(CAST(vec_id AS VARCHAR) || '${graft.operators.Sampling.ClusterQuotaSalt}'), vec_id) AS pick_rank
         |       FROM asg)
         |SELECT vec_id, assigned_cell, CAST(pick_rank AS BIGINT) AS pick_rank
         |FROM rk WHERE pick_rank <= ${graft.operators.Sampling.ClusterQuotaQ}""".stripMargin,
    "quality_label_noise" ->
      s"""$ivfAssignCtes,
         |lab AS MATERIALIZED (
         |  SELECT a.vec_id, a.assigned_cell, CAST(e.label AS INT) AS label
         |  FROM asg a JOIN embeddings e USING (vec_id)),
         |cl AS (SELECT assigned_cell, label, count(*) AS n FROM lab GROUP BY 1, 2),
         |mj AS (SELECT assigned_cell, label AS majority_label,
         |         row_number() OVER (PARTITION BY assigned_cell ORDER BY n DESC, label) AS rn
         |       FROM cl)
         |SELECT l.vec_id, l.assigned_cell, l.label, m.majority_label,
         |  CAST(CASE WHEN l.label <> m.majority_label THEN 1 ELSE 0 END AS INT) AS is_suspect
         |FROM lab l JOIN mj m ON l.assigned_cell = m.assigned_cell AND m.rn = 1""".stripMargin,
    // the Lloyd loop unrolled: each round re-derives float-quantized
    // centroids from the previous round's integer assignment — the
    // same per-round determinism argument as ivf_assign, applied
    // inductively
    "ivf_kmeans_iterated" -> {
      val rounds = (1 to 3).map { k =>
        s"""dims$k AS (
           |  SELECT cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS m
           |  FROM a${k - 1}, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
           |  GROUP BY cell, i),
           |cents$k AS (SELECT cell, list(CAST(m AS FLOAT) ORDER BY i) AS centroid FROM dims$k GROUP BY cell),
           |scored$k AS (
           |  SELECT e.vec_id, e.embedding, c.cell, ${cosSql("e.embedding", "c.centroid")} AS sim
           |  FROM embeddings e CROSS JOIN cents$k c),
           |a$k AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT vec_id, embedding, cell,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
           |    FROM scored$k) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH a0 AS (SELECT vec_id, embedding, CAST(label AS INT) AS cell FROM embeddings),
         |$rounds
         |SELECT vec_id, cell AS assigned_cell FROM a3""".stripMargin
    },
    "sample_temperature_mix" ->
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |w AS MATERIALIZED (
        |  SELECT source, n_docs,
        |         CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
        |  FROM s),
        |t AS MATERIALIZED (
        |  SELECT source, n_docs, w,
        |         CAST((((SELECT sum(n_docs) FROM w) // 2) * w)
        |              // (SELECT sum(w) FROM w) AS BIGINT) AS t_target
        |  FROM w),
        |t2 AS MATERIALIZED (
        |  SELECT source, n_docs, w, t_target,
        |         least(CAST(4096 AS BIGINT), CAST((4096 * t_target) // n_docs AS BIGINT)) AS sel_4096
        |  FROM t),
        |d AS (
        |  SELECT source,
        |    (strpos('0123456789abcdef', substr(md5(text || '|temp'), 1, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substr(md5(text || '|temp'), 2, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(md5(text || '|temp'), 3, 1)) - 1) AS h
        |  FROM documents)
        |SELECT t2.source, t2.n_docs, t2.w, t2.t_target, t2.sel_4096,
        |       CAST(sum(CASE WHEN d.h < t2.sel_4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
        |FROM d JOIN t2 USING (source)
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "sample_hash_splits" ->
      """WITH b AS (
        |  SELECT lang,
        |         CASE WHEN substr(md5(text || '|split'), 1, 2) < 'cc' THEN 'train'
        |              WHEN substr(md5(text || '|split'), 1, 2) < 'e6' THEN 'val'
        |              ELSE 'test' END AS split,
        |         substr(md5(text || '|sample'), 1, 2) AS sh
        |  FROM documents)
        |SELECT lang, split, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN sh < '20' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM b GROUP BY lang, split""".stripMargin,
    "embedding_quantize" ->
      """WITH b AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (
        |  SELECT e.vec_id,
        |    CASE WHEN b.mx > 0.0 THEN
        |      list_transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / b.mx) AS INT))
        |    ELSE NULL END AS q
        |  FROM embeddings e JOIN b ON e.vec_id = b.vec_id)
        |SELECT vec_id,
        |  CASE WHEN q IS NULL THEN NULL
        |       ELSE md5(array_to_string(q, ',')) END AS q_md5,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_min(q) AS INT) AS q_min,
        |  CAST(list_max(q) AS INT) AS q_max,
        |  CAST(len(q) AS INT) AS n_dims
        |FROM q""".stripMargin,
    // integer sum vectors per (label, dim), cosine via the same
    // ordered-fold dot/norm the similarity oracles replay; cosine's
    // scale invariance makes sums stand in for means exactly
    "embedding_centroid_drift" ->
      s"""WITH e AS (
         |  SELECT label, i - 1 AS dim,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
         |  FROM embeddings,
         |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
         |pl AS (
         |  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
         |  FROM e GROUP BY 1, 2),
         |lv AS (
         |  SELECT label, list(s ORDER BY dim) AS v,
         |         max(CASE WHEN dim = 0 THEN n END) AS n_vecs
         |  FROM pl GROUP BY label),
         |gd AS (SELECT dim, CAST(sum(s) AS BIGINT) AS s FROM pl GROUP BY dim),
         |gv AS (SELECT list(s ORDER BY dim) AS gvec FROM gd)
         |SELECT label, n_vecs,
         |       ${dotSql("v", "gvec")} / (${normSql("v")} * ${normSql("gvec")})
         |         AS cos_to_global
         |FROM lv, gv""".stripMargin,
    // same floor-quantization rule as centroid drift; Σq stays raw
    // (negatives — integer division is not portable there), Σq²/n is
    // positive so the floor quotient matches Spark's div
    "embedding_dim_stats" ->
      """WITH e AS (
        |  SELECT CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM embeddings,
        |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g)
        |SELECT dim, count(*) AS n_vecs, CAST(sum(q) AS BIGINT) AS sum_q,
        |       CAST(sum(CAST(q AS HUGEINT) * q) // count(*) AS BIGINT) AS meansq_q
        |FROM e GROUP BY dim""".stripMargin,
    // interleaved snapshot halves per source, same integer-sum-vector
    // cosine rule; embeddings join documents on the shared id
    "source_snapshot_drift" ->
      s"""WITH j AS (
         |  SELECT d.source, e.vec_id % 2 AS half, e.embedding
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         |ex AS (
         |  SELECT source, half, i - 1 AS dim,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS q
         |  FROM j,
         |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
         |pd AS (
         |  SELECT source, dim,
         |    CAST(sum(CASE WHEN half = 0 THEN q END) AS BIGINT) AS sa,
         |    CAST(sum(CASE WHEN half = 1 THEN q END) AS BIGINT) AS sb,
         |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM ex GROUP BY 1, 2),
         |sv AS (
         |  SELECT source, list(sa ORDER BY dim) AS va, list(sb ORDER BY dim) AS vb,
         |         max(CASE WHEN dim = 0 THEN na END) AS n_a,
         |         max(CASE WHEN dim = 0 THEN nb END) AS n_b
         |  FROM pd GROUP BY source)
         |SELECT source, n_a, n_b,
         |       ${dotSql("va", "vb")} / (${normSql("va")} * ${normSql("vb")})
         |         AS cos_halves
         |FROM sv""".stripMargin,
    "sample_per_source_cap" ->
      """WITH h AS (
        |  SELECT source, doc_id, substr(md5(text || '|cap'), 1, 2) AS h
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        |  FROM h)
        |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 10""".stripMargin,
    // quality-ranked per-source keep: token count desc, doc_id tie
    "sample_top_quality" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_tok,
        |         row_number() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rank
        |  FROM t)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_tok
        |FROM r WHERE rank <= 10""".stripMargin,
    // seeded md5 permutation key; first hex byte shards, rank within
    // shard orders — same key algebra as the Spark side
    "sample_epoch_shuffle" ->
      """WITH t AS (
        |  SELECT doc_id, md5('epoch0' || ':' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents)
        |SELECT substr(k, 1, 2) AS shard,
        |       CAST(row_number() OVER (PARTITION BY substr(k, 1, 2)
        |                               ORDER BY k, doc_id) AS BIGINT) AS position,
        |       doc_id
        |FROM t""".stripMargin,
    // concat-and-chunk packing: doc → the 256-token window containing
    // its first token, per source in doc_id order
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT source, doc_id, doc_id // 200 AS split_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT source, doc_id, split_id, n_tok,
        |         sum(n_tok) OVER (PARTITION BY source, split_id ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
        |  FROM t)
        |SELECT source, split_id, CAST(start_off // 256 AS BIGINT) AS seq_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc
        |FROM o GROUP BY 1, 2, 3""".stripMargin,
    // length-bucketed batching: bucket = n_tok div 32; padding waste
    // pads each doc to its bucket's max length — all integer math
    "pack_length_buckets" ->
      """WITH t AS (SELECT len(string_split(text, ' ')) AS n_tok FROM documents)
        |SELECT n_tok // 32 AS bucket, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(max(n_tok) AS BIGINT) AS max_tok,
        |       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS padding_waste
        |FROM t GROUP BY 1""".stripMargin,
    // streaming dedup projects exactly the dedup key, so the sink
    // content is the distinct key set whatever row survived
    "stream_dedup_sink" ->
      "SELECT user_id, event_type FROM events GROUP BY user_id, event_type",
    // the landed first-sighting set IS the distinct (user, hour)
    // table, so the read-back count per hour equals COUNT(DISTINCT)
    "stream_active_users" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    // keep side of the streaming quality router == the batch filter
    // with the same four Gopher rules
    "stream_quality_route_sink" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    len(string_split(text, ' ')) AS nt,
         |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS meanlen,
         |    len(list_filter([$stopList], w -> list_contains(string_split(text, ' '), w))) AS nstop
         |  FROM documents)
         |SELECT doc_id, source FROM f
         |WHERE nt >= 20 AND nt <= 1000 AND meanlen >= 3.0 AND meanlen <= 10.0
         |  AND nstop >= 2""".stripMargin,
    // the window-rank formulation of latest-per-key; the Spark side
    // computes the same survivor via max_by aggregation (see
    // RelationalQueries.latestEventPerUser scaladoc)
    "cdc_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        |FROM r WHERE rk = 1""".stripMargin,
    // per (source × quality class) strata with class-dependent
    // deterministic selection rates; class rule identical to
    // text_quality's CASE
    "sample_stratified" ->
      s"""WITH f AS (
         |  SELECT source,
         |    CASE WHEN len(string_split(text, ' ')) < 20 THEN 'too_short'
         |         WHEN CAST($stopCount AS DOUBLE) / len(string_split(text, ' ')) > 0.2
         |           THEN 'stopword_heavy'
         |         ELSE 'ok' END AS quality_class,
         |    substr(md5(text || '|strat'), 1, 2) AS h
         |  FROM documents),
         |s AS (
         |  SELECT source, quality_class,
         |    CASE quality_class WHEN 'ok' THEN 'ff'
         |         WHEN 'stopword_heavy' THEN '7f' ELSE '1f' END AS thr, h
         |  FROM f)
         |SELECT source, quality_class, thr AS threshold, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN h <= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
         |FROM s GROUP BY 1, 2, 3""".stripMargin,
    // DSIR importance weights: the log-likelihood ratio kept in its
    // monotone rational form (1e6-scaled, add-one smoothed over 4096
    // md5 buckets); products in HUGEINT — 1e6·n_tgt·N_raw wraps BIGINT
    "sample_importance_weights" ->
      s"""WITH $dsirWeightCtes
         |SELECT doc_id, n_feat, weight_x1e6 FROM dw""".stripMargin,
    // the resampling step: h16 from the salted content hash (strpos
    // nibble expansion — the classifier oracle's hex→int idiom);
    // accept iff h16·w_max < 65536·w, probability w/w_max exactly
    "sample_importance_resample" ->
      s"""WITH $dsirWeightCtes,
         |wm AS (SELECT max(weight_x1e6) AS w_max FROM dw),
         |h AS (SELECT doc_id, substr(md5(text || '|dsir-rs'), 1, 4) AS hx FROM documents),
         |h16 AS (SELECT doc_id,
         |          CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
         |               (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
         |               (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
         |               (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT) AS h16
         |        FROM h)
         |SELECT dw.doc_id, dw.weight_x1e6, h16.h16, wm.w_max,
         |       CAST(CASE WHEN h16.h16 * wm.w_max < dw.weight_x1e6 * 65536
         |            THEN 1 ELSE 0 END AS INT) AS accepted
         |FROM dw JOIN h16 USING (doc_id), wm""".stripMargin,
    // Hamilton apportionment: floor quotas + largest remainders; the
    // budget·tokens product in HUGEINT, remainders < total fit BIGINT
    "token_budget_allocation" ->
      """WITH ps AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT source, n_tokens,
        |        CAST(sum(n_tokens) OVER () AS BIGINT) AS total,
        |        1000000::HUGEINT * n_tokens AS prod
        |      FROM ps),
        |r AS (SELECT source, n_tokens,
        |        CAST(prod // total AS BIGINT) AS q,
        |        CAST(prod - (prod // total) * total AS BIGINT) AS rem
        |      FROM t),
        |k AS (SELECT *, CAST(1000000 - sum(q) OVER () AS BIGINT) AS leftover,
        |        row_number() OVER (ORDER BY rem DESC, source) AS rk
        |      FROM r)
        |SELECT source, n_tokens,
        |       CAST(q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM k""".stripMargin,
    "sample_weighted_mix" ->
      """WITH f AS (
        |  SELECT source,
        |    CASE CAST(regexp_extract(source, '\d+') AS INT) % 4
        |      WHEN 0 THEN 'ff' WHEN 1 THEN '7f' WHEN 2 THEN '3f' ELSE '1f' END AS thr,
        |    substr(md5(text || '|mix'), 1, 2) AS b
        |  FROM documents)
        |SELECT source, thr AS threshold, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN b <= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
        |FROM f GROUP BY source, thr""".stripMargin,
    "decontamination_overlap" -> decontaminationSql,
    // near-dup contamination: the banding pair table joined to the
    // md5 content-hash split rule (decontaminationSql's CASE)
    "decontamination_fuzzy" ->
      s"""WITH ${minhashPairCtes()},
         |sp AS (SELECT doc_id,
         |   CASE WHEN substr(md5(text || '|split'), 1, 2) < 'cc' THEN 'train'
         |        WHEN substr(md5(text || '|split'), 1, 2) < 'e6' THEN 'val'
         |        ELSE 'test' END AS split
         |  FROM documents),
         |x AS (SELECT p.doc_a, p.doc_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
         |      FROM lshpairs p JOIN sp sa ON sa.doc_id = p.doc_a
         |      JOIN sp sb ON sb.doc_id = p.doc_b),
         |c AS (SELECT CASE WHEN split_a = 'train' THEN doc_a ELSE doc_b END AS train_doc_id,
         |             jaccard
         |      FROM x WHERE (split_a = 'train' AND split_b = 'test')
         |         OR (split_a = 'test' AND split_b = 'train'))
         |SELECT train_doc_id, count(*) AS n_test_near_dups, max(jaccard) AS max_jaccard
         |FROM c GROUP BY 1""".stripMargin,
    // the Bloom-prefiltered path must produce the IDENTICAL result
    // (no false negatives; false positives die in the exact confirm
    // join) — so it gates against the same SQL
    "decontamination_bloom" -> decontaminationSql,
    // the semantic leg: the embedding near-dup pair chain restricted
    // to the train x test slice of the vec_id-hash split, over the
    // replica-AUGMENTED corpus (Sampling.SemanticPlantReplicas copies
    // of each test vector under fresh negative ids — known cosine-1.0
    // cross-split leaks exist by construction, so the gate is
    // provably non-vacuous: an inverted or dropped split filter
    // cannot hash-match)
    "decontamination_semantic" ->
      s"""WITH aug AS MATERIALIZED (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT -(e.vec_id * ${graft.operators.Sampling.SemanticPlantReplicas} + t.rep + 1) AS vec_id,
         |         e.label, e.embedding
         |  FROM embeddings e, range(${graft.operators.Sampling.SemanticPlantReplicas}) t(rep)
         |  WHERE substr(md5(CAST(e.vec_id AS VARCHAR) || '|vsplit'), 1, 2) >= 'e6'),
         |p AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM aug a JOIN aug b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         |sp AS MATERIALIZED (
         |  SELECT vec_id,
         |         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'cc' THEN 'train'
         |              WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'e6' THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM aug),
         |x AS (
         |  SELECT CASE WHEN sa.split = 'train' THEN p.va ELSE p.vb END AS train_vec_id
         |  FROM p JOIN sp sa ON sa.vec_id = p.va JOIN sp sb ON sb.vec_id = p.vb
         |  WHERE (sa.split = 'train' AND sb.split = 'test')
         |     OR (sa.split = 'test' AND sb.split = 'train'))
         |SELECT train_vec_id, CAST(count(*) AS BIGINT) AS n_test_near_dups
         |FROM x GROUP BY train_vec_id""".stripMargin,
    // the IVF-blocked variant's oracle: the SAME augmentation and
    // split algebra, but pairs meet on (assigned_cell * 256 + SRP
    // prefix bucket) with the prefix length from the mining staircase
    // over the BASE corpus count — both engines flip planes at
    // identical sizes, and replicas inherit their original's blk
    // (embedding unchanged), so the planted cosine-1.0 cross-split
    // pairs collide at every p
    "decontamination_semantic_ivf" -> {
      val r = graft.operators.Sampling.SemanticPlantReplicas
      s"""$ivfAssignCtes,
         |psel AS (SELECT $miningStaircaseSql AS p
         |FROM (SELECT count(*) AS n FROM embeddings)),
         |aug0 AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(a.assigned_cell AS BIGINT) * 256 + ($miningBktTermsSql) AS blk
         |  FROM embeddings e JOIN asg a USING (vec_id), psel s),
         |aug AS MATERIALIZED (
         |  SELECT vec_id, embedding, blk FROM aug0
         |  UNION ALL
         |  SELECT -(a.vec_id * $r + t.rep + 1) AS vec_id, a.embedding, a.blk
         |  FROM aug0 a, range($r) t(rep)
         |  WHERE substr(md5(CAST(a.vec_id AS VARCHAR) || '|vsplit'), 1, 2) >= 'e6'),
         |prs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM aug a JOIN aug b ON a.blk = b.blk AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         |sx AS (
         |  SELECT va, vb,
         |    CASE WHEN substr(md5(CAST(va AS VARCHAR) || '|vsplit'), 1, 2) < 'cc' THEN 'train'
         |         WHEN substr(md5(CAST(va AS VARCHAR) || '|vsplit'), 1, 2) < 'e6' THEN 'val'
         |         ELSE 'test' END AS sa,
         |    CASE WHEN substr(md5(CAST(vb AS VARCHAR) || '|vsplit'), 1, 2) < 'cc' THEN 'train'
         |         WHEN substr(md5(CAST(vb AS VARCHAR) || '|vsplit'), 1, 2) < 'e6' THEN 'val'
         |         ELSE 'test' END AS sb
         |  FROM prs),
         |x AS (
         |  SELECT CASE WHEN sa = 'train' THEN va ELSE vb END AS train_vec_id
         |  FROM sx
         |  WHERE (sa = 'train' AND sb = 'test') OR (sa = 'test' AND sb = 'train'))
         |SELECT train_vec_id, CAST(count(*) AS BIGINT) AS n_test_near_dups
         |FROM x GROUP BY train_vec_id""".stripMargin
    },
    // the ingest guard's oracle: arriving (past-cutoff, non-test)
    // candidates x the fixed test bank, same cell + threshold
    "stream_decontamination" ->
      s"""WITH cut AS (SELECT 9 * max(vec_id) // 10 AS c FROM embeddings),
         |sp AS MATERIALIZED (
         |  SELECT vec_id,
         |         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'cc' THEN 'train'
         |              WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'e6' THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM embeddings),
         |x AS (
         |  SELECT a.vec_id AS cand_vec_id, t.vec_id AS tv
         |  FROM embeddings a
         |  JOIN sp sa ON sa.vec_id = a.vec_id
         |  JOIN embeddings t ON a.label = t.label
         |  JOIN sp st ON st.vec_id = t.vec_id, cut
         |  WHERE a.vec_id > cut.c AND sa.split <> 'test' AND st.split = 'test'
         |    AND ${cosSql("a.embedding", "t.embedding")} >= ${graft.operators.Sampling.IngestDecontaminationCosine})
         |SELECT cand_vec_id, CAST(count(*) AS BIGINT) AS n_test_near_dups
         |FROM x GROUP BY cand_vec_id""".stripMargin,
    // the bank refresh loop's oracle computes the REBUILT bank
    // (test-split vectors <= the 85% cutoff) — the engine runs the
    // stored-era ∪ increment FOLD, so the hash-match proves
    // fold == rebuild at the gate level (the boilerplate_index_refresh
    // convention); probe audience and threshold are the ingest
    // guard's
    "decontamination_bank_refresh" ->
      s"""WITH cut AS (SELECT 7 * max(vec_id) // 10 AS c1, 85 * max(vec_id) // 100 AS c2 FROM embeddings),
         |sp AS MATERIALIZED (
         |  SELECT vec_id,
         |         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'cc' THEN 'train'
         |              WHEN substr(md5(CAST(vec_id AS VARCHAR) || '|vsplit'), 1, 2) < 'e6' THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM embeddings),
         |x AS (
         |  SELECT a.vec_id AS cand_vec_id, t.vec_id AS tv
         |  FROM embeddings a
         |  JOIN sp sa ON sa.vec_id = a.vec_id
         |  JOIN embeddings t ON a.label = t.label
         |  JOIN sp st ON st.vec_id = t.vec_id, cut
         |  WHERE a.vec_id > cut.c2 AND sa.split <> 'test'
         |    AND st.split = 'test' AND t.vec_id <= cut.c2
         |    AND ${cosSql("a.embedding", "t.embedding")} >= ${graft.operators.Sampling.IngestDecontaminationCosine})
         |SELECT cand_vec_id, CAST(count(*) AS BIGINT) AS n_test_near_dups
         |FROM x GROUP BY cand_vec_id""".stripMargin,
    // the eviction gate's oracle replicates Spark's watermark rule in
    // SQL: per-era max event time (ALL rows — the stats node runs
    // before the late filter), ms-floored minus the 15-day delay,
    // running-max monotone. Spark ≥ 3.4 runs DUAL watermarks: the
    // LATE-EVENT filter of micro-batch k uses the PREVIOUS batch's
    // watermark — i.e. stats through batch k−2 (measured here:
    // batch 1 accepted every era-1 row under the era-0 watermark;
    // batch 2 dropped by it) — while eviction uses batch k−1's, and
    // the two thresholds align so an accepted row can never target
    // an already-evicted window. Hence the era − 2 join. 1296000000
    // ms = 15 days.
    "stream_late_eviction" ->
      """WITH e AS (SELECT event_id % 3 AS era, epoch_us(ts) AS us, value FROM events),
        |em AS (SELECT era, max(us) AS mx FROM e GROUP BY era),
        |wm AS (
        |  SELECT era,
        |         max((mx // 1000) - 1296000000) OVER (ORDER BY era ROWS UNBOUNDED PRECEDING) AS wm_ms
        |  FROM em),
        |win AS (
        |  SELECT era, value,
        |         3600000000 * (us // 3600000000) AS ws,
        |         3600000000 * (us // 3600000000) + 3600000000 AS we
        |  FROM e),
        |kept AS (
        |  SELECT a.era, a.value, a.ws, a.we
        |  FROM win a LEFT JOIN wm w ON w.era = a.era - 2
        |  WHERE a.era <= 1 OR a.we > w.wm_ms * 1000)
        |SELECT ws AS window_start_us, we AS window_end_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM kept GROUP BY 1, 2""".stripMargin,
    // append-mode twin: a window emits at the END of the first batch
    // whose EVICTION watermark (batch k evicts with W(k−1), after
    // merging batch k's data) passes its end — content is every era
    // ≤ that batch (rows of those eras into a not-yet-evicted window
    // always pass the lagged late filter); windows the run's
    // watermarks never pass stay in state and are correctly absent
    "stream_eviction_append" ->
      """WITH e AS (SELECT event_id % 3 AS era, epoch_us(ts) AS us, value FROM events),
        |em AS (SELECT era, max(us) AS mx FROM e GROUP BY era),
        |wm AS (
        |  SELECT
        |    (SELECT mx // 1000 - 1296000000 FROM em WHERE era = 0) AS w0,
        |    greatest((SELECT mx // 1000 - 1296000000 FROM em WHERE era = 0),
        |             (SELECT mx // 1000 - 1296000000 FROM em WHERE era = 1)) AS w1),
        |win AS (
        |  SELECT era, value,
        |         3600000000 * (us // 3600000000) AS ws,
        |         3600000000 * (us // 3600000000) + 3600000000 AS we
        |  FROM e),
        |x AS (
        |  SELECT a.*, CASE WHEN a.we <= w.w0 * 1000 THEN 1
        |                   WHEN a.we <= w.w1 * 1000 THEN 2 END AS elim
        |  FROM win a, wm w)
        |SELECT ws AS window_start_us, we AS window_end_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM x WHERE elim IS NOT NULL AND era <= elim
        |GROUP BY 1, 2""".stripMargin,
    // the merging-window eviction oracle: a batch-by-batch replay of
    // the dual-watermark session semantics (scaladoc at
    // StreamingQueries.sessionEvictionViaSink). Era = id-interleave
    // with time-staggered maxima (top day -> era 2, next day -> era
    // 1) so the running-max watermark ADVANCES between batches while
    // all eras still span the range — the measured prerequisites for
    // batch-2 eviction to be non-empty, for wrong models to diverge,
    // AND for late rows to land next to closed sessions.
    // sessionize(era 0 ∪ 1) → emit sessions ending <= W0; carry the
    // ROWS of live sessions, union era-2 rows passing the W0 late
    // filter (on ts + gap — the row's initial session-window end),
    // re-sessionize, emit <= W1. Emitted sessions' rows leave the
    // store, so a late survivor near a closed session starts a NEW
    // session — the re-sessionize over live rows reproduces Spark's
    // merge store exactly (sessions are per-user disjoint; removing
    // whole sessions cannot bridge survivors)
    "stream_session_eviction" -> {
      val g = StreamingQueries.SessionEvictionGapHours * 3600000000L
      val day = 86400000000L
      s"""WITH raw AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
         |bounds AS (SELECT min(us) AS mn, max(us) AS mx FROM raw),
         |e AS (SELECT user_id, event_id, us, value,
         |        CASE WHEN us > b.mx - $day THEN 2
         |             WHEN us > b.mx - ${2 * day} THEN 1
         |             ELSE event_id % 3 END AS era FROM raw, bounds b),
         |em AS (SELECT era, max(us) AS mx FROM e GROUP BY era),
         |wm AS (
         |  SELECT (SELECT mx // 1000 - 1296000000 FROM em WHERE era = 0) AS w0,
         |         greatest((SELECT mx // 1000 - 1296000000 FROM em WHERE era = 0),
         |                  (SELECT mx // 1000 - 1296000000 FROM em WHERE era = 1)) AS w1),
         |g1 AS MATERIALIZED (
         |  SELECT user_id, event_id, us, value,
         |         sum(CASE WHEN prev IS NULL OR us - prev >= $g THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY us, event_id
         |                 ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
         |        FROM e WHERE era <= 1)),
         |s1 AS MATERIALIZED (
         |  SELECT user_id, sid, min(us) AS sstart, max(us) + $g AS send,
         |         count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS sv
         |  FROM g1 GROUP BY 1, 2),
         |e1 AS (SELECT s.user_id, s.sstart, s.send, s.n, s.sv FROM s1 s, wm w
         |       WHERE s.send <= w.w0 * 1000),
         |live AS (
         |  SELECT g.user_id, g.event_id, g.us, g.value
         |  FROM g1 g JOIN s1 s ON s.user_id = g.user_id AND s.sid = g.sid, wm w
         |  WHERE s.send > w.w0 * 1000),
         |r2 AS (
         |  SELECT user_id, event_id, us, value FROM live
         |  UNION ALL
         |  SELECT user_id, event_id, us, value FROM e, wm w
         |  WHERE era = 2 AND us + $g > w.w0 * 1000),
         |g2 AS (
         |  SELECT user_id, us, value,
         |         sum(CASE WHEN prev IS NULL OR us - prev >= $g THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY us, event_id
         |                 ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
         |        FROM r2)),
         |s2 AS (
         |  SELECT user_id, min(us) AS sstart, max(us) + $g AS send,
         |         count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS sv
         |  FROM g2 GROUP BY user_id, sid),
         |e2 AS (SELECT s.user_id, s.sstart, s.send, s.n, s.sv FROM s2 s, wm w
         |       WHERE s.send <= w.w1 * 1000),
         |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
         |SELECT user_id, sstart AS session_start_us, send AS session_end_us,
         |       CAST(n AS BIGINT) AS n_events,
         |       CAST(round(sv, 2) AS DOUBLE) AS total_value
         |FROM u""".stripMargin
    },
    "session_windows" ->
      """WITH o AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM o),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= 3600000000 THEN 1 ELSE 0 END AS news FROM l),
        |g AS (SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(us) AS session_start_us, max(us) + 3600000000 AS session_end_us,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "stream_turnout_by_location" ->
      """SELECT n_name, count(*) AS turnout
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name""".stripMargin,
    // epoch_us mirrors the Spark side's nanos→micros truncation (the
    // determinism rule: never compare raw cross-precision timestamps)
    "stream_interval_join" ->
      """SELECT a.event_id AS event_a, b.event_id AS event_b,
        |       a.event_type AS type_a, b.event_type AS type_b
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx
        |FROM documents,
        |LATERAL (SELECT unnest(generate_series(0, octet_length(encode(text)) % 24)) AS i) g""".stripMargin,
    // analytic twin of the REAL container-header decode: the Spark
    // side builds byte-valid PNG/WAV/JPEG files and parses them back;
    // the oracle recomputes every header field from the synthesis
    // contract (Multimodal.MediaPayload.synthesize), so a parser that
    // reads the wrong offset/endianness hash-mismatches here
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS k,
        |         octet_length(encode(text)) AS len,
        |         2 * (CAST(doc_id % 2 AS INT) + 1) AS block_align
        |  FROM documents)
        |SELECT doc_id,
        |  CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS media_type,
        |  CAST(CASE k WHEN 0 THEN 57 + len
        |              WHEN 1 THEN 44 + len - (len % block_align)
        |              ELSE 35 + len END AS BIGINT) AS n_bytes,
        |  CASE k WHEN 0 THEN '89504e47' WHEN 1 THEN '52494646' ELSE 'ffd8ffe0' END AS magic,
        |  CAST(CASE k WHEN 0 THEN doc_id % 637 + 1 WHEN 1 THEN 0 ELSE doc_id % 641 + 1 END AS INT) AS width,
        |  CAST(CASE k WHEN 0 THEN doc_id % 479 + 1 WHEN 1 THEN 0 ELSE doc_id % 443 + 1 END AS INT) AS height,
        |  CAST(CASE k WHEN 1 THEN 8000 + (doc_id % 5) * 2000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE k WHEN 1 THEN doc_id % 2 + 1 ELSE 0 END AS INT) AS n_channels,
        |  CAST(CASE k WHEN 1 THEN len // block_align ELSE 0 END AS BIGINT) AS n_samples
        |FROM m""".stripMargin,
    // payload-extraction twin: the engine slices the payload BYTES
    // back out of each container and hashes them; the oracle
    // recomputes the hash from text analytically (the corpus is
    // ASCII — verified octet_length == length — so char slicing
    // equals the engine's byte slicing; WAV truncates to whole
    // sample frames per the synthesis contract)
    "multimodal_payload_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END
        |      AS media_type,
        |    CASE WHEN doc_id % 3 = 1
        |      THEN CAST(length(text) - (length(text) % (2 * (doc_id % 2 + 1))) AS BIGINT)
        |      ELSE CAST(length(text) AS BIGINT) END AS n_payload,
        |    CASE WHEN doc_id % 3 = 1
        |      THEN md5(substr(text, 1,
        |             CAST(length(text) - (length(text) % (2 * (doc_id % 2 + 1))) AS INT)))
        |      ELSE md5(text) END AS payload_md5
        |  FROM documents),
        |g AS (SELECT payload_md5, CAST(count(*) AS BIGINT) AS n_sharers FROM m GROUP BY 1)
        |SELECT m.doc_id, m.media_type, m.n_payload, m.payload_md5, g.n_sharers
        |FROM m JOIN g USING (payload_md5)""".stripMargin,
    // perceptual dHash near-dups over the generated image fixture
    // (Multimodal.phashMediaTable): two variants per document base,
    // pixel_j = first md5 byte of 'base|j' mod 200 (+8 on one
    // downsample block for v=1), 64 area-averaged blocks,
    // adjacent-mean gradient signs as a 63-bit fingerprint, 8-band
    // pigeonhole candidates, hamming <= 7. Block of 0-based pixel j
    // under boundaries floor(i*n/64) is (64*j + 63) // n (the
    // ceil-minus-one identity). This oracle regenerates the pixel
    // surface analytically — the engine's decode path (container
    // synthesis, magic dispatch, payload walk) must reproduce it
    // byte-exactly
    "multimodal_phash_dedup" ->
      s"""WITH $phashCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // the band-index refresh probe's oracle: the REBUILT index form —
    // the full pigeonhole pair chain restricted to pairs whose larger
    // id sits in the probe era (base > the 85% cutoff); the engine
    // runs the stored ∪ increment FOLD, so the hash-match proves
    // fold == rebuild at the gate level. The smaller id is index-side
    // (base <= c2) or probe-side (increment x increment) — both
    // slices of the same restriction, since probe ids exceed every
    // index id
    "phash_index_refresh" ->
      s"""WITH $phashCtes,
        |cut AS (SELECT 85 * max(doc_id) // 100 AS c2 FROM documents),
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id, cut
        |  WHERE y.id // 2 > cut.c2),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // the audio refresh probe's oracle: the phash_index_refresh
    // restriction over the frame-energy fixture chain — rebuilt-index
    // form, pairs whose larger id sits past the 85% base cutoff
    "audio_index_refresh" ->
      s"""WITH $audioCtes,
        |cut AS (SELECT 85 * max(doc_id) // 100 AS c2 FROM documents),
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id, cut
        |  WHERE y.id // 2 > cut.c2),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // the audio tier: identical pairing algebra over the analytic
    // frame-energy fixture (audioCtes) — pigeonhole candidates,
    // hamming filter, band-layout-invariant result set
    "multimodal_audio_neardup" ->
      s"""WITH $audioCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // the audio keep policy: the audio pair chain closed under
    // recursive CC, component-minimum survives (the phash_keep
    // oracle over audioCtes)
    "multimodal_audio_keep" ->
      s"""WITH RECURSIVE $audioCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id),
        |hh AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b),
        |pp AS MATERIALIZED (SELECT doc_a AS va, doc_b AS vb FROM hh WHERE hamming <= 7),
        |edges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM pp
        |          UNION ALL SELECT vb, va FROM pp),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
        |cc AS MATERIALIZED (SELECT id, min(lbl) AS cl FROM reach GROUP BY id),
        |ids AS (SELECT d.doc_id * 2 + v.v AS id
        |        FROM documents d, (SELECT unnest([0, 1]) AS v) v)
        |SELECT i.id AS media_id, COALESCE(cc.cl, i.id) AS media_cluster,
        |       CAST(CASE WHEN COALESCE(cc.cl, i.id) = i.id THEN 1 ELSE 0 END AS INT) AS is_kept
        |FROM ids i LEFT JOIN cc ON i.id = cc.id""".stripMargin,
    // the audio ingest probe's oracle: the SAME fingerprint chain,
    // pairs restricted to stored (v=0, even id) x arriving (v=1,
    // odd id) — the stream-static join's slice
    "stream_audio_probe" ->
      s"""WITH $audioCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv
        |  WHERE x.id % 2 = 0 AND y.id % 2 = 1),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // the keep policy: the phash pair chain closed under recursive
    // CC (the dedup_semantic_keep pattern), singleton media implicit
    "multimodal_phash_keep" ->
      s"""WITH RECURSIVE $phashCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv AND x.id < y.id),
        |hh AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b),
        |pp AS MATERIALIZED (SELECT doc_a AS va, doc_b AS vb FROM hh WHERE hamming <= 7),
        |edges AS MATERIALIZED (SELECT va AS src, vb AS dst FROM pp
        |          UNION ALL SELECT vb, va FROM pp),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lbl FROM edges e JOIN reach r ON r.id = e.src),
        |cc AS MATERIALIZED (SELECT id, min(lbl) AS cl FROM reach GROUP BY id),
        |ids AS (SELECT d.doc_id * 2 + v.v AS id
        |        FROM documents d, (SELECT unnest([0, 1]) AS v) v)
        |SELECT i.id AS media_id, COALESCE(cc.cl, i.id) AS media_cluster,
        |       CAST(CASE WHEN COALESCE(cc.cl, i.id) = i.id THEN 1 ELSE 0 END AS INT) AS is_kept
        |FROM ids i LEFT JOIN cc ON i.id = cc.id""".stripMargin,
    // the ingest-time probe's oracle: the SAME fingerprint chain,
    // pairs restricted to stored (v=0, even id) x arriving (v=1, odd
    // id) — the stream-static join's slice
    "stream_phash_probe" ->
      s"""WITH $phashCtes,
        |cand AS (
        |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
        |  FROM bands x JOIN bands y ON x.j = y.j AND x.bv = y.bv
        |  WHERE x.id % 2 = 0 AND y.id % 2 = 1),
        |h AS (
        |  SELECT c.doc_a, c.doc_b, $phashHamSql AS hamming
        |  FROM cand c JOIN fparr fa ON fa.id = c.doc_a JOIN fparr fb ON fb.id = c.doc_b)
        |SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
        |FROM h WHERE hamming <= 7""".stripMargin,
    // audio accounting from the synthesis contract: WAV rows are
    // doc_id % 3 = 1, rate/channels doc_id-derived, samples = the
    // block-aligned body length over block_align (2 * channels);
    // octet_length(encode(..)) = UTF-8 BYTES, matching the engine's
    // payload-byte decode (the multimodal_features convention — a
    // non-ASCII corpus would break a len()-based oracle)
    "multimodal_audio_stats" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         8000 + (doc_id % 5) * 2000 AS rate,
        |         CAST(doc_id % 2 + 1 AS INT) AS ch,
        |         (octet_length(encode(text)) - octet_length(encode(text)) % (2 * (doc_id % 2 + 1)))
        |           // (2 * (doc_id % 2 + 1)) AS samples
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT CAST(rate AS INT) AS sample_rate, ch AS n_channels,
        |       CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(samples) AS BIGINT) AS total_samples,
        |       CAST(sum(1000 * samples // rate) AS BIGINT) AS total_duration_ms
        |FROM w GROUP BY 1, 2""".stripMargin,
    // the tf-index increment: exactly the landed era's postings,
    // aggregated to (doc_id, token, tf) — the slice a refresh appends
    "stream_tf_ingest" ->
      """WITH cut AS (SELECT 9 * max(doc_id) // 10 AS c FROM documents),
        |tok AS (
        |  SELECT doc_id, t AS token
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents, cut WHERE doc_id > cut.c)
        |  WHERE t <> '')
        |SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |FROM tok GROUP BY 1, 2""".stripMargin,
    // the maintenance drift audit: the full chain vs the era-bounded
    // chain (suffix 'o'), overlap via union-tag flag aggregation
    "bm25_era_drift" ->
      s"""WITH $bm25RankedCtes,
        |${bm25RankedCtesFor("o", " WHERE doc_id <= (SELECT 9 * max(doc_id) // 10 FROM documents)")},
        |u AS (
        |  SELECT query_id, doc_id, max(f) AS f, max(st) AS st FROM (
        |    SELECT query_id, doc_id, 1 AS f, 0 AS st FROM r WHERE rk <= 10
        |    UNION ALL
        |    SELECT query_id, doc_id, 0, 1 FROM ro WHERE rk <= 10)
        |  GROUP BY 1, 2)
        |SELECT query_id, CAST(sum(st) AS BIGINT) AS n_stored,
        |       CAST(sum(f) AS BIGINT) AS n_folded,
        |       CAST(sum(st * f) AS BIGINT) AS n_overlap
        |FROM u GROUP BY query_id""".stripMargin,
  )
}
