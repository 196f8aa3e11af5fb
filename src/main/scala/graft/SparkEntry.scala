package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupTwins, Documents, Engine, Relational}

/**
 * Driver contract (see SURVEY.md §5.2 item 6).
 *
 * Every SQL-expressible operator carries a DuckDB-equivalent oracle query in
 * `oracleSql` (column names aligned on both sides; aggregates routed through
 * exact decimal arithmetic and cast to double so value hashes match).
 * Engine-native operators (MinHash/SimHash/LSH-ANN, the image+caption dedup
 * pipeline, imageio decode) have no ANSI-SQL form — they get rows-only
 * checks here and full oracle-parity coverage in the test suite
 * (PipelineSpec / EngineQuerySpec).
 */
object SparkEntry {

  /** Flagship: the dedup pipeline's cluster assignment on the sf0.001-sized
    * synthetic image+caption corpus. */
  def entry(spark: SparkSession): DataFrame =
    Engine.pipelineClusters(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / monitoring analogs (oracle-checked)
    "q01_pricing_summary" -> (Relational.q01PricingSummary(_, _)),
    "q02_filter_project" -> (Relational.q02FilterProject(_, _)),
    "q03_top_revenue_orders" -> (Relational.q03TopRevenueOrders(_, _)),
    "q04_region_suppliers" -> (Relational.q04RegionSuppliers(_, _)),
    "q05_topk_per_group" -> (Relational.q05TopkPerGroup(_, _)),
    "q06_market_segments" -> (Relational.q06MarketSegments(_, _)),
    "q07_daily_events" -> (Relational.q07DailyEvents(_, _)),
    "q08_value_histogram" -> (Relational.q08ValueHistogram(_, _)),
    "q09_priority_timeline" -> (Relational.q09PriorityTimeline(_, _)),
    "q10_top_customers" -> (Relational.q10TopCustomers(_, _)),
    "q11_like_search" -> (Relational.q11LikeSearch(_, _)),
    "q12_status_rate" -> (Relational.q12StatusRate(_, _)),
    "q13_customers_without_orders" -> (Relational.q13CustomersWithoutOrders(_, _)),
    "q14_active_customers" -> (Relational.q14ActiveCustomers(_, _)),
    "q15_recurring_customers" -> (Relational.q15RecurringCustomers(_, _)),
    // text / documents / embeddings (oracle-checked)
    "q16_fingerprints" -> (Documents.q16Fingerprints(_, _)),
    "q17_token_stats" -> (Documents.q17TokenStats(_, _)),
    "q18_top_tokens" -> (Documents.q18TopTokens(_, _)),
    "q19_quality_flags" -> (Documents.q19QualityFlags(_, _)),
    "q20_lang_stopwords" -> (Documents.q20LangStopwords(_, _)),
    // memoized: q21's pair set is shared by the q28-q37 decision family —
    // one computation per driver run
    "q21_ngram_jaccard" -> (DedupTwins.q21Pairs(_, _)),
    "q22_embed_norms" -> (Documents.q22EmbedNorms(_, _)),
    "q23_embed_topk" -> (Documents.q23EmbedTopk(_, _)),
    "q24_regex_tokens" -> (Documents.q24RegexTokens(_, _)),
    "q25_embed_dups" -> (Documents.q25EmbedDups(_, _)),
    // dedup-core twins over `documents` (oracle-checked; same code paths as
    // the pipeline: SuffixDup, SimHash64 + banding + salted join, CC,
    // decision rule, monitoring metrics)
    "q26_substring_docs" -> (DedupTwins.q26SubstringDocs(_, _)),
    "q27_simhash_dups_docs" -> (DedupTwins.q27SimhashDocs(_, _)),
    "q28_cc_clusters_docs" -> (DedupTwins.q28CcClustersDocs(_, _)),
    "q29_decisions_docs" -> (DedupTwins.q29DecisionsDocs(_, _)),
    "q30_dedup_metrics_docs" -> (DedupTwins.q30DedupMetricsDocs(_, _)),
    "q31_score_histogram_docs" -> (DedupTwins.q31ScoreHistogramDocs(_, _)),
    "q32_top_parents_docs" -> (DedupTwins.q32TopParentsDocs(_, _)),
    "q33_percentiles" -> (DedupTwins.q33Percentiles(_, _)),
    "q34_prefix_dedup_docs" -> (DedupTwins.q34PrefixDedupDocs(_, _)),
    "q35_pagination" -> (Relational.q35Pagination(_, _)),
    "q36_avg_match_score" -> (DedupTwins.q36AvgMatchScore(_, _)),
    "q37_decision_timeline" -> (DedupTwins.q37DecisionTimeline(_, _)),
    "q38_duplicate_history" -> (DedupTwins.q38DuplicateHistory(_, _)),
    // engine-native (rows-only checks; oracle parity lives in the test suite)
    "dedup_minhash_docs" -> (Engine.minhashCandidatesDocs(_, _)),
    "dedup_simhash_docs" -> (Engine.simhashDocs(_, _)),
    "ann_lsh_topk" -> (Engine.annLshTopk(_, _)),
    "ann_ivf_topk" -> (Engine.annIvfTopk(_, _)),
    "pipeline_clusters" -> (Engine.pipelineClusters(_, _)),
    "pipeline_decisions" -> (Engine.pipelineDecisions(_, _)),
    "pipeline_verified_pairs" -> (Engine.pipelineVerifiedPairs(_, _)),
    "pipeline_low_quality" -> (Engine.pipelineLowQuality(_, _)),
    "pipeline_cluster_stats" -> (Engine.pipelineClusterStats(_, _)),
    "pipeline_audit" -> (Engine.pipelineAudit(_, _)),
    "pipeline_history" -> (Engine.pipelineHistory(_, _)),
    "pipeline_probe" -> (Engine.pipelineProbe(_, _)),
    "pipeline_outbox" -> (Engine.pipelineOutbox(_, _)),
    "image_features" -> (Engine.imageFeatures(_, _)),
    "image_thumbnails" -> (Engine.imageThumbnails(_, _)),
    "video_frames" -> (Engine.videoFrames(_, _)),
    "audio_features" -> (Engine.audioFeatures(_, _)),
    "audio_dup_pairs" -> (Engine.audioDupPairs(_, _)),
    // round-5: these two moved from rows-only to oracle-checked — documents
    // reshaped into the corpus schema with PLANTED exact copies / substring
    // fragments, driving the same engine paths (exactRepMapFull, SuffixDup)
    "exact_dedup_corpus" -> (DedupTwins.exactDedupCorpus(_, _)),
    "substring_pairs_corpus" -> (DedupTwins.substringPairsCorpus(_, _))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_project" -> Relational.q02Sql,
    "q03_top_revenue_orders" -> Relational.q03Sql,
    "q04_region_suppliers" -> Relational.q04Sql,
    "q05_topk_per_group" -> Relational.q05Sql,
    "q06_market_segments" -> Relational.q06Sql,
    "q07_daily_events" -> Relational.q07Sql,
    "q08_value_histogram" -> Relational.q08Sql,
    "q09_priority_timeline" -> Relational.q09Sql,
    "q10_top_customers" -> Relational.q10Sql,
    "q11_like_search" -> Relational.q11Sql,
    "q12_status_rate" -> Relational.q12Sql,
    "q13_customers_without_orders" -> Relational.q13Sql,
    "q14_active_customers" -> Relational.q14Sql,
    "q15_recurring_customers" -> Relational.q15Sql,
    "q16_fingerprints" -> Documents.q16Sql,
    "q17_token_stats" -> Documents.q17Sql,
    "q18_top_tokens" -> Documents.q18Sql,
    "q19_quality_flags" -> Documents.q19Sql,
    "q20_lang_stopwords" -> Documents.q20Sql,
    "q21_ngram_jaccard" -> Documents.q21Sql,
    "q22_embed_norms" -> Documents.q22Sql,
    "q23_embed_topk" -> Documents.q23Sql,
    "q24_regex_tokens" -> Documents.q24Sql,
    "q25_embed_dups" -> Documents.q25Sql,
    "q26_substring_docs" -> DedupTwins.q26Sql,
    "q27_simhash_dups_docs" -> DedupTwins.q27Sql,
    "q28_cc_clusters_docs" -> DedupTwins.q28Sql,
    "q29_decisions_docs" -> DedupTwins.q29Sql,
    "q30_dedup_metrics_docs" -> DedupTwins.q30Sql,
    "q31_score_histogram_docs" -> DedupTwins.q31Sql,
    "q32_top_parents_docs" -> DedupTwins.q32Sql,
    "q33_percentiles" -> DedupTwins.q33Sql,
    "q34_prefix_dedup_docs" -> DedupTwins.q34Sql,
    "q35_pagination" -> Relational.q35Sql,
    "q36_avg_match_score" -> DedupTwins.q36Sql,
    "q37_decision_timeline" -> DedupTwins.q37Sql,
    "q38_duplicate_history" -> DedupTwins.q38Sql,
    "exact_dedup_corpus" -> DedupTwins.exactDedupCorpusSql,
    "substring_pairs_corpus" -> DedupTwins.substringPairsCorpusSql
  )
}
