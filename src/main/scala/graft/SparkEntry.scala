package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{AsOf, Clustering, Dedup, Layout, Multimodal, Pipeline, Profiling, Relational, Similarity, Summarize, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a scale-factor directory; `oracleSql` carries the DuckDB
  * equivalent for hash-compared correctness. Non-SQL-expressible operators
  * (ML, LSH, sketches) appear in `queries` only and are oracled by specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole batch pipeline (SURVEY §3.1): dedup → TF-IDF →
    * k-means → LexRank summaries, over documents-as-articles. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.qNewsPipeline(Tables(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    def t(fn: Tables => DataFrame): (SparkSession, String) => DataFrame =
      (s, dir) => fn(Tables(s, dir))
    Map(
      "q01_pricing_summary"  -> t(Relational.q01PricingSummary),
      "q02_filter_pushdown"  -> t(Relational.q02FilterPushdown),
      "q03_star_join"        -> t(Relational.q03StarJoinRevenue),
      "q04_broadcast_join"   -> t(Relational.q04BroadcastJoin),
      "q05_semi_join"        -> t(Relational.q05SemiJoin),
      "q06_anti_join"        -> t(Relational.q06AntiJoin),
      "q07_left_join_agg"    -> t(Relational.q07LeftJoinAgg),
      "q08_rollup"           -> t(Relational.q08Rollup),
      "q09_cube"             -> t(Relational.q09Cube),
      "q10_window_rank"      -> t(Relational.q10WindowRank),
      "q11_window_running"   -> t(Relational.q11WindowRunning),
      "q12_window_lag_lead"  -> t(Relational.q12WindowLagLead),
      "q13_global_topk"      -> t(Relational.q13GlobalTopK),
      "q14_distinct_agg"     -> t(Relational.q14DistinctAgg),
      "q15_union"            -> t(Relational.q15Union),
      "q16_set_ops"          -> t(Relational.q16SetOps),
      "q17_json_extract"     -> t(Relational.q17JsonExtract),
      "q18_date_trunc"       -> t(Relational.q18DateTrunc),
      "q19_case_when"        -> t(Relational.q19CaseWhen),
      "q20_string_funcs"     -> t(Relational.q20StringFuncs),
      "q21_having"           -> t(Relational.q21Having),
      "q22_above_cust_avg"   -> t(Relational.q22AboveCustomerAvg),
      "q23_approx_distinct"  -> t(Relational.qApproxDistinct),
      // text analysis (SURVEY §2.8 + north-star text block)
      "q24_token_count"      -> t(TextAnalysis.qTokenCount),
      "q25_word_freq"        -> t(TextAnalysis.qWordFreq),
      "q26_quality_counts"   -> t(TextAnalysis.qQualityCounts),
      "q27_quality_score"    -> t(TextAnalysis.qQualityScore),
      "q28_lang_id"          -> t(TextAnalysis.qLangId),
      "q29_fingerprint"      -> t(TextAnalysis.qFingerprint),
      "q30_ngrams"           -> t(TextAnalysis.qNgrams),
      // dedup family (SURVEY J2/M7 + north-star dedup block)
      "q31_dedup_exact"      -> t(Dedup.qDedupExact),
      "q32_fuzzy_pairs"      -> t(Dedup.qFuzzyPairs),
      "q33_jaccard_pairs"    -> t(Dedup.qJaccardPairs),
      "q34_dedup_minhash"    -> t(Dedup.qDedupMinhashLsh),
      "q35_dedup_simhash"    -> t(Dedup.qDedupSimhash),
      "q36_dedup_greedy"     -> t(Dedup.qDedupGreedy),
      "q37_dedup_components" -> t(Dedup.qDedupComponents),
      // similarity search (SURVEY J4 + north-star similarity block)
      "q38_knn_brute"        -> t(Similarity.qKnnBruteForce),
      "q39_cosine_pairs"     -> t(Similarity.qCosinePairs),
      "q40_knn_lsh"          -> t(Similarity.qKnnLsh),
      // clustering + summarization (SURVEY M1/M2/M5/M6)
      "q41_tfidf"            -> t(Clustering.qTfidf),
      "q42_kmeans_ref"       -> t(Clustering.qKmeansDocsRef),
      "q43_kmeans_embed"     -> t(Clustering.qKmeansEmbeddings),
      "q44_lda_topics"       -> t(Clustering.qLdaTopics),
      "q45_lexrank"          -> t(Summarize.qLexrankBySource),
      // event-stream surface (SURVEY T3/T4), batch-first
      "q46_tumbling_window"  -> t(streaming.Events.qTumbling),
      "q47_sliding_window"   -> t(streaming.Events.qSliding),
      "q48_session_window"   -> t(streaming.Events.qSessions),
      "q49_recent_window"    -> t(streaming.Events.qRecentWindow),
      // the reference's full batch pipeline (SURVEY §3.1)
      "q50_news_pipeline"    -> t(Pipeline.qNewsPipeline),
      "q51_percentiles"      -> t(Relational.q51Percentiles),
      "q52_grouping_sets"    -> t(Relational.q52GroupingSets),
      "q53_string_agg"       -> t(Relational.q53StringAgg),
      "q56_knn_ivf"          -> t(Similarity.qKnnIvf),
      "q57_sql_parity"       -> t(Relational.q57SqlParity),
      "q58_asof_join"        -> t(AsOf.qAsOfJoin),
      "q59_range_join"       -> t(AsOf.qRangeJoin),
      "q60_approx_percentile" -> t(Relational.qApproxPercentile),
      "q54_mode"             -> t(Relational.q54Mode),
      "q55_window_analytics" -> t(Relational.q55WindowAnalytics),
      // round 2: pivot surface, deterministic sampling, embedding dedup
      "q61_pivot"            -> t(Relational.q61Pivot),
      "q62_unpivot"          -> t(Relational.q62Unpivot),
      "q63_hash_sample"      -> t(Relational.q63HashSample),
      "q64_dedup_embedding"  -> t(Dedup.qDedupEmbedding),
      "q65_stratified_sample" -> t(Relational.q65StratifiedSample),
      "q66_topk_aggregator"  -> t(Relational.q66TopkAggregator),
      "q67_salted_join"      -> t(Relational.q67SaltedJoin),
      "q68_window_distribution" -> t(Relational.q68WindowDistribution),
      "q69_date_arithmetic"  -> t(Relational.q69DateArithmetic),
      "q70_array_funcs"      -> t(Relational.q70ArrayFuncs),
      "q71_embed_centroids"  -> t(Similarity.qEmbedCentroids),
      // round 3: multimodal + streaming state under the gate
      "q72_media_features"   -> t(Multimodal.qMediaFeatures),
      "q73_media_metadata"   -> t(Multimodal.qMediaMetadata),
      "q74_stream_state"     -> t(streaming.Events.qStreamState),
      "q75_bloom_semi_join"  -> t(Relational.q75BloomSemiJoin),
      "q76_range_frame"      -> t(Relational.q76RangeFrame),
      "q77_top_terms"        -> t(TextAnalysis.qTopTerms),
      "q78_repetition"       -> t(TextAnalysis.qRepetition),
      "q79_decontaminate"    -> t(TextAnalysis.qDecontaminate),
      "q80_incremental_dedup" -> t(Dedup.qIncrementalDedup),
      "q81_knn_sq8"          -> t(Similarity.qKnnSq8),
      "q82_filtered_agg"     -> t(Relational.q82FilteredAgg),
      "q83_latest_per_key"   -> t(Relational.q83LatestPerKey),
      "q84_redact"           -> t(TextAnalysis.qRedact),
      "q85_histogram"        -> t(Relational.q85Histogram),
      // round 4: quality gate, vocab coverage, domain balancing
      "q86_quality_filter"   -> t(TextAnalysis.qQualityFilter),
      "q87_head_coverage"    -> t(TextAnalysis.qHeadCoverage),
      "q88_domain_cap"       -> t(TextAnalysis.qDomainCap(_)),
      "q89_merge_upsert"     -> t(Relational.q89MergeUpsert),
      "q90_asof_native"      -> t(graft.plans.NativeAsOf.qAsOfNative),

      "q91_bucketed_join"    -> t(Layout.q91BucketedJoin),
      "q92_passage_dedup"    -> t(TextAnalysis.qPassageDedup(_)),
      "q93_partition_prune"  -> t(Layout.q93PartitionPrune),
      "q94_profile"          -> t(Profiling.q94Profile),
      "q95_dedup_quality"    -> t(Dedup.qDedupQuality(_)),
      "q96_sequence_pack"    -> t(TextAnalysis.qSequencePack(_)),
      "q97_interval_join"    -> t(AsOf.q97IntervalJoin),
    )
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"  -> Relational.q01Sql,
    "q02_filter_pushdown"  -> Relational.q02Sql,
    "q03_star_join"        -> Relational.q03Sql,
    "q04_broadcast_join"   -> Relational.q04Sql,
    "q05_semi_join"        -> Relational.q05Sql,
    "q06_anti_join"        -> Relational.q06Sql,
    "q07_left_join_agg"    -> Relational.q07Sql,
    "q08_rollup"           -> Relational.q08Sql,
    "q09_cube"             -> Relational.q09Sql,
    "q10_window_rank"      -> Relational.q10Sql,
    "q11_window_running"   -> Relational.q11Sql,
    "q12_window_lag_lead"  -> Relational.q12Sql,
    "q13_global_topk"      -> Relational.q13Sql,
    "q14_distinct_agg"     -> Relational.q14Sql,
    "q15_union"            -> Relational.q15Sql,
    "q16_set_ops"          -> Relational.q16Sql,
    "q17_json_extract"     -> Relational.q17Sql,
    "q18_date_trunc"       -> Relational.q18Sql,
    "q19_case_when"        -> Relational.q19Sql,
    "q20_string_funcs"     -> Relational.q20Sql,
    "q21_having"           -> Relational.q21Sql,
    "q22_above_cust_avg"   -> Relational.q22Sql,
    "q24_token_count"      -> TextAnalysis.qTokenCountSql,
    "q25_word_freq"        -> TextAnalysis.qWordFreqSql,
    "q26_quality_counts"   -> TextAnalysis.qQualityCountsSql,
    "q30_ngrams"           -> TextAnalysis.qNgramsSql,
    "q31_dedup_exact"      -> Dedup.qDedupExactSql,
    "q32_fuzzy_pairs"      -> Dedup.qFuzzyPairsSql,
    "q33_jaccard_pairs"    -> Dedup.qJaccardPairsSql,
    "q38_knn_brute"        -> Similarity.qKnnBruteForceSql,
    "q39_cosine_pairs"     -> Similarity.qCosinePairsSql,
    "q46_tumbling_window"  -> streaming.Events.qTumblingSql,
    "q47_sliding_window"   -> streaming.Events.qSlidingSql,
    "q48_session_window"   -> streaming.Events.qSessionsSql,
    "q49_recent_window"    -> streaming.Events.qRecentWindowSql,
    "q51_percentiles"      -> Relational.q51Sql,
    "q52_grouping_sets"    -> Relational.q52Sql,
    "q53_string_agg"       -> Relational.q53Sql,
    "q54_mode"             -> Relational.q54Sql,
    "q55_window_analytics" -> Relational.q55Sql,
    "q57_sql_parity"       -> Relational.q57Sql,
    "q58_asof_join"        -> AsOf.qAsOfJoinSql,
    "q59_range_join"       -> AsOf.qRangeJoinSql,
    "q27_quality_score"    -> TextAnalysis.qQualityScoreSql,
    "q28_lang_id"          -> TextAnalysis.qLangIdSql,
    "q37_dedup_components" -> Dedup.qDedupComponentsSql,
    "q61_pivot"            -> Relational.q61Sql,
    "q62_unpivot"          -> Relational.q62Sql,
    "q63_hash_sample"      -> Relational.q63Sql,
    "q64_dedup_embedding"  -> Dedup.qDedupEmbeddingSql,
    "q65_stratified_sample" -> Relational.q65Sql,
    "q66_topk_aggregator"  -> Relational.q66Sql,
    "q67_salted_join"      -> Relational.q67Sql,
    "q68_window_distribution" -> Relational.q68Sql,
    "q69_date_arithmetic"  -> Relational.q69Sql,
    "q70_array_funcs"      -> Relational.q70Sql,
    "q71_embed_centroids"  -> Similarity.qEmbedCentroidsSql,
    "q73_media_metadata"   -> Multimodal.qMediaMetadataSql,
    "q75_bloom_semi_join"  -> Relational.q75Sql,
    "q76_range_frame"      -> Relational.q76Sql,
    "q77_top_terms"        -> TextAnalysis.qTopTermsSql,
    "q78_repetition"       -> TextAnalysis.qRepetitionSql,
    "q79_decontaminate"    -> TextAnalysis.qDecontaminateSql,
    "q80_incremental_dedup" -> Dedup.qIncrementalDedupSql,
    "q82_filtered_agg"     -> Relational.q82Sql,
    "q83_latest_per_key"   -> Relational.q83Sql,
    "q84_redact"           -> TextAnalysis.qRedactSql,
    "q85_histogram"        -> Relational.q85Sql,
    "q74_stream_state"     -> streaming.Events.qStreamStateSql,
    "q86_quality_filter"   -> TextAnalysis.qQualityFilterSql,
    "q87_head_coverage"    -> TextAnalysis.qHeadCoverageSql,
    "q88_domain_cap"       -> TextAnalysis.qDomainCapSql,
    "q89_merge_upsert"     -> Relational.q89Sql,
    // q90 runs the NATIVE as-of exec against the same DuckDB ASOF oracle as
    // the composed q58 — two independent implementations, one truth
    "q90_asof_native"      -> AsOf.qAsOfJoinSql,
    "q91_bucketed_join"    -> Layout.q91Sql,
    "q92_passage_dedup"    -> TextAnalysis.qPassageDedupSql,
    "q93_partition_prune"  -> Layout.q93Sql,
    "q94_profile"          -> Profiling.q94Sql,
    "q96_sequence_pack"    -> TextAnalysis.qSequencePackSql,
    "q97_interval_join"    -> AsOf.q97Sql,
  )
}
