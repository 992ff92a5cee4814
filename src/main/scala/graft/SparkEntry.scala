package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Relational, Events}
import graft.text.Text
import graft.dedup.Dedup
import graft.sim.Sim
import graft.multimodal.Multimodal
import graft.streaming.Streams
import graft.ml.ReliefQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 appears in `queries`; the SQL-expressible
  * ones also appear in `oracleSql` (DuckDB dialect, same column names).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.q01PricingSummary _,
    "q02_filter_pushdown" -> Relational.q02FilterPushdown _,
    "q03_revenue_topn"    -> Relational.q03RevenueTopN _,
    "q04_semi_join"       -> Relational.q04SemiJoin _,
    "q05_local_supplier"  -> Relational.q05LocalSupplier _,
    "q06_forecast_filter" -> Relational.q06ForecastFilter _,
    "q07_window_topn"     -> Relational.q07WindowTopN _,
    "q08_running_sum"     -> Relational.q08RunningSum _,
    "q09_distinct_agg"    -> Relational.q09DistinctAgg _,
    "q10_anti_join"       -> Relational.q10AntiJoin _,
    "q11_rollup"          -> Relational.q11Rollup _,
    "q12_case_agg"        -> Relational.q12CaseAgg _,
    "q13_outer_join_dist" -> Relational.q13OuterJoinDist _,
    "q14_expr_pct"        -> Relational.q14ExprPct _,
    "q15_top_supplier"    -> Relational.q15TopSupplier _,
    "q19_cube"            -> Relational.q19Cube _,
    "q20_grouping_sets"   -> Relational.q20GroupingSets _,
    "q21_intersect"       -> Relational.q21Intersect _,
    "q22_except"          -> Relational.q22Except _,
    "q16_events_bucket"   -> Events.q16EventsBucket _,
    "q38_sketch_setops"   -> Events.q38SketchSetops _,
    "q17_sessionize"      -> Events.q17Sessionize _,
    "q18_events_pivot"    -> Events.q18EventsPivot _,
    "q23_asof_join"       -> Events.q23AsofJoin _,
    "q24_range_join"      -> Events.q24RangeJoin _,
    "q25_percentiles"     -> Relational.q25Percentiles _,
    "q25b_approx_percentiles" -> Relational.q25bApproxPercentiles _,
    "q31_ntile_deciles"   -> Relational.q31NtileDeciles _,
    "q31b_decile_cuts"    -> Relational.q31bDecileCuts _,
    "q26_session_window"  -> Events.q26SessionWindow _,
    "q27_salted_join"     -> Events.q27SaltedJoin _,
    "q28_correlated_subquery" -> Relational.q28CorrelatedSubquery _,
    "q29_json_props"      -> Events.q29JsonProps _,
    "q30_lead_lag"        -> Events.q30LeadLag _,
    "q32_trailing_window" -> Events.q32TrailingWindow _,
    "q33_funnel"          -> Events.q33Funnel _,
    "q34_retention"       -> Events.q34Retention _,
    "q35_decayed_agg"     -> Relational.q35DecayedAgg _,
    "q36_kmv_distinct"    -> Relational.q36KmvDistinct _,
    "q37_gap_fill"        -> Events.q37GapFill _,
    "q39_event_transitions" -> Events.q39EventTransitions _,
    "q40_peak_concurrency" -> Events.q40PeakConcurrency _,
    "d01_dedup_exact"     -> Dedup.d01DedupExact _,
    "d02_token_count"     -> Text.d02TokenCount _,
    "d03_text_quality"    -> Text.d03TextQuality _,
    "d04_lang_id"         -> Text.d04LangId _,
    "d05_fingerprint"     -> Text.d05Fingerprint _,
    "d06_minhash_lsh"     -> Dedup.d06MinHashLsh _,
    "d07_simhash"         -> Dedup.d07SimHash _,
    "d08_ngram_jaccard"   -> Dedup.d08NgramJaccard _,
    "d28_containment"     -> Dedup.d28Containment _,
    "d29_bloom_decontam"  -> graft.text.Corpus.d29BloomDecontam _,
    "d31_reference_lm"    -> graft.text.Corpus.d31ReferenceLm _,
    "d32_cms_termfreq"    -> Text.d32CmsTermfreq _,
    "d09_chunk"           -> Text.d09Chunk _,
    "d11_dup_clusters"    -> Dedup.d11DupClusters _,
    "d12_tfidf"           -> Text.d12TfIdf _,
    "d13_stratified"      -> Text.d13StratifiedSample _,
    "d10_term_freq"       -> Text.d10TermFreq _,
    "d14_decontam"        -> graft.text.Corpus.d14Decontaminate _,
    "d15_repetition"      -> graft.text.Corpus.d15Repetition _,
    "d16_pii_scrub"       -> graft.text.Corpus.d16PiiScrub _,
    "d17_chunk_dedup"     -> graft.text.Corpus.d17ChunkDedup _,
    "d18_curation_funnel" -> graft.text.Corpus.d18CurationFunnel _,
    "d19_incremental_dedup" -> graft.text.Corpus.d19IncrementalDedup _,
    "d20_corpus_mix"      -> graft.text.Corpus.d20CorpusMix _,
    "d21_pack_shards"     -> graft.text.Pack.d21PackShards _,
    "d22_corpus_profile"  -> Text.d22CorpusProfile _,
    "d23_cluster_survivors" -> Dedup.d23ClusterSurvivors _,
    "d24_doc_rarity"      -> Text.d24DocRarity _,
    "d25_corpus_diff"     -> graft.text.Corpus.d25CorpusDiff _,
    "d26_line_dedup"      -> graft.text.Corpus.d26LineDedup _,
    "d27_domain_cap"      -> graft.text.Corpus.d27DomainCap _,
    "d36_span_dedup"      -> graft.text.Corpus.d36SpanDedup _,
    "d37_template_mining" -> graft.text.Corpus.d37TemplateMining _,
    "e18_embedding_drift" -> Sim.e18EmbeddingDrift _,
    "e19_ivf_tuning"      -> Sim.e19IvfTuningCurve _,
    "q43_period_growth"   -> Events.q43PeriodGrowth _,
    "q44_equiwidth_histogram" -> Relational.q44EquiwidthHistogram _,
    "q45_sql_order_priority" -> Relational.q45SqlOrderPriority _,
    "q46_group_mode"      -> Relational.q46GroupMode _,
    "d38_priority_dedup"  -> graft.text.Corpus.d38PriorityDedup _,
    "d39_contamination_pressure" -> graft.text.Corpus.d39ContaminationPressure _,
    "d40_dedup_eval"      -> graft.dedup.Dedup.d40DedupEval _,
    "s24_stream_pressure" -> Streams.s24StreamPressure _,
    "d33_fuzzy_decontam"  -> graft.text.Corpus.d33FuzzyDecontam _,
    "d34_heavy_hitters"   -> Text.d34HeavyHitters _,
    "d35_quality_mix"     -> graft.text.Corpus.d35QualityMix _,
    "e01_knn_cosine"      -> Sim.e01KnnCosine _,
    "e02_ann_lsh"         -> Sim.e02AnnLsh _,
    "e06_ann_index_serve" -> Sim.e06AnnIndexServe _,
    "e03_embed_dedup"     -> Sim.e03EmbedDedup _,
    "e04_ann_ivf"         -> Sim.e04AnnIvf _,
    "e07_ann_pq"          -> Sim.e07AnnPq _,
    "e08_ann_ivf_pq"      -> Sim.e08AnnIvfPq _,
    "e09_filtered_ann"    -> Sim.e09FilteredAnn _,
    "e10_ann_recall"      -> Sim.e10AnnRecall _,
    "e11_ann_tombstones"  -> Sim.e11AnnTombstones _,
    "e12_ann_delta_serve" -> Sim.e12AnnDeltaServe _,
    "e13_mmr_rerank"      -> Sim.e13MmrRerank _,
    "e14_ann_sq8"         -> Sim.e14AnnSq8 _,
    "e15_ann_ivf_sq8"     -> Sim.e15AnnIvfSq8 _,
    "e16_range_search"    -> Sim.e16RangeSearch _,
    "e17_hybrid_search"   -> Sim.e17HybridSearch _,
    "e05_knn_join"        -> Sim.e05KnnJoin _,
    "e23_knn_graph"       -> Sim.e23KnnGraph _,
    "e24_ivf_repair"      -> Sim.e24IvfRepair _,
    "e25_graph_serve"     -> Sim.e25GraphServe _,
    "e27_graph_delta"     -> Sim.e27GraphDelta _,
    "e28_graph_serve_delta" -> Sim.e28GraphServeDelta _,
    "e29_hnsw_serve"      -> Sim.e29HnswServe _,
    "e30_dedup_serve"     -> Sim.e30DedupServe _,
    "e31_ivf_seeded_serve" -> Sim.e31IvfSeededServe _,
    "i01_enn_filter"      -> Sim.i01EnnFilter _,
    "i04_edited_relief"   -> ReliefQueries.i04EditedRelief _,
    "g01_transition_pagerank" -> graft.graph.Graph.g01TransitionPagerank _,
    "s28_stream_pagerank" -> Streams.s28StreamPagerank _,
    "w26_bloom_skipping"  -> graft.sources.Sinks.w26BloomSkipping _,
    "d46_lsh_tuning"      -> Dedup.d46LshTuning _,
    "i02_tomek_links"     -> Sim.i02TomekLinks _,
    "e26_knn_classify"    -> Sim.e26KnnClassify _,
    "i03_fcnn_condense"   -> Sim.i03FcnnCondense _,
    "b02_smote_plan"      -> Sim.b02SmotePlan _,
    "b03_class_weights"   -> ReliefQueries.b03ClassWeights _,
    "b04_null_label_clean" -> ReliefQueries.b04NullLabelClean _,
    "s30_stream_class_weights" -> Streams.s30StreamClassWeights _,
    "g02_label_propagation" -> graft.graph.Graph.g02LabelPropagation _,
    "g03_triangle_count"  -> graft.graph.Graph.g03TriangleCount _,
    "g04_user_pagerank"   -> graft.graph.Graph.g04UserPagerank _,
    "g05_user_communities" -> graft.graph.Graph.g05UserCommunities _,
    "g05b_lpa_damped"     -> graft.graph.Graph.g05bLpaDamped _,
    "g06_user_triangles"  -> graft.graph.Graph.g06UserTriangles _,
    "g07_user_components" -> graft.graph.Graph.g07UserComponents _,
    "s31_stream_user_pagerank" -> Streams.s31StreamUserPagerank _,
    "s32_stream_user_triangles" -> Streams.s32StreamUserTriangles _,
    "s33_stream_user_communities" -> Streams.s33StreamUserCommunities _,
    "s34_stream_user_components" -> Streams.s34StreamUserComponents _,
    "g08_user_ppr"        -> graft.graph.Graph.g08UserPpr _,
    "g09_user_kcore"      -> graft.graph.Graph.g09UserKcore _,
    "g10_link_prediction" -> graft.graph.Graph.g10LinkPrediction _,
    "s35_stream_user_ppr" -> Streams.s35StreamUserPpr _,
    "s36_stream_user_kcore" -> Streams.s36StreamUserKcore _,
    "s37_stream_links"    -> Streams.s37StreamLinks _,
    "d47_nb_langid"       -> Text.d47NbLangid _,
    "g11_item_cooccurrence" -> graft.graph.Graph.g11ItemCooccurrence _,
    "s38_stream_item_cooccurrence" -> Streams.s38StreamItemCooccurrence _,
    "i05_allknn"          -> Sim.i05AllKnn _,
    "f16_psi"             -> ReliefQueries.f16Psi _,
    "q47_user_growth"     -> Events.q47UserGrowth _,
    "w27_compaction_planner" -> graft.sources.Sinks.w27CompactionPlanner _,
    "s29_stream_knn_classify" -> Streams.s29StreamKnnClassify _,
    "d30_semantic_dedup"  -> Sim.d30SemanticDedup _,
    "m01_multimodal"      -> Multimodal.m01Multimodal _,
    "m02_binary_source"   -> Multimodal.m02BinarySource _,
    "m03_container_source" -> Multimodal.m03ContainerSource _,
    "m12_container_random_access" -> Multimodal.m12ContainerRandomAccess _,
    "m13_video_near_dup"  -> Multimodal.m13VideoNearDup _,
    "m14_audio_near_dup"  -> Multimodal.m14AudioNearDup _,
    "m04_audio_features"  -> Multimodal.m04AudioFeatures _,
    "m05_video_frames"    -> Multimodal.m05VideoFrames _,
    "m06_image_resize"    -> Multimodal.m06ImageResize _,
    "m07_image_dedup"     -> Multimodal.m07ImageDedup _,
    "m08_image_quality_gate" -> Multimodal.m08ImageQualityGate _,
    "m09_scene_change"    -> Multimodal.m09SceneChange _,
    "m10_audio_segmentation" -> Multimodal.m10AudioSegmentation _,
    "m11_image_near_dup"  -> Multimodal.m11ImageNearDup _,
    "s22_stream_scd2"     -> Streams.s22StreamScd2 _,
    "s23_stream_histogram" -> Streams.s23StreamHistogram _,
    "s01_stream_tumbling" -> Streams.s01StreamTumbling _,
    "s25_stream_backfill" -> Streams.s25StreamBackfill _,
    "s02_stream_stateful" -> Streams.s02StreamStateful _,
    "s03_stream_dedup"    -> Streams.s03StreamDedup _,
    "s04_stream_join"     -> Streams.s04StreamJoin _,
    "s05_stream_neardup"  -> Streams.s05StreamNearDup _,
    "s06_stream_session_window" -> Streams.s06StreamSessionWindow _,
    "s07_stream_quality_gate" -> Streams.s07StreamQualityGate _,
    "s08_stream_incr_dedup" -> Streams.s08StreamIncrementalDedup _,
    "s09_stream_decontam" -> Streams.s09StreamDecontam _,
    "s10_stream_ann_serve" -> Streams.s10StreamAnnServe _,
    "s11_stream_sampler"  -> Streams.s11StreamSampler _,
    "s12_stream_publish"  -> Streams.s12StreamPublish _,
    "s13_stream_quality_lm" -> Streams.s13StreamQualityLm _,
    "w01_sink_partitioned" -> graft.sources.Sinks.w01SinkPartitioned _,
    "w02_sink_bucketed"   -> graft.sources.Sinks.w02SinkBucketed _,
    "w03_sink_compacted"  -> graft.sources.Sinks.w03SinkCompacted _,
    "w04_source_formats"  -> graft.sources.Sinks.w04SourceFormats _,
    "w05_sink_upsert"     -> graft.sources.Sinks.w05SinkUpsert _,
    "w08_atomic_publish"  -> graft.sources.Sinks.w08AtomicPublish _,
    "w09_stats_pruning"   -> graft.sources.Sinks.w09StatsPruning _,
    "w10_time_travel"     -> graft.sources.Sinks.w10TimeTravel _,
    "w11_compact_snapshots" -> graft.sources.Sinks.w11CompactSnapshots _,
    "w12_expire_snapshots" -> graft.sources.Sinks.w12ExpireSnapshots _,
    "w13_incremental_read" -> graft.sources.Sinks.w13IncrementalRead _,
    "w14_zorder_compact"  -> graft.sources.Sinks.w14ZorderCompact _,
    "w15_row_deletes"     -> graft.sources.Sinks.w15RowDeletes _,
    "w16_partition_evolution" -> graft.sources.Sinks.w16PartitionEvolution _,
    "w17_merge_cdc"       -> graft.sources.Sinks.w17MergeCdc _,
    "w18_write_audit_publish" -> graft.sources.Sinks.w18WriteAuditPublish _,
    "w19_snapshot_rollback" -> graft.sources.Sinks.w19SnapshotRollback _,
    "w20_analyze_stats"   -> graft.sources.Sinks.w20AnalyzeStats _,
    "w21_table_branches"  -> graft.sources.Sinks.w21TableBranches _,
    "w22_metadata_tables" -> graft.sources.Sinks.w22MetadataTables _,
    "f02_variance_select" -> ReliefQueries.f02VarianceSelect _,
    "q41_last_touch_attribution" -> Events.q41LastTouchAttribution _,
    "q42_scd2_join"       -> Events.q42Scd2Join _,
    "f03_top_correlations" -> ReliefQueries.f03TopCorrelations _,
    "f04_mrmr_select"     -> ReliefQueries.f04MrmrSelect _,
    "f05_histogram_drift" -> ReliefQueries.f05HistogramDrift _,
    "f06_anova_f"         -> ReliefQueries.f06AnovaF _,
    "f07_info_gain"       -> ReliefQueries.f07InfoGain _,
    "s14_stream_cdc_apply" -> Streams.s14StreamCdcApply _,
    "s15_stream_late_data" -> Streams.s15StreamLateData _,
    "s16_stream_outer_join" -> Streams.s16StreamOuterJoin _,
    "s17_stream_line_scrub" -> Streams.s17StreamLineScrub _,
    "s18_stream_domain_cap" -> Streams.s18StreamDomainCap _,
    "s19_stream_trending" -> Streams.s19StreamTrending _,
    "s20_stream_attribution" -> Streams.s20StreamAttribution _,
    "s21_stream_funnel"   -> Streams.s21StreamFunnel _,
    "w06_sink_streamed"   -> Streams.w06SinkStreamed _,
    "w07_schema_evolution" -> graft.sources.Sinks.w07SchemaEvolution _,
    "w23_orphan_cleanup"  -> graft.sources.Sinks.w23OrphanCleanup _,
    "w24_shallow_clone"   -> graft.sources.Sinks.w24ShallowClone _,
    "d41_quality_votes"   -> graft.text.Corpus.d41QualityVotes _,
    "d42_bpe_pairs"       -> Text.d42BpePairs _,
    "d42b_bpe_train"      -> Text.d42bBpeTrain _,
    "d42c_bpe_tokenize"   -> Text.d42cBpeTokenize _,
    "d43_temperature_mix" -> graft.text.Corpus.d43TemperatureMix _,
    "d44_split_leakage"   -> Dedup.d44SplitLeakage _,
    "d45_novelty_curve"   -> Dedup.d45NoveltyCurve _,
    "w25_manifest_diff"   -> graft.sources.Sinks.w25ManifestDiff _,
    "e20_cluster_sample"  -> Sim.e20ClusterSample _,
    "e21_sharded_knn"     -> Sim.e21ShardedKnn _,
    "e22_ivf_skew_audit"  -> Sim.e22IvfSkewAudit _,
    "f08_selection_stability" -> ReliefQueries.f08SelectionStability _,
    "f09_auc_select"      -> ReliefQueries.f09AucSelect _,
    "f09b_auc_binned"     -> ReliefQueries.f09bAucBinned _,
    "f10_fcbf"            -> ReliefQueries.f10Fcbf _,
    "f11_cmim"            -> ReliefQueries.f11Cmim _,
    "f12_mdlp_discretize" -> ReliefQueries.f12MdlpDiscretize _,
    "f13_jmi"             -> ReliefQueries.f13Jmi _,
    "f14_target_encode"   -> ReliefQueries.f14TargetEncode _,
    "f15_woe_iv"          -> ReliefQueries.f15WoeIv _,
    "b01_class_rebalance" -> ReliefQueries.b01ClassRebalance _,
    "s26_stream_temperature_mix" -> Streams.s26StreamTemperatureMix _,
    "s27_stream_group_mode" -> Streams.s27StreamGroupMode _,
    "f01_chi2_select"     -> ReliefQueries.f01Chi2Select _,
    "relief_weights"      -> ReliefQueries.reliefWeights _,
    "relief_weights_content" -> ReliefQueries.reliefWeightsContent _,
    "relief_select"       -> ReliefQueries.reliefSelect _,
    "relief_transform"    -> ReliefQueries.reliefTransform _,
    "relief_knn"          -> ReliefQueries.reliefKnn _,
    "relief_persist"      -> ReliefQueries.reliefPersist _,
    "vector_assemble"     -> ReliefQueries.vectorAssemble _,
    "vector_assemble_nominal" -> ReliefQueries.vectorAssembleNominal _,
    "vector_assemble_onehot" -> ReliefQueries.vectorAssembleOneHot _,
  )

  /** DuckDB-dialect oracle for each SQL-expressible query (same column
    * names as the Spark result — the driver sorts columns by name before
    * hashing).
    */
  /** d14's 5-gram decontamination in DuckDB terms — shared by the
    * batch pass (d14) and its at-ingestion streaming deployment (s09),
    * which must reproduce the identical flagged-doc table.
    */
  private val decontamOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
      |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
      |      < 20000000 AS is_bench
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, is_bench,
      |    unnest(list_distinct(list_transform(range(1, len(toks)-3),
      |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
      |  FROM d WHERE len(toks) >= 5),
      |b AS (SELECT DISTINCT gram FROM g WHERE is_bench)
      |SELECT g.doc_id, count(*) AS n_contaminated_ngrams
      |FROM g JOIN b USING (gram) WHERE NOT g.is_bench
      |GROUP BY 1""".stripMargin

  /** The shingle → poly-hash → MinHash-signature → band CTE chain in
    * DuckDB terms, parameterized by source CTE and name suffix so d33
    * can run it over BOTH the crawl and the bench slice (same
    * arithmetic as d06's literal oracle).
    */
  private def minhashCtes(src: String, tag: String): String =
    s"""sh$tag AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM $src)
       |  WHERE len(toks) >= 3),
       |hs$tag AS (
       |  SELECT doc_id, shingles, list_transform(shingles, s ->
       |    list_reduce(list_prepend(CAST(17 AS BIGINT),
       |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
       |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
       |  FROM sh$tag),
       |sg$tag AS (
       |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
       |    list_min(list_transform(hv, h ->
       |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
       |  FROM hs$tag),
       |bands$tag AS (
       |  SELECT doc_id, b.b AS band_id,
       |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
       |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
       |  FROM sg$tag, (SELECT unnest(range(0, 16)) AS b) b)""".stripMargin

  /** d33's fuzzy decontamination in DuckDB terms: the bench split, the
    * planted twin crawl, both MinHash pipelines, the crawl×bench band
    * join with the bench-side bucket cap, and the exact shingle-set
    * contamination/Jaccard verify.
    */
  private val d33OracleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
       |      < 20000000 AS is_bench
       |  FROM documents),
       |tw AS (
       |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |        FROM d WHERE is_bench)
       |  WHERE len(toks) >= 12),
       |crawl AS (SELECT doc_id, text FROM d WHERE NOT is_bench
       |          UNION ALL SELECT doc_id, text FROM tw),
       |bench AS (SELECT doc_id, text FROM d WHERE is_bench),
       |${minhashCtes("crawl", "c")},
       |${minhashCtes("bench", "b")},
       |benchok AS (
       |  SELECT band_id, band_sig FROM bandsb GROUP BY 1, 2 HAVING count(*) <= 64),
       |cand AS (
       |  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
       |  FROM bandsc c
       |  JOIN (SELECT bandsb.* FROM bandsb JOIN benchok USING (band_id, band_sig)) b
       |    USING (band_id, band_sig))
       |SELECT doc_id, bench_id, contamination, jaccard FROM (
       |  SELECT cand.doc_id, cand.bench_id,
       |    CAST(len(list_intersect(sc.shingles, sb.shingles)) AS DOUBLE)
       |      / len(sc.shingles) AS contamination,
       |    CAST(len(list_intersect(sc.shingles, sb.shingles)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sc.shingles, sb.shingles))) AS jaccard
       |  FROM cand
       |  JOIN sgc sc ON sc.doc_id = cand.doc_id
       |  JOIN sgb sb ON sb.doc_id = cand.bench_id) t
       |WHERE contamination >= 0.8""".stripMargin

  /** e07's product-quantized search in DuckDB terms, GENERATED for
    * M=[[graft.sim.Sim.PqM]] subspaces over the 64-dim verification
    * embeddings (one argmin CTE + one ADC lookup CTE per subspace).
    * Arithmetic mirrors the Spark pipeline operation-for-operation —
    * same slices, same left-to-right adds — so the approximate-cosine
    * candidate cut and the exact rerank agree bit-for-bit.
    */
  private val e07OracleSql: String = pqOracleSql(ivf = false)
  private val e08OracleSql: String = pqOracleSql(ivf = true)

  /** The PQ-ADC search in DuckDB terms, generated for M subspaces —
    * e07 scans the whole code table; with `ivf` the candidates are
    * first restricted to each query's nprobe coarse cells via e04's
    * assignment/probe CTEs (same sampled centroids, same argmin).
    */
  private def pqOracleSql(ivf: Boolean): String = {
    val m = graft.sim.Sim.PqM
    val sub = 64 / m // verification embeddings are 64-dim
    val cand = graft.sim.Sim.PqCand
    val nprobe = graft.sim.Sim.IvfNprobe
    def sl(s: Int, v: String) = s"$v[${s * sub + 1}:${(s + 1) * sub}]"
    val cbCols = (0 until m).map(s =>
      s"${sl(s, "cv")} AS cs$s, list_dot_product(${sl(s, "cv")}, ${sl(s, "cv")}) AS c2$s").mkString(",\n  ")
    val codeCtes = (0 until m).map(s =>
      s"""c$s AS (
         |  SELECT vec_id, cid AS code$s, c2$s FROM (
         |    SELECT en.vec_id, cb.cid, cb.c2$s,
         |      row_number() OVER (PARTITION BY en.vec_id
         |        ORDER BY list_dot_product(${sl(s, "en.v")}, cb.cs$s) * -2.0 + cb.c2$s, cb.cid) AS rn
         |    FROM en CROSS JOIN cb) t
         |  WHERE rn = 1)""".stripMargin).mkString(",\n")
    val lutCtes = (0 until m).map(s =>
      s"""l$s AS (
         |  SELECT en.vec_id AS query_id, cb.cid AS code$s,
         |    list_dot_product(${sl(s, "en.v")}, cb.cs$s) AS a$s
         |  FROM en CROSS JOIN cb WHERE en.vec_id < 20)""".stripMargin).mkString(",\n")
    val codeJoins = (0 until m).map(s => s"JOIN c$s USING (vec_id)").mkString("\n  ")
    val lutJoins = (0 until m).map(s =>
      if (s == 0) "JOIN l0 ON l0.code0 = c0.code0"
      else s"JOIN l$s ON l$s.code$s = c$s.code$s AND l$s.query_id = l0.query_id").mkString("\n  ")
    val anrm = (0 until m).map(s => s"c$s.c2$s").mkString(" + ")
    val adot = (0 until m).map(s => s"l$s.a$s").mkString(" + ")
    val ivfCtes = if (!ivf) "" else s"""
       |cc AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents),
       |asg AS (
       |  SELECT vec_id, cid AS centroid_id FROM (
       |    SELECT en.vec_id, cc.cid,
       |      row_number() OVER (PARTITION BY en.vec_id
       |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
       |    FROM en CROSS JOIN cc) t
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, cid AS centroid_id FROM (
       |    SELECT en.vec_id AS query_id, cc.cid,
       |      row_number() OVER (PARTITION BY en.vec_id
       |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
       |    FROM en CROSS JOIN cc WHERE en.vec_id < 20) t
       |  WHERE rn <= $nprobe),""".stripMargin
    val ivfJoins = if (!ivf) "" else
      "JOIN asg ON asg.vec_id = en.vec_id\n  " +
        "JOIN probes p ON p.centroid_id = asg.centroid_id AND p.query_id = l0.query_id\n  "
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id) - 1 AS cid,
       |    v AS cv
       |  FROM e
       |  ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id
       |  LIMIT 16),$ivfCtes
       |cb AS (
       |  SELECT cid, $cbCols
       |  FROM cents),
       |$codeCtes,
       |$lutCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM en WHERE vec_id < 20),
       |cand AS (
       |  SELECT l0.query_id, en.vec_id AS neighbor_id, en.v, en.nrm, q.qv, q.qn,
       |    ($adot) / (q.qn * sqrt($anrm)) AS approx_cos
       |  FROM en
       |  $codeJoins
       |  $lutJoins
       |  ${ivfJoins}JOIN q ON q.query_id = l0.query_id
       |  WHERE en.vec_id <> l0.query_id),
       |top AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY approx_cos DESC, neighbor_id) AS rn
       |    FROM cand) t
       |  WHERE rn <= $cand)
       |SELECT query_id, neighbor_id, cosine FROM (
       |  SELECT query_id, neighbor_id,
       |    list_dot_product(qv, v) / (qn * nrm) AS cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_dot_product(qv, v) / (qn * nrm) DESC, neighbor_id) AS rn2
       |  FROM top) t
       |WHERE rn2 <= 10""".stripMargin
  }

  /** d13's deterministic stratified sample in DuckDB terms — shared by
    * the batch pass (d13) and its streaming deployment (s11).
    */
  private val stratifiedOracleSql: String =
    """SELECT lang, count(*) AS n_sampled FROM documents
      |WHERE ((doc_id % 1000000007) * 900000011 % 1000000007 + 20260812) % 1000000007 <
      |  CASE lang WHEN 'en' THEN 500000003 WHEN 'es' THEN 300000002
      |            WHEN 'de' THEN 300000002 WHEN 'fr' THEN 300000002
      |            WHEN 'zh' THEN 100000000 ELSE -1 END
      |GROUP BY 1""".stripMargin

  /** The w17/s14 merged final state: one CDC changeset (lower-eighth
    * key range; %4==1 delete + reinsert above max id, %4==2 update in
    * place) applied over `documents` — identical whether it lands as
    * one commit (w17) or one commit per micro-batch (s14).
    */
  private val mergeCdcOracleSql: String =
    """WITH b AS (
      |  SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 8 AS thr,
      |         max(doc_id) AS mx
      |  FROM documents
      |), merged AS (
      |  SELECT d.doc_id, d.lang,
      |         CASE WHEN d.doc_id <= b.thr AND d.doc_id % 4 = 2
      |              THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars,
      |         CASE WHEN d.doc_id <= b.thr AND d.doc_id % 4 = 2
      |              THEN 'cdc_upd' ELSE d.source END AS source
      |  FROM documents d, b
      |  WHERE NOT (d.doc_id <= b.thr AND d.doc_id % 4 = 1)
      |  UNION ALL
      |  SELECT d.doc_id + b.mx, d.lang, d.n_chars, 'cdc_ins'
      |  FROM documents d, b
      |  WHERE d.doc_id <= b.thr AND d.doc_id % 4 = 1
      |)
      |SELECT lang, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      | count(*) FILTER (WHERE source IN ('cdc_upd','cdc_ins')) AS n_cdc
      |FROM merged GROUP BY 1""".stripMargin

  /** d26/s17: boilerplate line scrub over the near-dup corpus —
    * 8-token line spans, lines in ≥ 2 distinct docs removed
    * everywhere, survivors re-joined in order (empty string when a doc
    * is all boilerplate, matching Spark's concat_ws over an empty
    * array).
    */
  private val lineDedupOracleSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |tr AS (
      |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
      |  WHERE len(toks) >= 12),
      |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
      |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM corpus),
      |ln AS (
      |  SELECT doc_id,
      |    unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS line_idx,
      |    unnest(list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
      |      i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS line_text
      |  FROM tk),
      |bp AS (SELECT line_text FROM ln GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
      |fl AS (SELECT l.doc_id, l.line_idx, l.line_text, b.line_text IS NOT NULL AS is_bp
      |       FROM ln l LEFT JOIN bp b USING (line_text))
      |SELECT doc_id,
      |  coalesce(string_agg(line_text, ' ' ORDER BY line_idx) FILTER (WHERE NOT is_bp), '')
      |    AS clean_text,
      |  count(*) AS n_lines,
      |  count(*) FILTER (WHERE is_bp) AS n_dropped
      |FROM fl GROUP BY doc_id""".stripMargin

  /** e14/e15: the SQ8 pipeline replayed in SQL — per-dim (min, range)
    * from the corpus, byte codes via the same clamp/floor formula,
    * dequant norms, approximate scores as Σq·mn + Σ(q·scale)·code,
    * top-64 cut, exact rerank. Every double comes from the identical
    * left-to-right fold (list_dot_product ≡ the Spark aggregate fold).
    * With `ivf` the e04 coarse-quantizer CTEs restrict candidates to
    * each query's nprobe cells (e08's composition device).
    */
  private def annSq8OracleSql(ivf: Boolean): String = {
    val nprobe = graft.sim.Sim.IvfNprobe
    val ivfCtes = if (!ivf) "" else s"""
      |cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id) - 1 AS cid,
      |    v AS cv
      |  FROM e
      |  ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id
      |  LIMIT 16),
      |cc AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents),
      |asg AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, cc.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_dot_product(e.v, cc.cv) * -2.0 + cc.c2, cc.cid) AS rn
      |    FROM e CROSS JOIN cc) t
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT e.vec_id AS query_id, cc.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_dot_product(e.v, cc.cv) * -2.0 + cc.c2, cc.cid) AS rn
      |    FROM e CROSS JOIN cc WHERE e.vec_id < 20) t
      |  WHERE rn <= $nprobe),""".stripMargin
    val ivfJoins = if (!ivf) "" else
      """
        |    JOIN asg ON asg.vec_id = c.vec_id
        |    JOIN probes p ON p.cid = asg.cid AND p.query_id = q.query_id""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),$ivfCtes
      |mm AS (SELECT d, min(v[d+1]) AS mn, max(v[d+1]) - min(v[d+1]) AS rg
      |       FROM e, (SELECT unnest(range(0, 64)) AS d) dims GROUP BY d),
      |ma AS (SELECT list(mn ORDER BY d) AS mnA, list(rg ORDER BY d) AS rgA FROM mm),
      |enc AS (
      |  SELECT vec_id,
      |    list_transform(range(0, 64), d -> CASE WHEN rgA[d+1] > 0
      |      THEN CAST(greatest(0, least(255, floor((v[d+1] - mnA[d+1]) * 255 / rgA[d+1]))) AS DOUBLE)
      |      ELSE 0.0 END) AS cst
      |  FROM e, ma),
      |dq AS (
      |  SELECT vec_id, cst,
      |    list_transform(range(0, 64), d -> mnA[d+1] + cst[d+1] * (rgA[d+1] / 255)) AS dv
      |  FROM enc, ma),
      |cd AS (SELECT vec_id, cst, sqrt(list_dot_product(dv, dv)) AS anrm FROM dq),
      |qq AS (
      |  SELECT e.vec_id AS query_id,
      |    list_dot_product(v, mnA) AS qmin,
      |    list_transform(range(0, 64), d -> v[d+1] * (rgA[d+1] / 255)) AS qsc,
      |    sqrt(list_dot_product(v, v)) AS qn
      |  FROM e, ma WHERE e.vec_id < 20),
      |cand AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.query_id, c.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.query_id ORDER BY
      |        (q.qmin + list_dot_product(q.qsc, c.cst)) / (q.qn * c.anrm) DESC, c.vec_id) AS rn
      |    FROM qq q JOIN cd c ON c.vec_id <> q.query_id$ivfJoins)
      |  WHERE rn <= 64),
      |x AS (
      |  SELECT ca.query_id, ca.neighbor_id,
      |    list_dot_product(q.v, n.v)
      |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) AS cosine
      |  FROM cand ca
      |  JOIN e q ON q.vec_id = ca.query_id
      |  JOIN e n ON n.vec_id = ca.neighbor_id)
      |SELECT query_id, neighbor_id, cosine FROM (
      |  SELECT query_id, neighbor_id, cosine,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      |  FROM x)
      |WHERE rn <= 10""".stripMargin
  }

  /** Exact brute-force cosine top-10 for the 20-query panel — e01's
    * oracle, and the ground-truth CTE inside e10's recall eval.
    */
  /** e04's IVF reproduction, parameterized by nprobe — shared by the
    * e04 oracle (nprobe = 4) and the e19 tuning-curve sweep.
    */
  /** The deterministic IVF codebook + nearest-centroid assignment CTEs
    * (through `asg`) — shared prefix of the e04/e19 search oracles and
    * the e20 cluster-sampler oracle.
    */
  private val ivfAsgCte: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id) - 1 AS cid,
      |    v AS cv
      |  FROM e
      |  ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id
      |  LIMIT 16),
      |cc AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents),
      |asg AS (
      |  SELECT vec_id, v, nrm, cid AS centroid_id FROM (
      |    SELECT en.vec_id, en.v, en.nrm, cc.cid,
      |      row_number() OVER (PARTITION BY en.vec_id
      |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
      |    FROM en CROSS JOIN cc) t
      |  WHERE rn = 1)""".stripMargin

  /** d06's full banded-MinHash pair reproduction — also the evidence
    * CTE inside d44's split-leakage audit.
    */
  /** The minhash signature pipeline (near-dup corpus → shingles →
    * 64-perm signatures, CTE `sg`) — shared by d06's pair oracle and
    * d46's banding-plan tuner.
    */
  private val d06SigCtes: String =
    """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
      |tr AS (
      |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
      |  WHERE len(toks) >= 12),
      |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
      |  WHERE len(toks) >= 3),
      |hs AS (
      |  SELECT doc_id, shingles, list_transform(shingles, s ->
      |    list_reduce(list_prepend(CAST(17 AS BIGINT),
      |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
      |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
      |  FROM sh),
      |sg AS (
      |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
      |    list_min(list_transform(hv, h ->
      |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
      |  FROM hs)""".stripMargin

  private val d06PairsSql: String = d06SigCtes +
    """,
      |bands AS (
      |  SELECT doc_id, b.b AS band_id,
      |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
      |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
      |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
      |useful AS (
      |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
      |  HAVING count(*) BETWEEN 2 AND 64),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
      |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
      |    USING (band_id, band_sig)
      |  WHERE a.doc_id < b.doc_id)
      |SELECT p.doc_a, p.doc_b,
      |  len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0 AS est_jaccard
      |FROM pairs p
      |JOIN sg sa ON sa.doc_id = p.doc_a
      |JOIN sg sb ON sb.doc_id = p.doc_b
      |WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0 >= 0.5""".stripMargin

  /** d46: the shared signature CTEs + per-plan (measured bucket
    * census, analytic S-curve integral) blocks, one UNION ALL branch
    * per banding plan. Powers are REPEATED-SQUARING multiplication
    * trees (all b, r are powers of two), so no pow() is compared
    * cross-engine; s_star is baked as the same driver-rounded literal
    * the Spark plan carries.
    */
  private val d46OracleSql: String = {
    def sqTxt(x: String, k: Int): String =
      if (k == 0) x else { val t = sqTxt(x, k - 1); s"($t * $t)" }
    val parts = graft.dedup.Dedup.TuningPlans.map { case (b, r) =>
      val kr = Integer.numberOfTrailingZeros(r)
      val kb = Integer.numberOfTrailingZeros(b)
      val p = s"(CAST(1 AS DOUBLE) - ${sqTxt(s"(CAST(1 AS DOUBLE) - ${sqTxt("s", kr)})", kb)})"
      val sStar = graft.dedup.Dedup.tuningSStar(b, r)
      s"""SELECT m.bands, m.rows_per_band, CAST($sStar AS DOUBLE) AS s_star,
  a.fp_area, a.fn_area, m.n_candidate_pairs, m.n_capped_buckets
FROM (
  SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
    CAST(coalesce(sum(c*(c-1)//2), 0) AS BIGINT) AS n_candidate_pairs,
    CAST(coalesce(sum(CASE WHEN c > 64 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_capped_buckets
  FROM (SELECT band_id, band_sig, count(*) AS c FROM (
      SELECT sg.doc_id, bb.band_id,
        list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[bb.band_id*$r+1 : bb.band_id*$r+$r]),
          (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
      FROM sg, (SELECT unnest(range(0, $b)) AS band_id) bb) t1
    GROUP BY 1, 2) t2) m
CROSS JOIN (
  SELECT round(sum(CASE WHEN s < CAST(0.5 AS DOUBLE) THEN $p ELSE CAST(0 AS DOUBLE) END) / CAST(1000 AS DOUBLE), 6) AS fp_area,
         round(sum(CASE WHEN s > CAST(0.5 AS DOUBLE) THEN CAST(1 AS DOUBLE) - $p ELSE CAST(0 AS DOUBLE) END) / CAST(1000 AS DOUBLE), 6) AS fn_area
  FROM (SELECT CAST(i*2 + 1 AS DOUBLE) / CAST(2000 AS DOUBLE) AS s
        FROM (SELECT unnest(range(0, 1000)) AS i) t3) t4) a"""
    }
    d06SigCtes + "\n" + parts.mkString("\nUNION ALL\n")
  }

  private def ivfOracleSql(np: Int): String =
    s"""$ivfAsgCte,
       |probes AS (
       |  SELECT query_id, qv, qn, cid AS centroid_id FROM (
       |    SELECT en.vec_id AS query_id, en.v AS qv, en.nrm AS qn, cc.cid,
       |      row_number() OVER (PARTITION BY en.vec_id
       |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
       |    FROM en CROSS JOIN cc WHERE en.vec_id < 20) t
       |  WHERE rn <= $np),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    list_dot_product(p.qv, a.v) / (p.qn * a.nrm) AS cosine
       |  FROM probes p JOIN asg a USING (centroid_id)
       |  WHERE a.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM cand) t
       |WHERE rn <= 10""".stripMargin

  /** f04's greedy mRMR replayed as unrolled CTE layers (the e13
    * device): the f01 χ² CTEs + the f03 pairwise-correlation CTEs feed
    * five selection layers, each picking the argmax of
    * χ² − mean |corr(·, selected)| over the remaining dims.
    */
  private val f04OracleSql: String = {
    val base =
      """WITH e AS (SELECT label::BIGINT AS label,
        |             unnest(range(0, 64)) AS dim, unnest(embedding) AS x
        |           FROM embeddings),
        |cells AS (SELECT dim, CASE WHEN x > 0 THEN 1 ELSE 0 END AS s, label,
        |            count(*) AS n
        |          FROM e GROUP BY 1, 2, 3),
        |grid AS (SELECT d.dim, s.s, l.label
        |         FROM (SELECT DISTINCT dim FROM cells) d,
        |              (VALUES (0), (1)) s(s),
        |              (SELECT DISTINCT label FROM cells) l),
        |dense AS (SELECT g.dim, g.s, g.label, coalesce(c.n, 0) AS n
        |          FROM grid g LEFT JOIN cells c
        |            ON g.dim = c.dim AND g.s = c.s AND g.label = c.label),
        |mm AS (SELECT dim, s, label, n,
        |        sum(n) OVER (PARTITION BY dim, s) AS row_tot,
        |        sum(n) OVER (PARTITION BY dim, label) AS col_tot,
        |        sum(n) OVER (PARTITION BY dim) AS tot
        |      FROM dense),
        |chi AS (SELECT dim,
        |          sum(CASE WHEN row_tot * col_tot > 0
        |              THEN (n - row_tot * col_tot / tot) * (n - row_tot * col_tot / tot)
        |                   / (row_tot * col_tot / tot)
        |              ELSE 0 END) AS chi2
        |        FROM mm GROUP BY 1),
        |e2 AS (SELECT vec_id, unnest(range(0, 64)) AS dim,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |       FROM embeddings),
        |p2 AS (SELECT a.dim AS i, b.dim AS j, count(*) AS n,
        |        sum(a.x) AS sx, sum(b.x) AS sy, sum(a.x * a.x) AS sxx,
        |        sum(b.x * b.x) AS syy, sum(a.x * b.x) AS sxy
        |      FROM e2 a JOIN e2 b ON a.vec_id = b.vec_id AND a.dim < b.dim
        |      GROUP BY 1, 2),
        |c2 AS (SELECT i, j,
        |        CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
        |          THEN (n * sxy - sx * sy)
        |               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |          ELSE 0 END AS corr
        |      FROM p2),
        |cr AS (SELECT i, j, corr FROM c2
        |       UNION ALL SELECT j AS i, i AS j, corr FROM c2),
        |s1 AS (SELECT dim, chi2 AS score FROM chi ORDER BY chi2 DESC, dim LIMIT 1),
        |sel1 AS (SELECT dim FROM s1)""".stripMargin
    val layers = (2 to 5).map { k =>
      s"""m$k AS (SELECT ch.dim,
         |  ch.chi2 - (SELECT avg(abs(cr.corr)) FROM cr
         |             JOIN sel${k - 1} sl ON cr.i = ch.dim AND cr.j = sl.dim) AS score
         |  FROM chi ch WHERE ch.dim NOT IN (SELECT dim FROM sel${k - 1})),
         |s$k AS (SELECT dim, score FROM m$k ORDER BY score DESC, dim LIMIT 1),
         |sel$k AS (SELECT dim FROM sel${k - 1} UNION ALL SELECT dim FROM s$k)"""
        .stripMargin
    }.mkString(",\n", ",\n", "")
    val out = (1 to 5)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, dim, score FROM s$k")
      .mkString("\n", "\nUNION ALL\n", "")
    base + layers + out
  }

  private val knnExactOracleSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    list_dot_product(q.v, e.v)
      |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
      |  FROM e q JOIN e ON e.vec_id <> q.vec_id
      |  WHERE q.vec_id < 20)
      |SELECT query_id, neighbor_id, cosine FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rn FROM s) t
      |WHERE rn <= 10""".stripMargin

  /** e13's MMR picks, generated as one CTE layer per step (the e07
    * generated-SQL precedent): sel_t = everything picked so far, m_t =
    * remaining candidates scored λ·rel − (1−λ)·max sim-to-selected,
    * s_t = the argmax with ties by neighbor_id. Cosines are e01's
    * exact arithmetic; 0.7/0.3 literals and the multiply/subtract
    * order match the Spark side token-for-token, so every pick hashes
    * identically.
    */
  private val mmrOracleSql: String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(q.v, e.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS rel
        |  FROM e q JOIN e ON e.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20),
        |cand AS (SELECT query_id, neighbor_id, rel FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rel DESC, neighbor_id) AS rn FROM sc) t
        |  WHERE rn <= 10),
        |sim AS (
        |  SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
        |    list_dot_product(va.v, vb.v)
        |      / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) AS sim
        |  FROM cand a JOIN cand b
        |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
        |  JOIN e va ON va.vec_id = a.neighbor_id
        |  JOIN e vb ON vb.vec_id = b.neighbor_id),
        |s1 AS (SELECT query_id, neighbor_id, rel AS mmr_score, 1 AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rel DESC, neighbor_id) AS rn FROM cand) t WHERE rn = 1)""".stripMargin)
    for (t <- 2 to 5) {
      val sel = (1 until t).map(i => s"SELECT query_id, neighbor_id FROM s$i")
        .mkString(" UNION ALL ")
      sb.append(s""",
        |sel$t AS ($sel),
        |m$t AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    c.rel * 0.7 - max(s.sim) * 0.3 AS mmr_score
        |  FROM cand c
        |  JOIN sim s ON s.query_id = c.query_id AND s.a_id = c.neighbor_id
        |  JOIN sel$t x ON x.query_id = s.query_id AND x.neighbor_id = s.b_id
        |  LEFT JOIN sel$t y ON y.query_id = c.query_id AND y.neighbor_id = c.neighbor_id
        |  WHERE y.neighbor_id IS NULL
        |  GROUP BY c.query_id, c.neighbor_id, c.rel),
        |s$t AS (SELECT query_id, neighbor_id, mmr_score, $t AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY mmr_score DESC, neighbor_id) AS rn FROM m$t) t WHERE rn = 1)""".stripMargin)
    }
    sb.append("""
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, mmr_score
      |FROM (""".stripMargin)
    sb.append((1 to 5).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL "))
    sb.append(") u")
    sb.toString
  }

  /** The hamming-≤2 multi-probe LSH search in DuckDB terms — shared by
    * e02 (in-session signature table) and e06 (persisted index): both
    * serve the identical result, so both check against the same SQL.
    */
  /** d42b oracle: the full BPE merge loop replayed — K layers, each
    * (pair census → argmax → merge applied). The merge uses the
    * gaps-and-islands alternation over match positions (greedy
    * LEFTMOST non-overlapping: within a maximal run of consecutive
    * overlapping matches, every odd one fires) — an INDEPENDENT
    * formulation of the left fold the Spark side uses; the two must
    * agree bit-for-bit.
    */
  /** e05's full bucketed kNN-join construction (LSH buckets, census
    * cap, hamming-1 probes, top-3 by cosine) ending in CTE `knn` —
    * shared by the e05 oracle and i01's vote layer on top of it.
    */
  /** The capped-bucket prefix alone (CTEs e/bk/census/inn) — shared
    * by e05's all-queries kNN join and e26's split-fold classifier.
    */
  private val e05BucketCtes: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |bk AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, CAST(list_sum(list_transform(range(0, 8), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
      |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
      |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
      |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS bucket FROM e),
      |census AS (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= 64),
      |inn AS (SELECT bk.* FROM bk JOIN census USING (bucket))""".stripMargin

  private val e05KnnCtes: String = e05BucketCtes +
    """,
      |probes AS (
      |  SELECT vec_id AS query_id, unnest(list_distinct(list_concat(
      |      [bucket],
      |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))))) AS bucket
      |  FROM inn),
      |cand AS (
      |  SELECT DISTINCT p.query_id, i.vec_id AS neighbor_id
      |  FROM probes p JOIN inn i USING (bucket)
      |  WHERE i.vec_id <> p.query_id),
      |scored AS (
      |  SELECT c.query_id, c.neighbor_id,
      |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
      |  FROM cand c JOIN bk a ON a.vec_id = c.query_id
      |              JOIN bk b ON b.vec_id = c.neighbor_id),
      |knn AS (
      |  SELECT query_id, neighbor_id, cosine FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rn FROM scored) t
      |  WHERE rn <= 3)""".stripMargin

  /** i03: seeds + three unrolled FCNN rounds, each = nearest-prototype
    * classification (cross join against the bounded prototype set),
    * misclassified census, per-cell representative election, set
    * union — operation order identical to the Spark side.
    */
  private val i03OracleSql: String = {
    val layer = (r: Int) => {
      val p = s"p${r - 1}"
      s"""pv$r AS (SELECT p.vec_id AS proto_id, en.v AS pv, en.nrm AS pn, en.lbl AS plbl
  FROM $p p JOIN en ON en.vec_id = p.vec_id),
sc$r AS (SELECT en.vec_id, en.lbl, q.proto_id, q.plbl,
    list_dot_product(en.v, q.pv) / (en.nrm * q.pn) AS cos
  FROM en CROSS JOIN pv$r q),
nr$r AS (SELECT * FROM (SELECT sc$r.*, row_number() OVER (PARTITION BY vec_id
    ORDER BY cos DESC, proto_id) AS rn FROM sc$r) t WHERE rn = 1),
mis$r AS (SELECT * FROM nr$r WHERE lbl <> plbl),
rep$r AS (SELECT vec_id FROM (SELECT vec_id, row_number() OVER (PARTITION BY proto_id
    ORDER BY cos DESC, vec_id) AS rp FROM mis$r) t WHERE rp = 1),
a$r AS (SELECT CAST($r AS BIGINT) AS round,
    (SELECT count(*) FROM $p) + (SELECT count(*) FROM rep$r) AS n_prototypes,
    (SELECT count(*) FROM mis$r) AS n_misclassified,
    (SELECT CAST(coalesce(sum(vec_id), 0) AS BIGINT) FROM rep$r) AS added_id_sum),
p$r AS (SELECT vec_id FROM $p UNION ALL SELECT vec_id FROM rep$r)"""
    }
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
  label::BIGINT AS lbl FROM embeddings),
en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, lbl FROM e
  WHERE sqrt(list_dot_product(v, v)) > 0),
p0 AS (SELECT min(vec_id) AS vec_id FROM en GROUP BY lbl),
${(1 to graft.sim.Sim.FcnnRounds).map(layer).mkString(",\n")}
SELECT CAST(0 AS BIGINT) AS round, (SELECT count(*) FROM p0) AS n_prototypes,
  CAST(NULL AS BIGINT) AS n_misclassified, CAST(NULL AS BIGINT) AS added_id_sum
${(1 to graft.sim.Sim.FcnnRounds).map(r =>
      s"UNION ALL SELECT round, n_prototypes, n_misclassified, added_id_sum FROM a$r")
        .mkString("\n")}"""
  }

  /** i01's ENN vote layer over the e05 kNN replay, ending at the
    * agg/other CTEs — the i01 oracle's final select and i04's
    * flagged-id subquery both build on this one chain, so the editing
    * rule cannot silently diverge between the census and the
    * composed fit.
    */
  private val i01VoteCtes: String = e05KnnCtes + """,
        |lbl AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings),
        |votes AS (
        |  SELECT k.query_id, l.lbl AS nlbl, count(*)::BIGINT AS c
        |  FROM knn k JOIN lbl l ON l.vec_id = k.neighbor_id
        |  GROUP BY 1, 2),
        |own AS (SELECT v.*, q.lbl FROM votes v JOIN lbl q ON q.vec_id = v.query_id),
        |agg AS (
        |  SELECT query_id, lbl,
        |    CAST(sum(c) AS BIGINT) AS n_neighbors,
        |    CAST(sum(CASE WHEN nlbl = lbl THEN c ELSE 0 END) AS BIGINT) AS n_same
        |  FROM own GROUP BY 1, 2),
        |other AS (
        |  SELECT query_id, nlbl AS other_label, c AS n_other,
        |    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, nlbl) AS rn
        |  FROM own WHERE nlbl <> lbl)""".stripMargin

  /** e26's full fold-split classification replay — also the s29
    * oracle (one AvailableNow pass of the query stream must equal
    * batch e26 exactly).
    */
  private val e26OracleSql: String = (e05BucketCtes + """,
        |probes AS (
        |  SELECT vec_id AS query_id, unnest(list_distinct(list_concat(
        |      [bucket],
        |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))))) AS bucket
        |  FROM inn WHERE vec_id % 5 = 0),
        |cand AS (
        |  SELECT DISTINCT p.query_id, i.vec_id AS neighbor_id
        |  FROM probes p JOIN inn i USING (bucket)
        |  WHERE i.vec_id % 5 <> 0),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
        |  FROM cand c JOIN bk a ON a.vec_id = c.query_id
        |              JOIN bk b ON b.vec_id = c.neighbor_id),
        |top3 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rn FROM scored) t
        |  WHERE rn <= 3),
        |lbl AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings),
        |votes AS (
        |  SELECT t.query_id, l.lbl AS nlbl, count(*)::BIGINT AS c
        |  FROM top3 t JOIN lbl l ON l.vec_id = t.neighbor_id
        |  GROUP BY 1, 2),
        |pred AS (
        |  SELECT query_id, nlbl AS pred_label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY c DESC, nlbl) AS rn FROM votes) t
        |  WHERE rn = 1)
        |SELECT q.lbl AS true_label, p.pred_label, count(*)::BIGINT AS n
        |FROM pred p JOIN lbl q ON q.vec_id = p.query_id
        |GROUP BY 1, 2""".stripMargin)

  /** b03's census + weight formulas — also the s30 oracle (one
    * AvailableNow streaming pass must equal batch b03 exactly).
    */
  private val b03OracleSql: String =
    """WITH census AS (SELECT label::BIGINT AS label, count(*)::BIGINT AS n_class
      |  FROM embeddings GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_class) AS BIGINT) AS n, count(*)::BIGINT AS k FROM census),
      |raw AS (SELECT label, n_class,
      |  CAST((SELECT n FROM tot) AS DOUBLE)
      |    / CAST((SELECT k FROM tot) * n_class AS DOUBLE) AS balanced_weight,
      |  (1 - CAST(0.999 AS DOUBLE))
      |    / (CAST(1 AS DOUBLE) - power(CAST(0.999 AS DOUBLE), CAST(n_class AS DOUBLE))) AS e_raw
      |  FROM census),
      |norm AS (SELECT sum(e_raw) AS es FROM raw)
      |SELECT label, n_class, round(balanced_weight, 6) AS balanced_weight,
      |  round(e_raw * CAST((SELECT k FROM tot) AS DOUBLE) / (SELECT es FROM norm), 6)
      |    AS effnum_weight
      |FROM raw""".stripMargin

  /** g02: the symmetrized transition graph + 5 unrolled synchronous
    * label-propagation layers — all integer weight sums, argmax by
    * (weight desc, label asc).
    */
  /** Shared sync-LPA replay builder (the g02/g05 kernel by reference —
    * same discipline as pagerankOracleSql): 5 adopt-max-incident-
    * weight layers over caller-supplied `sym` (a, b, w) and `nodes`
    * CTEs.
    */
  private def lpaOracleSql(graphCtes: String): String = {
    val layer = (k: Int) => {
      val p = s"l${k - 1}"
      s"""sc$k AS (SELECT s.a AS node, l.community, sum(s.w) AS sw
  FROM sym s JOIN $p l ON l.node = s.b GROUP BY 1, 2),
b$k AS (SELECT node, community AS nc FROM (
    SELECT node, community, row_number() OVER (PARTITION BY node
      ORDER BY sw DESC, community) AS rn FROM sc$k) t WHERE rn = 1),
l$k AS (SELECT l.node, coalesce(b.nc, l.community) AS community
  FROM $p l LEFT JOIN b$k b ON b.node = l.node)"""
    }
    s"""WITH $graphCtes,
l0 AS (SELECT node, node AS community FROM nodes),
${(1 to graft.graph.Graph.LpaRounds).map(layer).mkString(",\n")}
SELECT node, community FROM l${graft.graph.Graph.LpaRounds}"""
  }

  private val g02OracleSql: String = lpaOracleSql(
    """x AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
dcounts AS (
  SELECT prev_type AS a, event_type AS b, count(*) AS n
  FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2),
sym AS (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS w FROM (
    SELECT a, b, n FROM dcounts UNION ALL SELECT b AS a, a AS b, n FROM dcounts) u
  WHERE a <> b GROUP BY 1, 2),
nodes AS (SELECT DISTINCT event_type AS node FROM events)""")

  /** The user-handoff directed census in (a, b, n) vocabulary —
    * g04's x/edge derivation shared textually with g05's
    * symmetrization (one derivation, two kernels).
    */
  private val userHandoffCountCtes: String =
    """x AS (
  SELECT user_id,
    lag(user_id) OVER (
      PARTITION BY CAST(json_extract_string(props, '$.k') AS BIGINT),
                   CAST(ts AS DATE)
      ORDER BY ts, event_id) AS prev_user
  FROM events),
dcounts AS (
  SELECT prev_user AS a, user_id AS b, count(*) AS n
  FROM x WHERE prev_user IS NOT NULL AND prev_user <> user_id
  GROUP BY 1, 2)"""

  private val userHandoffLpaGraphCtes: String =
    userHandoffCountCtes + """,
sym AS (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS w FROM (
    SELECT a, b, n FROM dcounts UNION ALL SELECT b AS a, a AS b, n FROM dcounts) u
  WHERE a <> b GROUP BY 1, 2),
nodes AS (SELECT DISTINCT user_id AS node FROM events)"""

  private val g05OracleSql: String = lpaOracleSql(userHandoffLpaGraphCtes)

  /** g05b: the damped rounds replayed exactly — the same layer text
    * as [[lpaOracleSql]] plus the self-vote leg (node's current
    * community at its max incident edge weight), all integer sums.
    * The Spark kernel is convergence-gated (stop when a round moves
    * nothing, cap [[graft.graph.Graph.LpaMaxRounds]]); this text
    * stays ONE query for every corpus because the kernel is
    * idempotent at a fixpoint (same labels → same votes → same
    * argmax), so it simply unrolls all LpaMaxRounds layers and the
    * post-fixpoint layers are exact no-ops. A corpus still moving at
    * the cap runs the same LpaMaxRounds in both engines.
    */
  private def lpaDampedOracleSql(graphCtes: String): String = {
    val cap = graft.graph.Graph.LpaMaxRounds
    val layer = (k: Int) => {
      val p = s"l${k - 1}"
      s"""sc$k AS (SELECT node, community, sum(s) AS sw FROM (
  SELECT s.a AS node, l.community, s.w AS s
  FROM sym s JOIN $p l ON l.node = s.b
  UNION ALL
  SELECT l.node, l.community, m.sw AS s
  FROM $p l JOIN selfw m ON m.node = l.node) v GROUP BY 1, 2),
b$k AS (SELECT node, community AS nc FROM (
    SELECT node, community, row_number() OVER (PARTITION BY node
      ORDER BY sw DESC, community) AS rn FROM sc$k) t WHERE rn = 1),
l$k AS MATERIALIZED (SELECT l.node, coalesce(b.nc, l.community) AS community
  FROM $p l LEFT JOIN b$k b ON b.node = l.node)"""
    }
    // The label frontier l0..lN is MATERIALIZED: DuckDB 1.0 inlines a
    // plain CTE at every reference site and each layer references its
    // predecessor 3x, so a 30-layer chain would re-expand the whole
    // events scan 3^30 ways (measured at 10 layers: fd exhaustion at
    // sf0.01). Materializing the ≤|nodes|-row frontier keeps the
    // replay linear in both engines — the exact analogue of the Spark
    // side's per-round lineage cut.
    s"""WITH $graphCtes,
selfw AS MATERIALIZED (SELECT a AS node, max(w) AS sw FROM sym GROUP BY 1),
l0 AS MATERIALIZED (SELECT node, node AS community FROM nodes),
${(1 to cap).map(layer).mkString(",\n")}
SELECT node, community FROM l$cap"""
  }

  private val g05bOracleSql: String =
    lpaDampedOracleSql(userHandoffLpaGraphCtes)

  /** g01: q39's edge frame + 10 unrolled damped power-iteration
    * layers, each = dangling-mass scalar + contribution join +
    * left-join re-assembly — operation order identical to the Spark
    * side so the doubles track to ulps (absorbed by round 6).
    */
  /** Shared PageRank replay builder: the 10 damped layers (dangling
    * mass + contribution join + rebuild, exactly the Spark kernel's
    * order of operations) over caller-supplied `edges`
    * (prev_type, next_type, w) and `nodes` (node) CTEs — g01/s28
    * replay the event-type transition graph, g04 the user handoff
    * graph, all three by REFERENCE to this builder (the §14.8
    * shared-CTE discipline: a kernel-oracle change cannot silently
    * diverge between its consumers).
    */
  private def pagerankOracleSql(graphCtes: String, finalSelect: String): String = {
    val update = (k: Int) =>
      s"""(1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
  + CAST(0.85 AS DOUBLE) * (coalesce(c.s, 0.0)
      + (SELECT dang FROM d$k) / (SELECT n FROM nn))"""
    val layer = (k: Int) => {
      val p = s"pr${k - 1}"
      s"""d$k AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM $p
  WHERE node NOT IN (SELECT node FROM srcs)),
c$k AS (SELECT e.next_type AS node, sum(p.pr * e.w) AS s
  FROM $p p JOIN edges e ON e.prev_type = p.node GROUP BY 1),
pr$k AS MATERIALIZED (SELECT n.node,
  ${update(k)} AS pr
  FROM nodes n LEFT JOIN c$k c ON c.node = n.node)"""
    }
    // Quant-gated layers past the documented 10-round budget (r13
    // VERDICT #5): each compares the two previous frontiers at the
    // 6-decimal output contract — where both engines' ulp drift is
    // already absorbed — and freezes (identity) once nothing moved,
    // exactly the Spark kernel's stop decision. Once frozen, every
    // later gate count is zero, so the chain stays frozen and
    // pr<cap> is the frontier the Spark side stopped at.
    val gated = (k: Int) => {
      val p = s"pr${k - 1}"
      s"""ch$k AS (SELECT count(*) AS m FROM $p a JOIN pr${k - 2} b ON b.node = a.node
  WHERE round(a.pr, 6) <> round(b.pr, 6)),
d$k AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM $p
  WHERE node NOT IN (SELECT node FROM srcs)),
c$k AS (SELECT e.next_type AS node, sum(p.pr * e.w) AS s
  FROM $p p JOIN edges e ON e.prev_type = p.node GROUP BY 1),
pr$k AS MATERIALIZED (SELECT n.node,
  CASE WHEN (SELECT m FROM ch$k) = 0 THEN n.pr
  ELSE ${update(k)} END AS pr
  FROM $p n LEFT JOIN c$k c ON c.node = n.node)"""
    }
    val cap = graft.graph.Graph.PrMaxIters
    s"""WITH $graphCtes,
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
srcs AS MATERIALIZED (SELECT DISTINCT prev_type AS node FROM edges),
pr0 AS MATERIALIZED (
  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes),
${(1 to 10).map(layer).mkString(",\n")},
${(11 to cap).map(gated).mkString(",\n")},
prf AS MATERIALIZED (SELECT node, pr FROM pr$cap)
$finalSelect"""
  }

  private val g01OracleSql: String = pagerankOracleSql(
    """x AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
edges AS MATERIALIZED (
  SELECT prev_type, next_type,
    CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY prev_type) AS w
  FROM (SELECT prev_type, event_type AS next_type, count(*) AS n_trans
        FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2)),
nodes AS MATERIALIZED (SELECT DISTINCT event_type AS node FROM events)""",
    """SELECT node, round(pr, 6) AS pr,
  CAST(row_number() OVER (ORDER BY round(pr, 6) DESC, node) AS BIGINT) AS rank
FROM prf""")

  // g04: the user-handoff graph — same kernel layers by reference;
  // edges from consecutive DIFFERENT-user events in each (item, day)
  // activity stream, nodes = every user, final select = top-20 only
  // (the Spark side's TakeOrderedAndProject cut, rank on rounded pr).
  private val g04OracleSql: String = pagerankOracleSql(
    userHandoffCountCtes + """,
edges AS MATERIALIZED (
  SELECT a AS prev_type, b AS next_type,
    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY a) AS w
  FROM dcounts),
nodes AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events)""",
    s"""SELECT user_id, pr, rank FROM (
  SELECT node AS user_id, round(pr, 6) AS pr,
    CAST(row_number() OVER (ORDER BY round(pr, 6) DESC, node) AS BIGINT) AS rank
  FROM prf)
WHERE rank <= ${graft.graph.Graph.TopUsers}""")

  // g06: the triangle census on the user handoff graph — edge
  // derivation shared textually with g04/g05 (userHandoffCountCtes);
  // the oracle enumerates triangles by the order-only two-join
  // (a < b < c): degree orientation changes the Spark PLAN's wedge
  // fan-out, never the triangle set, so the simplest exact
  // enumeration is the right truth here.
  private val g06OracleSql: String =
    s"""WITH $userHandoffCountCtes,
edges AS (SELECT DISTINCT a, b FROM (
    SELECT a, b FROM dcounts UNION ALL SELECT b AS a, a AS b FROM dcounts) u
  WHERE a < b),
nodes AS (SELECT DISTINCT user_id AS node FROM events),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1 JOIN edges e2 ON e2.a = e1.b
       JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
tpn AS (SELECT node, count(*)::BIGINT AS n_triangles FROM (
    SELECT unnest([x, y, z]) AS node FROM tri) t GROUP BY 1),
deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges) u
  GROUP BY 1)
SELECT n.node, coalesce(dg.degree, 0) AS degree,
  coalesce(t.n_triangles, 0) AS n_triangles,
  round(CASE WHEN coalesce(dg.degree, 0) >= 2
    THEN CAST(2 AS DOUBLE) * coalesce(t.n_triangles, 0)
         / (dg.degree * (dg.degree - 1))
    ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
FROM nodes n LEFT JOIN deg dg ON dg.node = n.node
     LEFT JOIN tpn t ON t.node = n.node"""

  // g07/s34: the exact reachability partition over the handoff graph.
  private val g07OracleSql: String =
    s"""WITH RECURSIVE $userHandoffCountCtes,
edges0 AS (SELECT DISTINCT a AS u, b AS v FROM (
    SELECT a, b FROM dcounts UNION ALL SELECT b AS a, a AS b FROM dcounts) t
  WHERE a < b),
bidir AS (SELECT u, v FROM edges0 UNION SELECT v AS u, u AS v FROM edges0),
reach AS (
  SELECT u AS a, v AS b FROM bidir
  UNION
  SELECT r.a, e.v FROM reach r JOIN bidir e ON r.b = e.u WHERE e.v <> r.a),
lab AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
nodes AS (SELECT DISTINCT user_id AS node FROM events)
SELECT n.node, coalesce(l.component, n.node) AS component
FROM nodes n LEFT JOIN lab l ON l.node = n.node"""

  // g08/s35: personalized PageRank — the g04 replay with the uniform
  // teleport swapped for the seed distribution: pr0 = t, per layer
  // (1−d)·t + d·(contrib + dang·t), seeds = top-PprSeeds users by
  // out-handoff volume (ties to the smaller id). Operation order
  // mirrors Graph.pprScores exactly so the doubles track to ulps.
  private val g08OracleSql: String = {
    val update = (k: Int) =>
      s"""(1 - CAST(0.85 AS DOUBLE)) * n.t
  + CAST(0.85 AS DOUBLE) * (coalesce(c.s, 0.0)
      + (SELECT dang FROM d$k) * n.t)"""
    val layer = (k: Int) => {
      val p = s"pr${k - 1}"
      s"""d$k AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM $p
  WHERE node NOT IN (SELECT node FROM srcs)),
c$k AS (SELECT e.next_type AS node, sum(p.pr * e.w) AS s
  FROM $p p JOIN edges e ON e.prev_type = p.node GROUP BY 1),
pr$k AS MATERIALIZED (SELECT n.node,
  ${update(k)} AS pr
  FROM tele n LEFT JOIN c$k c ON c.node = n.node)"""
    }
    // same quant-gated extension as pagerankOracleSql, with the
    // personalized teleport joined back in for the live branch
    val gated = (k: Int) => {
      val p = s"pr${k - 1}"
      s"""ch$k AS (SELECT count(*) AS m FROM $p a JOIN pr${k - 2} b ON b.node = a.node
  WHERE round(a.pr, 6) <> round(b.pr, 6)),
d$k AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM $p
  WHERE node NOT IN (SELECT node FROM srcs)),
c$k AS (SELECT e.next_type AS node, sum(p.pr * e.w) AS s
  FROM $p p JOIN edges e ON e.prev_type = p.node GROUP BY 1),
pr$k AS MATERIALIZED (SELECT n.node,
  CASE WHEN (SELECT m FROM ch$k) = 0 THEN q.pr
  ELSE ${update(k)} END AS pr
  FROM tele n JOIN $p q ON q.node = n.node
  LEFT JOIN c$k c ON c.node = n.node)"""
    }
    val cap = graft.graph.Graph.PprMaxIters
    s"""WITH $userHandoffCountCtes,
edges AS MATERIALIZED (
  SELECT a AS prev_type, b AS next_type,
    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY a) AS w
  FROM dcounts),
nodes AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
seeds AS MATERIALIZED (SELECT node FROM (
  SELECT a AS node, sum(n) AS out_n FROM dcounts GROUP BY 1
  ORDER BY out_n DESC, node LIMIT ${graft.graph.Graph.PprSeeds})),
ns AS MATERIALIZED (SELECT count(*)::DOUBLE AS ns FROM seeds),
tele AS MATERIALIZED (SELECT n.node,
  CASE WHEN s.node IS NOT NULL THEN CAST(1 AS DOUBLE) / (SELECT ns FROM ns)
       ELSE CAST(0 AS DOUBLE) END AS t
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
srcs AS MATERIALIZED (SELECT DISTINCT prev_type AS node FROM edges),
pr0 AS MATERIALIZED (SELECT node, t AS pr FROM tele),
${(1 to 10).map(layer).mkString(",\n")},
${(11 to cap).map(gated).mkString(",\n")},
prf AS MATERIALIZED (SELECT node, pr FROM pr$cap)
SELECT user_id, ppr, rank FROM (
  SELECT node AS user_id, round(pr, 6) AS ppr,
    CAST(row_number() OVER (ORDER BY round(pr, 6) DESC, node) AS BIGINT) AS rank
  FROM prf)
WHERE rank <= ${graft.graph.Graph.TopUsers}"""
  }

  // g09/s36: the peel replay — KcoreRounds unrolled survivor layers
  // (degree within survivors >= KcoreK), then membership + final
  // within-core degree. Same round count as the Spark kernel, so
  // agreement never depends on convergence.
  private val g09OracleSql: String = {
    val K = graft.graph.Graph.KcoreK
    val R = graft.graph.Graph.KcoreRounds
    val layer = (k: Int) => {
      val p = s"s${k - 1}"
      s"""d$k AS MATERIALIZED (SELECT e.u AS node, count(*) AS n FROM bidir e
  JOIN $p x ON x.node = e.u JOIN $p y ON y.node = e.v GROUP BY 1),
s$k AS MATERIALIZED (SELECT node FROM d$k WHERE n >= $K)"""
    }
    s"""WITH $userHandoffCountCtes,
edges0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
    SELECT a, b FROM dcounts UNION ALL SELECT b AS a, a AS b FROM dcounts) t
  WHERE a < b),
bidir AS MATERIALIZED (SELECT a AS u, b AS v FROM edges0
  UNION ALL SELECT b AS u, a AS v FROM edges0),
nodes AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
s0 AS MATERIALIZED (SELECT node FROM nodes),
${(1 to R).map(layer).mkString(",\n")},
fin AS (SELECT e.u AS node, count(*) AS n FROM bidir e
  JOIN s$R x ON x.node = e.u JOIN s$R y ON y.node = e.v GROUP BY 1)
SELECT n.node,
  CAST(CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_core,
  CAST(coalesce(f.n, 0) AS BIGINT) AS core_deg
FROM nodes n LEFT JOIN s$R s ON s.node = n.node
     LEFT JOIN fin f ON f.node = n.node"""
  }

  // g11/s38: the bipartite projection replay — distinct engagement
  // census, hub-capped (user degree <= DMax) pair self-join, UNCAPPED
  // popularity normalizer, top-20 by bipartite cosine.
  private val g11OracleSql: String =
    s"""WITH ui AS MATERIALIZED (
  SELECT DISTINCT user_id,
    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
  FROM events
  WHERE CAST(json_extract_string(props, '$$.k') AS BIGINT) IS NOT NULL),
ud AS MATERIALIZED (SELECT user_id, count(*) AS n_items FROM ui GROUP BY 1),
capped AS MATERIALIZED (SELECT ui.user_id, ui.item FROM ui JOIN ud USING (user_id)
  WHERE ud.n_items <= ${graft.graph.Graph.LinkDMax}),
pop AS MATERIALIZED (SELECT item, count(*)::BIGINT AS n_users FROM ui GROUP BY 1),
pairs AS MATERIALIZED (SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS co_users
  FROM capped a JOIN capped b ON b.user_id = a.user_id
  WHERE a.item < b.item GROUP BY 1, 2),
scored AS (SELECT p.item_a, p.item_b, p.co_users,
  round(CAST(p.co_users AS DOUBLE)
    / sqrt(CAST(pa.n_users AS DOUBLE) * CAST(pb.n_users AS DOUBLE)), 6) AS cosine_sim
  FROM pairs p JOIN pop pa ON pa.item = p.item_a
               JOIN pop pb ON pb.item = p.item_b)
SELECT item_a, item_b, co_users, cosine_sim,
  CAST(row_number() OVER (ORDER BY cosine_sim DESC, item_a, item_b) AS BIGINT) AS rank
FROM scored
ORDER BY cosine_sim DESC, item_a, item_b LIMIT ${graft.graph.Graph.TopLinks}"""

  // g10/s37: hub-capped common-neighbor census (apex degree <= DMax —
  // part of the operator's semantics, mirrored here), anti-join
  // against existing edges, Jaccard on full degrees, top-20.
  private val g10OracleSql: String =
    s"""WITH $userHandoffCountCtes,
edges0 AS MATERIALIZED (SELECT DISTINCT a, b FROM (
    SELECT a, b FROM dcounts UNION ALL SELECT b AS a, a AS b FROM dcounts) t
  WHERE a < b),
bidir AS MATERIALIZED (SELECT a AS u, b AS v FROM edges0
  UNION ALL SELECT b AS u, a AS v FROM edges0),
deg AS MATERIALIZED (SELECT u AS node, count(*)::BIGINT AS degree FROM bidir GROUP BY 1),
apex AS MATERIALIZED (SELECT b.u, b.v FROM bidir b JOIN deg d ON d.node = b.u
  WHERE d.degree <= ${graft.graph.Graph.LinkDMax}),
cand AS MATERIALIZED (SELECT a1.v AS y, a2.v AS z, count(*)::BIGINT AS common_neighbors
  FROM apex a1 JOIN apex a2 ON a2.u = a1.u
  WHERE a1.v < a2.v GROUP BY 1, 2),
fresh AS (SELECT c.y, c.z, c.common_neighbors FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM edges0 e WHERE e.a = c.y AND e.b = c.z)),
scored AS (SELECT f.y AS u, f.z AS v, f.common_neighbors,
  round(CAST(f.common_neighbors AS DOUBLE)
    / CAST(dy.degree + dz.degree - f.common_neighbors AS DOUBLE), 6) AS jaccard
  FROM fresh f JOIN deg dy ON dy.node = f.y JOIN deg dz ON dz.node = f.z)
SELECT u, v, common_neighbors, jaccard,
  CAST(row_number() OVER (ORDER BY jaccard DESC, u, v) AS BIGINT) AS rank
FROM scored
ORDER BY jaccard DESC, u, v LIMIT ${graft.graph.Graph.TopLinks}"""

  private val d42bOracleSql: String = bpeOracleSql(minLen = 2,
    (1 to graft.text.Text.BpeMerges).map(i => s"SELECT * FROM o$i")
      .mkString("\nUNION ALL\n"))

  // d42c: the same replayed merge stack, minLen = 1 (1-char words
  // tokenize too — they never merge, so the RULES are identical), and
  // the final select is the occurrence-weighted token census over the
  // last merged type table.
  private val d42cOracleSql: String = bpeOracleSql(minLen = 1,
    s"""SELECT token, n_occ, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT sym AS token, n_occ,
       |    row_number() OVER (ORDER BY n_occ DESC, sym) AS rank
       |  FROM (SELECT sym, CAST(sum(n) AS BIGINT) AS n_occ FROM
       |    (SELECT unnest(syms) AS sym, n FROM t${graft.text.Text.BpeMerges})
       |    GROUP BY 1))
       |WHERE rank <= 20""".stripMargin)

  private def bpeOracleSql(minLen: Int, finalSelect: String): String = {
    val layer = (k: Int) => {
      val t = s"t${k - 1}"
      s"""p$k AS (SELECT unnest(list_transform(range(1, len(syms)),
         |    i -> {'a': syms[i], 'b': syms[i + 1]})) AS p, n FROM $t),
         |c$k AS (SELECT p.a AS ma, p.b AS mb, CAST(sum(n) AS BIGINT) AS n_pair
         |        FROM p$k GROUP BY 1, 2),
         |b$k AS (SELECT ma, mb, n_pair FROM c$k
         |        ORDER BY n_pair DESC, ma, mb LIMIT 1),
         |q$k AS (SELECT w, n, syms, unnest(range(1, len(syms) + 1)) AS i FROM $t),
         |m$k AS (SELECT q.w, q.i FROM q$k q, b$k b
         |        WHERE q.i < len(q.syms)
         |          AND q.syms[q.i] = b.ma AND q.syms[q.i + 1] = b.mb),
         |isl$k AS (SELECT w, i,
         |    i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp FROM m$k),
         |sel$k AS (SELECT w, i FROM (SELECT w, i,
         |    row_number() OVER (PARTITION BY w, grp ORDER BY i) AS rn FROM isl$k)
         |  WHERE rn % 2 = 1),
         |r$k AS (SELECT q.w, q.n, q.i,
         |    CASE WHEN s.i IS NOT NULL THEN q.syms[q.i] || q.syms[q.i + 1]
         |         ELSE q.syms[q.i] END AS sym,
         |    CASE WHEN x.i IS NOT NULL THEN 0 ELSE 1 END AS keep
         |  FROM q$k q
         |  LEFT JOIN sel$k s ON s.w = q.w AND s.i = q.i
         |  LEFT JOIN sel$k x ON x.w = q.w AND x.i = q.i - 1),
         |t$k AS (SELECT w, any_value(n) AS n, list(sym ORDER BY i) AS syms
         |        FROM r$k WHERE keep = 1 GROUP BY w),
         |o$k AS (SELECT CAST($k AS BIGINT) AS merge_rank, ma AS left_sym,
         |          mb AS right_sym, ma || mb AS merged_sym, n_pair FROM b$k)""".stripMargin
    }
    val k = graft.text.Text.BpeMerges
    s"""WITH w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE length(w) >= $minLen GROUP BY 1),
       |t0 AS (SELECT w, n,
       |  list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)) AS syms
       |  FROM w0),
       |${(1 to k).map(layer).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  /** e23's full NN-descent CTE stack (WITH ... g3) — shared by the
    * e23 oracle and e25's serve oracle, which searches over g3.
    */
  /** The ann signature expression over a double-list column `v` —
    * shared verbatim by the e23 chain and e27's full-corpus CTEs.
    */
  private val annSigExprSql: String =
    """CAST(list_sum(list_transform(range(0, 8), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
      |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
      |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
      |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** The hamming-≤2 multi-probe list over a `bucket` column — shared
    * by the e23 chain and e27's delta probes.
    */
  private val hamming2ProbesSql: String =
    """list_distinct(list_concat(list_concat(
      |      [bucket],
      |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))),
      |      flatten(list_transform(range(0, 7), j -> list_transform(range(j+1, 8), k ->
      |        xor(xor(bucket, CAST(1 AS BIGINT) << j), CAST(1 AS BIGINT) << k))))))""".stripMargin

  /** The corpus-scaled build-budget election, mirrored from
    * [[graft.sim.Sim.graphKOf]]/[[graft.sim.Sim.maxBucketOf]]: both
    * engines elect the tier from the SAME number — the raw
    * `count(*) FROM embeddings` — so K and the stop-bucket cap agree
    * at every SF without a per-SF oracle text.
    */
  private val graphKSql =
    "(SELECT CASE WHEN count(*) <= 1000 THEN 5 ELSE 14 END FROM embeddings)"
  private val bucketCapSql =
    "(SELECT greatest(64, count(*)//32) FROM embeddings)"

  /** The full e23 NN-descent replay (LSH init + 2 rounds, ending in
    * CTE g3) with the corpus WHERE pluggable — "" is e23's full
    * corpus; e27 nests the base-corpus variant as its nightly-artifact
    * CTE. K and the bucket cap are elected from the full-corpus count
    * ([[graphKSql]]/[[bucketCapSql]]) exactly as the Spark side does.
    */
  private def e23GraphCtesFor(where: String): String =
    e23GraphCtesFor(where, graphKSql, bucketCapSql)

  /** The chain with the budget election pluggable — the plain/e27
    * replays elect from the full-corpus count, e30's canonical replay
    * from the distinct-embedding count (exactly what the Spark side's
    * canonN election does).
    */
  private def e23GraphCtesFor(
      where: String, kSql: String, capSql: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings$where),
        |bk AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $annSigExprSql AS bucket FROM e),
        |census AS (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= $capSql),
        |inn AS (SELECT bk.* FROM bk JOIN census USING (bucket)),
        |probes AS (
        |  SELECT vec_id AS node_id, unnest($hamming2ProbesSql) AS bucket
        |  FROM inn),""".stripMargin + "\n" + e23GraphTailFor(kSql)

  private def e23GraphTailFor(graphKSql: String): String =
    s"""cand AS (
        |  SELECT DISTINCT p.node_id, i.vec_id AS neighbor_id
        |  FROM probes p JOIN inn i USING (bucket)
        |  WHERE i.vec_id <> p.node_id),
        |s0 AS (
        |  SELECT c.node_id, c.neighbor_id,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
        |  FROM cand c JOIN bk a ON a.vec_id = c.node_id
        |              JOIN bk b ON b.vec_id = c.neighbor_id),
        |g1 AS (SELECT node_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM s0) WHERE rn <= $graphKSql),
        |r1rev AS (SELECT neighbor_id AS node_id, node_id AS neighbor_id, cosine FROM g1),
        |r1rc AS (SELECT node_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM r1rev) WHERE rn <= $graphKSql),
        |r1b AS (SELECT DISTINCT node_id, neighbor_id FROM (
        |  SELECT node_id, neighbor_id FROM g1 UNION ALL SELECT * FROM r1rc)),
        |r1p AS (SELECT DISTINCT x.neighbor_id AS node_id, y.neighbor_id AS neighbor_id
        |  FROM r1b x JOIN r1b y ON x.node_id = y.node_id
        |    AND x.neighbor_id <> y.neighbor_id),
        |r1e AS (SELECT DISTINCT node_id, neighbor_id FROM (
        |  SELECT * FROM r1p UNION ALL SELECT node_id, neighbor_id FROM g1)),
        |r1s AS (
        |  SELECT c.node_id, c.neighbor_id,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
        |  FROM r1e c JOIN bk a ON a.vec_id = c.node_id
        |              JOIN bk b ON b.vec_id = c.neighbor_id),
        |g2 AS (SELECT node_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM r1s) WHERE rn <= $graphKSql),
        |r2rev AS (SELECT neighbor_id AS node_id, node_id AS neighbor_id, cosine FROM g2),
        |r2rc AS (SELECT node_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM r2rev) WHERE rn <= $graphKSql),
        |r2b AS (SELECT DISTINCT node_id, neighbor_id FROM (
        |  SELECT node_id, neighbor_id FROM g2 UNION ALL SELECT * FROM r2rc)),
        |r2p AS (SELECT DISTINCT x.neighbor_id AS node_id, y.neighbor_id AS neighbor_id
        |  FROM r2b x JOIN r2b y ON x.node_id = y.node_id
        |    AND x.neighbor_id <> y.neighbor_id),
        |r2e AS (SELECT DISTINCT node_id, neighbor_id FROM (
        |  SELECT * FROM r2p UNION ALL SELECT node_id, neighbor_id FROM g2)),
        |r2s AS (
        |  SELECT c.node_id, c.neighbor_id,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
        |  FROM r2e c JOIN bk a ON a.vec_id = c.node_id
        |              JOIN bk b ON b.vec_id = c.neighbor_id),
        |g3 AS (SELECT node_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY node_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM r2s) WHERE rn <= $graphKSql)""".stripMargin

  private val e23GraphCtes: String = e23GraphCtesFor("")

  /** e27 oracle: the nightly base-corpus e23 build nested by reference
    * (g3b wraps the SAME chain text at `vec_id % 20 <> 0` — nested
    * WITH scoping keeps its CTE names local), then the three merge
    * stages replayed: delta seeding over the current capped buckets,
    * reverse attach with REUSED symmetric scores re-ranking only
    * affected base lists, and the one bounded 2-hop local round for
    * delta nodes.
    */
  private val e27MergeCtes: String = {
    val topK = (src: String) =>
      s"""(SELECT node_id, neighbor_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY node_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM $src) WHERE rn <= $graphKSql)""".stripMargin
    s"""WITH g3b AS MATERIALIZED (
${e23GraphCtesFor(" WHERE vec_id % 20 <> 0")}
SELECT node_id, neighbor_id, cosine FROM g3),
ef AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
bkf AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, $annSigExprSql AS bucket FROM ef),
censusf AS (SELECT bucket FROM bkf GROUP BY bucket HAVING count(*) <= $bucketCapSql),
innf AS MATERIALIZED (SELECT bkf.* FROM bkf JOIN censusf USING (bucket)),
probesd AS (
  SELECT vec_id AS node_id, unnest($hamming2ProbesSql) AS bucket
  FROM innf WHERE vec_id % 20 = 0),
candd AS (
  SELECT DISTINCT p.node_id, i.vec_id AS neighbor_id
  FROM probesd p JOIN innf i USING (bucket)
  WHERE i.vec_id <> p.node_id),
seedsc AS (
  SELECT c.node_id, c.neighbor_id,
    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
  FROM candd c JOIN bkf a ON a.vec_id = c.node_id
               JOIN bkf b ON b.vec_id = c.neighbor_id),
seed AS MATERIALIZED ${topK("seedsc")},
rev AS MATERIALIZED (SELECT neighbor_id AS node_id, node_id AS neighbor_id, cosine FROM seed),
revb AS (SELECT * FROM rev WHERE node_id % 20 <> 0),
aff AS (SELECT DISTINCT node_id FROM revb),
repaired AS MATERIALIZED ${topK(
      "(SELECT g.* FROM g3b g JOIN aff USING (node_id) UNION ALL SELECT * FROM revb)")},
kept AS MATERIALIZED (SELECT * FROM g3b WHERE node_id NOT IN (SELECT node_id FROM aff)),
adjd AS (SELECT DISTINCT node_id, neighbor_id FROM (
  SELECT node_id, neighbor_id FROM seed
  UNION ALL SELECT node_id, neighbor_id FROM rev WHERE node_id % 20 = 0)),
ml AS MATERIALIZED (SELECT node_id, neighbor_id FROM kept
  UNION ALL SELECT node_id, neighbor_id FROM repaired
  UNION ALL SELECT node_id, neighbor_id FROM seed),
hop2 AS (SELECT DISTINCT x.node_id, y.neighbor_id
  FROM adjd x JOIN ml y ON y.node_id = x.neighbor_id
  WHERE y.neighbor_id <> x.node_id),
dcand AS (SELECT DISTINCT node_id, neighbor_id FROM (
  SELECT * FROM hop2 UNION ALL SELECT * FROM adjd)),
dsc AS (
  SELECT c.node_id, c.neighbor_id,
    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
  FROM dcand c JOIN bkf a ON a.vec_id = c.node_id
               JOIN bkf b ON b.vec_id = c.neighbor_id),
dl AS ${topK("dsc")},
merged AS MATERIALIZED (
  SELECT *, 'kept' AS src FROM kept
  UNION ALL SELECT *, 'repaired' FROM repaired
  UNION ALL SELECT *, 'delta' FROM dl)"""
  }

  private val e27OracleSql: String = e27MergeCtes + """
SELECT node_id, neighbor_id, cosine,
  CAST(row_number() OVER (PARTITION BY node_id
    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk, src
FROM merged"""

  // e28: the shared beam-walk replay over the merged graph — prefix is
  // e27's merge chain by reference, vectors/entries from the
  // full-corpus tables the merge already defines.
  private val e28OracleSql: String =
    beamServeOracleSql(e27MergeCtes, "merged", "bkf", "ef")

  /** e25 oracle: beam-walk serving replayed over the e23 graph CTEs —
    * fixed hash-elected entry points, then 3 unrolled expand/score/
    * top-beam layers, final top-10.
    */
  /** The beam-walk serving replay with the graph, vector table and
    * entry source pluggable — e25 walks the nightly e23 graph (g3 over
    * bk/e), e28 the e27-merged graph (merged over bkf/ef); entry
    * election, hops, beam and final top-10 are one shared text, the
    * same discipline as the Spark side's beamServeOver.
    */
  /** One unrolled serve layer: expand `prev` through `graphTbl`,
    * score via `vecTbl`, keep the best `keep` per query. Shared by
    * the e25/e28 layer-0 chain and e29's upper-layer descent so every
    * level's SQL is the same text with different width/graph.
    */
  private def beamLayerSql(
      tag: String, k: Int, prev: String, graphTbl: String, vecTbl: String,
      keep: String): String =
    s"""$tag${k}c AS (SELECT DISTINCT query_id, node_id FROM (
       |  SELECT b.query_id, g.neighbor_id AS node_id
       |  FROM $prev b JOIN $graphTbl g ON g.node_id = b.node_id
       |  UNION ALL SELECT query_id, node_id FROM $prev)
       |  WHERE query_id <> node_id),
       |${if (tag == "h") "b" else tag}$k AS (SELECT query_id, node_id, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, node_id) AS rn FROM (
       |    SELECT c.query_id, c.node_id,
       |      list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cosine
       |    FROM $tag${k}c c JOIN $vecTbl nv ON nv.vec_id = c.node_id
       |                  JOIN qq q ON q.query_id = c.query_id))
       |  WHERE rn <= $keep)""".stripMargin

  private def beamServeOracleSql(
      prefixCtes: String, graphTbl: String, vecTbl: String, entSrc: String): String = {
    def beamLayer(k: Int): String =
      beamLayerSql("h", k, if (k == 1) "b0" else s"b${k - 1}",
        graphTbl, vecTbl, "12")
    prefixCtes + ",\n" +
      s"""entries AS (SELECT vec_id AS node_id FROM $entSrc
        |  ORDER BY vec_id % 1000000007 * 888000131 % 1000000007, vec_id LIMIT 8),
        |qq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM $vecTbl WHERE vec_id < 20),
        |b0 AS (SELECT query_id, node_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, node_id) AS rn FROM (
        |    SELECT q.query_id, en.node_id,
        |      list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cosine
        |    FROM qq q CROSS JOIN entries en JOIN $vecTbl nv ON nv.vec_id = en.node_id
        |    WHERE q.query_id <> en.node_id))
        |  WHERE rn <= 12),""".stripMargin + "\n" +
      (1 to 3).map(beamLayer).mkString(",\n") + "\n" +
      """SELECT query_id, node_id AS neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, node_id) AS rn FROM b3)
        |WHERE rn <= 10""".stripMargin
  }

  private val e25ServeOracleSql: String =
    beamServeOracleSql(e23GraphCtes, "g3", "bk", "e")

  // e31: IVF-seeded graph serving — the e23 layer-0 chain (g3) plus
  // the e04 coarse quantizer replayed over the SAME bk frame (hash-
  // elected medoids, nearest-centroid assignment, per-query nprobe
  // probe), entries = top-ServeEntries scored members of the probed
  // inverted lists, then EXACTLY e25's layer-0 beam text. Arithmetic
  // is verbatim from the e04 oracle (d2 = -2·dot + |c|², ties to
  // cid) and the serve oracles (cosine through the same division).
  private val e31OracleSql: String = {
    val g = graft.sim.Sim
    e23GraphCtes + ",\n" +
      s"""cents31 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * ${g.IvfHashMul} % 1000000007, vec_id) - 1 AS cid,
         |    v AS cv
         |  FROM e
         |  ORDER BY vec_id % 1000000007 * ${g.IvfHashMul} % 1000000007, vec_id
         |  LIMIT ${g.IvfK}),
         |cc31 AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents31),
         |asg31 AS (
         |  SELECT vec_id, cid AS centroid_id FROM (
         |    SELECT bk.vec_id, cc.cid,
         |      row_number() OVER (PARTITION BY bk.vec_id
         |        ORDER BY list_dot_product(bk.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
         |    FROM bk CROSS JOIN cc31 cc) t
         |  WHERE rn = 1),
         |qq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM bk WHERE vec_id < 20),
         |probes31 AS (
         |  SELECT query_id, centroid_id FROM (
         |    SELECT q.query_id, cc.cid AS centroid_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_dot_product(q.qv, cc.cv) * -2 + cc.c2, cc.cid) AS rn
         |    FROM qq q CROSS JOIN cc31 cc) t
         |  WHERE rn <= ${g.IvfNprobe}),
         |b0 AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM (
         |    SELECT p.query_id, a.vec_id AS node_id,
         |      list_dot_product(q.qv, b.v) / (q.qn * b.nrm) AS cosine
         |    FROM probes31 p JOIN asg31 a USING (centroid_id)
         |         JOIN bk b ON b.vec_id = a.vec_id
         |         JOIN qq q ON q.query_id = p.query_id
         |    WHERE a.vec_id <> p.query_id))
         |  WHERE rn <= ${g.ServeEntries}),""".stripMargin + "\n" +
      (1 to g.ServeHops).map(k => beamLayerSql("h", k,
        if (k == 1) "b0" else s"b${k - 1}", "g3", "bk", g.ServeBeam.toString))
        .mkString(",\n") + "\n" +
      s"""SELECT query_id, node_id AS neighbor_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM b${g.ServeHops})
         |WHERE rn <= 10""".stripMargin
  }

  // e29: the two-level HNSW serve — e23's layer-0 chain (g3), the
  // upper-layer election + capped-bucket probe build (gu), the
  // greedy descent (u0 -> u2, keep 8), then EXACTLY e25's layer-0
  // beam text seeded from the descent result (u2 aliased as b0).
  private val e29OracleSql: String = {
    val g = graft.sim.Sim
    val perm = "vec_id % 1000000007 * 888000131 % 1000000007"
    // corpus-scaled descent budget, mirrored from Sim.upperEntriesOf /
    // Sim.upperKeepOf / the upper build's maxBucketOf(n/UpperEvery) —
    // elected from the same raw count(*) the K staircase uses
    val upperCapSql = "(SELECT greatest(64, count(*)//256) FROM embeddings)"
    val uEntSql = "(SELECT CASE WHEN count(*) <= 1000 THEN 2 ELSE 4 END FROM embeddings)"
    val uKeepSql = "(SELECT CASE WHEN count(*) <= 1000 THEN 8 ELSE 16 END FROM embeddings)"
    e23GraphCtes + ",\n" +
      s"""upper AS (SELECT * FROM bk WHERE $perm % ${g.UpperEvery} = 0),
         |ucensus AS (SELECT bucket FROM upper GROUP BY bucket HAVING count(*) <= $upperCapSql),
         |uin AS (SELECT upper.* FROM upper JOIN ucensus USING (bucket)),
         |uprobes AS (
         |  SELECT vec_id AS node_id, unnest($hamming2ProbesSql) AS bucket
         |  FROM uin),
         |ucand AS (
         |  SELECT DISTINCT p.node_id, i.vec_id AS neighbor_id
         |  FROM uprobes p JOIN uin i USING (bucket)
         |  WHERE i.vec_id <> p.node_id),
         |uscore AS (
         |  SELECT c.node_id, c.neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
         |  FROM ucand c JOIN upper a ON a.vec_id = c.node_id
         |               JOIN upper b ON b.vec_id = c.neighbor_id),
         |gu AS (SELECT node_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY node_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM uscore)
         |  WHERE rn <= ${g.UpperK}),
         |qq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM bk WHERE vec_id < 20),
         |uent AS (SELECT node_id FROM (
         |  SELECT vec_id AS node_id, row_number() OVER (ORDER BY $perm, vec_id) AS rn
         |  FROM upper) WHERE rn <= $uEntSql),
         |u0 AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM (
         |    SELECT q.query_id, en.node_id,
         |      list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cosine
         |    FROM qq q CROSS JOIN uent en JOIN bk nv ON nv.vec_id = en.node_id
         |    WHERE q.query_id <> en.node_id))
         |  WHERE rn <= $uKeepSql),""".stripMargin + "\n" +
      (1 to g.UpperHops).map(k => beamLayerSql("u", k,
        s"u${k - 1}", "gu", "bk", uKeepSql)).mkString(",\n") + ",\n" +
      // the equal-budget cut: whatever the descent explored, layer 0
      // starts from exactly ServeEntries scored rows per query
      s"""b0 AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM u${g.UpperHops})
         |  WHERE rn <= ${g.ServeEntries}),""".stripMargin + "\n" +
      (1 to g.ServeHops).map(k => beamLayerSql("h", k,
        if (k == 1) "b0" else s"b${k - 1}", "g3", "bk", g.ServeBeam.toString))
        .mkString(",\n") + "\n" +
      s"""SELECT query_id, node_id AS neighbor_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM b${g.ServeHops})
         |WHERE rn <= 10""".stripMargin
  }

  /** e30: the full canonical replay — canonicalize by the raw vector,
    * run the e23 chain + upper build over CANONICAL vectors only
    * (budget elected from the distinct-embedding count), serve with
    * SELF-ALLOWED hops, expand result ids through the duplicate map.
    */
  private val e30OracleSql: String = {
    val g = graft.sim.Sim
    val perm = "vec_id % 1000000007 * 888000131 % 1000000007"
    val canonSrc = "(SELECT DISTINCT embedding FROM embeddings) t"
    val kSql = s"(SELECT CASE WHEN count(*) <= 1000 THEN 5 ELSE 14 END FROM $canonSrc)"
    val capSql = s"(SELECT greatest(64, count(*)//32) FROM $canonSrc)"
    val uCapSql = s"(SELECT greatest(64, count(*)//256) FROM $canonSrc)"
    val uEntSql = s"(SELECT CASE WHEN count(*) <= 1000 THEN 2 ELSE 4 END FROM $canonSrc)"
    val uKeepSql = s"(SELECT CASE WHEN count(*) <= 1000 THEN 8 ELSE 16 END FROM $canonSrc)"
    // the self-ALLOWED serve layer (vs beamLayerSql's query<>node cut)
    def layer(tag: String, k: Int, prev: String, graphTbl: String,
        keep: String): String =
      s"""$tag${k}c AS (SELECT DISTINCT query_id, node_id FROM (
         |  SELECT b.query_id, g.neighbor_id AS node_id
         |  FROM $prev b JOIN $graphTbl g ON g.node_id = b.node_id
         |  UNION ALL SELECT query_id, node_id FROM $prev)),
         |${if (tag == "h") "b" else tag}$k AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM (
         |    SELECT c.query_id, c.node_id,
         |      list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cosine
         |    FROM $tag${k}c c JOIN bk nv ON nv.vec_id = c.node_id
         |                  JOIN qq q ON q.query_id = c.query_id))
         |  WHERE rn <= $keep)""".stripMargin
    e23GraphCtesFor(
      " WHERE vec_id IN (SELECT min(vec_id) FROM embeddings GROUP BY embedding)",
      kSql, capSql) + ",\n" +
      s"""cm AS (SELECT vec_id, min(vec_id) OVER (PARTITION BY embedding) AS canon_id
         |  FROM embeddings),
         |upper AS (SELECT * FROM bk WHERE $perm % ${g.UpperEvery} = 0),
         |ucensus AS (SELECT bucket FROM upper GROUP BY bucket HAVING count(*) <= $uCapSql),
         |uin AS (SELECT upper.* FROM upper JOIN ucensus USING (bucket)),
         |uprobes AS (
         |  SELECT vec_id AS node_id, unnest($hamming2ProbesSql) AS bucket
         |  FROM uin),
         |ucand AS (
         |  SELECT DISTINCT p.node_id, i.vec_id AS neighbor_id
         |  FROM uprobes p JOIN uin i USING (bucket)
         |  WHERE i.vec_id <> p.node_id),
         |uscore AS (
         |  SELECT c.node_id, c.neighbor_id,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
         |  FROM ucand c JOIN upper a ON a.vec_id = c.node_id
         |               JOIN upper b ON b.vec_id = c.neighbor_id),
         |gu AS (SELECT node_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY node_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM uscore)
         |  WHERE rn <= ${g.UpperK}),
         |qf AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id < 20),
         |qq AS (SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
         |  FROM qf WHERE sqrt(list_dot_product(v, v)) > 0),
         |uent AS (SELECT node_id FROM (
         |  SELECT vec_id AS node_id, row_number() OVER (ORDER BY $perm, vec_id) AS rn
         |  FROM upper) WHERE rn <= $uEntSql),
         |u0cand AS (
         |  SELECT q.query_id, en.node_id FROM qq q CROSS JOIN uent en
         |  UNION
         |  SELECT m.vec_id AS query_id, m.canon_id AS node_id FROM cm m
         |  WHERE m.vec_id IN (SELECT query_id FROM qq)),
         |u0 AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM (
         |    SELECT c.query_id, c.node_id,
         |      list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cosine
         |    FROM u0cand c JOIN bk nv ON nv.vec_id = c.node_id
         |                  JOIN qq q ON q.query_id = c.query_id))
         |  WHERE rn <= $uKeepSql),""".stripMargin + "\n" +
      (1 to g.UpperHops).map(k => layer("u", k,
        s"u${k - 1}", "gu", uKeepSql)).mkString(",\n") + ",\n" +
      s"""b0 AS (SELECT query_id, node_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, node_id) AS rn FROM u${g.UpperHops})
         |  WHERE rn <= ${g.ServeEntries}),""".stripMargin + "\n" +
      (1 to g.ServeHops).map(k => layer("h", k,
        if (k == 1) "b0" else s"b${k - 1}", "g3", g.ServeBeam.toString))
        .mkString(",\n") + ",\n" +
      s"""expd AS (SELECT b.query_id, m.vec_id AS neighbor_id, b.cosine
         |  FROM b${g.ServeHops} b JOIN cm m ON m.canon_id = b.node_id
         |  WHERE m.vec_id <> b.query_id)
         |SELECT query_id, neighbor_id, cosine FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rn FROM expd)
         |WHERE rn <= 10""".stripMargin
  }

  private val annLshOracleSql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |bk AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, CAST(list_sum(list_transform(range(0, 8), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
      |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
      |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
      |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS bucket FROM e),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM bk WHERE vec_id < 20),
      |probes AS (
      |  SELECT query_id, qv, qn, unnest(list_distinct(list_concat(list_concat(
      |      [bucket],
      |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))),
      |      flatten(list_transform(range(0, 7), j -> list_transform(range(j+1, 8), k ->
      |        xor(xor(bucket, CAST(1 AS BIGINT) << j), CAST(1 AS BIGINT) << k))))))) AS bucket
      |  FROM q),
      |cand AS (
      |  SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id,
      |    list_dot_product(p.qv, b.v) / (p.qn * b.nrm) AS cosine
      |  FROM probes p JOIN bk b USING (bucket)
      |  WHERE b.vec_id <> p.query_id)
      |SELECT query_id, neighbor_id, cosine FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS rn FROM cand) t
      |WHERE rn <= 10""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | sum(l_extendedprice) AS sum_base_price,
        | sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        | sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
        | avg(l_quantity) AS avg_qty,
        | avg(l_extendedprice) AS avg_price,
        | avg(l_discount) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 10.0""".stripMargin,
    "q03_revenue_topn" ->
      """SELECT l_orderkey, o_orderdate,
        | sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49.0)
        |GROUP BY 1""".stripMargin,
    "q05_local_supplier" ->
      """SELECT n_name, sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q06_forecast_filter" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,
    "q07_window_topn" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "q08_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend
        |FROM orders""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY 1""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q12_case_agg" ->
      """SELECT l_returnflag,
        | count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        | count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q13_outer_join_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1) t
        |GROUP BY 1""".stripMargin,
    "q14_expr_pct" ->
      """SELECT 100.0 * sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |  / sum(l_extendedprice * (1.0 - l_discount)) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    // exact DECIMAL revenue (q28's multiply-through rule): the
    // max-equality filter is order-independent at any scale; cast to
    // double only on emit
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev_exact AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_exact = (SELECT max(rev_exact) FROM revenue)""".stripMargin,
    "q19_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q20_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_extendedprice) AS sum_price, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))""".stripMargin,
    "q21_intersect" ->
      """SELECT l_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT l_suppkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'""".stripMargin,
    "q22_except" ->
      """SELECT l_partkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
        |EXCEPT
        |SELECT l_partkey FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-02-01' AND l_shipdate < TIMESTAMP '1996-03-01'""".stripMargin,
    // m09: the two-scene clip geometry, luminance sums, lag diffs and
    // the cut census regenerated entirely from the synthesis formulas —
    // a codec, sampler, or detector bug breaks the hash.
    "m09_scene_change" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |geo AS (SELECT id, 6 + id % 7 AS nf,
        |          CASE WHEN id % 4 = 0 THEN 2147483647 ELSE 2 + id % 3 END AS cut
        |        FROM ids),
        |fr AS (SELECT id, nf, cut,
        |         unnest(range(0, (nf + 2) // 3)) * 3 AS f
        |       FROM geo),
        |px AS (SELECT id, nf, cut, f, unnest(range(0, 48)) AS p FROM fr),
        |lum AS (SELECT id, nf, cut, f,
        |  sum(299 * ((id*5 + p*7) % 120 + (f % 2) + CASE WHEN f >= cut THEN 128 ELSE 0 END)
        |    + 587 * ((id*9 + p*5) % 120 + (f % 2) + CASE WHEN f >= cut THEN 128 ELSE 0 END)
        |    + 114 * ((id*3 + p*13) % 120 + (f % 2) + CASE WHEN f >= cut THEN 128 ELSE 0 END)) AS ls
        |  FROM px GROUP BY 1, 2, 3, 4),
        |d AS (SELECT id, nf, f, ls,
        |        lag(ls) OVER (PARTITION BY id ORDER BY f) AS prev
        |      FROM lum),
        |c AS (SELECT id, nf, f,
        |        CASE WHEN prev IS NOT NULL AND abs(ls - prev) > 3072000
        |             THEN 1 ELSE 0 END AS is_cut
        |      FROM d)
        |SELECT id AS doc_id, CAST(max(nf) AS BIGINT) AS n_frames,
        |  count(*) AS n_sampled, CAST(sum(is_cut) AS BIGINT) AS n_cuts,
        |  CAST(coalesce(min(CASE WHEN is_cut = 1 THEN f END), -1) AS BIGINT)
        |    AS first_cut_frame
        |FROM c GROUP BY 1""".stripMargin,
    // w22: both snapshots' censuses from metadata only — file counts
    // follow the repartition layout, but an empty round-robin partition
    // writes NO file, so the expected counts are least(n_rows, 4) and
    // least(n_filtered, 2), not the literal partition counts (a corpus
    // with < 4 rows would otherwise break the pin).
    "w22_metadata_tables" ->
      """SELECT CAST(1 AS BIGINT) AS snapshot,
        |  CAST(least(count(*), 4) AS BIGINT) AS n_files,
        |  count(*) AS n_rows FROM documents
        |UNION ALL
        |SELECT CAST(2 AS BIGINT),
        |  (SELECT CAST(least(count(*), 4) AS BIGINT) FROM documents)
        |    + (SELECT CAST(least(count(*), 2) AS BIGINT)
        |       FROM documents WHERE doc_id % 3 = 0),
        |  count(*) + (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)
        |FROM documents""".stripMargin,
    // f02: per-dim moment aggregates and the variance identity replayed
    // over the zipped unnest.
    "f02_variance_select" ->
      """WITH e AS (SELECT unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |m AS (SELECT dim, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        |      FROM e GROUP BY 1)
        |SELECT dim, variance, rnk FROM (
        |  SELECT dim, (sxx - sx * sx / n) / n AS variance,
        |    row_number() OVER (ORDER BY (sxx - sx * sx / n) / n DESC, dim) AS rnk
        |  FROM m)
        |WHERE rnk <= 10""".stripMargin,
    // d41: weak labels, Laplace class counts, cross-multiplied NB votes
    // and the confusion census replayed in exact integer SQL.
    "d41_quality_votes" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, toks, len(toks)::BIGINT AS n_toks,
        |    len(list_filter(toks,
        |      x -> x IN ('spark', 'query', 'table', 'join')))::BIGINT AS n_jargon
        |  FROM t),
        |w AS (SELECT doc_id, unnest(toks) AS token,
        |        (20 * n_jargon >= 3 * n_toks AND n_toks >= 20) AS weak_good
        |      FROM d),
        |vocab AS (
        |  SELECT token,
        |    count(*) FILTER (WHERE weak_good) AS c_good,
        |    count(*) FILTER (WHERE NOT weak_good) AS c_bad
        |  FROM w WHERE doc_id % 2 = 0 GROUP BY 1),
        |tot AS (SELECT coalesce(sum(c_good), 0) AS n_good,
        |          coalesce(sum(c_bad), 0) AS n_bad, count(*) AS v FROM vocab),
        |votes AS (
        |  SELECT w.doc_id, w.weak_good,
        |    CAST(sum(
        |      length(bin(((coalesce(c_good, 0) + 1) * (SELECT n_bad + v FROM tot))::BIGINT))
        |      - length(bin(((coalesce(c_bad, 0) + 1) * (SELECT n_good + v FROM tot))::BIGINT))
        |    ) AS BIGINT) AS score
        |  FROM w LEFT JOIN vocab USING (token)
        |  WHERE w.doc_id % 2 = 1 GROUP BY 1, 2)
        |SELECT weak_good, score > 0 AS pred_good,
        |  count(*) AS n_docs, CAST(sum(score) AS BIGINT) AS sum_score
        |FROM votes GROUP BY 1, 2""".stripMargin,
    // w23: live = manifests 1+2 (repartition layouts, least()-guarded
    // like w22); orphans = the crashed snapshot-3 parts + the stray
    // _tmp_ upload; the post-sweep read serves snapshot 2.
    "w23_orphan_cleanup" ->
      """SELECT 'n_live_files' AS metric,
        |  (SELECT CAST(least(count(*), 3) AS BIGINT) FROM documents)
        |    + (SELECT CAST(least(count(*), 2) AS BIGINT)
        |       FROM documents WHERE doc_id % 3 = 0) AS n
        |UNION ALL
        |SELECT 'n_orphans_removed',
        |  (SELECT CAST(least(count(*), 2) AS BIGINT)
        |   FROM documents WHERE doc_id % 5 = 0) + 1
        |UNION ALL
        |SELECT 'n_rows_after',
        |  (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)""".stripMargin,
    // w24: the shallow clone serves the source's files at clone time,
    // then diverges — source census = full corpus, clone = the rewrite.
    "w24_shallow_clone" ->
      """SELECT 'source' AS table_ref, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
        |UNION ALL
        |SELECT 'clone' AS table_ref, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,
    // d42: every word occurrence emits its adjacent char pairs; exact
    // corpus-wide counts, top 20, ties broken on the pair string.
    "d42_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |pos AS (
        |  SELECT w, unnest(range(1, length(w))) AS i
        |  FROM words WHERE length(w) >= 2),
        |agg AS (
        |  SELECT substr(w, i, 2) AS pair, count(*) AS n_pair
        |  FROM pos GROUP BY 1)
        |SELECT pair, n_pair,
        |  CAST(row_number() OVER (ORDER BY n_pair DESC, pair) AS BIGINT) AS rank
        |FROM agg QUALIFY rank <= 20""".stripMargin,
    // d42b: the full 5-merge BPE loop — census/argmax/merge layers
    // replayed with the independent gaps-and-islands merge formulation.
    "d42b_bpe_train" -> d42bOracleSql,
    "d42c_bpe_tokenize" -> d42cOracleSql,
    // d43: per-lang counts, the p^0.7 temperature rule, same operation
    // order as the Spark projection (floats are outputs, never ranks).
    "d43_temperature_mix" ->
      """WITH l AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
        |        sum(pow(n_docs, 0.7)) AS z FROM l)
        |SELECT lang, n_docs,
        |  n_docs / total AS p_raw,
        |  pow(n_docs, 0.7) / z AS p_temp,
        |  pow(n_docs, 0.7) / z * total / n_docs AS boost
        |FROM l, t""".stripMargin,
    // s26 maintains d43's weight table live; one AvailableNow pass over
    // the staged corpus must equal the batch projection exactly.
    "s26_stream_temperature_mix" ->
      """WITH l AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total,
        |        sum(pow(n_docs, 0.7)) AS z FROM l)
        |SELECT lang, n_docs,
        |  n_docs / total AS p_raw,
        |  pow(n_docs, 0.7) / z AS p_temp,
        |  pow(n_docs, 0.7) / z * total / n_docs AS boost
        |FROM l, t""".stripMargin,
    // f08: the f02 variance ranking replayed per corpus half, joined,
    // swept over k — integer overlap counts plus the Jaccard ratio.
    "f08_selection_stability" ->
      """WITH e AS (SELECT vec_id, unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |ma AS (SELECT dim, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        |       FROM e WHERE vec_id % 2 = 0 GROUP BY 1),
        |mb AS (SELECT dim, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        |       FROM e WHERE vec_id % 2 = 1 GROUP BY 1),
        |va AS (SELECT dim, row_number() OVER (
        |         ORDER BY (sxx - sx * sx / n) / n DESC, dim) AS rnk_a FROM ma),
        |vb AS (SELECT dim, row_number() OVER (
        |         ORDER BY (sxx - sx * sx / n) / n DESC, dim) AS rnk_b FROM mb),
        |j AS (SELECT va.dim, rnk_a, rnk_b FROM va JOIN vb USING (dim)),
        |ks AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS k)
        |SELECT k,
        |  CAST(count(*) FILTER (WHERE rnk_a <= k AND rnk_b <= k) AS BIGINT) AS n_common,
        |  count(*) FILTER (WHERE rnk_a <= k AND rnk_b <= k)
        |    / (2.0 * k - count(*) FILTER (WHERE rnk_a <= k AND rnk_b <= k)) AS jaccard
        |FROM ks CROSS JOIN j GROUP BY k""".stripMargin,
    // q46: exact counts, total-order tie-break (count desc, mode asc) —
    // engine-independent mode, unlike SQL mode()'s arbitrary ties.
    "q46_group_mode" ->
      """WITH c AS (
        |  SELECT o_orderpriority, l_returnflag, count(*) AS n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderpriority, l_returnflag, n,
        |    sum(n) OVER (PARTITION BY o_orderpriority) AS n_group,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY n DESC, l_returnflag) AS rnk
        |  FROM c)
        |SELECT o_orderpriority, l_returnflag AS mode_returnflag,
        |  n AS n_mode, n / CAST(n_group AS DOUBLE) AS mode_share
        |FROM r WHERE rnk = 1""".stripMargin,
    // s27 maintains q46's census live; one AvailableNow pass over the
    // staged stream must elect exactly the batch modes.
    "s27_stream_group_mode" ->
      """WITH c AS (
        |  SELECT o_orderpriority, l_returnflag, count(*) AS n
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT o_orderpriority, l_returnflag, n,
        |    sum(n) OVER (PARTITION BY o_orderpriority) AS n_group,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY n DESC, l_returnflag) AS rnk
        |  FROM c)
        |SELECT o_orderpriority, l_returnflag AS mode_returnflag,
        |  n AS n_mode, n / CAST(n_group AS DOUBLE) AS mode_share
        |FROM r WHERE rnk = 1""".stripMargin,
    // w25: the append then the rewrite, reported as pure file-count set
    // differences — least()-guarded like w22/w23.
    "w25_manifest_diff" ->
      """WITH c AS (SELECT
        |  (SELECT CAST(least(count(*), 3) AS BIGINT)
        |   FROM documents WHERE doc_id % 3 <> 0) AS m1,
        |  (SELECT CAST(least(count(*), 2) AS BIGINT)
        |   FROM documents WHERE doc_id % 3 = 0) AS extra,
        |  (SELECT CAST(least(count(*), 1) AS BIGINT)
        |   FROM documents WHERE doc_id % 5 = 0) AS m3)
        |SELECT '1_to_2' AS step, extra AS n_added,
        |  CAST(0 AS BIGINT) AS n_removed, m1 AS n_kept FROM c
        |UNION ALL
        |SELECT '2_to_3', m3, m1 + extra, CAST(0 AS BIGINT) FROM c""".stripMargin,
    // d45: shingle first-seen deciles — the same trigram + poly hash
    // the d06 oracle uses, decile bounds from the 1-row min/max agg.
    "d45_novelty_curve" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |       FROM d WHERE len(toks) >= 3),
        |b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |g AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |h AS (SELECT (doc_id - lo) * 10 // (hi - lo + 1) AS decile,
        |        list_reduce(list_prepend(CAST(17 AS BIGINT),
        |          list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |          (b, c) -> (b * 31 + c) % 1000000007) AS hv
        |      FROM g, b),
        |g1 AS (SELECT hv, decile, count(*) AS n FROM h GROUP BY 1, 2),
        |occ AS (SELECT decile, CAST(sum(n) AS BIGINT) AS n_occurrences,
        |          count(*) AS n_distinct FROM g1 GROUP BY 1),
        |nov AS (SELECT decile, count(*) AS n_novel FROM (
        |          SELECT hv, min(decile) AS decile FROM g1 GROUP BY 1)
        |        GROUP BY 1)
        |SELECT occ.decile, n_occurrences, n_distinct,
        |  coalesce(n_novel, 0) AS n_novel
        |FROM occ LEFT JOIN nov ON occ.decile = nov.decile""".stripMargin,
    // f09: average ranks via rank + (ties-1)/2 (exact halves), the
    // Mann-Whitney U identity, |AUC - 0.5| ranking replayed.
    "f09_auc_select" ->
      """WITH e AS (SELECT label::BIGINT = 0 AS y, unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |r AS (SELECT dim, y,
        |        rank() OVER (PARTITION BY dim ORDER BY x)
        |          + (count(*) OVER (PARTITION BY dim, x) - 1) / 2.0 AS ar
        |      FROM e),
        |a AS (SELECT dim,
        |        sum(CASE WHEN y THEN ar ELSE 0 END) AS rsum,
        |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS n1,
        |        count(*) AS n
        |      FROM r GROUP BY 1)
        |SELECT dim, auc, rnk FROM (
        |  SELECT dim,
        |    (rsum - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)) AS auc,
        |    CAST(row_number() OVER (
        |      ORDER BY abs((rsum - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)) - 0.5) DESC,
        |        dim) AS BIGINT) AS rnk
        |  -- single-class guard mirrored from the Spark plan
        |  FROM (SELECT * FROM a WHERE n1 > 0 AND n - n1 > 0) a)
        |WHERE rnk <= 10""".stripMargin,
    // f09b: the binned twin replayed — the same milli-quantized
    // equi-width buckets (f05's integer convention), 2·U₁ in exact
    // integers from cumulative negative counts, one double division.
    "f09b_auc_binned" ->
      """WITH e AS (SELECT CAST(label::BIGINT = 0 AS BIGINT) AS y,
        |             unnest(range(0, 64)) AS dim,
        |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS xm
        |           FROM embeddings),
        |b AS (SELECT dim, min(xm) AS lo, max(xm) AS hi FROM e GROUP BY 1),
        |bk AS (SELECT e.dim,
        |         greatest(0, least(63, (xm - lo) * 64 // (hi - lo + 1))) AS bucket,
        |         CAST(sum(y) AS BIGINT) AS n1b,
        |         CAST(sum(1 - y) AS BIGINT) AS n0b
        |       FROM e JOIN b ON e.dim = b.dim GROUP BY 1, 2),
        |c AS (SELECT dim, n1b, n0b,
        |        CAST(coalesce(sum(n0b) OVER (PARTITION BY dim ORDER BY bucket
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c0
        |      FROM bk),
        |a AS (SELECT dim, CAST(sum(n1b * (2 * c0 + n0b)) AS BIGINT) AS num2,
        |        CAST(sum(n1b) AS BIGINT) AS n1, CAST(sum(n0b) AS BIGINT) AS n0
        |      FROM c GROUP BY 1)
        |SELECT dim, auc, rnk FROM (
        |  SELECT dim, num2 / (2.0 * n1 * n0) AS auc,
        |    CAST(row_number() OVER (
        |      ORDER BY abs(num2 / (2.0 * n1 * n0) - 0.5) DESC, dim) AS BIGINT) AS rnk
        |  -- single-class guard mirrored from the Spark plan
        |  FROM (SELECT * FROM a WHERE n1 > 0 AND n0 > 0) a)
        |WHERE rnk <= 10""".stripMargin,
    // f06: the same (dim, class) moment sums and F identity replayed.
    "f06_anova_f" ->
      """WITH e AS (SELECT label::BIGINT AS lbl, unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |g AS (SELECT dim, lbl, count(*)::DOUBLE AS n, sum(x) AS sx,
        |        sum(x * x) AS sxx
        |      FROM e GROUP BY 1, 2),
        |d AS (SELECT dim, count(*)::DOUBLE AS k, sum(n) AS nn, sum(sx) AS s,
        |        sum(sx * sx / n) AS sb, sum(sxx) AS q
        |      FROM g GROUP BY 1)
        |SELECT dim, f_stat, rnk FROM (
        |  SELECT dim,
        |    ((sb - s * s / nn) / (k - 1)) / ((q - sb) / (nn - k)) AS f_stat,
        |    row_number() OVER (ORDER BY
        |      ((sb - s * s / nn) / (k - 1)) / ((q - sb) / (nn - k)) DESC, dim) AS rnk
        |  FROM d)
        |WHERE rnk <= 10""".stripMargin,
    // f07: sign-binarized mutual information from exact integer counts.
    "f07_info_gain" ->
      """WITH e AS (SELECT label::BIGINT AS lbl, unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |c AS (SELECT dim, (x > 0)::BIGINT AS bit, lbl, count(*)::DOUBLE AS nbl
        |      FROM e GROUP BY 1, 2, 3),
        |t AS (SELECT dim, nbl,
        |        sum(nbl) OVER (PARTITION BY dim) AS nn,
        |        sum(nbl) OVER (PARTITION BY dim, bit) AS nb,
        |        sum(nbl) OVER (PARTITION BY dim, lbl) AS ny
        |      FROM c),
        |ig AS (SELECT dim,
        |         sum((nbl / nn) * (ln(nbl * nn / (nb * ny)) / ln(2))) AS info_gain
        |       FROM t GROUP BY 1)
        |SELECT dim, info_gain, rnk FROM (
        |  SELECT dim, info_gain,
        |    row_number() OVER (ORDER BY info_gain DESC, dim) AS rnk FROM ig)
        |WHERE rnk <= 10""".stripMargin,
    // Branch isolation baked into the census: after the staging-only
    // commit, main still serves the full corpus and staging serves the
    // filtered snapshot 2.
    "w21_table_branches" ->
      """SELECT 'main' AS ref, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
        |UNION ALL
        |SELECT 'staging' AS ref, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,
    // m10: the span structure, frame flags and gaps-and-islands census
    // regenerated at formula level — the energy detector recovers the
    // spans exactly, so codec-level Spark must hash-match.
    "m10_audio_segmentation" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |g AS (SELECT id, 10 + 2 * (id % 5) AS nframes FROM ids),
        |f AS (SELECT id, nframes, unnest(range(0, nframes)) AS fr FROM g),
        |v AS (SELECT id, nframes, fr,
        |        CASE WHEN (id + fr // 2) % 3 <> 0 THEN 1 ELSE 0 END AS voiced
        |      FROM f),
        |seg AS (SELECT id, fr,
        |          fr - row_number() OVER (PARTITION BY id ORDER BY fr) AS grp
        |        FROM v WHERE voiced = 1),
        |runs AS (SELECT id, count(*) AS run_len FROM seg GROUP BY id, grp),
        |rs AS (SELECT id, count(*) AS n_segments, max(run_len) AS longest
        |       FROM runs GROUP BY 1)
        |SELECT v.id AS doc_id, CAST(max(v.nframes) AS BIGINT) AS n_frames,
        |  CAST(sum(v.voiced) AS BIGINT) AS n_voiced,
        |  CAST(coalesce(max(rs.n_segments), 0) AS BIGINT) AS n_segments,
        |  CAST(coalesce(max(rs.longest), 0) AS BIGINT) AS longest_voiced
        |FROM v LEFT JOIN rs ON v.id = rs.id
        |GROUP BY v.id""".stripMargin,
    // s22 enriches the stream against the batch-built dimension; one
    // AvailableNow pass equals batch q42, so it shares the oracle.
    "s22_stream_scd2" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) + 1 AS t3
        |           FROM events),
        |d AS (SELECT et.event_type, CAST(v.k AS BIGINT) AS k,
        |        t0 + (t3 - t0) * v.k // 3 AS valid_from,
        |        t0 + (t3 - t0) * (v.k + 1) // 3 AS valid_to,
        |        CAST(length(et.event_type) + v.k AS BIGINT) AS mult
        |      FROM (SELECT DISTINCT event_type FROM events) et,
        |           (VALUES (0), (1), (2)) v(k), b),
        |j AS (SELECT e.event_type, d.k AS version,
        |        CAST(round(e.value * 1000) AS BIGINT) * d.mult AS vm
        |      FROM events e JOIN d ON e.event_type = d.event_type
        |        AND epoch_us(e.ts) >= d.valid_from AND epoch_us(e.ts) < d.valid_to)
        |SELECT event_type, version, count(*) AS n_events,
        |  CAST(sum(vm) AS BIGINT) AS sum_vmil
        |FROM j GROUP BY 1, 2""".stripMargin,
    // SCD-2: the deterministic versioned dimension rebuilt in SQL and
    // the as-of validity join replayed; value sums exact milli-integers.
    "q42_scd2_join" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) + 1 AS t3
        |           FROM events),
        |d AS (SELECT et.event_type, CAST(v.k AS BIGINT) AS k,
        |        t0 + (t3 - t0) * v.k // 3 AS valid_from,
        |        t0 + (t3 - t0) * (v.k + 1) // 3 AS valid_to,
        |        CAST(length(et.event_type) + v.k AS BIGINT) AS mult
        |      FROM (SELECT DISTINCT event_type FROM events) et,
        |           (VALUES (0), (1), (2)) v(k), b),
        |j AS (SELECT e.event_type, d.k AS version,
        |        CAST(round(e.value * 1000) AS BIGINT) * d.mult AS vm
        |      FROM events e JOIN d ON e.event_type = d.event_type
        |        AND epoch_us(e.ts) >= d.valid_from AND epoch_us(e.ts) < d.valid_to)
        |SELECT event_type, version, count(*) AS n_events,
        |  CAST(sum(vm) AS BIGINT) AS sum_vmil
        |FROM j GROUP BY 1, 2""".stripMargin,
    // f05: per-dim parity-half histograms on the OLD half's bounds,
    // cross-multiplied integer L1 — bit-reproducible, no PSI log().
    "f05_histogram_drift" ->
      """WITH v AS (SELECT vec_id % 2 AS is_new,
        |             unnest(range(0, 64)) AS dim,
        |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS xm
        |           FROM embeddings),
        |b AS (SELECT dim, min(xm) AS lo, max(xm) AS hi FROM v
        |      WHERE is_new = 0 GROUP BY 1),
        |bk AS (SELECT v.dim, v.is_new,
        |         greatest(0, least(7, (xm - lo) * 8 // (hi - lo + 1))) AS bucket,
        |         count(*) AS n
        |       FROM v JOIN b ON v.dim = b.dim GROUP BY 1, 2, 3),
        |t AS (SELECT dim, is_new, sum(n) AS tn FROM bk GROUP BY 1, 2),
        |o AS (SELECT dim, bucket, n AS n_old FROM bk WHERE is_new = 0),
        |nn AS (SELECT dim, bucket, n AS n_new FROM bk WHERE is_new = 1),
        |f AS (SELECT coalesce(o.dim, nn.dim) AS dim,
        |        coalesce(o.bucket, nn.bucket) AS bucket,
        |        coalesce(o.n_old, 0) AS n_old, coalesce(nn.n_new, 0) AS n_new
        |      FROM o FULL OUTER JOIN nn ON o.dim = nn.dim AND o.bucket = nn.bucket),
        |dr AS (SELECT f.dim,
        |         CAST(sum(abs(f.n_old * tn2.tn - f.n_new * tn1.tn)) AS BIGINT) AS drift_l1
        |       FROM f
        |       JOIN t tn1 ON tn1.dim = f.dim AND tn1.is_new = 0
        |       JOIN t tn2 ON tn2.dim = f.dim AND tn2.is_new = 1
        |       GROUP BY 1)
        |SELECT dim, drift_l1, rnk FROM (
        |  SELECT dim, drift_l1,
        |    row_number() OVER (ORDER BY drift_l1 DESC, dim) AS rnk
        |  FROM dr)
        |WHERE rnk <= 10""".stripMargin,
    // f04: the greedy mRMR selection unrolled into five CTE layers.
    "f04_mrmr_select" -> f04OracleSql,
    // f03: pairwise Pearson moments from the zipped-unnest self-join,
    // the same correlation identity, top-10 by |corr|.
    "f03_top_correlations" ->
      """WITH e AS (SELECT vec_id, unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |p AS (SELECT a.dim AS i, b.dim AS j, count(*) AS n,
        |        sum(a.x) AS sx, sum(b.x) AS sy, sum(a.x * a.x) AS sxx,
        |        sum(b.x * b.x) AS syy, sum(a.x * b.x) AS sxy
        |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim < b.dim
        |      GROUP BY 1, 2),
        |c AS (SELECT i, j,
        |        CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
        |          THEN (n * sxy - sx * sy)
        |               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |          ELSE 0 END AS corr
        |      FROM p)
        |SELECT i AS dim_i, j AS dim_j, corr, rnk FROM (
        |  SELECT i, j, corr,
        |    row_number() OVER (ORDER BY abs(corr) DESC, i, j) AS rnk
        |  FROM c)
        |WHERE rnk <= 10""".stripMargin,
    // Last-touch attribution: the strictly-preceding carry-forward
    // window + the 1-hour cutoff in exact integer µs.
    "q41_last_touch_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |           FROM events),
        |c AS (SELECT *,
        |        last_value(CASE WHEN event_type IN ('click','view')
        |                   THEN {'t': ts_us, 'ty': event_type} END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |      FROM e),
        |p AS (SELECT CASE WHEN lt IS NOT NULL AND ts_us - lt.t <= 3600000000
        |             THEN lt.ty ELSE 'none' END AS touch_type,
        |        value,
        |        CASE WHEN lt IS NOT NULL AND ts_us - lt.t <= 3600000000
        |             THEN ts_us - lt.t END AS gap
        |      FROM c WHERE event_type = 'purchase')
        |SELECT touch_type, count(*) AS n_purchases, sum(value) AS sum_value,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap_us
        |FROM p GROUP BY 1""".stripMargin,
    // s20 is q41 at ingestion: one AvailableNow pass over the corpus
    // walks each user's slice in time order, so it shares q41's oracle.
    "s20_stream_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        |           FROM events),
        |c AS (SELECT *,
        |        last_value(CASE WHEN event_type IN ('click','view')
        |                   THEN {'t': ts_us, 'ty': event_type} END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |      FROM e),
        |p AS (SELECT CASE WHEN lt IS NOT NULL AND ts_us - lt.t <= 3600000000
        |             THEN lt.ty ELSE 'none' END AS touch_type,
        |        value,
        |        CASE WHEN lt IS NOT NULL AND ts_us - lt.t <= 3600000000
        |             THEN ts_us - lt.t END AS gap
        |      FROM c WHERE event_type = 'purchase')
        |SELECT touch_type, count(*) AS n_purchases, sum(value) AS sum_value,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap_us
        |FROM p GROUP BY 1""".stripMargin,
    // Peak concurrency: the +1/−1 interval sweep as one naive global
    // running sum (the two-level distributed version must equal it
    // exactly); ends order before starts at equal t via the dlt key.
    "q40_peak_concurrency" ->
      """WITH iv AS (SELECT epoch_us(ts) AS s FROM events),
        |d AS (SELECT s AS t, 1 AS dlt FROM iv
        |      UNION ALL SELECT s + 600000000, -1 FROM iv),
        |r AS (SELECT t, dlt,
        |        CAST(sum(dlt) OVER (ORDER BY t, dlt ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        |      FROM d)
        |SELECT make_timestamp((t // 3600000000) * 3600000000) AS bucket,
        |  max(conc) AS max_conc, count(*) AS n_deltas
        |FROM r GROUP BY 1""".stripMargin,
    "q16_events_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n_events, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q17_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS boundary FROM x),
        |z AS (
        |  SELECT *, CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM y)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM z GROUP BY 1, 2""".stripMargin,
    "q18_events_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'error') AS error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,
    // Spark's exact `percentile` and DuckDB's quantile_cont share the
    // type-7 linear-interpolation definition.
    "q25_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS p50,
        | quantile_cont(l_extendedprice, 0.9) AS p90,
        | quantile_cont(l_extendedprice, 0.99) AS p99,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    // At accuracy 1e6 ≫ n the GK sketch retains every value, so
    // approx_percentile returns the exact DISCRETE percentile =
    // DuckDB's quantile_disc (both pick the element at rank
    // floor(p·(n−1)) zero-based).
    "q25b_approx_percentiles" ->
      """SELECT l_returnflag,
        | quantile_disc(l_extendedprice, 0.5) AS p50,
        | quantile_disc(l_extendedprice, 0.9) AS p90,
        | quantile_disc(l_extendedprice, 0.99) AS p99,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    // session_window semantics: a gap of EXACTLY 30 min starts a new
    // session (window end exclusive) — hence >= in the boundary rule,
    // unlike q17's strictly-greater lag formulation.
    "q26_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
        |    THEN 1 ELSE 0 END AS boundary FROM x),
        |z AS (
        |  SELECT *, sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM z GROUP BY user_id, sid""".stripMargin,
    // plain (unsalted) join — the salted plan must be result-identical
    "q27_salted_join" ->
      """WITH f AS (SELECT event_id, value,
        |  CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id END AS k FROM events),
        |d AS (SELECT DISTINCT k FROM f),
        |dl AS (SELECT k, 'grp_' || CAST(k % 10 AS VARCHAR) AS k_label FROM d)
        |SELECT k_label, count(*) AS n_events, sum(value) AS sum_value
        |FROM f JOIN dl USING (k) GROUP BY 1""".stripMargin,
    // multiply-through exact arithmetic (price*cnt > sum over DECIMAL):
    // neither engine divides or sums doubles, so the threshold is
    // bit-identical cross-engine; the final CAST to DOUBLE of the exact
    // decimal sum is deterministic
    "q28_correlated_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above_avg,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "q29_json_props" ->
      """SELECT event_type,
        |  CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_decile,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    // integer-µs gaps: every partial sum stays below 2^53, so avg is
    // exact (not merely close) in both engines
    "q30_lead_lag" ->
      """WITH x AS (
        |  SELECT event_type, epoch_us(ts) - lag(epoch_us(ts))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(avg(gap_us) AS DOUBLE) AS avg_gap_us,
        |  max(gap_us) AS max_gap_us, min(gap_us) AS min_gap_us
        |FROM x WHERE gap_us IS NOT NULL GROUP BY 1""".stripMargin,
    // q39: per-user lag pairs → exact transition counts → conditional
    // probability by prev-type total (integer counts, one division)
    "q39_event_transitions" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n_trans
        |  FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_trans,
        |  CAST(n_trans AS DOUBLE) / sum(n_trans) OVER (PARTITION BY prev_type) AS p_trans
        |FROM c""".stripMargin,
    // Day-over-day retention: distinct (day, user) + self-join on
    // (user, day+1) — exact timestamp-bucket equality.
    "q34_retention" ->
      """WITH a AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)
        |SELECT a.day, count(*) AS n_active, count(b.user_id) AS n_retained_next_day
        |FROM a LEFT JOIN a b ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
        |GROUP BY 1""".stripMargin,
    // Freshness-decayed aggregation: integer days → quarter buckets →
    // floor-division decay by 2^k (never pow() on doubles); the
    // freshness ratio divides two exact integers once at the end.
    "q35_decayed_agg" ->
      """WITH mx AS (SELECT max(o_orderdate) AS max_d FROM orders),
        |o AS (SELECT o_orderpriority,
        |        CAST(round(o_totalprice * 1000) AS BIGINT) AS rm,
        |        date_diff('day', o_orderdate, (SELECT max_d FROM mx)) AS age_days
        |      FROM orders),
        |d AS (SELECT o_orderpriority, rm,
        |        rm // (CAST(1 AS BIGINT) << (age_days // 90)) AS dm
        |      FROM o)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(rm) AS BIGINT) AS raw_milli,
        |  CAST(sum(dm) AS BIGINT) AS decayed_milli,
        |  CAST(CAST(sum(dm) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(rm) AS BIGINT) AS DOUBLE)
        |    AS freshness
        |FROM d GROUP BY 1""".stripMargin,
    // q36: the KMV threshold is the 64th-smallest distinct mod-prime
    // hash per group — deterministic, so the oracle recomputes it
    // exactly; the estimate is pure integer division
    "q36_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    (((l_partkey * 1000003 + 17) % 1000000007) * 999983 + 7919)
        |      % 1000000007 AS hv FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
        |  FROM h)
        |SELECT l_returnflag, hv AS kth_min_hash,
        |  CAST((CAST(63 AS BIGINT) * 1000000007) // hv AS BIGINT) AS est_distinct
        |FROM r WHERE rn = 64""".stripMargin,
    // q37: the dense grid, hourly closing values and the forward fill
    // are all exact integer / timestamp arithmetic
    "q37_gap_fill" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm FROM events),
        |hr AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket, vm,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e),
        |hc AS (SELECT user_id, bucket, vm FROM hr WHERE rn = 1),
        |span AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |    date_trunc('hour', max(ts)) AS h1 FROM e GROUP BY 1),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket FROM span),
        |j AS (SELECT g.user_id, g.bucket, hc.vm FROM grid g
        |      LEFT JOIN hc ON g.user_id = hc.user_id AND g.bucket = hc.bucket)
        |SELECT user_id, bucket,
        |  last_value(vm IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_milli,
        |  CAST(CASE WHEN vm IS NULL THEN 0 ELSE 1 END AS BIGINT) AS observed
        |FROM j""".stripMargin,
    // Snapshot diff: digest-compare both derived versions; counts are
    // exact integers.
    "d25_corpus_diff" ->
      """WITH o AS (SELECT doc_id, source AS src_old, md5(coalesce(text, '')) AS h_old
        |           FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, source AS src_new,
        |        md5(CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '') || ' v2'
        |            ELSE coalesce(text, '') END) AS h_new
        |      FROM documents)
        |SELECT coalesce(src_new, src_old) AS source,
        |  CAST(sum(CASE WHEN h_old IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN h_new IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  CAST(sum(CASE WHEN h_old IS NOT NULL AND h_new IS NOT NULL AND h_old <> h_new
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN h_old = h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM o FULL JOIN n USING (doc_id)
        |GROUP BY 1""".stripMargin,
    // q38: the theta-sketch set algebra replayed in SQL — same 2-round
    // mod-prime hash as q36, K smallest distinct per type, combined
    // threshold, common-below-theta counts, integer div estimates.
    "q38_sketch_setops" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    (((user_id * 1000003 + 17) % 1000000007) * 999983 + 7919) % 1000000007 AS hv
        |  FROM events),
        |sk AS (SELECT event_type, hv FROM (
        |    SELECT event_type, hv,
        |      row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM h)
        |  WHERE rn <= 64),
        |ty AS (SELECT DISTINCT event_type FROM sk),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |      FROM ty a JOIN ty b ON a.event_type < b.event_type),
        |u AS (SELECT DISTINCT p.type_a, p.type_b, s.hv
        |      FROM p JOIN sk s ON s.event_type = p.type_a OR s.event_type = p.type_b),
        |r AS (SELECT type_a, type_b, hv,
        |        row_number() OVER (PARTITION BY type_a, type_b ORDER BY hv) AS rn FROM u),
        |th AS (SELECT type_a, type_b,
        |        max(CASE WHEN rn <= 64 THEN hv END) AS theta,
        |        count(*) AS n_u
        |      FROM r GROUP BY 1, 2),
        |cm AS (SELECT sa.event_type AS type_a, sb.event_type AS type_b, sa.hv
        |       FROM sk sa JOIN sk sb ON sa.hv = sb.hv AND sa.event_type < sb.event_type),
        |cc AS (SELECT c.type_a, c.type_b, count(*) AS n_common
        |       FROM cm c JOIN th t ON c.type_a = t.type_a AND c.type_b = t.type_b
        |       WHERE t.n_u < 64 OR c.hv < t.theta
        |       GROUP BY 1, 2)
        |SELECT t.type_a, t.type_b, t.theta,
        |  CASE WHEN t.n_u < 64 THEN t.n_u
        |       ELSE CAST(63 AS BIGINT) * 1000000007 // t.theta END AS est_union,
        |  coalesce(cc.n_common, 0) AS n_common,
        |  CASE WHEN t.n_u < 64 THEN coalesce(cc.n_common, 0)
        |       ELSE coalesce(cc.n_common, 0) * 1000000007 // t.theta END AS est_inter
        |FROM th t LEFT JOIN cc ON t.type_a = cc.type_a AND t.type_b = cc.type_b""".stripMargin,
    // Line dedup: the near-dup corpus split into 8-token lines; a line
    // in ≥2 distinct docs is boilerplate and is scrubbed from every
    // doc; surviving lines re-join in order. Shared by the batch
    // operator (d26) and its at-ingestion deployment (s17).
    "d26_line_dedup" -> lineDedupOracleSql,
    "s17_stream_line_scrub" -> lineDedupOracleSql,
    // d37: the d26 dictionary ranked — tie order on the md5 digest is
    // the same hex-string comparison in both engines.
    "d37_template_mining" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM corpus),
        |ln AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS line_idx,
        |    unnest(list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
        |      i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS line_text
        |  FROM tk),
        |tot AS (SELECT count(*) AS n FROM corpus),
        |bp AS (SELECT line_text, count(DISTINCT doc_id) AS n_docs FROM ln
        |       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
        |top AS (SELECT line_text, n_docs,
        |          row_number() OVER (ORDER BY n_docs DESC, md5(line_text)) AS rnk
        |        FROM bp)
        |SELECT line_text AS template, n_docs, rnk,
        |  CAST(n_docs AS DOUBLE) / (SELECT n FROM tot) AS doc_share
        |FROM top WHERE rnk <= 20""".stripMargin,
    // e18: parity-split halves, per-(half, label, dim) sums, centroid
    // displacement — each mean is one division of a full-precision sum.
    "e18_embedding_drift" ->
      """WITH e AS (SELECT vec_id, label::BIGINT AS label,
        |             vec_id % 2 AS is_new,
        |             unnest(range(0, 64)) AS dim,
        |             CAST(unnest(embedding) AS DOUBLE) AS x
        |           FROM embeddings),
        |s AS (SELECT is_new, label, dim, count(*) AS n, sum(x) AS sx
        |      FROM e GROUP BY 1, 2, 3),
        |o AS (SELECT label, dim, sx / n AS m_old, n AS n_old FROM s WHERE is_new = 0),
        |nn AS (SELECT label, dim, sx / n AS m_new, n AS n_new FROM s WHERE is_new = 1)
        |SELECT label, CAST(max(n_old) AS BIGINT) AS n_old,
        |  CAST(max(n_new) AS BIGINT) AS n_new,
        |  sum((m_old - m_new) * (m_old - m_new)) AS drift_sq
        |FROM o JOIN nn USING (label, dim)
        |GROUP BY 1""".stripMargin,
    // First-occurrence span dedup: the smallest (doc_id, line_idx)
    // keeps each repeated span; every later occurrence is scrubbed.
    // Same span frame as d26; the winner election is a packed-id min.
    "d36_span_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM corpus),
        |ln AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS line_idx,
        |    unnest(list_transform(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
        |      i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS line_text
        |  FROM tk),
        |w AS (SELECT line_text, min(doc_id * 1048576 + line_idx) AS pk FROM ln GROUP BY 1),
        |fl AS (SELECT l.doc_id, l.line_idx, l.line_text,
        |         (l.doc_id * 1048576 + l.line_idx) <> w.pk AS is_dup
        |       FROM ln l JOIN w USING (line_text))
        |SELECT doc_id,
        |  coalesce(string_agg(line_text, ' ' ORDER BY line_idx) FILTER (WHERE NOT is_dup), '')
        |    AS clean_text,
        |  count(*) AS n_lines,
        |  count(*) FILTER (WHERE is_dup) AS n_dropped
        |FROM fl GROUP BY doc_id""".stripMargin,
    // Per-domain cap: the salted two-phase cap must equal the naive
    // per-source window.
    "d27_domain_cap" ->
      """SELECT doc_id, source, lang, n_chars, rnk FROM (
        |  SELECT doc_id, source, lang, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 15""".stripMargin,
    // s18 is d27's cap as streaming admission control: one AvailableNow
    // pass over the corpus admits exactly the batch rule's survivors
    "s18_stream_domain_cap" ->
      """SELECT doc_id, source, lang, n_chars, rnk FROM (
        |  SELECT doc_id, source, lang, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
        |  FROM documents)
        |WHERE rnk <= 15""".stripMargin,
    // Schema evolution: the mergeSchema read must reconstruct exactly
    // the generation split the writer produced.
    "w07_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gen1,
        |  CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gen2,
        |  CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars ELSE NULL END) AS BIGINT) AS sum_chars_gen2
        |FROM documents GROUP BY 1""".stripMargin,
    // Ordered funnel: stage mins chain on the previous stage's time;
    // integer-µs arithmetic keeps stage times and mean gaps exact.
    // s21 walks the same funnel per user at ingestion; one AvailableNow
    // pass equals the batch funnel, so it shares q33's oracle verbatim.
    "s21_stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT user_id, min(ts_us) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |p AS (SELECT user_id, min(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
        |SELECT count(*) AS n_view,
        |  count(t_click) AS n_click_after_view,
        |  count(t_purchase) AS n_purchase_after_click,
        |  CAST(avg(t_click - t_view) AS DOUBLE) AS avg_view_to_click_us,
        |  CAST(avg(t_purchase - t_click) AS DOUBLE) AS avg_click_to_purchase_us
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,
    // f01: the full χ² pipeline replayed — zipped unnest binarization,
    // exact contingency counts densified over the observed grid,
    // integer margins, (n−e)²/e terms, top-10 rank.
    "f01_chi2_select" ->
      """WITH e AS (SELECT label::BIGINT AS label,
        |             unnest(range(0, 64)) AS dim, unnest(embedding) AS x
        |           FROM embeddings),
        |cells AS (SELECT dim, CASE WHEN x > 0 THEN 1 ELSE 0 END AS s, label,
        |            count(*) AS n
        |          FROM e GROUP BY 1, 2, 3),
        |grid AS (SELECT d.dim, s.s, l.label
        |         FROM (SELECT DISTINCT dim FROM cells) d,
        |              (VALUES (0), (1)) s(s),
        |              (SELECT DISTINCT label FROM cells) l),
        |dense AS (SELECT g.dim, g.s, g.label, coalesce(c.n, 0) AS n
        |          FROM grid g LEFT JOIN cells c
        |            ON g.dim = c.dim AND g.s = c.s AND g.label = c.label),
        |m AS (SELECT dim, s, label, n,
        |        sum(n) OVER (PARTITION BY dim, s) AS row_tot,
        |        sum(n) OVER (PARTITION BY dim, label) AS col_tot,
        |        sum(n) OVER (PARTITION BY dim) AS tot
        |      FROM dense),
        |chi AS (SELECT dim,
        |          sum(CASE WHEN row_tot * col_tot > 0
        |              THEN (n - row_tot * col_tot / tot) * (n - row_tot * col_tot / tot)
        |                   / (row_tot * col_tot / tot)
        |              ELSE 0 END) AS chi2
        |        FROM m GROUP BY 1)
        |SELECT dim, chi2, rnk FROM (
        |  SELECT dim, chi2,
        |    row_number() OVER (ORDER BY chi2 DESC, dim) AS rnk
        |  FROM chi)
        |WHERE rnk <= 10""".stripMargin,
    "q33_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT user_id, min(ts_us) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |p AS (SELECT user_id, min(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
        |SELECT count(*) AS n_view,
        |  count(t_click) AS n_click_after_view,
        |  count(t_purchase) AS n_purchase_after_click,
        |  CAST(avg(t_click - t_view) AS DOUBLE) AS avg_view_to_click_us,
        |  CAST(avg(t_purchase - t_click) AS DOUBLE) AS avg_click_to_purchase_us
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,
    // Trailing time-RANGE frame: the frame SET is identical in both
    // engines (integer-µs anchor, ties are peers) and the value sum is
    // an exact integer milli-value — no float summation order.
    "q32_trailing_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER w AS n_trailing_1h,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS sum_value_mil_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    // DuckDB's native ASOF JOIN against the union+window composition;
    // clicks deduped per (user, ts) so the as-of match is deterministic.
    "q23_asof_join" ->
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |e AS (SELECT user_id, ts, event_id AS error_id
        |      FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.error_id, c.click_id,
        |  epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
        |FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin,
    "q24_range_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        |           FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, event_id AS error_id, epoch_us(ts) AS e_us
        |      FROM events WHERE event_type = 'error')
        |SELECT e.user_id, count(*) AS n_pairs,
        |  count(DISTINCT e.error_id) AS n_errors
        |FROM e JOIN c ON e.user_id = c.user_id
        |  AND c.c_us >= e.e_us - 300000000 AND c.c_us < e.e_us
        |GROUP BY 1""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // round-trip integrity: the partitioned write+read-back must
    // preserve exactly the source rows and bytes per language
    "w01_sink_partitioned" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w08 publishes snapshot 1 = the full corpus and leaves snapshot
    // 2's data files UNCOMMITTED — the manifest-resolved read-back
    // must therefore roll up to exactly the source table (atomicity
    // baked into the oracle).
    "w08_atomic_publish" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // s12 streams the corpus through the manifest-publish sink (one
    // commit per micro-batch); the final manifest must reference every
    // landed row exactly once — the full-corpus rollup checks it.
    "s12_stream_publish" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w12 expires everything below the compacted snapshot and GCs the
    // orphaned data files — the LIVE read must be untouched by the
    // deletion (the full corpus, snapshot 3 = w11's compaction of 2).
    "w12_expire_snapshots" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w11 lands the corpus as 3 appended snapshots, compacts the live
    // table into 2 range-sorted files, and reads back THROUGH the
    // compacted manifest — the rewrite must preserve every row exactly.
    "w11_compact_snapshots" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w16 re-partitions the table between generations without
    // rewriting history; the union read must recover every row with
    // both partition columns intact (lang from gen1's dirs, source
    // from gen2's dirs).
    "w16_partition_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY 1""".stripMargin,
    // w17 applies one CDC changeset (deletes re-landing as inserts
    // under new ids, in-place updates) confined to the lower-eighth
    // doc_id range, then rolls up the merged final state.
    "w17_merge_cdc" -> mergeCdcOracleSql,
    // w18: the audit ledger over two deterministic candidate batches —
    // pure integer arithmetic; the published-table state is spec-pinned
    "w18_write_audit_publish" ->
      """WITH dirty AS (
        |  SELECT CASE WHEN doc_id % 14 = 3 THEN NULL ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 = 3),
        |clean AS (SELECT text FROM documents WHERE doc_id % 7 = 5),
        |l AS (
        |  SELECT 1 AS batch, count(*) AS n_rows,
        |    count(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0) AS n_bad
        |  FROM dirty
        |  UNION ALL
        |  SELECT 2, count(*),
        |    count(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0)
        |  FROM clean)
        |SELECT CAST(batch AS BIGINT) AS batch, n_rows, n_bad,
        |  CAST(CASE WHEN n_bad = 0 AND n_rows > 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS published
        |FROM l""".stripMargin,
    // s14 applies the SAME changeset through per-micro-batch MERGE
    // commits; every key is merged by exactly one batch, so the
    // final table is w17's no matter how the stream was batched.
    "s14_stream_cdc_apply" -> mergeCdcOracleSql,
    // s15: the watermark arithmetic reproduced in exact integer ms —
    // wm = epoch_ms(max on-time ts) − 24 h; a straggler (user_id%5=0)
    // arrives in the second micro-batch and survives iff its hour
    // window's END is still beyond the watermark
    "s15_stream_late_data" ->
      """WITH wm AS (
        |  SELECT epoch_us(max(ts)) // 1000 - 86400000 AS wm_ms
        |  FROM events WHERE user_id % 5 <> 0),
        |acc AS (
        |  SELECT * FROM events
        |  WHERE user_id % 5 <> 0
        |     OR epoch_us(date_trunc('hour', ts)) // 1000 + 3600000
        |        > (SELECT wm_ms FROM wm))
        |SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n
        |FROM acc GROUP BY 1, 2""".stripMargin,
    // w15 copy-on-write-deletes the lower-eighth doc_id range and
    // reads back through the new manifest: exactly the surviving rows.
    "w15_row_deletes" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id > (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 8
        |                FROM documents)
        |GROUP BY 1""".stripMargin,
    // w14's Z-ordered layout answers the n_chars-range predicate from
    // only the bounding-box-intersecting files — the rollup must equal
    // the plain filtered scan (same integer threshold device as w09,
    // on the OTHER dimension).
    "w14_zorder_compact" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE n_chars <= (SELECT min(n_chars) + (max(n_chars) - min(n_chars)) // 8
        |                  FROM documents)
        |GROUP BY 1""".stripMargin,
    // w13 reads the 1→3 manifest increment (two appended batches) —
    // exactly the rows NOT in snapshot 1's doc_id % 3 == 0 slice.
    "w13_incremental_read" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1""".stripMargin,
    // w10 commits snapshot 2 (a filtered rewrite) AFTER snapshot 1 and
    // then time-travels back: the as-of-1 read must still roll up to
    // exactly the source table even though a newer committed snapshot
    // supersedes it.
    "w10_time_travel" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w19 rolls the live table back to snapshot 1 (= the full corpus),
    // so the live read must roll up to exactly the source table — the
    // bad snapshot 2 is superseded without rewriting any data
    "w19_snapshot_rollback" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // w20: per-file KMV merge-exactness means the merged table stats
    // equal a DIRECT whole-column sketch — which is what the oracle
    // computes (q36's double affine round; string columns poly-hashed
    // first), exact below K=64 distinct, (K-1)·P div θ above
    "w20_analyze_stats" ->
      """WITH hd AS (SELECT DISTINCT
        |    (((doc_id * 1000003 + 17) % 1000000007) * 999983 + 7919) % 1000000007 AS hv
        |  FROM documents),
        |od AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hd),
        |hl AS (SELECT DISTINCT
        |    ((list_reduce(list_prepend(CAST(17 AS BIGINT),
        |        list_transform(range(1, length(lang)+1), i -> CAST(ascii(lang[i]) AS BIGINT))),
        |        (b, c) -> (b * 31 + c) % 1000000007)
        |      * 1000003 + 17) % 1000000007 * 999983 + 7919) % 1000000007 AS hv
        |  FROM documents),
        |ol AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hl),
        |hs AS (SELECT DISTINCT
        |    ((list_reduce(list_prepend(CAST(17 AS BIGINT),
        |        list_transform(range(1, length(source)+1), i -> CAST(ascii(source[i]) AS BIGINT))),
        |        (b, c) -> (b * 31 + c) % 1000000007)
        |      * 1000003 + 17) % 1000000007 * 999983 + 7919) % 1000000007 AS hv
        |  FROM documents),
        |os AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hs)
        |SELECT 'doc_id' AS col_name,
        |  (SELECT count(*) FROM documents) AS n_rows,
        |  CASE WHEN (SELECT count(*) FROM hd) < 64 THEN (SELECT count(*) FROM hd)
        |       ELSE CAST(63 AS BIGINT) * 1000000007 // (SELECT hv FROM od WHERE rn = 64) END AS est_ndv
        |UNION ALL
        |SELECT 'lang', (SELECT count(*) FROM documents),
        |  CASE WHEN (SELECT count(*) FROM hl) < 64 THEN (SELECT count(*) FROM hl)
        |       ELSE CAST(63 AS BIGINT) * 1000000007 // (SELECT hv FROM ol WHERE rn = 64) END
        |UNION ALL
        |SELECT 'source', (SELECT count(*) FROM documents),
        |  CASE WHEN (SELECT count(*) FROM hs) < 64 THEN (SELECT count(*) FROM hs)
        |       ELSE CAST(63 AS BIGINT) * 1000000007 // (SELECT hv FROM os WHERE rn = 64) END""".stripMargin,
    // w09's pruned read answers the id-range predicate from only the
    // manifest-selected files — the rollup must equal the plain
    // filtered scan (integer threshold: min + (max-min)/8, and both
    // engines floor the non-negative division identically).
    "w09_stats_pruning" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id <= (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) // 8
        |                 FROM documents)
        |GROUP BY 1""".stripMargin,
    // self-join on the unique bucket key is the identity: the bucketed
    // write+read-back must preserve exactly the source rows
    "w02_sink_bucketed" ->
      """SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1""",
    // the shard+compact round-trip must preserve exactly the source
    "w03_sink_compacted" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1""".stripMargin,
    // expected post-upsert state: en docs with doc_id%7==0 corrected
    // (+1000 chars), new en docs cloned from the %7==1 slice at
    // doc_id+2000000, every other language untouched
    "w05_sink_upsert" ->
      """WITH upd AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN lang = 'en' AND doc_id % 7 = 0 THEN n_chars + 1000
        |         ELSE n_chars END AS n_chars
        |  FROM documents),
        |fresh AS (
        |  SELECT doc_id + 2000000 AS doc_id, lang, n_chars
        |  FROM documents WHERE lang = 'en' AND doc_id % 7 = 1),
        |fin AS (SELECT * FROM upd UNION ALL SELECT * FROM fresh)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM fin GROUP BY 1""".stripMargin,
    // JSON→CSV round-trip must preserve text byte-for-byte
    "w04_source_formats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        | count(DISTINCT text) AS n_distinct_texts
        |FROM documents GROUP BY 1""".stripMargin,
    "d04_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang AS lang_actual,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang_actual,
        |    len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('el','la','los','de','que','y','en','un','una','es'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('der','die','und','das','ein','eine','ist','zu','den','mit'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('le','la','les','et','des','un','une','est','que','dans'))) AS s_fr,
        |    len(list_filter(toks, t -> t IN ('de','shi','le','zai','he','you','wo','ta','men','zhe'))) AS s_zh
        |  FROM s)
        |SELECT doc_id, lang_actual,
        |  CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred,
        |  CAST(greatest(s_en, s_es, s_de, s_fr, s_zh) AS BIGINT) AS best_score
        |FROM sc""".stripMargin,
    // d47: the NB replay — census, Laplace-1 scores in the Spark
    // side's exact expression shape (observed cells join; the unseen
    // term folds into n_toks·log_denom), argmax on the RAW score.
    "d47_nb_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |census AS (SELECT lang AS model_lang, tok, count(*) AS c
        |  FROM toks GROUP BY 1, 2),
        |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM census),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |priors AS (SELECT lang AS model_lang,
        |    ln(count(*) / (SELECT n_docs FROM nd)) AS log_prior
        |  FROM documents GROUP BY 1),
        |lconst AS (SELECT model_lang,
        |    ln(CAST(sum(c) AS DOUBLE) + (SELECT v FROM v)) AS log_denom
        |  FROM census GROUP BY 1),
        |dt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |contrib AS (SELECT dt.doc_id, cs.model_lang,
        |    sum(dt.cnt * ln(CAST(cs.c AS DOUBLE) + CAST(1.0 AS DOUBLE))) AS sum_log_c
        |  FROM dt JOIN census cs ON cs.tok = dt.tok GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n_toks FROM dt GROUP BY 1),
        |scored AS (SELECT d.doc_id, d.lang AS lang_actual, p.model_lang,
        |    p.log_prior + coalesce(c.sum_log_c, CAST(0 AS DOUBLE))
        |      - l.n_toks * lc.log_denom AS score
        |  FROM documents d
        |  JOIN dlen l ON l.doc_id = d.doc_id
        |  CROSS JOIN priors p
        |  LEFT JOIN contrib c ON c.doc_id = d.doc_id AND c.model_lang = p.model_lang
        |  JOIN lconst lc ON lc.model_lang = p.model_lang)
        |SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT doc_id, lang_actual, model_lang AS lang_pred,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, model_lang) AS rn
        |  FROM scored) t
        |WHERE rn = 1 GROUP BY 1, 2""".stripMargin,
    "d02_token_count" ->
      """SELECT doc_id,
        | length(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        | length(regexp_extract_all(text, '[A-Za-z0-9'']+')) AS n_re_tokens,
        | CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe_est
        |FROM documents""".stripMargin,
    "d03_text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE) AS alpha_ratio,
        |    length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) AS upper_ratio,
        |    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
        |      / CAST(length(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS stop_ratio
        |  FROM documents)
        |SELECT doc_id, alpha_ratio, upper_ratio, punct_ratio, stop_ratio,
        |  alpha_ratio * 0.5 + stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.1
        |    + (1.0 - upper_ratio) * 0.1 AS quality_score
        |FROM q""".stripMargin,
    "d09_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(regexp_split_to_array(trim(text), '\s+')) AS n
        |  FROM documents)
        |SELECT doc_id, i AS chunk_id,
        |  array_to_string(toks[i*10 + 1 : i*10 + 50], ' ') AS chunk_text,
        |  CAST(least(50, n - i*10) AS BIGINT) AS n_tokens
        |FROM t, LATERAL (SELECT unnest(range(0, CAST(floor(greatest(n - 50, 0)/10) AS BIGINT) + 1)) AS i)""".stripMargin,
    "d12_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rn FROM s) t
        |WHERE rn <= 3""".stripMargin,
    "d10_term_freq" ->
      """SELECT term, count(*) AS freq FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents)
        |GROUP BY 1 ORDER BY freq DESC, term LIMIT 100""".stripMargin,
    "e01_knn_cosine" -> knnExactOracleSql,
    // e21: the shard-and-merge topology must return EXACTLY the
    // unsharded answer — its oracle is e01's brute force, unchanged.
    "e21_sharded_knn" -> knnExactOracleSql,
    // e22: the shared assignment CTEs reduced to a per-list census with
    // the balanced-mean ratio and the split flag.
    "e22_ivf_skew_audit" ->
      s"""$ivfAsgCte,
         |census AS (SELECT centroid_id, count(*) AS n_vecs FROM asg GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_vecs) AS DOUBLE) AS total,
         |          CAST(count(*) AS DOUBLE) AS k FROM census)
         |SELECT CAST(centroid_id AS BIGINT) AS centroid_id, n_vecs,
         |  n_vecs / total AS list_share,
         |  n_vecs * k / total AS skew_ratio,
         |  n_vecs * k / total > 2.0 AS needs_split
         |FROM census, tot""".stripMargin,
    // Hybrid lexical+vector RRF fusion: both top-100 lists replayed,
    // full-outer fused with 1/(60+rank) in explicit DOUBLE arithmetic
    // (DuckDB's bare 1.0 literal is DECIMAL — different rounding).
    "e17_hybrid_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |vs AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS id,
        |    list_dot_product(q.v, e.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        |  FROM e q JOIN e ON e.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20),
        |vl AS (SELECT query_id, id, rn AS r_vec FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rn
        |  FROM vs) WHERE rn <= 100),
        |tm AS (SELECT doc_id,
        |         unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS term
        |       FROM documents),
        |ov AS (SELECT qt.doc_id AS query_id, t.doc_id AS id, count(*) AS n_shared
        |       FROM tm t JOIN tm qt USING (term)
        |       WHERE qt.doc_id < 20 AND t.doc_id <> qt.doc_id GROUP BY 1, 2),
        |ll AS (SELECT query_id, id, rn AS r_lex FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_shared DESC, id) AS rn
        |  FROM ov) WHERE rn <= 100),
        |f AS (SELECT coalesce(vl.query_id, ll.query_id) AS query_id,
        |        coalesce(vl.id, ll.id) AS id, vl.r_vec, ll.r_lex,
        |        coalesce(CAST(1 AS DOUBLE) / (60 + vl.r_vec), CAST(0 AS DOUBLE))
        |          + coalesce(CAST(1 AS DOUBLE) / (60 + ll.r_lex), CAST(0 AS DOUBLE)) AS rrf
        |      FROM vl FULL OUTER JOIN ll ON vl.query_id = ll.query_id AND vl.id = ll.id)
        |SELECT query_id, id AS neighbor_id, coalesce(r_vec, 0) AS r_vec,
        |  coalesce(r_lex, 0) AS r_lex, rrf
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, id) AS rn
        |      FROM f)
        |WHERE rn <= 10""".stripMargin,
    // e10 joins the exact panel ground truth (e01's SQL) against the
    // index's answers (e02's SQL) — integer hit counts per query.
    "e10_ann_recall" ->
      s"""WITH exact AS (
         |$knnExactOracleSql
         |), approx AS (
         |$annLshOracleSql
         |)
         |SELECT exact.query_id, count(*) AS n_exact,
         | count(a.neighbor_id) AS n_hit
         |FROM exact LEFT JOIN approx a
         |  ON exact.query_id = a.query_id AND exact.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin,
    // single AvailableNow batch == the full batch census, so the
    // streaming near-dup oracle is d06's, verbatim
    "s05_stream_neardup" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT p.doc_a, p.doc_b,
        |  len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0 AS est_jaccard
        |FROM pairs p
        |JOIN sg sa ON sa.doc_id = p.doc_a
        |JOIN sg sb ON sb.doc_id = p.doc_b
        |WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0 >= 0.5""".stripMargin,
    // Full LSH-ANN reproduction: mod-prime hyperplane parities (identical
    // arithmetic to Sim.bucketColOf), hamming<=2 probe set, exact cosine
    // rank. list_dot_product matches the graft_dot fold bit-for-bit.
    "e02_ann_lsh" -> annLshOracleSql,
    // e06 serves the SAME search from the persisted index — identical
    // result contract, so the oracle is e02's verbatim
    "e06_ann_index_serve" -> annLshOracleSql,
    // e11 is e02/e06 with the tombstone set (vec_id % 10 == 7)
    // removed from the CANDIDATE side before ranking — the oracle is
    // the LSH SQL with that one predicate added to the cand CTE.
    "e11_ann_tombstones" -> {
      val patched = annLshOracleSql.replace(
        "WHERE b.vec_id <> p.query_id)",
        "WHERE b.vec_id <> p.query_id AND b.vec_id % 10 <> 7)")
      require(patched != annLshOracleSql, "e11 oracle patch anchor drifted")
      patched
    },
    "e13_mmr_rerank" -> mmrOracleSql,
    // e16: radius membership over the twin-planted corpus — the e03
    // corpus CTEs with e02's 8-bit buckets/probes, radius not rank
    "e16_range_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pert AS (SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x * 1.0005 + 0.0001) AS v FROM e),
        |corpus0 AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM pert),
        |cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, CAST(list_sum(list_transform(range(0, 8), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
        |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
        |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
        |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS bucket FROM corpus0),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM cn WHERE vec_id < 20),
        |probes AS (
        |  SELECT query_id, qv, qn, unnest(list_distinct(list_concat(list_concat(
        |      [bucket],
        |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))),
        |      flatten(list_transform(range(0, 7), j -> list_transform(range(j+1, 8), k ->
        |        xor(xor(bucket, CAST(1 AS BIGINT) << j), CAST(1 AS BIGINT) << k))))))) AS bucket
        |  FROM q),
        |cand AS (
        |  SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(p.qv, b.v) / (p.qn * b.nrm) AS cosine
        |  FROM probes p JOIN cn b USING (bucket)
        |  WHERE b.vec_id <> p.query_id)
        |SELECT query_id, neighbor_id, cosine FROM cand WHERE cosine >= 0.99""".stripMargin,
    "e14_ann_sq8" -> annSq8OracleSql(ivf = false),
    "e15_ann_ivf_sq8" -> annSq8OracleSql(ivf = true),
    // e12 unions the stale index cut with the fresh delta BEFORE
    // probing, so the answer must equal the full-index search — e02's
    // oracle verbatim is the whole point
    "e12_ann_delta_serve" -> annLshOracleSql,
    // s10 serves the SAME search from a query STREAM against the
    // persisted index — one AvailableNow pass must reproduce e02/e06
    "s10_stream_ann_serve" -> annLshOracleSql,
    // e09 is e02 with PRE-filter semantics: the corpus is cut to
    // lang='en' rows (metadata join on id) before candidate
    // generation; buckets/probes/ranking identical to e02.
    "e09_filtered_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |bk AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, CAST(list_sum(list_transform(range(0, 8), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
        |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
        |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
        |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS bucket FROM e),
        |fb AS (SELECT bk.* FROM bk JOIN documents d ON bk.vec_id = d.doc_id WHERE d.lang = 'en'),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket FROM bk WHERE vec_id < 20),
        |probes AS (
        |  SELECT query_id, qv, qn, unnest(list_distinct(list_concat(list_concat(
        |      [bucket],
        |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))),
        |      flatten(list_transform(range(0, 7), j -> list_transform(range(j+1, 8), k ->
        |        xor(xor(bucket, CAST(1 AS BIGINT) << j), CAST(1 AS BIGINT) << k))))))) AS bucket
        |  FROM q),
        |cand AS (
        |  SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(p.qv, b.v) / (p.qn * b.nrm) AS cosine
        |  FROM probes p JOIN fb b USING (bucket)
        |  WHERE b.vec_id <> p.query_id)
        |SELECT query_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM cand) t
        |WHERE rn <= 10""".stripMargin,
    // the all-pairs kNN join: same 8-bit buckets as e02, but EVERY
    // vector is a query (census cap + hamming-1 probes), top-3 per
    // query by (cosine DESC, neighbor_id)
    "e05_knn_join" -> (e05KnnCtes + """
        |SELECT query_id, neighbor_id, cosine FROM knn""".stripMargin),
    // e25: the full graph build (e23's CTEs) + entry election + three
    // expand/score/top-beam layers + final top-10 replayed.
    "e25_graph_serve" -> e25ServeOracleSql,
    "e27_graph_delta" -> e27OracleSql,
    "e28_graph_serve_delta" -> e28OracleSql,
    "e29_hnsw_serve" -> e29OracleSql,
    // e30: canonical-corpus two-level serve + duplicate-map expansion
    "e30_dedup_serve" -> e30OracleSql,
    "e31_ivf_seeded_serve" -> e31OracleSql,
    // i01: e05's whole bucketed kNN construction replayed (shared
    // CTEs), then the ENN plurality vote — per-query same/other label
    // tallies, the top outvoting label, flag where it strictly wins.
    "i01_enn_filter" -> (i01VoteCtes + """
        |SELECT a.query_id AS vec_id, a.lbl AS label, a.n_neighbors, a.n_same,
        |  o.other_label, o.n_other
        |FROM agg a JOIN other o ON o.query_id = a.query_id AND o.rn = 1
        |WHERE o.n_other > a.n_same""".stripMargin),
    // i04: the i01 ENN replay (by reference, as a nested id subquery)
    // composed into the full relief_weights pipeline on the edited
    // instance set — sampling/priors/kNN all rerun post-edit.
    "i04_edited_relief" ->
      graft.ml.ReliefOracle.weightsEditedSql(i01VoteCtes + """
        |SELECT a.query_id AS vec_id
        |FROM agg a JOIN other o ON o.query_id = a.query_id AND o.rn = 1
        |WHERE o.n_other > a.n_same""".stripMargin),
    // i02: e05's construction + 1-NN re-rank, mutual self-join,
    // opposite labels, majority-member removal policy.
    "i02_tomek_links" -> (e05KnnCtes + """,
        |nn1 AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM knn) t WHERE rn = 1),
        |lbl AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings),
        |ccen AS (SELECT lbl, count(*)::BIGINT AS n_class FROM lbl GROUP BY 1),
        |mut AS (SELECT f.query_id AS vec_id_a, f.neighbor_id AS vec_id_b
        |  FROM nn1 f JOIN nn1 g ON f.query_id = g.neighbor_id
        |                       AND f.neighbor_id = g.query_id
        |  WHERE f.query_id < f.neighbor_id)
        |SELECT m.vec_id_a, m.vec_id_b, la.lbl AS label_a, lb.lbl AS label_b,
        |  CASE WHEN ca.n_class > cb.n_class THEN m.vec_id_a
        |       WHEN cb.n_class > ca.n_class THEN m.vec_id_b
        |       ELSE greatest(m.vec_id_a, m.vec_id_b) END AS removed_id
        |FROM mut m JOIN lbl la ON la.vec_id = m.vec_id_a
        |           JOIN lbl lb ON lb.vec_id = m.vec_id_b
        |           JOIN ccen ca ON ca.lbl = la.lbl
        |           JOIN ccen cb ON cb.lbl = lb.lbl
        |WHERE la.lbl <> lb.lbl""".stripMargin),
    // i05: the e05 replay re-ranked, a 3-way k grid, per-k strict
    // outvote, union over k — Tomek's All-kNN rule exactly.
    "i05_allknn" -> (e05KnnCtes + """,
        |rk AS (SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM knn),
        |lbl AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings),
        |kv AS (SELECT r.query_id, l.lbl AS nlbl, r.rn, kk.k
        |  FROM rk r JOIN lbl l ON l.vec_id = r.neighbor_id
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) kk
        |  WHERE r.rn <= kk.k),
        |votes AS (SELECT query_id, k, nlbl, count(*)::BIGINT AS c
        |  FROM kv GROUP BY 1, 2, 3),
        |own AS (SELECT v.*, q.lbl FROM votes v JOIN lbl q ON q.vec_id = v.query_id),
        |perqk AS (SELECT query_id, k, lbl,
        |    CAST(sum(CASE WHEN nlbl = lbl THEN c ELSE 0 END) AS BIGINT) AS n_same,
        |    CAST(max(CASE WHEN nlbl <> lbl THEN c ELSE 0 END) AS BIGINT) AS n_other_max
        |  FROM own GROUP BY 1, 2, 3)
        |SELECT query_id AS vec_id, lbl AS label,
        |  CAST(count(*) AS BIGINT) AS n_ks_flagged,
        |  CAST(min(k) AS BIGINT) AS first_flag_k
        |FROM perqk WHERE n_other_max > n_same GROUP BY 1, 2""".stripMargin),
    // e26: the bucket prefix + fold-split probes/candidates, top-3,
    // plurality vote, confusion census.
    "e26_knn_classify" -> e26OracleSql,
    // s29: the streaming deployment of e26 — identical result contract.
    "s29_stream_knn_classify" -> e26OracleSql,
    // i03: seeds + 3 unrolled FCNN rounds replayed.
    "i03_fcnn_condense" -> i03OracleSql,
    // b03: one census + inverse-frequency and effective-number weights.
    "b03_class_weights" -> b03OracleSql,
    // b04: cleanLabelCol replayed — null injection on the same id
    // gate, MISSING sentinel, frequencyDesc indexing (ties break
    // alphabetically ascending, Spark StringIndexer's documented order)
    "b04_null_label_clean" ->
      s"""WITH dirty AS (
        |  SELECT CASE WHEN vec_id % 17 = 0 THEN NULL
        |              ELSE CAST(label AS VARCHAR) END AS label
        |  FROM embeddings),
        |cleaned AS (
        |  SELECT coalesce(label, '${graft.ml.ReliefQueries.MissingLabel}')
        |    AS label_clean
        |  FROM dirty),
        |counts AS (SELECT label_clean, count(*)::BIGINT AS n
        |           FROM cleaned GROUP BY 1)
        |SELECT label_clean,
        |  CAST(row_number() OVER (ORDER BY n DESC, label_clean) - 1 AS DOUBLE)
        |    AS label_idx,
        |  n
        |FROM counts""".stripMargin,
    // s30: one AvailableNow pass must equal batch b03 — same oracle.
    "s30_stream_class_weights" -> b03OracleSql,
    // b02: bucket prefix + same-class 1-NN + midpoint-mass audit.
    "b02_smote_plan" -> (e05BucketCtes + """,
        |lbl AS (SELECT vec_id, label::BIGINT AS lbl FROM embeddings),
        |ccen AS (SELECT lbl, count(*)::BIGINT AS n_minority FROM lbl GROUP BY 1),
        |mj AS (SELECT lbl FROM ccen ORDER BY n_minority DESC, lbl LIMIT 1),
        |inl AS (SELECT inn.*, l.lbl FROM inn JOIN lbl l USING (vec_id)),
        |mino AS (SELECT * FROM inl WHERE lbl <> (SELECT lbl FROM mj)),
        |probes AS (
        |  SELECT vec_id AS query_id, lbl AS qlbl, unnest(list_distinct(list_concat(
        |      [bucket],
        |      list_transform(range(0, 8), j -> xor(bucket, CAST(1 AS BIGINT) << j))))) AS bucket
        |  FROM mino),
        |cand AS (
        |  SELECT DISTINCT p.query_id, p.qlbl, i.vec_id AS neighbor_id
        |  FROM probes p JOIN inl i USING (bucket)
        |  WHERE i.lbl = p.qlbl AND i.vec_id <> p.query_id),
        |scored AS (
        |  SELECT c.query_id, c.qlbl, c.neighbor_id,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, len(a.v) + 1),
        |        i -> (a.v[i] + b.v[i]) / CAST(2 AS DOUBLE))),
        |      (acc, x) -> acc + x) AS mass
        |  FROM cand c JOIN bk a ON a.vec_id = c.query_id
        |              JOIN bk b ON b.vec_id = c.neighbor_id),
        |nn1 AS (SELECT * FROM (SELECT scored.*, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM scored) t WHERE rn = 1),
        |syn AS (SELECT qlbl AS lbl, count(*)::BIGINT AS n_synth, sum(mass) AS mass
        |  FROM nn1 GROUP BY 1)
        |SELECT c.lbl AS label, c.n_minority,
        |  coalesce(s.n_synth, 0) AS n_synth,
        |  round(coalesce(s.mass, CAST(0 AS DOUBLE)), 6) AS synth_mass
        |FROM ccen c LEFT JOIN syn s ON s.lbl = c.lbl
        |WHERE c.lbl <> (SELECT lbl FROM mj)""".stripMargin),
    // g01: the full 10-iteration damped power iteration replayed
    // layer by layer over q39's transition frame.
    "g01_transition_pagerank" -> g01OracleSql,
    "g04_user_pagerank" -> g04OracleSql,
    "g05_user_communities" -> g05OracleSql,
    "g05b_lpa_damped" -> g05bOracleSql,
    "g06_user_triangles" -> g06OracleSql,
    // s32/s33/s34: one AvailableNow pass must equal batch g06/g05/g07
    // exactly — the oracles ARE the batch ones (the s28/s31 twin
    // discipline, closed over the whole graph family).
    "s32_stream_user_triangles" -> g06OracleSql,
    "s33_stream_user_communities" -> g05OracleSql,
    // g07: exact reachability partition — the oracle closes the
    // symmetrized handoff edges transitively (recursive CTE, UNION
    // dedup terminates) and labels every node with the least reachable
    // id, the same min-root convergeForest's star rounds reach;
    // singletons and roots map to themselves via the left join.
    "g07_user_components" -> g07OracleSql,
    "s34_stream_user_components" -> g07OracleSql,
    "g08_user_ppr" -> g08OracleSql,
    "s35_stream_user_ppr" -> g08OracleSql,
    "g09_user_kcore" -> g09OracleSql,
    "s36_stream_user_kcore" -> g09OracleSql,
    "g10_link_prediction" -> g10OracleSql,
    "s37_stream_links" -> g10OracleSql,
    "g11_item_cooccurrence" -> g11OracleSql,
    "s38_stream_item_cooccurrence" -> g11OracleSql,
    // s31: g04's deployment shape — the streamed handoff extraction
    // must reduce to the identical leaderboard, so the oracle IS g04's.
    "s31_stream_user_pagerank" -> g04OracleSql,
    // g02: 5 synchronous LPA layers, integer weight sums throughout.
    "g02_label_propagation" -> g02OracleSql,
    // w27: stats rollup + exclusive-cumsum next-fit packing, all
    // integer arithmetic.
    "w27_compaction_planner" ->
      """WITH parts AS (
        |  SELECT lang, doc_id % 8 AS bucket, CAST(sum(n_chars) AS BIGINT) AS vol,
        |    count(*)::BIGINT AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |tt AS (SELECT greatest((coalesce(CAST(sum(vol) AS BIGINT), 0) + 3) // 4, 1) AS t FROM parts),
        |ordered AS (
        |  SELECT *, coalesce(CAST(sum(vol) OVER (ORDER BY vol DESC, lang, bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
        |  FROM parts)
        |SELECT cum // (SELECT t FROM tt) AS bin,
        |  count(*)::BIGINT AS n_parts,
        |  CAST(sum(vol) AS BIGINT) AS bin_volume,
        |  max(vol) AS max_part_volume
        |FROM ordered GROUP BY 1""".stripMargin,
    // g03: ordered two-join triangle enumeration + degree census.
    "g03_triangle_count" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |d AS (SELECT DISTINCT prev_type AS a, event_type AS b FROM x WHERE prev_type IS NOT NULL),
        |edges AS (SELECT DISTINCT a, b FROM (
        |    SELECT a, b FROM d UNION ALL SELECT b AS a, a AS b FROM d) u
        |  WHERE a < b),
        |nodes AS (SELECT DISTINCT event_type AS node FROM events),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM edges e1 JOIN edges e2 ON e2.a = e1.b
        |       JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tpn AS (SELECT node, count(*)::BIGINT AS n_triangles FROM (
        |    SELECT unnest([x, y, z]) AS node FROM tri) t GROUP BY 1),
        |deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
        |    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges) u
        |  GROUP BY 1)
        |SELECT n.node, coalesce(dg.degree, 0) AS degree,
        |  coalesce(t.n_triangles, 0) AS n_triangles,
        |  round(CASE WHEN coalesce(dg.degree, 0) >= 2
        |    THEN CAST(2 AS DOUBLE) * coalesce(t.n_triangles, 0)
        |         / (dg.degree * (dg.degree - 1))
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
        |FROM nodes n LEFT JOIN deg dg ON dg.node = n.node
        |     LEFT JOIN tpn t ON t.node = n.node""".stripMargin,
    // s28: one AvailableNow pass must equal batch g01 exactly —
    // the oracle IS g01's.
    "s28_stream_pagerank" -> g01OracleSql,
    // w26: Bloom skipping never changes the ANSWER (no false
    // negatives; exact fp filter on survivors) — the oracle is the
    // pure lookup-by-fingerprint semantics; the skipping itself is
    // spec-pinned (admitted ⊇ true shards, ≥ 1 shard skipped).
    "w26_bloom_skipping" ->
      """WITH p AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 97 = 0)
        |SELECT md5(d.text) AS fp, d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN p ON md5(d.text) = p.fp""".stripMargin,
    // e24: flood corpus + centroid fit + assignment + census + the
    // ceil(ratio)-way hash-mod split replayed end to end.
    "e24_ivf_repair" ->
      """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |v0 AS (SELECT v FROM e0 ORDER BY vec_id LIMIT 1),
        |flood AS (
        |  SELECT 100000 + i AS vec_id,
        |    list_transform(v0.v, x -> x * (1.0 + 0.0002 * i)) AS v
        |  FROM v0, (SELECT unnest(range(0, 250)) AS i)),
        |corpus AS (SELECT * FROM e0 UNION ALL SELECT * FROM flood),
        |en AS (SELECT vec_id, v FROM corpus),
        |cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id) - 1 AS cid,
        |    v AS cv
        |  FROM e0
        |  ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id
        |  LIMIT 16),
        |cc AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents),
        |asg AS (
        |  SELECT vec_id, cid AS centroid_id FROM (
        |    SELECT en.vec_id, cc.cid,
        |      row_number() OVER (PARTITION BY en.vec_id
        |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
        |    FROM en CROSS JOIN cc) t
        |  WHERE rn = 1),
        |cen AS (SELECT centroid_id, count(*) AS n FROM asg GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS k FROM cen),
        |fl AS (SELECT centroid_id, n * k / total AS ratio_before,
        |    CASE WHEN n * k / total > 2.0 THEN CAST(ceil(n * k / total) AS BIGINT)
        |         ELSE 1 END AS n_subs
        |  FROM cen, tot),
        |re AS (SELECT a.vec_id, a.centroid_id, f.ratio_before, f.n_subs,
        |    a.centroid_id + 16 * ((a.vec_id % 1000000007 * 888000131 % 1000000007) % f.n_subs) AS new_id
        |  FROM asg a JOIN fl f USING (centroid_id)),
        |c2 AS (SELECT new_id, count(*) AS n_vecs, min(ratio_before) AS ratio_before,
        |    min(n_subs) > 1 AS was_split
        |  FROM re GROUP BY 1),
        |t2 AS (SELECT CAST(sum(n_vecs) AS DOUBLE) AS total2,
        |    CAST(count(*) AS DOUBLE) AS k2 FROM c2)
        |SELECT CAST(new_id AS BIGINT) AS centroid_id,
        |  CAST(new_id % 16 AS BIGINT) AS parent_id,
        |  CAST(n_vecs AS BIGINT) AS n_vecs, ratio_before,
        |  n_vecs * k2 / total2 AS skew_ratio, was_split
        |FROM c2, t2""".stripMargin,
    // e23: full NN-descent replay — the e05 LSH init at the corpus-
    // elected K (graphKSql mirrors Sim.graphKOf), then two
    // unrolled rounds (reverse cap, co-adjacency pairs, re-score,
    // per-node top-K), identical arithmetic throughout.
    "e23_knn_graph" ->
      (e23GraphCtes + "\n" +
        """SELECT node_id, neighbor_id, cosine,
          |  CAST(row_number() OVER (PARTITION BY node_id
          |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
          |FROM g3""".stripMargin),
    // Full IVF reproduction: sampled-medoid centroids (smallest mod-prime
    // vec_id hash), argmin assignment on -2*dot+|c|^2 (the |v|^2 term drops
    // out), nprobe=4 probing, exact cosine rank.
    "e04_ann_ivf" -> ivfOracleSql(4),
    // e20: the shared assignment CTEs + per-cluster cap-lowest election
    // over the same mod-prime permutation the Spark sampler ranks on.
    "e20_cluster_sample" ->
      s"""$ivfAsgCte
         |SELECT CAST(centroid_id AS BIGINT) AS centroid_id, vec_id,
         |  CAST(rk AS BIGINT) AS rk
         |FROM (
         |  SELECT centroid_id, vec_id,
         |    row_number() OVER (PARTITION BY centroid_id
         |      ORDER BY vec_id % 1000000007 * 888000131 % 1000000007, vec_id) AS rk
         |  FROM asg) t
         |WHERE rk <= 24""".stripMargin,
    // e19: the same IVF SQL swept over nprobe, each setting left-joined
    // against the e01 exact panel — integer hit counts per setting.
    "e19_ivf_tuning" -> Seq(1, 2, 4).map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe, count(*) AS n_exact,
         |  count(a.neighbor_id) AS n_hit
         |FROM (
         |$knnExactOracleSql
         |) exact LEFT JOIN (
         |${ivfOracleSql(np)}
         |) a ON exact.query_id = a.query_id AND exact.neighbor_id = a.neighbor_id"""
        .stripMargin
    }.mkString("", "\nUNION ALL\n", ""),
    // s23 maintains q44's histogram on the stream with batch-derived
    // literal bounds; one AvailableNow pass equals q44's oracle.
    "s23_stream_histogram" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 1000) AS BIGINT) AS vm
        |           FROM lineitem),
        |b AS (SELECT min(vm) AS lo, max(vm) AS hi FROM v)
        |SELECT (vm - lo) * 20 // (hi - lo + 1) AS bucket,
        |  count(*) AS n_rows, CAST(sum(vm) AS BIGINT) AS sum_vmil
        |FROM v, b GROUP BY 1""".stripMargin,
    // q44: integer equi-width bucketing — the same (v−lo)·20 div span
    // arithmetic, so no float boundary can differ.
    "q44_equiwidth_histogram" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 1000) AS BIGINT) AS vm
        |           FROM lineitem),
        |b AS (SELECT min(vm) AS lo, max(vm) AS hi FROM v)
        |SELECT (vm - lo) * 20 // (hi - lo + 1) AS bucket,
        |  count(*) AS n_rows, CAST(sum(vm) AS BIGINT) AS sum_vmil
        |FROM v, b GROUP BY 1""".stripMargin,
    // d38: the digest election replayed with a packed (prio, doc_id)
    // min; the polynomial source-priority fold is the d13/d20 device.
    "d38_priority_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(coalesce(text, '')) AS h,
        |    list_reduce(list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(1, length(source)+1),
        |        i -> CAST(ascii(source[i]) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 5 AS prio
        |  FROM documents),
        |e AS (SELECT h, min(prio * 1099511627776 + doc_id) AS pk,
        |        count(*) AS n_copies
        |      FROM d GROUP BY 1)
        |SELECT d.doc_id, d.source, d.prio, e.n_copies
        |FROM e JOIN d ON d.doc_id = e.pk % 1099511627776""".stripMargin,
    // q43: daily rollup + the lag/growth window over the daily frame.
    "q43_period_growth" ->
      """WITH d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
        |             CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_vmil
        |           FROM events GROUP BY 1),
        |g AS (SELECT day, n_events, sum_vmil,
        |        lag(n_events) OVER (ORDER BY day) AS prev_events
        |      FROM d)
        |SELECT day, n_events, sum_vmil, prev_events,
        |  CASE WHEN prev_events IS NOT NULL
        |       THEN CAST(n_events - prev_events AS DOUBLE) / prev_events END AS growth_pct
        |FROM g""".stripMargin,
    // Product-quantization reproduction (generated for M=8 subspaces
    // over the 64-dim verification embeddings): e04's sampled fit split
    // into M sub-codebooks, per-subspace argmin codes, ADC lookup
    // tables, approximate-cosine top-64 cut, exact rerank. Every double
    // on both engines is the same left-to-right fold, so cut and rank
    // agree bit-for-bit.
    "e07_ann_pq" -> e07OracleSql,
    // IVF+PQ composition: the same generated PQ SQL with e04's
    // assignment/probe CTEs restricting candidates to the probed
    // coarse cells before the ADC cut.
    "e08_ann_ivf_pq" -> e08OracleSql,
    // SemDeDup reproduction: base ∪ two perturbed generations, e04's
    // deterministic coarse quantizer + argmin assignment (CTEs verbatim
    // from the e04 oracle), within-cluster exact cosine edges at the
    // 0.99 threshold, recursive-CTE connected components (the d11
    // pattern), per-cluster census with the base-member count.
    "d30_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |g1 AS (SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x * 1.0005 + 0.0001) AS v FROM e),
        |g2 AS (SELECT vec_id + 200000 AS vec_id, list_transform(v, x -> x * 0.9995 - 0.0001) AS v FROM e),
        |corpus AS (SELECT * FROM e UNION ALL SELECT * FROM g1 UNION ALL SELECT * FROM g2),
        |en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus
        |       WHERE sqrt(list_dot_product(v, v)) > 0),
        |cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id) - 1 AS cid,
        |    v AS cv
        |  FROM en
        |  ORDER BY vec_id % 1000000007 * 616318177 % 1000000007, vec_id
        |  LIMIT 16),
        |cc AS (SELECT cid, cv, list_dot_product(cv, cv) AS c2 FROM cents),
        |asg AS (
        |  SELECT vec_id, v, nrm, cid AS centroid_id FROM (
        |    SELECT en.vec_id, en.v, en.nrm, cc.cid,
        |      row_number() OVER (PARTITION BY en.vec_id
        |        ORDER BY list_dot_product(en.v, cc.cv) * -2 + cc.c2, cc.cid) AS rn
        |    FROM en CROSS JOIN cc) t
        |  WHERE rn = 1),
        |edges AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM asg a JOIN asg b USING (centroid_id)
        |  WHERE a.vec_id < b.vec_id
        |    AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.99),
        |bidir AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        |reach AS (
        |  SELECT u AS a, v AS b FROM bidir
        |  UNION
        |  SELECT r.a, e2.v FROM reach r JOIN bidir e2 ON r.b = e2.u WHERE e2.v <> r.a),
        |lab AS (SELECT a AS node, least(a, min(b)) AS cluster FROM reach GROUP BY a)
        |SELECT cluster AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(count(*) FILTER (node < 100000) AS BIGINT) AS n_base
        |FROM lab GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    // Embed-dedup reproduction: perturbed-twin corpus, 16-bit buckets with
    // the 64-cap census, hamming-1 probes, cosine threshold.
    "e03_embed_dedup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pert AS (SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x * 1.0005 + 0.0001) AS v FROM e),
        |corpus0 AS (SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM pert),
        |cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN list_dot_product(v, list_transform(range(1, len(v)+1), d -> CAST(
        |      (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007)
        |       * (((((j+1)*906150257) % 1000000007 * d + (j*741103597+13) % 1000000007) % 1000000007))
        |       % 1000000007 % 2) * 2 - 1 AS DOUBLE))) > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS bucket FROM corpus0),
        |census AS (SELECT bucket FROM cn GROUP BY bucket HAVING count(*) <= 64),
        |inn AS (SELECT cn.* FROM cn JOIN census USING (bucket)),
        |probes AS (
        |  SELECT vec_id AS vec_a, unnest(list_distinct(list_concat([bucket],
        |    list_transform(range(0, 16), j -> xor(bucket, CAST(1 AS BIGINT) << j))))) AS bucket
        |  FROM inn),
        |cand AS (
        |  SELECT DISTINCT p.vec_a, i.vec_id AS vec_b
        |  FROM probes p JOIN inn i USING (bucket) WHERE p.vec_a < i.vec_id)
        |SELECT vec_a, vec_b, cosine FROM (
        |  SELECT c.vec_a, c.vec_b, list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cosine
        |  FROM cand c JOIN cn a ON a.vec_id = c.vec_a JOIN cn b ON b.vec_id = c.vec_b) t
        |WHERE cosine >= 0.995""".stripMargin,
    "s01_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n_events, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // s25: the stitched backfill+live view must equal the pure-batch
    // hourly rollup over ALL history — the seam partition (ts < / ≥
    // cutover) is exact, so the cutover never appears in the oracle.
    "s25_stream_backfill" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n_events, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // s19: s01's hourly counts cut to the top 3 types per window,
    // ties by event_type
    "s19_stream_trending" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS bucket, event_type,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, event_type, n_events, rnk FROM (
        |  SELECT bucket, event_type, n_events,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY n_events DESC, event_type) AS rnk
        |  FROM c)
        |WHERE rnk <= 3""".stripMargin,
    "s02_stream_stateful" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS boundary FROM x),
        |z AS (
        |  SELECT *, CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM y)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM z GROUP BY 1, 2""".stripMargin,
    "s03_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events FROM events GROUP BY 1""",
    "s04_stream_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, event_id AS error_id, ts AS e_ts
        |      FROM events WHERE event_type = 'error')
        |SELECT e.user_id, count(*) AS n_pairs,
        |  count(DISTINCT e.error_id) AS n_errors
        |FROM e JOIN c ON e.user_id = c.user_id
        |  AND c.c_ts >= e.e_ts - INTERVAL 5 MINUTE AND c.c_ts < e.e_ts
        |GROUP BY 1""".stripMargin,
    // s16: the stream converges to the batch left-outer interval join
    // EXCEPT inside the final watermark horizon, where an unmatched
    // error is still undecidable (a matching click could yet arrive)
    // and stays in state — the horizon is encoded in exact integer ms
    "s16_stream_outer_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, event_id AS error_id, ts AS e_ts
        |      FROM events WHERE event_type = 'error'),
        |wm AS (SELECT least(
        |    (SELECT epoch_us(max(c_ts)) // 1000 FROM c),
        |    (SELECT epoch_us(max(e_ts)) // 1000 FROM e)) - 3600000 AS wm_ms),
        |j AS (
        |  SELECT e.user_id, e.error_id, c.click_id
        |  FROM e LEFT JOIN c ON e.user_id = c.user_id
        |    AND c.c_ts >= e.e_ts - INTERVAL 5 MINUTE AND c.c_ts < e.e_ts
        |  WHERE c.click_id IS NOT NULL
        |     OR epoch_us(e.e_ts) // 1000 <= (SELECT wm_ms FROM wm))
        |SELECT user_id, count(*) AS n_rows,
        |  count(click_id) AS n_matched,
        |  count(*) FILTER (WHERE click_id IS NULL) AS n_unmatched,
        |  count(DISTINCT error_id) AS n_errors
        |FROM j GROUP BY 1""".stripMargin,
    "relief_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_distance(q.v, e.v) AS dist
        |  FROM e q JOIN e ON e.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5)
        |SELECT query_id, neighbor_id, dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dist, neighbor_id) AS rn FROM s) t
        |WHERE rn <= 10""".stripMargin,
    "vector_assemble" ->
      """SELECT o_orderkey, CAST(2 AS INTEGER) AS dim, o_totalprice AS f0
        |FROM orders""".stripMargin,
    // vector_assemble_nominal: StringIndexer's frequencyDesc order
    // recomputed as a rank over (count DESC, value ASC) per nominal
    // column — Spark's documented tie-break is alphabetical.
    "vector_assemble_nominal" ->
      """WITH sti AS (
        |  SELECT v, (row_number() OVER (ORDER BY n DESC, v) - 1)::DOUBLE AS idx
        |  FROM (SELECT o_orderstatus AS v, count(*) AS n FROM orders GROUP BY 1)),
        |pri AS (
        |  SELECT v, (row_number() OVER (ORDER BY n DESC, v) - 1)::DOUBLE AS idx
        |  FROM (SELECT o_orderpriority AS v, count(*) AS n FROM orders GROUP BY 1))
        |SELECT o.o_orderkey, CAST(3 AS INTEGER) AS dim,
        |  s.idx AS f0, p.idx AS f1, o.o_totalprice AS f2
        |FROM orders o JOIN sti s ON s.v = o.o_orderstatus
        |              JOIN pri p ON p.v = o.o_orderpriority""".stripMargin,
    // vector_assemble_onehot: the README preprocessing path — one-hot
    // slots replay StringIndexer's frequencyDesc rank with Spark's
    // dropLast (an index equal to card−1 has no slot → −1); the scaled
    // numeric replays StandardScaler's (x − mean)/sample-std, round 6
    // absorbing cross-engine summation ulps.
    "vector_assemble_onehot" ->
      """WITH sidx AS (
        |  SELECT v, row_number() OVER (ORDER BY n DESC, v) - 1 AS idx,
        |    (count(*) OVER ()) AS card
        |  FROM (SELECT o_orderstatus AS v, count(*) AS n FROM orders GROUP BY 1)),
        |pidx AS (
        |  SELECT v, row_number() OVER (ORDER BY n DESC, v) - 1 AS idx,
        |    (count(*) OVER ()) AS card
        |  FROM (SELECT o_orderpriority AS v, count(*) AS n FROM orders GROUP BY 1)),
        |m AS (SELECT avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sd FROM orders)
        |SELECT o.o_orderkey,
        |  CAST((SELECT max(card) FROM sidx) + (SELECT max(card) FROM pidx) - 1 AS BIGINT) AS dim,
        |  CAST(CASE WHEN si.idx < si.card - 1 THEN si.idx ELSE -1 END AS BIGINT) AS status_slot,
        |  CAST(CASE WHEN pi.idx < pi.card - 1 THEN pi.idx ELSE -1 END AS BIGINT) AS prio_slot,
        |  round((o.o_totalprice - m.mu) / m.sd, 6) AS scaled_price
        |FROM orders o
        |  JOIN sidx si ON si.v = o.o_orderstatus
        |  JOIN pidx pi ON pi.v = o.o_orderpriority
        |  CROSS JOIN m""".stripMargin,
    // relief_weights / relief_select / relief_persist / relief_transform
    // are checked by FULL RECOMPUTATION: graft.ml.ReliefOracle generates
    // DuckDB SQL that independently re-runs the deterministic fit
    // (splitmix64 sampling/batching via HUGEINT 64-bit emulation, exact
    // per-class kNN, prior-weighted hit/miss relevance, collision
    // marginals/joints, MI redundancy, unrolled greedy) from the raw
    // parquet — no expected value is copied from the Scala output.
    "relief_weights" -> graft.ml.ReliefOracle.weightsSql,
    "relief_select" -> graft.ml.ReliefOracle.selectSql,
    "relief_persist" -> graft.ml.ReliefOracle.selectSql,
    "relief_transform" -> graft.ml.ReliefOracle.transformSql,
    // relief_weights_content: full recomputation too (round 9) — the
    // content hash's IEEE-754 bit patterns extracted exactly in SQL
    // (corrected floor(log2) exponent + exact power-of-two mantissa
    // scaling), then the same HUGEINT splitmix64 fold the vec_id path
    // uses; the last frozen-VALUES pin in the matrix is gone.
    "relief_weights_content" -> graft.ml.ReliefOracle.weightsContentSql,
    // f10/f11: full recomputation — exact integer bit contingencies,
    // entropies/MIs in ln/ln(2), unrolled selection rounds.
    "f10_fcbf" -> graft.ml.ReliefOracle.fcbfSql,
    "f11_cmim" -> graft.ml.ReliefOracle.cmimSql,
    // f13: same kernel — triple cells, joint-MI pair table, 10
    // unrolled accumulate-and-argmax rounds.
    "f13_jmi" -> graft.ml.ReliefOracle.jmiSql,
    // f14: one grouping-sets census + the 1-row prior; (s + M·prior)
    // / (n + M) in the Spark side's exact operation order.
    // milli-integer exact sums (the q43/q44 discipline), smoothing
    // expression parenthesized exactly as the Spark side
    "f14_target_encode" ->
      s"""WITH v AS (SELECT o_orderpriority, o_orderstatus,
         |        CAST(round(o_totalprice * 1000) AS BIGINT) AS pm FROM orders),
         |pri AS (SELECT CAST(sum(pm) AS DOUBLE) AS tm,
         |        CAST(count(*) AS DOUBLE) AS nn FROM v),
         |g AS (SELECT o_orderpriority, o_orderstatus,
         |        count(*) AS n, sum(pm) AS sm,
         |        GROUPING(o_orderpriority) AS gp
         |      FROM v
         |      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus)))
         |SELECT CASE WHEN gp = 0 THEN 'o_orderpriority'
         |            ELSE 'o_orderstatus' END AS feature,
         |  coalesce(o_orderpriority, o_orderstatus) AS category,
         |  CAST(n AS BIGINT) AS n,
         |  round((CAST(sm AS DOUBLE)
         |      + CAST(${graft.ml.ReliefQueries.TargetEncM} AS DOUBLE) * (tm / nn))
         |    / ((CAST(n AS DOUBLE)
         |      + CAST(${graft.ml.ReliefQueries.TargetEncM} AS DOUBLE)) * 1000.0), 6) AS target_enc
         |FROM g CROSS JOIN pri""".stripMargin,
    // f15: grouping-sets census over (priority, fixed price band),
    // WOE with half-observation smoothing, per-feature IV window.
    "f15_woe_iv" ->
      s"""WITH o AS (SELECT o_orderpriority,
         |    CAST(CAST(floor(o_totalprice / CAST(${graft.ml.ReliefQueries.WoeBand} AS DOUBLE)) AS BIGINT) AS VARCHAR) AS price_band,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
         |  FROM orders),
         |g AS (SELECT o_orderpriority, price_band,
         |        count(*) AS n, sum(bad) AS n_bad,
         |        GROUPING(o_orderpriority) AS gp
         |      FROM o GROUP BY GROUPING SETS ((o_orderpriority), (price_band))),
         |c AS (SELECT CASE WHEN gp = 0 THEN 'o_orderpriority'
         |             ELSE 'price_band' END AS feature,
         |        coalesce(o_orderpriority, price_band) AS bucket,
         |        CAST(n - n_bad AS BIGINT) AS n_good,
         |        CAST(n_bad AS BIGINT) AS n_bad
         |      FROM g),
         |s AS (SELECT feature, bucket, n_good, n_bad,
         |        CAST(sum(n_good) OVER (PARTITION BY feature) AS DOUBLE) AS good_tot,
         |        CAST(sum(n_bad) OVER (PARTITION BY feature) AS DOUBLE) AS bad_tot
         |      FROM c),
         |w AS (SELECT feature, bucket, n_good, n_bad,
         |        (n_good + CAST(0.5 AS DOUBLE)) / good_tot AS dg,
         |        (n_bad + CAST(0.5 AS DOUBLE)) / bad_tot AS db
         |      FROM s)
         |SELECT feature, bucket, n_good, n_bad,
         |  round(ln(dg / db), 6) AS woe,
         |  round(sum((dg - db) * ln(dg / db)) OVER (PARTITION BY feature), 6) AS iv
         |FROM w""".stripMargin,
    // f16: exact-midpoint time split (integer-µs arithmetic), one
    // grouping-sets census per half, smoothed PSI windows.
    "f16_psi" ->
      s"""WITH mm AS (SELECT min(epoch_us(o_orderdate)) AS lo,
         |    max(epoch_us(o_orderdate)) AS hi FROM orders),
         |o AS (SELECT o_orderpriority,
         |    CAST(CAST(floor(o_totalprice / CAST(${graft.ml.ReliefQueries.WoeBand} AS DOUBLE)) AS BIGINT) AS VARCHAR) AS price_band,
         |    CASE WHEN epoch_us(o_orderdate) * 2 >= mm.lo + mm.hi
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM orders CROSS JOIN mm),
         |g AS (SELECT o_orderpriority, price_band,
         |        sum(1 - is_new) AS n_old, sum(is_new) AS n_new,
         |        GROUPING(o_orderpriority) AS gp
         |      FROM o GROUP BY GROUPING SETS ((o_orderpriority), (price_band))),
         |c AS (SELECT CASE WHEN gp = 0 THEN 'o_orderpriority'
         |             ELSE 'price_band' END AS feature,
         |        coalesce(o_orderpriority, price_band) AS bucket,
         |        CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new
         |      FROM g),
         |s AS (SELECT feature, bucket, n_old, n_new,
         |        CAST(sum(n_old) OVER (PARTITION BY feature) AS DOUBLE) AS old_tot,
         |        CAST(sum(n_new) OVER (PARTITION BY feature) AS DOUBLE) AS new_tot
         |      FROM c),
         |w AS (SELECT feature, bucket, n_old, n_new,
         |        (n_old + CAST(0.5 AS DOUBLE)) / old_tot AS po,
         |        (n_new + CAST(0.5 AS DOUBLE)) / new_tot AS pn
         |      FROM s)
         |SELECT feature, bucket, n_old, n_new,
         |  round((pn - po) * ln(pn / po), 6) AS psi_contrib,
         |  round(sum((pn - po) * ln(pn / po)) OVER (PARTITION BY feature), 6) AS psi
         |FROM w""".stripMargin,
    // q47: first-seen census + running sum over the day frame — the
    // scalable cumulative-distinct identity, replayed directly.
    "q47_user_growth" ->
      """WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY 1),
        |pd AS (SELECT first_day AS day, count(*)::BIGINT AS n_new
        |  FROM fs GROUP BY 1),
        |act AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        |SELECT CAST(a.day AS VARCHAR) AS day,
        |  coalesce(p.n_new, 0)::BIGINT AS n_new_users,
        |  CAST(sum(coalesce(p.n_new, 0)) OVER (ORDER BY a.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM act a LEFT JOIN pd p ON p.day = a.day""".stripMargin,
    // b01: full replay — class census, majority target, floor-division
    // replication plan, mod-prime rank window, extra-row id sum.
    "b01_class_rebalance" ->
      """WITH rws AS (SELECT vec_id::BIGINT AS id, label::BIGINT AS lbl FROM embeddings),
        |census AS (SELECT lbl, count(*)::BIGINT AS n_before FROM rws GROUP BY 1),
        |mm AS (SELECT max(n_before) AS m FROM census),
        |pln AS (SELECT lbl, n_before,
        |  (SELECT m FROM mm) // n_before AS rep_base,
        |  (SELECT m FROM mm) - ((SELECT m FROM mm) // n_before) * n_before AS n_extra
        |  FROM census),
        |ranked AS (SELECT id, lbl, row_number() OVER (PARTITION BY lbl
        |  ORDER BY ((id % 1000000007) * 900000011 % 1000000007 + 20260812), id) AS rnk
        |  FROM rws),
        |extra AS (SELECT r.lbl, CAST(sum(r.id) AS BIGINT) AS extra_id_sum
        |  FROM ranked r JOIN pln p ON p.lbl = r.lbl
        |  WHERE r.rnk <= p.n_extra GROUP BY 1)
        |SELECT p.lbl AS label, p.n_before, p.rep_base, p.n_extra,
        |  p.rep_base * p.n_before + p.n_extra AS n_after,
        |  coalesce(e.extra_id_sum, 0) AS extra_id_sum
        |FROM pln p LEFT JOIN extra e ON e.lbl = p.lbl""".stripMargin,
    // f12: full two-round MDLP replay — densified cumulative label
    // mass, entropies, the MDL test and the best-boundary pick, with
    // round 2 conditioned on round-1 acceptance (empty on this corpus
    // by the criterion itself, not by omission).
    "f12_mdlp_discretize" ->
      """WITH cells AS (
        |  SELECT dim, 0::BIGINT AS seg, xm, lbl, count(*)::BIGINT AS c
        |  FROM (SELECT label::BIGINT AS lbl, unnest(range(0, 64)) AS dim,
        |          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS xm
        |        FROM embeddings)
        |  GROUP BY 1, 2, 3, 4),
        |labs AS (SELECT DISTINCT lbl FROM cells),
        |pos1 AS (SELECT DISTINCT dim, seg, xm FROM cells),
        |dense1 AS (
        |  SELECT p.dim, p.seg, p.xm, l.lbl, coalesce(c.c, 0)::BIGINT AS c
        |  FROM pos1 p CROSS JOIN labs l
        |  LEFT JOIN cells c ON c.dim = p.dim AND c.seg = p.seg
        |                   AND c.xm = p.xm AND c.lbl = l.lbl),
        |g1 AS (
        |  SELECT dim, seg, xm, lbl, c,
        |    sum(c) OVER (PARTITION BY dim, seg, lbl ORDER BY xm)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY dim, seg, lbl)::BIGINT AS tot,
        |    sum(c) OVER (PARTITION BY dim, seg)::BIGINT AS n,
        |    max(xm) OVER (PARTITION BY dim, seg) AS xmax
        |  FROM dense1),
        |g1b AS (
        |  SELECT *, tot - cum AS r,
        |    sum(cum) OVER (PARTITION BY dim, seg, xm)::BIGINT AS nl,
        |    n - sum(cum) OVER (PARTITION BY dim, seg, xm)::BIGINT AS nr
        |  FROM g1),
        |hs1 AS (
        |  SELECT dim, seg,
        |    sum(CASE WHEN tot > 0 THEN -(tot::DOUBLE / n) * log2(tot::DOUBLE / n)
        |        ELSE 0 END) AS hs,
        |    sum(CASE WHEN tot > 0 THEN 1 ELSE 0 END)::BIGINT AS k,
        |    max(n) AS n
        |  FROM (SELECT DISTINCT dim, seg, lbl, tot, n FROM g1)
        |  GROUP BY 1, 2),
        |cand1 AS (
        |  SELECT dim, seg, xm, max(nl) AS nl, max(nr) AS nr,
        |    sum(CASE WHEN cum > 0 THEN -(cum::DOUBLE / nl) * log2(cum::DOUBLE / nl)
        |        ELSE 0 END) AS hl,
        |    sum(CASE WHEN r > 0 THEN -(r::DOUBLE / nr) * log2(r::DOUBLE / nr)
        |        ELSE 0 END) AS hr,
        |    sum(CASE WHEN cum > 0 THEN 1 ELSE 0 END)::BIGINT AS k1,
        |    sum(CASE WHEN r > 0 THEN 1 ELSE 0 END)::BIGINT AS k2
        |  FROM g1b WHERE xm < xmax
        |  GROUP BY 1, 2, 3),
        |sc1 AS (
        |  SELECT c.dim, c.seg, h.n, c.xm,
        |    h.hs - (c.nl::DOUBLE / h.n) * c.hl - (c.nr::DOUBLE / h.n) * c.hr AS gain,
        |    (log2(h.n::DOUBLE - 1) + log2(pow(3.0, h.k) - 2.0)
        |      - (h.k * h.hs - c.k1 * c.hl - c.k2 * c.hr)) / h.n AS mdl_thr
        |  FROM cand1 c JOIN hs1 h USING (dim, seg)),
        |best1 AS (
        |  SELECT dim, seg, n, xm AS cut_xm, gain, mdl_thr, gain > mdl_thr AS accepted
        |  FROM (SELECT *, row_number() OVER (PARTITION BY dim, seg
        |          ORDER BY gain DESC, xm ASC) AS rn FROM sc1)
        |  WHERE rn = 1),
        |cells2 AS (
        |  SELECT c.dim,
        |    (c.seg * 2 + CASE WHEN c.xm > b.cut_xm THEN 1 ELSE 0 END)::BIGINT AS seg,
        |    c.xm, c.lbl, c.c
        |  FROM cells c JOIN (SELECT dim, seg, cut_xm FROM best1 WHERE accepted) b
        |    ON b.dim = c.dim AND b.seg = c.seg),
        |pos2 AS (SELECT DISTINCT dim, seg, xm FROM cells2),
        |dense2 AS (
        |  SELECT p.dim, p.seg, p.xm, l.lbl, coalesce(c.c, 0)::BIGINT AS c
        |  FROM pos2 p CROSS JOIN labs l
        |  LEFT JOIN cells2 c ON c.dim = p.dim AND c.seg = p.seg
        |                    AND c.xm = p.xm AND c.lbl = l.lbl),
        |g2 AS (
        |  SELECT dim, seg, xm, lbl, c,
        |    sum(c) OVER (PARTITION BY dim, seg, lbl ORDER BY xm)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY dim, seg, lbl)::BIGINT AS tot,
        |    sum(c) OVER (PARTITION BY dim, seg)::BIGINT AS n,
        |    max(xm) OVER (PARTITION BY dim, seg) AS xmax
        |  FROM dense2),
        |g2b AS (
        |  SELECT *, tot - cum AS r,
        |    sum(cum) OVER (PARTITION BY dim, seg, xm)::BIGINT AS nl,
        |    n - sum(cum) OVER (PARTITION BY dim, seg, xm)::BIGINT AS nr
        |  FROM g2),
        |hs2 AS (
        |  SELECT dim, seg,
        |    sum(CASE WHEN tot > 0 THEN -(tot::DOUBLE / n) * log2(tot::DOUBLE / n)
        |        ELSE 0 END) AS hs,
        |    sum(CASE WHEN tot > 0 THEN 1 ELSE 0 END)::BIGINT AS k,
        |    max(n) AS n
        |  FROM (SELECT DISTINCT dim, seg, lbl, tot, n FROM g2)
        |  GROUP BY 1, 2),
        |cand2 AS (
        |  SELECT dim, seg, xm, max(nl) AS nl, max(nr) AS nr,
        |    sum(CASE WHEN cum > 0 THEN -(cum::DOUBLE / nl) * log2(cum::DOUBLE / nl)
        |        ELSE 0 END) AS hl,
        |    sum(CASE WHEN r > 0 THEN -(r::DOUBLE / nr) * log2(r::DOUBLE / nr)
        |        ELSE 0 END) AS hr,
        |    sum(CASE WHEN cum > 0 THEN 1 ELSE 0 END)::BIGINT AS k1,
        |    sum(CASE WHEN r > 0 THEN 1 ELSE 0 END)::BIGINT AS k2
        |  FROM g2b WHERE xm < xmax
        |  GROUP BY 1, 2, 3),
        |sc2 AS (
        |  SELECT c.dim, c.seg, h.n, c.xm,
        |    h.hs - (c.nl::DOUBLE / h.n) * c.hl - (c.nr::DOUBLE / h.n) * c.hr AS gain,
        |    (log2(h.n::DOUBLE - 1) + log2(pow(3.0, h.k) - 2.0)
        |      - (h.k * h.hs - c.k1 * c.hl - c.k2 * c.hr)) / h.n AS mdl_thr
        |  FROM cand2 c JOIN hs2 h USING (dim, seg)),
        |best2 AS (
        |  SELECT dim, seg, n, xm AS cut_xm, gain, mdl_thr, gain > mdl_thr AS accepted
        |  FROM (SELECT *, row_number() OVER (PARTITION BY dim, seg
        |          ORDER BY gain DESC, xm ASC) AS rn FROM sc2)
        |  WHERE rn = 1)
        |SELECT dim, 1::BIGINT AS level, seg, n, cut_xm, gain, mdl_thr, accepted FROM best1
        |UNION ALL
        |SELECT dim, 2::BIGINT, seg, n, cut_xm, gain, mdl_thr, accepted FROM best2""".stripMargin,
    // Full MinHash+LSH reproduction: poly-hashed shingles, universal-hash
    // permutation minima, banded buckets with the 2..64 census cap —
    // identical mod-1e9+7 arithmetic to Dedup.withSignature/lshCandidates.
    "d06_minhash_lsh" -> d06PairsSql,
    // d46: shared signature CTEs + per-plan measured census and
    // repeated-squaring S-curve integrals.
    "d46_lsh_tuning" -> d46OracleSql,
    // d44: the d06 pair evidence + the deterministic split tag — pair
    // census by split kind plus the count of leaked val docs.
    "d44_split_leakage" ->
      s"""WITH p AS (
         |$d06PairsSql
         |),
         |sp AS (SELECT doc_a, doc_b,
         |  CASE WHEN doc_a % 1000000007 * 888000131 % 1000000007 % 5 = 0
         |       THEN 'val' ELSE 'train' END AS sa,
         |  CASE WHEN doc_b % 1000000007 * 888000131 % 1000000007 % 5 = 0
         |       THEN 'val' ELSE 'train' END AS sb
         |  FROM p)
         |SELECT 'pairs_' || least(sa, sb) || '_' || greatest(sa, sb) AS metric,
         |  count(*) AS n
         |FROM sp GROUP BY 1
         |UNION ALL
         |SELECT 'val_docs_leaked',
         |  count(DISTINCT CASE WHEN sa = 'val' THEN doc_a ELSE doc_b END)
         |FROM sp WHERE sa <> sb""".stripMargin,
    // SimHash reproduction: packed dual poly token hashes, per-bit vote
    // packing (bits 60-63 are provably 0), 16-bit chunk buckets + cap.
    "d07_simhash" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM corpus WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 1),
        |th AS (
        |  SELECT doc_id, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007) * 1000000007 +
        |    list_reduce(list_prepend(CAST(19 AS BIGINT),
        |      list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
        |      (b, c) -> (b * 37 + c) % 1000000007)) AS hv
        |  FROM d),
        |sim AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 60), b -> CASE
        |      WHEN list_sum(list_transform(hv, h -> ((h >> b) & 1) * 2 - 1)) > 0
        |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS simhash
        |  FROM th),
        |ch AS (
        |  SELECT doc_id, CAST(simhash AS BIGINT) AS simhash, c.c AS chunk_id,
        |    (CAST(simhash AS BIGINT) >> (c.c * 16)) & 65535 AS chunk_val
        |  FROM sim, (SELECT unnest(range(0, 4)) AS c) c),
        |useful AS (
        |  SELECT chunk_id, chunk_val FROM ch GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 64),
        |cin AS (SELECT ch.* FROM ch JOIN useful USING (chunk_id, chunk_val))
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM cin a JOIN cin b USING (chunk_id, chunk_val)
        |  WHERE a.doc_id < b.doc_id) t
        |WHERE hamming <= 6""".stripMargin,
    // Exact shingle-set Jaccard over the SAME LSH candidate pairs as d06.
    // d40: exact panel ground truth vs d08's LSH+verify output —
    // the dedup tier's e10-style recall harness.
    "d40_dedup_eval" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id),
        |found AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT p.doc_a, p.doc_b,
        |      CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        |    FROM pairs p
        |    JOIN sg sa ON sa.doc_id = p.doc_a
        |    JOIN sg sb ON sb.doc_id = p.doc_b) t
        |  WHERE jaccard >= 0.6),
        |fb AS (SELECT doc_a AS panel_id, doc_b AS other_id FROM found
        |       UNION ALL SELECT doc_b, doc_a FROM found),
        |hsd AS (SELECT doc_id, list_distinct(hv) AS hss FROM hs),
        |truth AS (
        |  SELECT p.doc_id AS panel_id, c.doc_id AS other_id
        |  FROM hsd p JOIN hsd c ON c.doc_id <> p.doc_id
        |  WHERE p.doc_id < 50
        |    AND CAST(len(list_intersect(p.hss, c.hss)) AS DOUBLE)
        |        / len(list_distinct(list_concat(p.hss, c.hss))) >= 0.6),
        |hits AS (SELECT t.panel_id, count(*) AS n_found FROM truth t
        |         WHERE EXISTS (SELECT 1 FROM fb
        |           WHERE fb.panel_id = t.panel_id AND fb.other_id = t.other_id)
        |         GROUP BY 1)
        |SELECT t.panel_id, count(*) AS n_true,
        |  CAST(coalesce(max(h.n_found), 0) AS BIGINT) AS n_found
        |FROM truth t LEFT JOIN hits h ON h.panel_id = t.panel_id
        |GROUP BY 1""".stripMargin,
    "d08_ngram_jaccard" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT p.doc_a, p.doc_b,
        |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        |  FROM pairs p
        |  JOIN sg sa ON sa.doc_id = p.doc_a
        |  JOIN sg sb ON sb.doc_id = p.doc_b) t
        |WHERE jaccard >= 0.6""".stripMargin,
    // Directional shingle containment over the SAME LSH candidate
    // pairs — exact integer set sizes, so the 0.9 threshold cannot
    // flip cross-engine.
    "d28_containment" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, containment_a, containment_b FROM (
        |  SELECT p.doc_a, p.doc_b,
        |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |      / len(sa.shingles) AS containment_a,
        |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |      / len(sb.shingles) AS containment_b
        |  FROM pairs p
        |  JOIN sg sa ON sa.doc_id = p.doc_a
        |  JOIN sg sb ON sb.doc_id = p.doc_b) t
        |WHERE greatest(containment_a, containment_b) >= 0.9""".stripMargin,
    // Connected components over the d08 edges via recursive transitive
    // closure (min reachable id = cluster id) — matches large-star/small-star.
    "d11_dup_clusters" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM (
        |    SELECT p.doc_a, p.doc_b,
        |      CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        |    FROM pairs p
        |    JOIN sg sa ON sa.doc_id = p.doc_a
        |    JOIN sg sb ON sb.doc_id = p.doc_b) t
        |  WHERE jaccard >= 0.6),
        |bidir AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        |reach AS (
        |  SELECT u AS a, v AS b FROM bidir
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN bidir e ON r.b = e.u WHERE e.v <> r.a),
        |lab AS (SELECT a AS node, least(a, min(b)) AS cluster FROM reach GROUP BY a)
        |SELECT cluster AS cluster_id, CAST(count(*) AS BIGINT) AS n_members
        |FROM lab GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    // d23 composes the SAME clustering (CTEs duplicated verbatim, as
    // d06/d07/d08 already do for the signature pipeline) with the
    // survivor rule: longest member wins, ties to the smaller doc_id —
    // exact integer comparisons, so the choice can never flip engines.
    "d23_cluster_survivors" ->
      """WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus)
        |  WHERE len(toks) >= 3),
        |hs AS (
        |  SELECT doc_id, shingles, list_transform(shingles, s ->
        |    list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007)) AS hv
        |  FROM sh),
        |sg AS (
        |  SELECT doc_id, shingles, list_transform(range(0, 64), s ->
        |    list_min(list_transform(hv, h ->
        |      (((s+1) * 906150257) % 1000000007 * h + (s * 741103597 + 13) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, b.b AS band_id,
        |    list_reduce(list_prepend(CAST(1009 AS BIGINT), sig[b.b*4+1 : b.b*4+4]),
        |      (acc, x) -> (acc * 1000003 + x) % 1000000007) AS band_sig
        |  FROM sg, (SELECT unnest(range(0, 16)) AS b) b),
        |useful AS (
        |  SELECT band_id, band_sig FROM bands GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) a
        |  JOIN (SELECT bands.* FROM bands JOIN useful USING (band_id, band_sig)) b
        |    USING (band_id, band_sig)
        |  WHERE a.doc_id < b.doc_id),
        |edges AS (
        |  SELECT doc_a AS u, doc_b AS v FROM (
        |    SELECT p.doc_a, p.doc_b,
        |      CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        |        / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
        |    FROM pairs p
        |    JOIN sg sa ON sa.doc_id = p.doc_a
        |    JOIN sg sb ON sb.doc_id = p.doc_b) t
        |  WHERE jaccard >= 0.6),
        |bidir AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
        |reach AS (
        |  SELECT u AS a, v AS b FROM bidir
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN bidir e ON r.b = e.u WHERE e.v <> r.a),
        |lab AS (SELECT a AS node, least(a, min(b)) AS cluster FROM reach GROUP BY a),
        |ln AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_len FROM corpus),
        |rk AS (
        |  SELECT cluster, node, n_len,
        |    row_number() OVER (PARTITION BY cluster ORDER BY n_len DESC, node) AS rn,
        |    count(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM lab JOIN ln ON node = doc_id)
        |SELECT cluster AS cluster_id, CAST(n_members AS BIGINT) AS n_members,
        |  node AS survivor_id, n_len AS survivor_len
        |FROM rk WHERE rn = 1 AND n_members >= 2""".stripMargin,
    "d14_decontam" -> decontamOracleSql,
    // s24 is d39 at ingestion: pair-keyed streaming state folds to the
    // same census, so it shares d39's oracle.
    "s24_stream_pressure" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
        |      < 20000000 AS is_bench
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_bench,
        |    unnest(list_distinct(list_transform(range(1, len(toks)-3),
        |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM d WHERE len(toks) >= 5),
        |b AS (SELECT doc_id AS bench_id, gram FROM g WHERE is_bench),
        |c AS (SELECT doc_id AS crawl_id, gram FROM g WHERE NOT is_bench)
        |SELECT b.bench_id, count(DISTINCT c.crawl_id) AS n_crawl_docs,
        |  count(*) AS n_gram_hits
        |FROM c JOIN b USING (gram)
        |GROUP BY 1""".stripMargin,
    // d39 aggregates the same gram join from the benchmark's side:
    // distinct crawl docs per bench doc + the raw hit volume.
    "d39_contamination_pressure" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
        |      < 20000000 AS is_bench
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_bench,
        |    unnest(list_distinct(list_transform(range(1, len(toks)-3),
        |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM d WHERE len(toks) >= 5),
        |b AS (SELECT doc_id AS bench_id, gram FROM g WHERE is_bench),
        |c AS (SELECT doc_id AS crawl_id, gram FROM g WHERE NOT is_bench)
        |SELECT b.bench_id, count(DISTINCT c.crawl_id) AS n_crawl_docs,
        |  count(*) AS n_gram_hits
        |FROM c JOIN b USING (gram)
        |GROUP BY 1""".stripMargin,
    // q45: the same EXISTS in DuckDB SQL — both engines decorrelate it.
    "q45_sql_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    // d33 is the fuzzy (near-dup) counterpart: both MinHash pipelines,
    // the crawl×bench band join, and the exact contamination verify
    // replayed in SQL
    "d33_fuzzy_decontam" -> d33OracleSql,
    // d34's sketch pruning is exact by the CMS over-estimate guarantee,
    // so the oracle is simply the naive full groupBy with the same
    // integer threshold (N div 500 + 1)
    "d34_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT term, count(*) AS freq
        |FROM toks GROUP BY term
        |HAVING count(*) >= (SELECT n // 500 + 1 FROM tot)""".stripMargin,
    // d29 is d14 with a Bloom pre-filter whose false positives the
    // exact verify join removes — row-identical, same oracle
    "d29_bloom_decontam" -> decontamOracleSql,
    // d31 trains the bigram "LM" on the bench slice and scores the
    // crawl — integer counts end to end, no log-probs (libm-safe).
    "d31_reference_lm" -> referenceLmOracleSql,
    // d35: d31's coverage scoring + integer tier cuts + the d13/d20
    // hash-threshold sampling, replayed end to end
    "d35_quality_mix" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
        |      < 20000000 AS is_bench
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_bench,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM d WHERE len(toks) >= 2),
        |m AS (SELECT gram, count(*) AS ref_freq FROM g WHERE is_bench GROUP BY 1),
        |s AS (SELECT g.doc_id, m.ref_freq
        |      FROM g LEFT JOIN m USING (gram) WHERE NOT g.is_bench),
        |sc AS (SELECT doc_id, count(*) AS nb,
        |         count(*) FILTER (ref_freq IS NULL) AS nu
        |       FROM s GROUP BY 1),
        |t AS (
        |  SELECT d.doc_id, d.n_chars,
        |    CASE WHEN sc.nb IS NULL THEN 0
        |         WHEN (sc.nb - sc.nu) * 20 >= sc.nb * 11 THEN 2
        |         WHEN (sc.nb - sc.nu) * 20 >= sc.nb * 7 THEN 1
        |         ELSE 0 END AS tier
        |  FROM d LEFT JOIN sc USING (doc_id) WHERE NOT d.is_bench),
        |a AS (
        |  SELECT CAST(tier AS BIGINT) AS tier, n_chars,
        |    CASE WHEN ((doc_id % 1000000007) * 888000131 % 1000000007 + 99) % 1000000007 * 10
        |           < CAST(CASE tier WHEN 2 THEN 10 WHEN 1 THEN 5 ELSE 1 END AS BIGINT) * 1000000007
        |         THEN 1 ELSE 0 END AS adm
        |  FROM t)
        |SELECT tier, count(*) AS n_docs,
        |  CAST(sum(adm) AS BIGINT) AS n_sampled,
        |  CAST(coalesce(sum(CASE WHEN adm = 1 THEN n_chars ELSE 0 END), 0) AS BIGINT)
        |    AS sampled_chars
        |FROM a GROUP BY 1""".stripMargin,
    // d32: the whole count-min sketch — token polyhash, 4 affine
    // bucket maps, counter build, min-over-rows point queries —
    // reproduced in SQL; everything is integer arithmetic
    "d32_cms_termfreq" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |th AS (
        |  SELECT list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(term)+1), i -> CAST(ascii(term[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007) AS th
        |  FROM toks),
        |rb AS (
        |  SELECT r, CASE r
        |      WHEN 0 THEN ((th * 1000003 + 17) % 1000000007) % 1024
        |      WHEN 1 THEN ((th * 999983 + 7919) % 1000000007) % 1024
        |      WHEN 2 THEN ((th * 1000033 + 101) % 1000000007) % 1024
        |      ELSE ((th * 999979 + 271) % 1000000007) % 1024 END AS bucket
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r)),
        |counters AS (SELECT r, bucket, count(*) AS cnt FROM rb GROUP BY 1, 2),
        |panel AS (SELECT DISTINCT term FROM (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE doc_id < 20)),
        |pth AS (
        |  SELECT term, list_reduce(list_prepend(CAST(17 AS BIGINT),
        |      list_transform(range(1, length(term)+1), i -> CAST(ascii(term[i]) AS BIGINT))),
        |      (b, c) -> (b * 31 + c) % 1000000007) AS th
        |  FROM panel),
        |prb AS (
        |  SELECT term, r, CASE r
        |      WHEN 0 THEN ((th * 1000003 + 17) % 1000000007) % 1024
        |      WHEN 1 THEN ((th * 999983 + 7919) % 1000000007) % 1024
        |      WHEN 2 THEN ((th * 1000033 + 101) % 1000000007) % 1024
        |      ELSE ((th * 999979 + 271) % 1000000007) % 1024 END AS bucket
        |  FROM pth CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r))
        |SELECT term, CAST(min(cnt) AS BIGINT) AS est_freq
        |FROM prb JOIN counters USING (r, bucket)
        |GROUP BY term ORDER BY est_freq DESC, term LIMIT 50""".stripMargin,
    // s13 is d31 deployed at ingestion: one AvailableNow pass over the
    // document stream must reproduce the batch scores exactly.
    "s13_stream_quality_lm" -> referenceLmOracleSql,
    // s09 is d14 deployed at ingestion: one AvailableNow pass over the
    // document stream must reproduce the batch decontamination exactly.
    "s09_stream_decontam" -> decontamOracleSql,
    "d15_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |      / len(toks) AS mean_word_len,
        |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bigrams
        |  FROM d WHERE len(toks) >= 2),
        |bg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM s),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |tb AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
        |       FROM bc GROUP BY 1)
        |SELECT s.doc_id, n_words, mean_word_len, top_bigram_frac,
        |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND top_bigram_frac <= 0.2 AS passes_quality
        |FROM s JOIN tb USING (doc_id)""".stripMargin,
    "d16_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
        |    '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b', '[PHONE]', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    // the funnel's gate inputs are exactly d03/d15/d16's metrics (each
    // pinned bit-exact by its own oracle), so the gate booleans and the
    // per-source counts are integer-exact cross-engine
    "d18_curation_funnel" ->
      """WITH sg AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_words,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
        |      / CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) AS stop_ratio,
        |    length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) AS upper_ratio,
        |    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      + len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |      + len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) AS n_pii
        |  FROM documents),
        |d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bigrams
        |      FROM d WHERE len(toks) >= 2),
        |bg AS (SELECT doc_id, unnest(bigrams) AS bigram FROM s),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |tb AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac FROM bc GROUP BY 1),
        |g AS (
        |  SELECT sg.source,
        |    (n_words BETWEEN 50 AND 100000) AS g_len,
        |    (stop_ratio >= 0.05) AS g_stop,
        |    (upper_ratio <= 0.3) AS g_upper,
        |    (COALESCE(top_bigram_frac, 0.0) <= 0.2) AS g_rep,
        |    (n_pii = 0) AS g_pii
        |  FROM sg LEFT JOIN tb USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (WHERE g_len) AS n_pass_len,
        |  count(*) FILTER (WHERE g_stop) AS n_pass_stop,
        |  count(*) FILTER (WHERE g_upper) AS n_pass_upper,
        |  count(*) FILTER (WHERE g_rep) AS n_pass_rep,
        |  count(*) FILTER (WHERE g_pii) AS n_pass_pii,
        |  count(*) FILTER (WHERE g_len AND g_stop AND g_upper AND g_rep AND g_pii) AS n_clean
        |FROM g GROUP BY 1""".stripMargin,
    // both engines digest with md5 (identical lowercase hex), split on
    // doc_id%5, anti-join on the digest; the min-doc_id tie-break makes
    // the admitted set deterministic
    "d19_incremental_dedup" ->
      """WITH inc AS (SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 5 = 0),
        |ex AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0),
        |fresh AS (SELECT * FROM inc WHERE h NOT IN (SELECT h FROM ex)),
        |adm AS (SELECT min(doc_id) AS doc_id FROM fresh GROUP BY h),
        |adms AS (SELECT source, count(*) AS n_admitted FROM adm JOIN inc USING (doc_id) GROUP BY 1),
        |pi AS (SELECT source, count(*) AS n_incoming FROM inc GROUP BY 1),
        |pf AS (SELECT source, count(*) AS n_fresh FROM fresh GROUP BY 1)
        |SELECT pi.source, n_incoming,
        |  n_incoming - COALESCE(n_fresh, 0) AS n_dup_vs_existing,
        |  COALESCE(n_admitted, 0) AS n_admitted
        |FROM pi LEFT JOIN pf USING (source) LEFT JOIN adms USING (source)""".stripMargin,
    // the same mod-prime threshold arithmetic as d13, with the rate
    // keyed per source by a char-fold of the source name
    "d20_corpus_mix" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    list_reduce(list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(1, length(source)+1), i -> CAST(ascii(source[i]) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) AS sh
        |  FROM documents)
        |SELECT source,
        |  count(*) AS n_docs,
        |  count(*) FILTER (WHERE
        |    ((doc_id % 1000000007) * 888000131 % 1000000007 + 99) % 1000000007 <
        |      CAST(floor((sh % 3 + 1) * 0.25 * 1000000007) AS BIGINT)) AS n_sampled,
        |  (sh % 3 + 1) * 0.25 AS target_frac
        |FROM s GROUP BY source, sh""".stripMargin,
    // The oracle states the packing as ONE global cumulative window —
    // the semantics the two-level prefix-sum plan must reproduce.
    "d21_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
        |  FROM t)
        |SELECT doc_id, n_tokens, start_token, start_token // 2000 AS shard_id
        |FROM c""".stripMargin,
    // All-integer rarity statistics (document frequencies) + one exact
    // division — deliberately no log/rank so nothing can diverge.
    "d24_doc_rarity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS term
        |  FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1)
        |SELECT doc_id, count(*) AS n_terms, CAST(min(df) AS BIGINT) AS min_df,
        |  CAST(sum(df) AS DOUBLE) / count(*) AS mean_df
        |FROM t JOIN d USING (term)
        |GROUP BY 1""".stripMargin,
    "d22_corpus_profile" ->
      """WITH a AS (
        |  SELECT lang,
        |    least(CAST(floor(n_chars / 50) AS BIGINT), 11) AS len_bucket,
        |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, len_bucket, n_docs, sum_chars,
        |  CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
        |    AS lang_share
        |FROM a""".stripMargin,
    "s08_stream_incr_dedup" ->
      """WITH inc AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 5 = 0),
        |ex AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 <> 0)
        |SELECT (SELECT count(*) FROM inc) AS n_incoming,
        |  count(DISTINCT h) AS n_distinct_new
        |FROM inc WHERE h NOT IN (SELECT h FROM ex)""".stripMargin,
    // w06 lands exactly the rows s07's gate admits, so the oracle is
    // the batch gate as a WHERE (null gate = rejected, like Spark's
    // where) rolled up per source; CAST: DuckDB sum(BIGINT) is HUGEINT
    "w06_sink_streamed" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE (CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) BETWEEN 50 AND 100000
        |  AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
        |      / CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) >= 0.05
        |  AND length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) <= 0.3
        |  AND len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |    + len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) = 0)
        |GROUP BY 1""".stripMargin,
    // the streaming gate is d18's scalar-gate subset (no repetition
    // gate), so the batch formulation is the exact oracle
    "s07_stream_quality_gate" ->
      """WITH g AS (
        |  SELECT source,
        |    (CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) BETWEEN 50 AND 100000
        |     AND len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |           t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
        |         / CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE) >= 0.05
        |     AND length(regexp_replace(text, '[^A-Z]', '', 'g')) / CAST(length(text) AS DOUBLE) <= 0.3
        |     AND len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |       + len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |       + len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) = 0) AS admitted
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (WHERE admitted) AS n_admitted
        |FROM g GROUP BY 1""".stripMargin,
    // exact DECIMAL revenue + (rev DESC, custkey) total order make every
    // decile boundary deterministic and engine-independent
    "q31_ntile_deciles" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |d AS (SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile FROM rev)
        |SELECT decile, count(*) AS n_customers, CAST(sum(rev) AS DOUBLE) AS sum_revenue
        |FROM d GROUP BY 1""".stripMargin,
    // q25b's exactness trick again: accuracy 1e6 >> n makes Spark's
    // approx_percentile sketch exact, matching quantile_disc's discrete
    // cut elements; decile = 10 - #{cuts <= rev} mirrors the band join
    "q31b_decile_cuts" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |cuts AS (
        |  SELECT unnest(quantile_disc(CAST(rev AS DOUBLE),
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS c FROM rev),
        |assigned AS (
        |  SELECT r.rev,
        |    10 - (SELECT count(*) FROM cuts WHERE c <= CAST(r.rev AS DOUBLE)) AS decile
        |  FROM rev r)
        |SELECT decile, count(*) AS n_customers, CAST(sum(rev) AS DOUBLE) AS sum_revenue
        |FROM assigned GROUP BY 1""".stripMargin,
    // chunk-level dedup over the near-dup corpus: d06's corpus prelude +
    // d09's chunk arithmetic, then occurrence counts per chunk text
    "d17_chunk_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |tr AS (
        |  SELECT doc_id + 1000000 AS doc_id, array_to_string(toks[1:len(toks)-3], ' ') AS text
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM base)
        |  WHERE len(toks) >= 12),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tr),
        |t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    length(regexp_split_to_array(trim(text), '\s+')) AS n
        |  FROM corpus),
        |ch AS (
        |  SELECT doc_id, array_to_string(toks[i*10 + 1 : i*10 + 50], ' ') AS chunk_text
        |  FROM t, LATERAL (SELECT unnest(range(0, CAST(floor(greatest(n - 50, 0)/10) AS BIGINT) + 1)) AS i)),
        |occ AS (SELECT chunk_text, count(*) AS n_occ FROM ch GROUP BY 1)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE n_occ > 1) AS BIGINT) AS n_dup_chunks
        |FROM ch JOIN occ USING (chunk_text) GROUP BY 1""".stripMargin,
    // single AvailableNow batch == fully-merged sessions, so the
    // streaming session_window oracle is q26's
    "s06_stream_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
        |    THEN 1 ELSE 0 END AS boundary FROM x),
        |z AS (
        |  SELECT *, sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM y)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM z GROUP BY user_id, sid""".stripMargin,
    // Reproduces the deterministic stratified-sample threshold exactly
    // (thresholds are floor(frac * P) literals on both sides).
    "d13_stratified" -> stratifiedOracleSql,
    // s11 is d13 deployed at ingestion: the keep-predicate is a pure
    // row function, so one AvailableNow pass selects the batch sample.
    "s11_stream_sampler" -> stratifiedOracleSql,
    // Reproduces Text.fingerprint exactly: the same two mod-1e9+7
    // polynomial token/char folds, packed h1*P+h2 (every intermediate
    // < 2^63, so checked BIGINT arithmetic agrees with JVM longs).
    "d05_fingerprint" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(17 AS BIGINT), list_transform(toks, t ->
        |      list_reduce(list_prepend(CAST(17 AS BIGINT),
        |        list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
        |        (b, c) -> (b * 31 + c) % 1000000007))),
        |      (a, x) -> (a * 131 + x) % 1000000007) AS h1,
        |    list_reduce(list_prepend(CAST(19 AS BIGINT), list_transform(toks, t ->
        |      list_reduce(list_prepend(CAST(19 AS BIGINT),
        |        list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
        |        (b, c) -> (b * 37 + c) % 1000000007))),
        |      (a, x) -> (a * 137 + x) % 1000000007) AS h2
        |  FROM t)
        |SELECT doc_id, h1 * 1000000007 + h2 AS fingerprint FROM h""".stripMargin,
    // Reproduces Multimodal.stubDecode byte-for-byte: documents.text is
    // ASCII (octet_length == length on all SFs), so ascii(text[i]) IS the
    // payload byte; the mod-1e9+7 checksum and exact integer byte-sums
    // were chosen so checked BIGINT arithmetic matches JVM longs.
    "m01_multimodal" -> multimodalOracleSql,
    // m02 ingests the same payloads from a staged directory of files
    // via the binaryFile source — the decode result is byte-identical
    // to m01, so both check against the same SQL.
    "m02_binary_source" -> multimodalOracleSql,
    // m03 ingests the same payloads from a compacted
    // parquet-of-binaries container (the w03 mechanics) — decode is
    // byte-identical to m01 again, same SQL.
    "m03_container_source" -> multimodalOracleSql,
    // m12: the same decode surface, restricted to the point-read slice.
    "m12_container_random_access" ->
      (multimodalOracleSql + "\nWHERE doc_id % 7 = 0"),
    // m04 regenerates the deterministic PCM signal from its formula and
    // aggregates integer-exact features; Spark round-trips the SAME
    // signal through a real WAV encode → decode, so a header mis-parse
    // or sample-bias error on the Spark side breaks the hash match.
    "m04_audio_features" ->
      """WITH ids AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents),
        |s AS (SELECT doc_id, n, unnest(range(0, n)) AS t FROM ids),
        |v AS (SELECT doc_id, n, t, ((doc_id*31 + t*7) % 256) - 128 AS v FROM s),
        |w AS (SELECT doc_id, n, t, v,
        |        lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv FROM v)
        |SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(sum(v*v) AS BIGINT) AS sum_sq,
        |  CAST(count(*) FILTER (WHERE pv IS NOT NULL AND pv * v < 0) AS BIGINT)
        |    AS n_sign_flips
        |FROM w GROUP BY doc_id""".stripMargin,
    // m05 regenerates each sampled frame's raster from the channel
    // formulas; Spark round-trips the SAME raster through the real
    // GVF1 container (header + frame index + seek) and the real P6
    // parser — an index, header, or channel-order error on the Spark
    // side breaks the hash match.
    "m05_video_frames" ->
      """WITH ids AS (SELECT doc_id, 6 + doc_id % 7 AS nf FROM documents),
        |fr AS (SELECT doc_id, nf, unnest(range(0, nf)) AS frame_no FROM ids),
        |samp AS (SELECT doc_id, nf, frame_no FROM fr WHERE frame_no % 3 = 0),
        |px AS (SELECT doc_id, nf, frame_no, unnest(range(0, 48)) AS p FROM samp),
        |chan AS (
        |  SELECT doc_id, nf, frame_no,
        |    (doc_id*7 + frame_no*13 + p*3) % 256 AS r,
        |    (doc_id*11 + frame_no*5 + p*7) % 256 AS g,
        |    (doc_id*13 + frame_no*3 + p*11) % 256 AS b
        |  FROM px)
        |SELECT doc_id, frame_no, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(count(*) FILTER (WHERE 299*r + 587*g + 114*b < 64000) AS BIGINT)
        |    AS n_dark
        |FROM chan GROUP BY doc_id, frame_no, nf""".stripMargin,
    // m06 regenerates the thumbnail from the pixel formulas: the
    // nearest-neighbor map for 16×12 → 8×6 samples source pixel
    // 32y + 2x for thumb pixel (x, y) — Spark round-trips the same
    // raster through the real P6 codec + resize kernel.
    // m08: the oracle regenerates every image's dimensions and
    // luminance sum from the synthesis formulas (the m05/m06 device —
    // a codec or gate bug breaks the hash), then replays the three
    // integer gates and the per-source census
    "m08_image_quality_gate" ->
      """WITH dims AS (
        |  SELECT doc_id, source,
        |    8 + (doc_id % 6) * 8 AS w, 8 + (doc_id % 4) * 8 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, source, w, h, w*h AS px,
        |    list_sum(list_transform(range(0, w*h), p ->
        |      299*(((doc_id*5 + p*7) % 120) + (doc_id % 12) * 12)
        |      + 587*(((doc_id*9 + p*5) % 120) + (doc_id % 12) * 12)
        |      + 114*(((doc_id*3 + p*13) % 120) + (doc_id % 12) * 12))) AS sum_lum
        |  FROM dims)
        |SELECT source, count(*) AS n_images,
        |  count(*) FILTER (WHERE px < 256) AS n_small,
        |  count(*) FILTER (WHERE w > 3*h OR h > 3*w) AS n_stretched,
        |  count(*) FILTER (WHERE sum_lum < 80000*px OR sum_lum > 180000*px) AS n_badlum,
        |  count(*) FILTER (WHERE px >= 256 AND w <= 3*h AND h <= 3*w
        |    AND sum_lum BETWEEN 80000*px AND 180000*px) AS n_admitted
        |FROM lum GROUP BY 1""".stripMargin,
    "m06_image_resize" ->
      """WITH px AS (
        |  SELECT doc_id, unnest(flatten(list_transform(range(0, 6), y ->
        |    list_transform(range(0, 8), x -> 32*y + 2*x)))) AS p
        |  FROM documents),
        |chan AS (
        |  SELECT doc_id,
        |    (doc_id*5 + p*7) % 256 AS r,
        |    (doc_id*9 + p*5) % 256 AS g,
        |    (doc_id*3 + p*13) % 256 AS b
        |  FROM px)
        |SELECT doc_id, CAST(192 AS BIGINT) AS src_px,
        |  CAST(48 AS BIGINT) AS thumb_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(count(*) FILTER (WHERE 299*r + 587*g + 114*b < 64000) AS BIGINT)
        |    AS n_dark
        |FROM chan GROUP BY doc_id""".stripMargin,
    // m07: the aHash pipeline replayed from the image formulas — gid
    // picks content, brightness models re-encoding; the mean-threshold
    // bits pack into (hi, lo) 32-bit halves; clusters group by hash.
    // m13: the clip-fingerprint pipeline at formula level — the
    // luminance of frame f of clip (base, trim) is s0(base) +
    // ((f+trim)%2 + sceneShift)·48000 exactly (mod-120 channels never
    // wrap the byte), so the whole codec walk collapses to the
    // closed form; distinct signature sets, stop cap, Jaccard ≥ ½.
    "m13_video_near_dup" ->
      """WITH ids AS (SELECT doc_id AS base FROM documents),
        |vids AS (
        |  SELECT base, base AS vid, (6 + base % 7)::INTEGER AS nf, 0 AS trim
        |  FROM ids
        |  UNION ALL
        |  SELECT base, base + 2000000, (4 + base % 7)::INTEGER, 2
        |  FROM ids WHERE base % 3 = 0),
        |ph AS (
        |  SELECT base,
        |    base % 1000000007 * 616318177 % 1000000007 AS m1,
        |    base % 1000000007 * 777000037 % 1000000007 AS m2,
        |    base % 1000000007 * 888000131 % 1000000007 AS m3
        |  FROM ids),
        |s0 AS (
        |  SELECT base,
        |    sum(299 * ((m1 + p * (1 + m1 % 97)) % 120)
        |      + 587 * ((m2 + p * (1 + m2 % 89)) % 120)
        |      + 114 * ((m3 + p * (1 + m3 % 83)) % 120))::BIGINT AS s0,
        |    sum((2 * p + 1) * (299 * ((m1 + p * (1 + m1 % 97)) % 120)
        |      + 587 * ((m2 + p * (1 + m2 % 89)) % 120)
        |      + 114 * ((m3 + p * (1 + m3 % 83)) % 120)))::BIGINT AS w0
        |  FROM ph, unnest(range(0, 48)) AS u(p)
        |  GROUP BY 1),
        |fr AS (SELECT v.base, v.vid, u.f + v.trim AS bf
        |       FROM vids v, unnest(range(0, v.nf)) AS u(f)
        |       WHERE u.f % 3 = 0),
        |tok AS (
        |  SELECT DISTINCT fr.vid,
        |    s0.s0 + sym * 48000 AS ls, s0.w0 + sym * 2304000 AS ws
        |  FROM (SELECT fr.*, (fr.bf % 2)
        |          + CASE WHEN fr.base % 4 <> 0 AND fr.bf >= 2 + fr.base % 3
        |                 THEN 128 ELSE 0 END AS sym
        |        FROM fr) fr
        |  JOIN s0 ON s0.base = fr.base),
        |sizes AS (SELECT vid, count(*) AS sz FROM tok GROUP BY 1),
        |hot AS (SELECT ls, ws FROM tok GROUP BY ls, ws HAVING count(*) > 64),
        |ok AS (SELECT * FROM tok ANTI JOIN hot USING (ls, ws)),
        |pc AS (SELECT a.vid AS id_a, b.vid AS id_b, count(*) AS n_common
        |       FROM ok a JOIN ok b ON b.ls = a.ls AND b.ws = a.ws
        |                          AND a.vid < b.vid
        |       GROUP BY 1, 2)
        |SELECT pc.id_a, pc.id_b, pc.n_common,
        |  pc.n_common::DOUBLE / (sa.sz + sb.sz - pc.n_common) AS jaccard
        |FROM pc JOIN sizes sa ON sa.vid = pc.id_a
        |        JOIN sizes sb ON sb.vid = pc.id_b
        |WHERE pc.n_common::DOUBLE / (sa.sz + sb.sz - pc.n_common) >= 0.5""".stripMargin,
    // m14: the audio-fingerprint pipeline at formula level — the
    // sample at stream position t is the sum of two affine-mod tracks,
    // so each window's rise/fall masks pack directly from the formula
    // diffs (the codec round-trips — 8-bit base, 16-bit ×256 twin —
    // cancel out of the SIGNS by design); distinct signature sets,
    // stop cap, Jaccard ≥ ½.
    "m14_audio_near_dup" ->
      """WITH ids AS (SELECT doc_id AS base FROM documents),
        |vids AS (
        |  SELECT base, base AS vid, (6 + base % 7)::INTEGER AS nw, 0 AS trim
        |  FROM ids
        |  UNION ALL
        |  SELECT base, base + 3000000, (4 + base % 7)::INTEGER, 2
        |  FROM ids WHERE base % 3 = 0),
        |ph AS (
        |  SELECT base,
        |    base % 1000000007 * 700000133 % 1000000007 AS u0
        |  FROM ids),
        |pos AS (
        |  SELECT v.vid, u.w, j.j, u0 + 64*(u.w + v.trim) + j.j AS x0
        |  FROM vids v JOIN ph ON ph.base = v.base,
        |    unnest(range(0, v.nw)) AS u(w),
        |    unnest(range(0, 63)) AS j(j)),
        |dif AS (
        |  SELECT vid, w, j,
        |    ((x0+1)*(x0+1) % 1000000007)
        |      * ((x0+1)*(x0+1) % 1000000007) % 1000000007 % 232
        |    - (x0*x0 % 1000000007)
        |      * (x0*x0 % 1000000007) % 1000000007 % 232 AS d
        |  FROM pos),
        |sig AS (
        |  SELECT vid, w,
        |    sum(CASE WHEN d > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS pos,
        |    sum(CASE WHEN d < 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT AS neg
        |  FROM dif GROUP BY vid, w),
        |tok AS (SELECT DISTINCT vid, pos, neg FROM sig),
        |sizes AS (SELECT vid, count(*) AS sz FROM tok GROUP BY 1),
        |hot AS (SELECT pos, neg FROM tok GROUP BY pos, neg HAVING count(*) > 64),
        |ok AS (SELECT * FROM tok ANTI JOIN hot USING (pos, neg)),
        |pc AS (SELECT a.vid AS id_a, b.vid AS id_b, count(*) AS n_common
        |       FROM ok a JOIN ok b ON b.pos = a.pos AND b.neg = a.neg
        |                          AND a.vid < b.vid
        |       GROUP BY 1, 2)
        |SELECT pc.id_a, pc.id_b, pc.n_common,
        |  pc.n_common::DOUBLE / (sa.sz + sb.sz - pc.n_common) AS jaccard
        |FROM pc JOIN sizes sa ON sa.vid = pc.id_a
        |        JOIN sizes sb ON sb.vid = pc.id_b
        |WHERE pc.n_common::DOUBLE / (sa.sz + sb.sz - pc.n_common) >= 0.5""".stripMargin,
    // m11: the full near-dup pipeline at formula level — unique base
    // hashes, whited sampled pixels behind two bits of every 3rd doc's
    // twin, 16-bit bands with the stop cap, popcount hamming ≤ 7.
    "m11_image_near_dup" ->
      """WITH base AS (SELECT doc_id, doc_id AS img, FALSE AS noisy FROM documents),
        |tw AS (SELECT doc_id + 1000000 AS doc_id, doc_id AS img, TRUE AS noisy
        |       FROM documents WHERE doc_id % 3 = 0),
        |corpus AS (
        |  SELECT doc_id, img, noisy,
        |    img % 1000000007 * 616318177 % 1000000007 AS m1,
        |    img % 1000000007 * 777000037 % 1000000007 AS m2,
        |    img % 1000000007 * 888000131 % 1000000007 AS m3
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM tw)),
        |px AS (
        |  SELECT doc_id, img, noisy, m1, m2, m3,
        |    1 + m1 % 97 AS k1, 1 + m2 % 89 AS k2, 1 + m3 % 83 AS k3,
        |    unnest(flatten(list_transform(range(0, 8), y ->
        |      list_transform(range(0, 8), x -> y*8 + x)))) AS bit,
        |    unnest(flatten(list_transform(range(0, 8), y ->
        |      list_transform(range(0, 8), x -> ((y*12)//8)*16 + 2*x)))) AS p
        |  FROM corpus),
        |lum AS (
        |  SELECT doc_id, bit,
        |    CASE WHEN noisy AND (bit = img % 64 OR bit = (img*7 + 13) % 64)
        |         THEN 255000
        |         ELSE 299*((m1 + p*k1) % 200) + 587*((m2 + p*k2) % 200)
        |              + 114*((m3 + p*k3) % 200) END AS l
        |  FROM px),
        |t AS (SELECT doc_id, bit, l, sum(l) OVER (PARTITION BY doc_id) AS s FROM lum),
        |hs AS (
        |  SELECT doc_id,
        |    CAST(coalesce(sum(CASE WHEN l*64 > s AND bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END), 0) AS BIGINT) AS hi,
        |    CAST(coalesce(sum(CASE WHEN l*64 > s AND bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END), 0) AS BIGINT) AS lo
        |  FROM t GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, hi, lo, unnest([0, 1, 2, 3]) AS bi,
        |    unnest([lo & 65535, (lo >> 16) & 65535,
        |            hi & 65535, (hi >> 16) & 65535]) AS bv
        |  FROM hs),
        |hot AS (SELECT bi, bv FROM bands GROUP BY 1, 2 HAVING count(*) > 64),
        |ok AS (SELECT b.* FROM bands b ANTI JOIN hot USING (bi, bv)),
        |pr0 AS (SELECT doc_id, hi, lo, bi,
        |          unnest(list_append(list_transform(range(0, 16),
        |            k -> xor(bv, CAST(1 AS BIGINT) << k)), bv)) AS bv
        |        FROM ok),
        |pr AS (SELECT p.* FROM pr0 p ANTI JOIN hot USING (bi, bv)),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |           a.hi AS ah, a.lo AS al, b.hi AS bh, b.lo AS bl
        |         FROM pr a JOIN ok b
        |           ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id,
        |  CAST(bit_count(xor(ah, bh)) + bit_count(xor(al, bl)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(ah, bh)) + bit_count(xor(al, bl)) <= 7""".stripMargin,
    "m07_image_dedup" ->
      """WITH px AS (
        |  SELECT doc_id, doc_id % 97 AS gid, (doc_id // 97) % 5 * 3 AS br,
        |    unnest(flatten(list_transform(range(0, 8), y ->
        |      list_transform(range(0, 8), x -> y*8 + x)))) AS bit,
        |    unnest(flatten(list_transform(range(0, 8), y ->
        |      list_transform(range(0, 8), x -> ((y*12)//8)*16 + 2*x)))) AS p
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, bit,
        |    299*((gid*5 + p*7) % 200 + br) + 587*((gid*9 + p*5) % 200 + br)
        |      + 114*((gid*3 + p*13) % 200 + br) AS l
        |  FROM px),
        |t AS (SELECT doc_id, bit, l, sum(l) OVER (PARTITION BY doc_id) AS s FROM lum),
        |hs AS (
        |  SELECT doc_id,
        |    CAST(coalesce(sum(CASE WHEN l*64 > s AND bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END), 0) AS BIGINT) AS hash_hi,
        |    CAST(coalesce(sum(CASE WHEN l*64 > s AND bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END), 0) AS BIGINT) AS hash_lo
        |  FROM t GROUP BY doc_id),
        |cl AS (
        |  SELECT hash_hi, hash_lo, min(doc_id) AS canonical_id, count(*) AS n_members
        |  FROM hs GROUP BY 1, 2)
        |SELECT h.doc_id, h.hash_hi, h.hash_lo, cl.canonical_id, cl.n_members
        |FROM hs h JOIN cl USING (hash_hi, hash_lo)""".stripMargin,
  )

  /** d31's reference-LM scoring in DuckDB terms — shared by the batch
    * scorer (d31) and its at-ingestion streaming deployment (s13).
    */
  private val referenceLmOracleSql: String =
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |    ((doc_id % 1000000007) * 777000037 % 1000000007 + 4242) % 1000000007
        |      < 20000000 AS is_bench
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, is_bench,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM d WHERE len(toks) >= 2),
        |m AS (SELECT gram, count(*) AS ref_freq FROM g WHERE is_bench GROUP BY 1),
        |s AS (SELECT g.doc_id, g.gram, m.ref_freq
        |      FROM g LEFT JOIN m USING (gram) WHERE NOT g.is_bench)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(count(*) FILTER (ref_freq IS NULL) AS BIGINT) AS n_unseen,
        |  CAST(sum(coalesce(ref_freq, 0)) AS BIGINT) AS sum_ref_freq,
        |  CAST(count(*) - count(*) FILTER (ref_freq IS NULL) AS DOUBLE)
        |    / count(*) AS coverage
        |FROM s GROUP BY 1""".stripMargin

  /** m01's deterministic decode in DuckDB terms — shared by the
    * binary-column pipeline (m01) and the binaryFile-directory
    * ingestion (m02), which must produce the identical feature table.
    */
  private val multimodalOracleSql: String =
      """WITH b AS (
        |  SELECT doc_id, 'application/x-graft-' || lang AS mime,
        |    CAST(length(text) AS BIGINT) AS n_bytes, text,
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ascii(text[i]) AS BIGINT)) AS bytes
        |  FROM documents)
        |SELECT doc_id, mime, n_bytes,
        |  list_reduce(list_prepend(CAST(17 AS BIGINT), bytes),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS checksum,
        |  COALESCE(list_sum(list_transform(range(1, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_0,
        |  COALESCE(list_sum(list_transform(range(2, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_1,
        |  COALESCE(list_sum(list_transform(range(3, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_2,
        |  COALESCE(list_sum(list_transform(range(4, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_3,
        |  COALESCE(list_sum(list_transform(range(5, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_4,
        |  COALESCE(list_sum(list_transform(range(6, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_5,
        |  COALESCE(list_sum(list_transform(range(7, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_6,
        |  COALESCE(list_sum(list_transform(range(8, length(text) + 1, 8), i -> ascii(text[i]))), 0) / 255.0 AS feat_7
        |FROM b""".stripMargin
}
