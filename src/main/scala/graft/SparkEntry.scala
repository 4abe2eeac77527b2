package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Bpe, BradleyTerry, ClassifyQueries, ConnectorQueries, CoreQueries, CurationQueries, DedupQueries, MiningQueries, EvalQueries, MultimodalQueries, OlapQueries, RlQueries, SelectionQueries, SftQueries, SimilarityQueries, TemporalQueries, TextQueries, Unigram}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2.C has a `queries` entry here;
  * every DuckDB-expressible one has a matching `oracleSql` entry with
  * IDENTICAL output column names (the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan → partial/final hash agg,
    * one shuffle on the two low-cardinality flags. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        count(lit(1)).as("count_order"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** The `queries` entries that intentionally carry NO DuckDB oracle
    * (driver falls back to a rows-only check) — the rationale lives on
    * [[oracleSql]]'s doc, one bullet per entry. SparkEntryContractSpec
    * asserts this set EQUALS `queries.keySet -- oracleSql.keySet`, so
    * neither the doc nor this list can drift from the artifact. */
  val noOracleByDesign: Set[String] = Set(
    "q_bpe_encode", "q_bpe_bytes", "q_unigram_encode",
    "q_compress_ratio", "q_dedup_approx", "q_fingerprint64",
    "q_lr_classify", "q_percentiles", "q_profile_approx")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q_scan_project"    -> CoreQueries.qScanProject,
    "q_filter_range"    -> CoreQueries.qFilterRange,
    "q_wordcount"       -> CoreQueries.qWordcount,
    "q_count_meta"      -> CoreQueries.qCountMeta,
    "q_take_limit"      -> CoreQueries.qTakeLimit,
    "q_agg_stats"       -> CoreQueries.qAggStats,
    "q_join_enrich"     -> CoreQueries.qJoinEnrich,
    "q_join_semi_anti"  -> CoreQueries.qJoinSemiAnti,
    "q_window_tumbling" -> CoreQueries.qWindowTumbling,
    "q_window_sliding"  -> CoreQueries.qWindowSliding,
    "q_window_rank"     -> CoreQueries.qWindowRank,
    "q_sessionize"      -> CoreQueries.qSessionize,
    "q_sft_assemble"    -> SftQueries.qSftAssemble,
    "q_sft_spans"       -> SftQueries.qSftSpans,
    "q_sft_pack"        -> SftQueries.qSftPack,
    "q_sft_pack_tokens" -> SftQueries.qSftPackTokens,
    "q_dpo_export"      -> SftQueries.qDpoExport,
    "q_pref_pairs"      -> SftQueries.qPrefPairs,
    "q_pref_pairs_quality" -> SftQueries.qPrefPairsQuality,
    "q_best_of_n"       -> RlQueries.qBestOfN,
    "q_pass_at_k"       -> RlQueries.qPassAtK,
    "q_grpo_adv"        -> RlQueries.qGrpoAdv,
    "q_reward_drift"    -> RlQueries.qRewardDrift,
    "q_hard_negatives"  -> RlQueries.qHardNegatives,
    "q_hard_negatives_ivf" -> RlQueries.qHardNegativesIvf,
    "q_knn_classify_ivf" -> ClassifyQueries.qKnnClassifyIvf,
    "q_curriculum"      -> RlQueries.qCurriculum,
    "q_late_data"       -> CoreQueries.qLateData,
    "q_dedup_exact"     -> CoreQueries.qDedupExact,
    "q_dedup_approx"    -> CoreQueries.qDedupApprox,
    "q_distinct_kmv"    -> CoreQueries.qDistinctKmv,
    "q_topk"            -> CoreQueries.qTopk,
    "q_set_ops"         -> CoreQueries.qSetOps,
    "q_json_extract"    -> CoreQueries.qJsonExtract,
    "q_asof_join"       -> CoreQueries.qAsofJoin,
    "q_funnel"          -> CoreQueries.qFunnel,
    "q_tfidf"           -> TextQueries.qTfidf,
    "q_pack_sequences"  -> TextQueries.qPackSequences,
    "q_bm25"            -> TextQueries.qBm25,
    "q_stratified_sample" -> CoreQueries.qStratifiedSample,
    "q_dup_clusters"    -> DedupQueries.qDupClusters,
    "q_rollup"          -> CoreQueries.qRollup,
    "q_pivot"           -> CoreQueries.qPivot,
    "q_percentiles"     -> CoreQueries.qPercentiles,
    "q_percentiles_exact" -> CoreQueries.qPercentilesExact,
    "q_text_clean"      -> TextQueries.qTextClean,
    "q_token_count"     -> TextQueries.qTokenCount,
    "q_drop_boilerplate" -> TextQueries.qDropBoilerplate,
    "q_repetition"      -> TextQueries.qRepetition,
    "q_quality_score"   -> TextQueries.qQualityScore,
    "q_lang_id"         -> TextQueries.qLangId,
    "q_fingerprint"     -> TextQueries.qFingerprint,
    "q_fingerprint64"   -> ((s, dir) => graft.api.Graft.fingerprint64(
      graft.ops.Tables.documents(s, dir), "doc_id", "text")),
    "q_fingerprint_poly" -> ((s, dir) => graft.api.Graft.polyFingerprint64(
      graft.ops.Tables.documents(s, dir), "doc_id", "text")),
    "q_dis_roundtrip"   -> ConnectorQueries.qDisRoundtrip,
    "q_streaming_sessionize" -> ConnectorQueries.qStreamingSessionize,
    "q_streaming_kmv"   -> ConnectorQueries.qStreamingKmv,
    "q_streaming_domain_quota" -> ConnectorQueries.qStreamingDomainQuota,
    "q_streaming_reservoir" -> ConnectorQueries.qStreamingReservoir,
    "q_streaming_rl_metrics" -> ConnectorQueries.qStreamingRlMetrics,
    "q_streaming_decontam" -> ConnectorQueries.qStreamingDecontam,
    "q_streaming_bm25"  -> ConnectorQueries.qStreamingBm25,
    "q_streaming_best_of_n" -> ConnectorQueries.qStreamingBestOfN,
    "q_streaming_sft"   -> ConnectorQueries.qStreamingSft,
    "q_streaming_psi"   -> ConnectorQueries.qStreamingPsi,
    "q_streaming_neardup" -> ConnectorQueries.qStreamingNeardup,
    "q_streaming_embed_neardup" -> ConnectorQueries.qStreamingEmbedNeardup,
    "q_streaming_chunks" -> ConnectorQueries.qStreamingChunks,
    "q_minhash_dupes"   -> DedupQueries.qMinhashDupes,
    "q_simhash"         -> DedupQueries.qSimhash,
    "q_simhash_dupes"   -> ((s, dir) => graft.api.Graft.simhashDupes(
      graft.ops.Tables.documents(s, dir), "doc_id", "text", 3)),
    "q_ngram_jaccard"   -> DedupQueries.qNgramJaccard,
    "q_similarity_knn"  -> SimilarityQueries.qSimilarityKnn,
    "q_embed_neardup"   -> SimilarityQueries.qEmbedNeardup,
    "q_similarity_ivf"  -> SimilarityQueries.qSimilarityIvf,
    "q_agg_salted"      -> ((s, dir) => graft.api.Graft.saltedAgg(
      graft.ops.Tables.events(s, dir), Seq("event_type"), "value", "event_id", 16)),
    "q_multimodal_meta" -> MultimodalQueries.qMultimodalMeta,
    "q_multimodal_features" -> MultimodalQueries.qMultimodalFeatures,
    "q_multimodal_png" -> MultimodalQueries.qMultimodalPng,
    "q_multimodal_resize" -> MultimodalQueries.qMultimodalResize,
    "q_multimodal_resize2d" -> MultimodalQueries.qMultimodalResize2d,
    "q_multimodal_jpeg" -> MultimodalQueries.qMultimodalJpeg,
    "q_drop_boilerplate_lines" -> TextQueries.qDropBoilerplateLines,
    "q_decontaminate"   -> TextQueries.qDecontaminate,
    "q_lm_bits"         -> TextQueries.qLmBits,
    "q_token_budget_sample" -> CoreQueries.qTokenBudgetSample,
    "q_dup_spans"       -> TextQueries.qDupSpans,
    "q_decontaminate_bloom" -> TextQueries.qDecontaminateBloom,
    "q_pii_redact"      -> TextQueries.qPiiRedact,
    "q_line_dedup"      -> TextQueries.qLineDedup,
    "q_shuffle_shards"  -> CoreQueries.qShuffleShards,
    "q_similarity_pq"   -> SimilarityQueries.qSimilarityPq,
    "q_similarity_sq8"  -> SimilarityQueries.qSimilaritySq8,
    "q_ann_recall"      -> SimilarityQueries.qAnnRecall,
    "q_mmr_select"      -> SimilarityQueries.qMmrSelect,
    "q_bt_strength"     -> BradleyTerry.qBtStrength,
    "q_ece_calibration" -> ClassifyQueries.qEceCalibration,
    "q_heavy_hitters_cms" -> MiningQueries.qHeavyHittersCms,
    "q_domain_filter"   -> TextQueries.qDomainFilter,
    "q_compress_ratio"  -> TextQueries.qCompressRatio,
    "q_nb_classify"     -> ClassifyQueries.qNbClassify,
    "q_profile"         -> ClassifyQueries.qProfile,
    "q_profile_approx"  -> ClassifyQueries.qProfileApprox,
    "q_cross_dedup"     -> DedupQueries.qCrossDedup,
    "q_bpe_encode"      -> Bpe.qBpeEncode,
    "q_bpe_apply"       -> Bpe.qBpeApply,
    "q_bpe_bytes"       -> Bpe.qBpeBytes,
    "q_unigram_encode"  -> Unigram.qUnigramEncode,
    "q_split_groups"    -> CoreQueries.qSplitGroups,
    "q_sample_k"        -> CoreQueries.qSampleK,
    "q_excise"          -> TextQueries.qExcise,
    "q_excise_spans"    -> TextQueries.qExciseSpans,
    "q_heavy_hitters"   -> MiningQueries.qHeavyHitters,
    "q_winnow"          -> MiningQueries.qWinnow,
    "q_pagerank"        -> MiningQueries.qPagerank,
    "q_url_normalize"   -> MiningQueries.qUrlNormalize,
    "q_readability"     -> MiningQueries.qReadability,
    "q_decontaminate_embed" -> MiningQueries.qDecontaminateEmbed,
    "q_ccnet_bucket"    -> MiningQueries.qCcnetBucket,
    "q_hist_lengths"    -> MiningQueries.qHistLengths,
    "q_quality_gate"    -> MiningQueries.qQualityGate,
    "q_entropy"         -> MiningQueries.qEntropy,
    "q_mix_weights"     -> MiningQueries.qMixWeights,
    "q_lr_classify"     -> ((s, dir) => graft.ops.LogReg.qLrClassify(s, dir)),
    "q_lr_classify_fixed" -> ((s, dir) => graft.ops.LogReg.qLrClassifyFixed(s, dir)),
    "q_domain_cap"      -> CurationQueries.qDomainCap,
    "q_url_dedup"       -> CurationQueries.qUrlDedup,
    "q_bm25_search"     -> CurationQueries.qBm25Search,
    "q_range_join"      -> CurationQueries.qRangeJoin,
    "q_skew_join"       -> CurationQueries.qSkewJoin,
    "q_semdedup"        -> CurationQueries.qSemDedup,
    "q_pmi"             -> MiningQueries.qPmi,
    "q_blocklist"       -> TextQueries.qBlocklist,
    "q_dsir"            -> SelectionQueries.qDsirWeights,
    "q_weighted_sample" -> SelectionQueries.qWeightedSample,
    "q_weighted_stratum" -> SelectionQueries.qWeightedStratum,
    "q_psi_drift"       -> SelectionQueries.qPsiDrift,
    "q_unicode_norm"    -> SelectionQueries.qUnicodeNorm,
    "q_soft_dedup"      -> CurationQueries.qSoftDedup,
    "q_novelty"         -> CurationQueries.qNovelty,
    "q_zipf"            -> MiningQueries.qZipf,
    "q_html_extract"    -> TextQueries.qHtmlExtract,
    "q_oov_rate"        -> CurationQueries.qOovRate,
    "q_knn_classify"    -> ClassifyQueries.qKnnClassify,
    "q_cluster_dedup"   -> DedupQueries.qClusterDedup,
    "q_anchor_extract"  -> TextQueries.qAnchorExtract,
    "q_chunk_windows"   -> TextQueries.qChunkWindows,
    "q_code_detect"     -> TextQueries.qCodeDetect,
    "q_chunk_search"    -> CurationQueries.qChunkSearch,
    "q_hybrid_search"   -> CurationQueries.qHybridSearch,
    "q_scd2"            -> TemporalQueries.qScd2,
    "q_transitions"     -> TemporalQueries.qTransitions,
    "q_cube"            -> TemporalQueries.qCube,
    "q_grouping_sets"   -> TemporalQueries.qGroupingSets,
    "q_corr"            -> TemporalQueries.qCorr,
    "q_winsorize"       -> TemporalQueries.qWinsorize,
    "q_edit_dupes"      -> DedupQueries.qEditDupes,
    "q_cdc_chunks"      -> DedupQueries.qCdcChunks,
    "q_retention"       -> TemporalQueries.qRetention,
    "q_ntile"           -> TemporalQueries.qNtile,
    "q_mad_outliers"    -> TemporalQueries.qMadOutliers,
    "q_interleave"      -> TemporalQueries.qInterleave,
    "q_multimodal_wav"  -> MultimodalQueries.qMultimodalWav,
    "q_pricing_summary" -> OlapQueries.qPricingSummary,
    "q_top_orders"      -> OlapQueries.qTopOrders,
    "q_revenue_forecast" -> OlapQueries.qRevenueForecast,
    "q_gap_fill"        -> OlapQueries.qGapFill,
    "q_user_paths"      -> OlapQueries.qUserPaths,
    "q_rank_eval"       -> EvalQueries.qRankEval,
    "q_confusion"       -> EvalQueries.qConfusion,
    "q_outer_join"      -> EvalQueries.qOuterJoin,
    "q_rank_funcs"      -> EvalQueries.qRankFuncs,
    "q_rouge"           -> EvalQueries.qRouge,
    "q_ohlc"            -> TemporalQueries.qOhlc,
    "q_time_weighted"   -> TemporalQueries.qTimeWeighted,
    "q_skyline"         -> OlapQueries.qSkyline,
    "q_ab_test"         -> OlapQueries.qAbTest,
    "q_window_distinct" -> CoreQueries.qWindowDistinct,
    "q_rfm"             -> OlapQueries.qRfm,
    "q_basket"          -> OlapQueries.qBasket,
    "q_funnel_latency"  -> TemporalQueries.qFunnelLatency,
    "q_fim"             -> TextQueries.qFim,
    "q_span_corrupt"    -> TextQueries.qSpanCorrupt,
    "q_regional_volume" -> OlapQueries.qRegionalVolume,
    "q_blob_dedup"      -> MultimodalQueries.qBlobDedup,
    "q_phash"           -> MultimodalQueries.qPhash,
    "q_phash_dupes"     -> MultimodalQueries.qPhashDupes,
    "q_phrase_search"   -> CurationQueries.qPhraseSearch,
    "q_ewma"            -> TemporalQueries.qEwma,
    "q_maxsim_search"   -> SimilarityQueries.qMaxsimSearch,
    "q_version_diff"    -> CoreQueries.qVersionDiff,
    "q_dp_count"        -> graft.ops.PrivacyQueries.qDpCount,
    "q_kanon"           -> graft.ops.PrivacyQueries.qKAnon,
    "q_cascade"         -> CurationQueries.qCascade,
    "q_chi2"            -> ClassifyQueries.qChi2,
    "q_autocorr"        -> TemporalQueries.qAutocorr,
    "q_burst_detect"    -> TemporalQueries.qBurstDetect,
    "q_gini"            -> MiningQueries.qGini,
    "q_coverage_curve"  -> MiningQueries.qCoverageCurve,
  )

  // Shared SQL fragments for the oracle (DuckDB dialect).
  private val evCols = "event_id, ts, user_id, event_type, value"
  private val wsTokens = "list_filter(string_split(text, ' '), t -> t <> '')"
  private val stopEn = "('the','a','an','and','of','to','in','is','on','for')"

  /** Shared CTE prefix of the two SFT oracles: gap-sessionized events
    * with parity roles and the rendered chat-template turn (sid cast
    * to BIGINT — DuckDB's windowed sum(int) is HUGEINT). */
  private val sftTurnsCte =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type, props,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts, event_id, event_type, props,
      |    (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS UNBOUNDED PRECEDING))::BIGINT AS sid
      |  FROM flagged
      |), turns AS (
      |  SELECT user_id, sid, ts, event_id, event_type, props,
      |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS turn_idx
      |  FROM sess
      |), rendered AS (
      |  SELECT user_id, sid, ts, event_id, turn_idx,
      |    CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
      |    concat('<|', CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END,
      |      '|>', event_type, ' ', props) AS rendered
      |  FROM turns
      |)""".stripMargin

  /** Per-query ANSI SQL the driver runs in DuckDB against the same
    * parquet tables; row/schema/hash compare against the Spark output.
    *
    * Exactly [[noOracleByDesign]]'s `queries` entries are ABSENT here
    * BY DESIGN (the driver records a weaker rows-only check; each
    * carries a ScalaTest accuracy/equivalence/round-trip bound
    * instead) — one line each on why ANSI SQL cannot express the
    * check:
    *  - q_bpe_encode / q_bpe_bytes / q_unigram_encode: iterative
    *    merge-loop / EM training — the vocabulary is an argmax
    *    FIXPOINT, not a query (BpeSpec/UnigramSpec pin the distributed
    *    rounds bit-identical to a driver-side reference + round-trips).
    *    The ENCODING pass is replayable once merges are fixed, and IS
    *    oracled: q_bpe_apply runs the same greedy kernel with a fixed
    *    merge list under a recursive-CTE DuckDB replay — only the
    *    training fixpoints stay rows-only;
    *  - q_compress_ratio: zlib DEFLATE byte lengths — no SQL engine
    *    exposes the codec (spec pins known-ratio fixtures);
    *  - q_dedup_approx: HLL sketch cardinality — estimator-specific
    *    hashing (spec bounds the error vs exact distinct);
    *  - q_fingerprint64: xxhash64 — engine-private constants, and
    *    xxhash64-compatibility IS the query's point (Spark's codegen'd
    *    production hash at zero extra code). Both siblings ARE
    *    hash-oracled: q_fingerprint (31-bit positional) and
    *    q_fingerprint_poly (mod-2⁶⁴ polynomial, the scale-grade
    *    dedup-key width, replayed in DuckDB HUGEINT) — the
    *    fingerprint FAMILY is gate-checked, only the xxhash64
    *    constants are not;
    *  - q_lr_classify: iterative gradient descent — per-step float
    *    argmax drift makes cross-engine replay meaningless (spec pins
    *    convergence + accuracy floor; the fixed-point sibling
    *    q_lr_classify_fixed IS oracled);
    *  - q_percentiles / q_profile_approx: approx_percentile /
    *    approx_count_distinct sketches — implementation-defined
    *    nearest-rank answers (specs bound vs exact by rank window; the
    *    exact variants q_percentiles_exact / q_profile ARE oracled).
    *
    * (The k-means-flavored entries — q_semdedup, q_similarity_ivf,
    * q_similarity_pq — USED to be on this list; round 13's
    * [[graft.ops.Ivf.strideIndex]] / zero-Lloyd stride codebooks made
    * their index rules engine-replicable, so they are fully oracled
    * now. SparkEntryContractSpec asserts this doc's list — the
    * [[noOracleByDesign]] constant — equals
    * `queries.keySet -- oracleSql.keySet`, so it cannot go stale.) */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" -> s"SELECT $evCols FROM events",

    "q_filter_range" ->
      s"SELECT $evCols FROM events WHERE event_id >= 100 AND event_id < 5000",

    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin,

    "q_count_meta" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",

    "q_take_limit" ->
      s"SELECT $evCols FROM events ORDER BY event_id LIMIT 100",

    "q_agg_stats" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value,
        |avg(value) AS avg_value, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q_join_enrich" ->
      """SELECT o_orderkey, o_totalprice, c_name, n_name FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "q_join_semi_anti" ->
      """SELECT event_id, user_id, 'with_orders' AS side FROM events
        |WHERE user_id IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT event_id, user_id, 'no_orders' AS side FROM events
        |WHERE user_id NOT IN (SELECT o_custkey FROM orders)""".stripMargin,

    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, count(*) AS cnt,
        |sum(value) AS sum_value FROM events GROUP BY 1""".stripMargin,

    "q_window_sliding" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
        |count(*) AS cnt
        |FROM events, (SELECT unnest([0,1,2,3]) AS k) k
        |GROUP BY 1""".stripMargin,

    "q_window_distinct" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
        |count(DISTINCT user_id) AS users
        |FROM events, (SELECT unnest([0,1,2,3]) AS k) k
        |GROUP BY 1""".stripMargin,

    "q_window_rank" ->
      """SELECT user_id, event_id, value FROM (
        |SELECT user_id, event_id, value,
        |row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |FROM events) WHERE rn = 1""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*)::BIGINT AS n_events, sum(value) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q_sft_assemble" ->
      s"""$sftTurnsCte
        |SELECT user_id, sid, count(*)::BIGINT AS n_turns,
        |  string_agg(rendered, '' ORDER BY ts, event_id) AS transcript,
        |  length(string_agg(rendered, '' ORDER BY ts, event_id))::BIGINT AS transcript_chars,
        |  sum(CASE WHEN role = 'assistant' THEN length(rendered) ELSE 0 END)::BIGINT AS assistant_chars,
        |  floor(sum(CASE WHEN role = 'assistant' THEN length(rendered) ELSE 0 END)::DOUBLE
        |        / greatest(length(string_agg(rendered, '' ORDER BY ts, event_id)), 1) * 1e4 + 0.5) / 1e4 AS mask_frac
        |FROM rendered GROUP BY user_id, sid""".stripMargin,

    "q_sft_spans" ->
      s"""$sftTurnsCte
        |SELECT user_id, sid, turn_idx, role,
        |  coalesce(sum(length(rendered)) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS span_start,
        |  (coalesce(sum(length(rendered)) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + length(rendered))::BIGINT AS span_end,
        |  rendered
        |FROM rendered""".stripMargin,

    "q_sft_pack" ->
      s"""$sftTurnsCte, slen AS (
        |  SELECT user_id, sid,
        |    length(string_agg(rendered, '' ORDER BY ts, event_id))::BIGINT AS tc
        |  FROM rendered GROUP BY user_id, sid
        |), offs AS (
        |  SELECT user_id, sid,
        |    coalesce(sum(tc) OVER (ORDER BY user_id * 1048576 + sid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS stream_off
        |  FROM slen
        |), spans AS (
        |  SELECT user_id, sid, turn_idx, role,
        |    coalesce(sum(length(rendered)) OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS span_start,
        |    (coalesce(sum(length(rendered)) OVER (PARTITION BY user_id, sid
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + length(rendered))::BIGINT AS span_end
        |  FROM rendered
        |)
        |SELECT s.user_id, s.sid, s.turn_idx::BIGINT AS turn_idx, s.role,
        |  (o.stream_off + s.span_start)::BIGINT AS packed_start,
        |  (o.stream_off + s.span_end)::BIGINT AS packed_end,
        |  ((o.stream_off + s.span_start) // 2048)::BIGINT AS seq_id,
        |  ((o.stream_off + s.span_start) % 2048)::BIGINT AS seq_off,
        |  ((o.stream_off + s.span_end - 1) // 2048
        |    - (o.stream_off + s.span_start) // 2048 + 1)::BIGINT AS n_seqs
        |FROM spans s JOIN offs o USING (user_id, sid)""".stripMargin,

    "q_sft_pack_tokens" ->
      s"""$sftTurnsCte, tl AS (
        |  SELECT user_id, sid, ts, event_id, turn_idx, role,
        |    len(regexp_extract_all(rendered, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS tl
        |  FROM rendered
        |), slen AS (
        |  SELECT user_id, sid, sum(tl)::BIGINT AS tc FROM tl GROUP BY user_id, sid
        |), offs AS (
        |  SELECT user_id, sid,
        |    coalesce(sum(tc) OVER (ORDER BY user_id * 1048576 + sid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS stream_off
        |  FROM slen
        |), spans AS (
        |  SELECT user_id, sid, turn_idx, role,
        |    coalesce(sum(tl) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS span_start,
        |    (coalesce(sum(tl) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + tl)::BIGINT AS span_end
        |  FROM tl
        |)
        |SELECT s.user_id, s.sid, s.turn_idx::BIGINT AS turn_idx, s.role,
        |  (o.stream_off + s.span_start)::BIGINT AS packed_start,
        |  (o.stream_off + s.span_end)::BIGINT AS packed_end,
        |  ((o.stream_off + s.span_start) // 2048)::BIGINT AS seq_id,
        |  ((o.stream_off + s.span_start) % 2048)::BIGINT AS seq_off,
        |  ((o.stream_off + s.span_end - 1) // 2048
        |    - (o.stream_off + s.span_start) // 2048 + 1)::BIGINT AS n_seqs
        |FROM spans s JOIN offs o USING (user_id, sid)""".stripMargin,

    "q_dpo_export" ->
      s"""$sftTurnsCte, assembled AS (
        |  SELECT user_id, sid,
        |    string_agg(rendered, '' ORDER BY ts, event_id) AS transcript,
        |    sum(CASE WHEN role = 'assistant' THEN length(rendered) ELSE 0 END)::BIGINT AS ac
        |  FROM rendered GROUP BY user_id, sid
        |), ranked AS (
        |  SELECT user_id, sid, transcript, ac,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ac DESC, sid ASC) AS rn
        |  FROM assembled
        |)
        |SELECT user_id, ((rn + 1) // 2)::BIGINT AS pair_idx,
        |  max(CASE WHEN rn % 2 = 1 THEN sid END)::BIGINT AS chosen_sid,
        |  max(CASE WHEN rn % 2 = 0 THEN sid END)::BIGINT AS rejected_sid,
        |  max(CASE WHEN rn % 2 = 1 THEN transcript END) AS chosen,
        |  max(CASE WHEN rn % 2 = 0 THEN transcript END) AS rejected,
        |  (max(CASE WHEN rn % 2 = 1 THEN ac END)
        |    - max(CASE WHEN rn % 2 = 0 THEN ac END))::BIGINT AS margin
        |FROM ranked GROUP BY user_id, (rn + 1) // 2
        |HAVING max(CASE WHEN rn % 2 = 0 THEN sid END) IS NOT NULL""".stripMargin,

    "q_pref_pairs" ->
      """WITH ranked AS (
        |  SELECT source, lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source, lang ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents
        |)
        |SELECT source, lang, ((rn + 1) // 2)::BIGINT AS pair_idx,
        |  max(CASE WHEN rn % 2 = 1 THEN doc_id END) AS chosen_id,
        |  max(CASE WHEN rn % 2 = 0 THEN doc_id END) AS rejected_id,
        |  max(CASE WHEN rn % 2 = 1 THEN n_chars END) AS chosen_chars,
        |  max(CASE WHEN rn % 2 = 0 THEN n_chars END) AS rejected_chars,
        |  max(CASE WHEN rn % 2 = 1 THEN n_chars END)
        |    - max(CASE WHEN rn % 2 = 0 THEN n_chars END) AS gap
        |FROM ranked GROUP BY source, lang, (rn + 1) // 2
        |HAVING max(CASE WHEN rn % 2 = 0 THEN doc_id END) IS NOT NULL""".stripMargin,

    "q_pref_pairs_quality" ->
      """WITH scored AS (
        |  SELECT source, lang, doc_id,
        |    (100 * len(list_filter(list_transform(
        |       list_filter(string_split(text, ' '), w -> w <> ''), w -> lower(w)),
        |       w -> w IN ('the','a','an','and','of','to','in','is','on','for')))
        |     + len(list_filter(string_split(text, ' '), w -> w <> '')))::BIGINT AS quality
        |  FROM documents
        |), ranked AS (
        |  SELECT source, lang, doc_id, quality,
        |    row_number() OVER (PARTITION BY source, lang ORDER BY quality DESC, doc_id ASC) AS rn
        |  FROM scored
        |)
        |SELECT source, lang, ((rn + 1) // 2)::BIGINT AS pair_idx,
        |  max(CASE WHEN rn % 2 = 1 THEN doc_id END) AS chosen_id,
        |  max(CASE WHEN rn % 2 = 0 THEN doc_id END) AS rejected_id,
        |  max(CASE WHEN rn % 2 = 1 THEN quality END) AS chosen_quality,
        |  max(CASE WHEN rn % 2 = 0 THEN quality END) AS rejected_quality,
        |  max(CASE WHEN rn % 2 = 1 THEN quality END)
        |    - max(CASE WHEN rn % 2 = 0 THEN quality END) AS gap
        |FROM ranked GROUP BY source, lang, (rn + 1) // 2
        |HAVING max(CASE WHEN rn % 2 = 0 THEN doc_id END) IS NOT NULL""".stripMargin,

    "q_best_of_n" -> RlQueries.bestOfNOracle,
    "q_pass_at_k" -> RlQueries.passAtKOracle,
    "q_grpo_adv" -> RlQueries.grpoAdvOracle,
    "q_reward_drift" -> RlQueries.rewardDriftOracle,
    "q_hard_negatives" -> RlQueries.hardNegativesOracle,
    "q_hard_negatives_ivf" -> RlQueries.hardNegativesIvfOracle,
    "q_knn_classify_ivf" -> ClassifyQueries.knnClassifyIvfOracle,
    "q_curriculum" -> RlQueries.curriculumOracle,

    "q_late_data" ->
      """SELECT event_id, ts, user_id FROM (
        |  SELECT event_id, ts, user_id,
        |    max(ts) OVER (ORDER BY ((event_id % 2147483648) * 1103515245 + 12345) % 2147483648, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_ts_so_far
        |  FROM events)
        |WHERE ts < max_ts_so_far - INTERVAL '10 minutes'""".stripMargin,

    "q_dedup_exact" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q_distinct_kmv" -> CoreQueries.distinctKmvOracle,

    "q_topk" ->
      """SELECT user_id, sum(value) AS total_value FROM events
        |GROUP BY user_id ORDER BY total_value DESC, user_id ASC LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """SELECT 'union' AS op, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  UNION SELECT user_id FROM events WHERE event_type = 'view')
        |UNION ALL
        |SELECT 'intersect' AS op, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT SELECT user_id FROM events WHERE event_type = 'view')
        |UNION ALL
        |SELECT 'except' AS op, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT SELECT user_id FROM events WHERE event_type = 'view')""".stripMargin,

    "q_json_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k FROM events",

    "q_asof_join" ->
      """WITH c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id,
        |  coalesce(purchase_id, -1)::BIGINT AS purchase_id,
        |  coalesce(purchase_value, -1.0) AS purchase_value
        |FROM (
        |  SELECT c.event_id, c.user_id, p.purchase_id, p.purchase_value,
        |    row_number() OVER (PARTITION BY c.event_id
        |                       ORDER BY p.ts DESC, p.purchase_id DESC) AS rn
        |  FROM c LEFT JOIN p ON c.user_id = p.user_id AND p.ts < c.ts)
        |WHERE rn = 1""".stripMargin,

    "q_stratified_sample" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE ((event_id % 2147483648) * 1103515245 + 12345) % 10000 <
        |  CASE event_type WHEN 'click' THEN 5000 WHEN 'view' THEN 1000
        |                  WHEN 'purchase' THEN 10000 ELSE 0 END""".stripMargin,

    "q_dup_clusters" -> DedupQueries.dupClustersOracle,
    "q_tfidf" -> TextQueries.tfidfOracle,
    "q_pack_sequences" -> TextQueries.packOracle,
    "q_bm25" -> TextQueries.bm25Oracle,

    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL '1 day' GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL '1 day' GROUP BY e.user_id
        |)
        |SELECT stage_reached, count(*) AS users FROM (
        |  SELECT s1.user_id,
        |    CASE WHEN s3.user_id IS NOT NULL THEN 3
        |         WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END::BIGINT AS stage_reached
        |  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |          LEFT JOIN s3 ON s1.user_id = s3.user_id)
        |GROUP BY stage_reached""".stripMargin,

    "q_rollup" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY ROLLUP(event_type)",

    "q_pivot" ->
      """SELECT user_id % 4 AS cohort,
        |count(*) FILTER (event_type = 'click') AS click,
        |count(*) FILTER (event_type = 'error') AS error,
        |count(*) FILTER (event_type = 'purchase') AS purchase,
        |count(*) FILTER (event_type = 'signup') AS signup,
        |count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,

    // q_percentiles (approx_percentile) has no oracle: sketch impls
    // differ across engines; ApproxOpsSpec bounds its error vs exact.
    "q_percentiles_exact" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "q_text_clean" ->
      """SELECT doc_id,
        |lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS clean_text,
        |length(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::BIGINT AS clean_len
        |FROM documents""".stripMargin,

    "q_token_count" ->
      s"""SELECT doc_id,
         |len($wsTokens)::BIGINT AS ws_tokens,
         |len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS bpe_tokens,
         |length(text)::BIGINT AS n_chars
         |FROM documents""".stripMargin,

    "q_quality_score" ->
      s"""SELECT doc_id, n_chars, n_words, stop_ratio, punct_ratio, avg_word_len,
         |stop_ratio * 0.4 + (1.0 - punct_ratio) * 0.3 + least(n_words / 100.0, 1.0) * 0.3 AS quality
         |FROM (
         |  SELECT doc_id,
         |    length(text)::DOUBLE AS n_chars,
         |    len($wsTokens)::DOUBLE AS n_words,
         |    len(list_filter(string_split(text, ' '), t -> t IN $stopEn))::DOUBLE
         |      / len($wsTokens)::DOUBLE AS stop_ratio,
         |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::DOUBLE
         |      / greatest(length(text)::DOUBLE, 1.0) AS punct_ratio,
         |    (length(text)::DOUBLE - len($wsTokens)::DOUBLE + 1.0)
         |      / len($wsTokens)::DOUBLE AS avg_word_len
         |  FROM documents)""".stripMargin,

    "q_lang_id" ->
      s"""SELECT doc_id, lang_actual,
         |CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |     WHEN s_es >= s_fr THEN 'es'
         |     ELSE 'fr' END AS lang_pred,
         |s_en, s_de, s_es, s_fr
         |FROM (
         |  SELECT doc_id, lang AS lang_actual,
         |    len(list_filter(string_split(text, ' '), t -> t IN $stopEn))::BIGINT AS s_en,
         |    len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist','ein','zu','mit')))::BIGINT AS s_de,
         |    len(list_filter(string_split(text, ' '), t -> t IN ('el','la','los','de','y','es','un','en','que')))::BIGINT AS s_es,
         |    len(list_filter(string_split(text, ' '), t -> t IN ('le','les','des','et','est','un','une','du','que')))::BIGINT AS s_fr
         |  FROM documents)""".stripMargin,

    "q_dis_roundtrip" -> ConnectorQueries.oracle,
    "q_streaming_sessionize" -> ConnectorQueries.streamingSessionizeOracle,
    // bit-identical to the batch sketch by the associative merge —
    // shares q_distinct_kmv's oracle verbatim
    "q_streaming_kmv" -> CoreQueries.distinctKmvOracle,
    // the ingest-time domain quota under id-ordered arrival IS the
    // batch cap's smallest-id keeper rule — oracle shared verbatim
    "q_streaming_domain_quota" -> CurationQueries.domainCapOracle,
    // the A-Res store after the last trigger == the batch stratum
    // sample over everything ever arrived — oracle shared verbatim
    "q_streaming_reservoir" -> SelectionQueries.weightedStratumOracle,
    "q_streaming_rl_metrics" -> ConnectorQueries.streamingRlMetricsOracle,
    // the static-store stream's unioned per-batch decisions ARE the
    // batch gate's decisions — oracle shared verbatim
    "q_streaming_decontam" -> TextQueries.decontaminateOracle,
    // the streamed index's post-run search == the batch bm25Search
    // over everything admitted (the operator's own spec-pinned
    // contract) — oracle shared verbatim
    "q_streaming_bm25" -> CurationQueries.bm25SearchOracle,
    // whole-run pools close on the flush sentinel; each closed row ==
    // the batch best-of-N row (order-independent argmax fold) —
    // oracle shared verbatim
    "q_streaming_best_of_n" -> RlQueries.bestOfNOracle,
    // watermark-closed sessions == the batch assembly rows
    // field-for-field (shared kernel constants, per-user sid counter
    // reproduces the batch window numbering) — oracle shared verbatim
    "q_streaming_sft" ->
      s"""$sftTurnsCte
        |SELECT user_id, sid, count(*)::BIGINT AS n_turns,
        |  string_agg(rendered, '' ORDER BY ts, event_id) AS transcript,
        |  length(string_agg(rendered, '' ORDER BY ts, event_id))::BIGINT AS transcript_chars,
        |  sum(CASE WHEN role = 'assistant' THEN length(rendered) ELSE 0 END)::BIGINT AS assistant_chars,
        |  floor(sum(CASE WHEN role = 'assistant' THEN length(rendered) ELSE 0 END)::DOUBLE
        |        / greatest(length(string_agg(rendered, '' ORDER BY ts, event_id)), 1) * 1e4 + 0.5) / 1e4 AS mask_frac
        |FROM rendered GROUP BY user_id, sid""".stripMargin,
    // per-batch PSI vs the whole-corpus lang histogram, batch = the
    // binding's own cap-sized id-ordered slice replayed in SQL
    "q_streaming_psi" -> ConnectorQueries.streamingPsiOracle,
    // sequential two-batch admission replay: per-batch recursive-CTE
    // connected components + history rejection against the prior
    // batch's admitted set — the stateful-sequential oracle
    "q_streaming_neardup" -> ConnectorQueries.streamingNeardupOracle,
    // the vector sibling: same sequential replay over the exact-cosine
    // pair set, even-vec_id slice
    "q_streaming_embed_neardup" -> ConnectorQueries.streamingEmbedNeardupOracle,
    // chunk novelty is the global first occurrence by (doc_id,
    // chunk_idx) under id-ordered batches — a LINEAR window replay
    "q_streaming_chunks" -> ConnectorQueries.streamingChunksOracle,
    "q_minhash_dupes" -> DedupQueries.minhashOracle,
    "q_simhash"       -> DedupQueries.simhashOracle,
    "q_simhash_dupes" ->
      s"""WITH sims AS (${DedupQueries.simhashOracle})
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         |FROM sims a, sims b
         |WHERE a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "q_ngram_jaccard" -> DedupQueries.ngramOracle,
    "q_similarity_knn" -> SimilarityQueries.knnOracle,
    "q_embed_neardup" -> SimilarityQueries.neardupOracle,
    "q_similarity_ivf" -> SimilarityQueries.similarityIvfOracle,
    "q_similarity_pq" -> SimilarityQueries.similarityPqOracle,
    "q_similarity_sq8" -> SimilarityQueries.similaritySq8Oracle,
    "q_ann_recall" -> SimilarityQueries.annRecallOracle,
    "q_mmr_select" -> SimilarityQueries.mmrSelectOracle,
    "q_bt_strength" -> BradleyTerry.btStrengthOracle,
    "q_ece_calibration" -> ClassifyQueries.eceCalibrationOracle,
    "q_heavy_hitters_cms" -> MiningQueries.heavyHittersCmsOracle,
    "q_bpe_apply" -> Bpe.bpeApplyOracle,
    "q_agg_salted" ->
      """SELECT event_type, round(sum(value), 4) AS sum_value, count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin,
    "q_multimodal_meta" -> MultimodalQueries.metaOracle,
    "q_multimodal_features" -> MultimodalQueries.featuresOracle,
    "q_multimodal_png" -> MultimodalQueries.pngOracle,
    "q_multimodal_resize" -> MultimodalQueries.resizeOracle,
    "q_multimodal_resize2d" -> MultimodalQueries.resize2dOracle,
    "q_multimodal_jpeg" -> MultimodalQueries.jpegOracle,
    "q_drop_boilerplate" -> TextQueries.dropBoilerplateOracle,
    "q_drop_boilerplate_lines" -> TextQueries.dropBoilerplateLinesOracle,
    "q_decontaminate" -> TextQueries.decontaminateOracle,
    "q_lm_bits" -> TextQueries.lmBitsOracle,
    "q_token_budget_sample" -> CoreQueries.tokenBudgetOracle,
    "q_dup_spans" -> TextQueries.dupSpansOracle,
    "q_repetition" -> TextQueries.repetitionOracle,
    // bit-identical to the exact gate by construction (verify join)
    "q_decontaminate_bloom" -> TextQueries.decontaminateOracle,
    "q_pii_redact" -> TextQueries.piiRedactOracle,
    "q_line_dedup" -> TextQueries.lineDedupOracle,
    "q_shuffle_shards" -> CoreQueries.shuffleShardsOracle,
    "q_domain_filter" -> TextQueries.domainFilterOracle,
    "q_nb_classify" -> ClassifyQueries.nbClassifyOracle,
    "q_lr_classify_fixed" -> graft.ops.LogReg.lrClassifyFixedOracle,
    "q_profile" -> ClassifyQueries.profileOracle,
    "q_cross_dedup" -> DedupQueries.crossDedupOracle,
    "q_split_groups" -> CoreQueries.splitGroupsOracle,
    "q_sample_k" -> CoreQueries.sampleKOracle,
    "q_excise" -> TextQueries.exciseOracle,
    "q_excise_spans" -> TextQueries.exciseSpansOracle,
    "q_heavy_hitters" -> MiningQueries.heavyHittersOracle,
    "q_winnow" -> MiningQueries.winnowOracle,
    "q_pagerank" -> MiningQueries.pagerankOracle,
    "q_url_normalize" -> MiningQueries.urlNormalizeOracle,
    "q_readability" -> MiningQueries.readabilityOracle,
    "q_decontaminate_embed" -> MiningQueries.decontaminateEmbedOracle,
    "q_ccnet_bucket" -> MiningQueries.ccnetBucketOracle,
    "q_hist_lengths" -> MiningQueries.histLengthsOracle,
    "q_quality_gate" -> MiningQueries.qualityGateOracle,
    "q_entropy" -> MiningQueries.entropyOracle,
    "q_mix_weights" -> MiningQueries.mixWeightsOracle,
    "q_domain_cap" -> CurationQueries.domainCapOracle,
    "q_url_dedup" -> CurationQueries.urlDedupOracle,
    "q_bm25_search" -> CurationQueries.bm25SearchOracle,
    "q_range_join" -> CurationQueries.rangeJoinOracle,
    "q_skew_join" -> CurationQueries.skewJoinOracle,
    "q_pmi" -> MiningQueries.pmiOracle,
    "q_blocklist" -> TextQueries.blocklistOracle,
    "q_dsir" -> SelectionQueries.dsirWeightsOracle,
    "q_weighted_sample" -> SelectionQueries.weightedSampleOracle,
    "q_weighted_stratum" -> SelectionQueries.weightedStratumOracle,
    "q_psi_drift" -> SelectionQueries.psiDriftOracle,
    "q_unicode_norm" -> SelectionQueries.unicodeNormOracle,
    "q_soft_dedup" -> CurationQueries.softDedupOracle,
    "q_novelty" -> CurationQueries.noveltyOracle,
    "q_zipf" -> MiningQueries.zipfOracle,
    "q_html_extract" -> TextQueries.htmlExtractOracle,
    "q_oov_rate" -> CurationQueries.oovRateOracle,
    "q_knn_classify" -> ClassifyQueries.knnClassifyOracle,
    "q_cluster_dedup" -> DedupQueries.clusterDedupOracle,
    "q_anchor_extract" -> TextQueries.anchorExtractOracle,
    "q_chunk_windows" -> TextQueries.chunkWindowsOracle,
    "q_code_detect" -> TextQueries.codeDetectOracle,
    "q_chunk_search" -> CurationQueries.chunkSearchOracle,
    "q_hybrid_search" -> CurationQueries.hybridSearchOracle,
    "q_scd2" -> TemporalQueries.scd2Oracle,
    "q_transitions" -> TemporalQueries.transitionsOracle,
    "q_cube" -> TemporalQueries.cubeOracle,
    "q_grouping_sets" -> TemporalQueries.groupingSetsOracle,
    "q_corr" -> TemporalQueries.corrOracle,
    "q_winsorize" -> TemporalQueries.winsorizeOracle,
    "q_edit_dupes" -> DedupQueries.editDupesOracle,
    "q_cdc_chunks" -> DedupQueries.cdcChunksOracle,
    "q_retention" -> TemporalQueries.retentionOracle,
    "q_ntile" -> TemporalQueries.ntileOracle,
    "q_mad_outliers" -> TemporalQueries.madOutliersOracle,
    "q_interleave" -> TemporalQueries.interleaveOracle,
    "q_multimodal_wav" -> MultimodalQueries.wavOracle,
    "q_pricing_summary" -> OlapQueries.pricingSummaryOracle,
    "q_top_orders" -> OlapQueries.topOrdersOracle,
    "q_revenue_forecast" -> OlapQueries.revenueForecastOracle,
    "q_gap_fill" -> OlapQueries.gapFillOracle,
    "q_user_paths" -> OlapQueries.userPathsOracle,
    "q_rank_eval" -> EvalQueries.rankEvalOracle,
    "q_confusion" -> EvalQueries.confusionOracle,
    "q_outer_join" -> EvalQueries.outerJoinOracle,
    "q_rank_funcs" -> EvalQueries.rankFuncsOracle,
    "q_rouge" -> EvalQueries.rougeOracle,
    "q_ohlc" -> TemporalQueries.ohlcOracle,
    "q_time_weighted" -> TemporalQueries.timeWeightedOracle,
    "q_skyline" -> OlapQueries.skylineOracle,
    "q_ab_test" -> OlapQueries.abTestOracle,
    "q_rfm" -> OlapQueries.rfmOracle,
    "q_basket" -> OlapQueries.basketOracle,
    "q_funnel_latency" -> TemporalQueries.funnelLatencyOracle,
    "q_fim" -> TextQueries.fimOracle,
    "q_span_corrupt" -> TextQueries.spanCorruptOracle,
    "q_regional_volume" -> OlapQueries.regionalVolumeOracle,
    "q_blob_dedup" -> MultimodalQueries.blobDedupOracle,
    "q_phash" -> MultimodalQueries.phashOracle,
    "q_phash_dupes" -> MultimodalQueries.phashDupesOracle,
    "q_phrase_search" -> CurationQueries.phraseSearchOracle,
    "q_ewma" -> TemporalQueries.ewmaOracle,
    "q_maxsim_search" -> SimilarityQueries.maxsimOracle,
    "q_version_diff" -> CoreQueries.versionDiffOracle,
    "q_dp_count" -> graft.ops.PrivacyQueries.dpCountOracle,
    "q_kanon" -> graft.ops.PrivacyQueries.kAnonOracle,
    "q_cascade" -> CurationQueries.cascadeOracle,
    "q_chi2" -> ClassifyQueries.chi2Oracle,
    "q_autocorr" -> TemporalQueries.autocorrOracle,
    "q_burst_detect" -> TemporalQueries.burstDetectOracle,
    "q_gini" -> MiningQueries.giniOracle,
    "q_coverage_curve" -> MiningQueries.coverageCurveOracle,
    "q_semdedup" -> CurationQueries.semDedupOracle,

    "q_fingerprint" ->
      """SELECT doc_id,
        |list_sum(list_transform(string_split(text, ''), (c, i) -> i * ascii(c)))::BIGINT AS fp
        |FROM documents""".stripMargin,

    // mod-2^64 polynomial replayed in HUGEINT; the final CASE maps the
    // unsigned residue to the signed long Spark's native wrap produces.
    // list_reduce seeds with the first element — identical to folding
    // from 0 because 0*31 + c1 = c1; empty/null text stays NULL.
    "q_fingerprint_poly" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR len(text) = 0 THEN NULL
        |         ELSE list_reduce(
        |           list_transform(string_split(text, ''), c -> ascii(c)::HUGEINT),
        |           (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)
        |    END AS u
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN u >= 9223372036854775808::HUGEINT
        |       THEN (u - 18446744073709551616::HUGEINT)::BIGINT
        |       ELSE u::BIGINT END AS fp64
        |FROM f""".stripMargin,
  )
}
