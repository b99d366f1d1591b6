package graft

import graft.queries._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are defined per operator family under [[graft.queries]];
  * each carries its own DuckDB oracle SQL when SQL-expressible
  * (rows-only otherwise). See [[graft.queries.QueryDef]] for the
  * determinism conventions that make the hash-compare exact.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    QAgg.defs ++ QWindow.defs ++ QJoin.defs ++ QRelational.defs ++
      QScalar.defs ++ QText.defs ++ QVector.defs ++ QDomain.defs ++ QPbp.defs ++
      QMedia.defs ++ QSql.defs ++ QGraph.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A fact-to-dims broadcast-join rollup — the reference's most common
    * plan shape (J1+A13). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
      .orderBy("n_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap

  /** Headline queries Bench runs at sf0.1 — representative of each
    * family. The deliberately-quadratic oracle baselines ARE tracked
    * here (v01 brute top-k, v03 brute near-dup) so their cost stays
    * visible round-over-round, but they are baselines for the LSH/IVF
    * scale paths (v02/v04/v05), not production paths — never cite
    * their times as engine throughput. */
  val benchQueries: Seq[String] = Seq(
    "a01_pivot_matrix", "a05_event_kernel", "a08_union_explode_agg",
    "a10_scenario_weighted", "a17_exact_percentiles", "a18_grouped_percentiles",
    "a19_kmv_distinct", "a20_approx_percentiles", "a21_kmv_overlap",
    "a22_histogram_synopsis", "a23_weighted_percentiles", "a24_cms_counts",
    "a25_windowed_distinct", "a26_rollup", "a27_grouping_sets", "a28_grouped_mad",
    "e05_unpivot", "dq01_expectations", "dq02_enforce", "dq03_psi_drift",
    "w03_boundary_session", "w05_remaining_sum",
    "w12_rolling_now_then", "w14_ewma_smooth",
    "j01_broadcast_enrich", "j03_join_aggregates",
    "asof01_backward_tolerance", "asof02_forward_tolerance", "asof03_nearest",
    "ses02_session_stats", "ses05_native_session_window",
    "ses06_interval_join", "ses07_funnel", "ses08_cohort_retention",
    "ses09_cohort_stream", "ses10_drift_window",
    "x01_stateful_fold_balance",
    "o01_global_sort_limit", "o05_grouped_topk_agg", "a29_grouped_mode",
    "s01_scan_pushdown", "s17_compact_roundtrip",
    "s18_zorder_roundtrip", "s19_scd2_merge",
    "f05_hash_ids", "f15_edit_distance",
    "t01_text_quality", "t06_ngram_jaccard_pairs", "t07_minhash_lsh_pairs",
    "t08_simhash_pairs", "t09_dup_clusters", "t12_decontaminate",
    "t15_sequence_packing", "t19_line_dedup", "t20_bm25_topk",
    "t21_mixture_sample", "t22_tfidf_keywords", "t23_lm_perplexity",
    "t24_dup_spans", "t25_packed_text", "t26_dedup_keep_longest",
    "t27_incremental_dedup", "t28_budget_select", "t30_sliding_chunks",
    "t31_budget_mixture", "t32_incremental_neardup", "t33_split_leakage",
    "t34_bpe_encode", "t35_budget_select_bpe", "t36_bpe_chunks",
    "t37_leakfree_split", "t38_bpe_train", "t39_dsir_resample",
    "t40_html_extract", "t41_packing_bpe", "t42_langid_ngram",
    "t43_pack_boundaries", "t44_topk_tokens", "t45_quality_classifier", "t46_quality_filter",
    "t47_url_normalize", "t48_domain_quota", "t49_cut_dup_spans",
    "t50_hybrid_rrf", "t51_containment_pairs", "t52_registrable_domain_quota",
    "t53_bpe_roundtrip", "t54_temperature_mix",
    "t55_winnowing", "t56_ngram_novelty", "t57_cross_perplexity",
    "t59_dedup_recall",
    "v01_ann_brute_topk", "v02_ann_lsh_topk", "v03_embed_neardup_brute",
    "v04_embed_neardup_lsh", "v05_ann_ivf_topk", "v06_embed_semantic_dedup",
    "v09_ann_index_upsert", "v10_ann_pq_adc", "v11_ann_ivfpq",
    "v12_ann_pq_persisted", "v13_cluster_balanced_sample",
    "v14_ann_ivfpq_rerank", "v15_ann_filtered", "v16_ann_ivfpq_residual",
    "v17_ann_mmr", "v18_ann_delete_rebalance", "v19_ann_recall",
    "v20_ann_binary_hamming",
    "m12_image_neardup_dhash", "m13_video_neardup_frames",
    "m14_audio_neardup_energy", "m15_image_ingest_gate",
    "t60_trigram_backoff_perplexity", "t61_byte_bpe_encode",
    "t62_substring_dedup_eval", "t63_unigram_train", "t64_wordpiece_encode",
    "llm01_corpus_pipeline", "t65_dedup_index",
    "t66_kn5_perplexity", "m16_media_index_gate", "t67_gopher_rules",
    "t68_modified_kn5", "m17_audio_index_gate", "t69_line_rules",
    "t70_ccnet_buckets", "t71_ccnet_perlang", "llm02_corpus_multilang",
    "t72_ccnet_approx_cut", "llm03_clean_bloom", "t73_line_rules_perlang",
    "t74_decontam_by_suite", "t76_decontam_by_suite_bloom",
    "t78_char_minhash_lsh_pairs", "llm04_corpus_multilang_bloom",
    "t79_decontam_suite_store", "t80_semantic_decontam",
    "sql01_extension_surface", "sql02_url_surface", "sql03_binary_surface",
    "g01_pagerank", "g02_hits",
    "bsr03_baserunning", "val01_value_batter", "pbp01_parse_enrich",
    "pbp03_pitcher_standardize")
}
