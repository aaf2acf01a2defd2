package graft

/** SQL front-end parity: the ANSI-portable subset of the oracle SQL runs
  * unchanged through `spark.sql` on registered views and returns exactly
  * what the DataFrame formulation returns — one logical surface, two entry
  * points (the reference's users get a SQL door, not just the Scala API).
  *
  * The list is DERIVED from `SparkEntry.oracleSql` minus a documented
  * exclusion set (VERDICT r4 item 5), so every future query is proven
  * portable by default — adding a DuckDB-only oracle without updating the
  * exclusions fails this suite rather than silently shrinking the claim.
  */
class SqlFrontendSpec extends SparkSpec {

  /** Oracle strings written in DuckDB-only dialect — each name's SQL uses
    * at least one construct Spark SQL does not parse or resolve:
    * list comprehensions (`[expr FOR i IN ...]`) and `list_*` functions,
    * `string_split`/`array_to_string`/`unnest`-in-SELECT,
    * `generate_series`/`generate_subscripts` as table functions, `::`
    * casts, `epoch_us`/`epoch_ms`/`time_bucket`/`strftime`,
    * `quantile_cont`, `json_extract_string`, `string_agg(... ORDER BY)`,
    * DuckDB `PIVOT`/`ASOF JOIN` statements, `xor()`, `strpos`-fold md5
    * parsing, and DuckDB recursive-CTE idioms. The DataFrame side of each
    * is still hash-checked against DuckDB by the driver — this exclusion
    * is about the SQL STRING's dialect, not the operator's correctness.
    */
  private val duckOnly: Set[String] = Set(
    "q15_grouping_sets", "q18_pivot", "q22_window_moving", "q27_percentiles",
    "q28_string_agg", "q30_string_funcs", "q31_date_funcs", "q33_json_funcs",
    "q34_array_funcs", "q35_explode_tokens", "q37_hashtag_topk",
    "q38_session_window", "q46_asof_join", "q47_sessionize",
    "q49_tumbling_window", "q51_dedup_jaccard", "q52_minhash_lsh",
    "q53_simhash", "q54_embedding_neardup", "q55_ann_bruteforce",
    "q56_ann_lsh", "q58_ann_ivf", "q59_centroids", "q60_langid",
    "q61_quality", "q62_token_stats", "q63_fingerprint", "q64_tfidf",
    "q65_char_ngrams", "q67_from_json", "q70_media_features",
    "q71_frame_sample", "q72_rarity_score", "q73_dup_clusters",
    "q74_stratified_sample", "q75_token_shards", "q76_decontaminate",
    "q77_repetition", "q78_media_resize", "q79_dedup_jaccard_capped",
    "q80_split_assign", "q81_dedup_jaccard_prefix", "q82_variant_json",
    "q83_shard_text", "q84_ann_multiprobe", "q85_quantize",
    "q86_cluster_keeper", "q87_ann_quant_rescore", "q88_mixture_select",
    "q89_chunk_dedup", "q90_containment_dedup", "q91_contamination_frac",
    "q92_quality_funnel", "q93_split_leakage", "q94_incremental_dedup",
    "q95_curation_manifest", "q96_pair_features", "q98_vocab_coverage",
    "q99_domain_shift", "q100_bpe_merges", "q101_embedding_neardup_r8",
    "q102_embedding_neardup_multiprobe", "q103_source_dup_stats",
    "q104_cross_source_dups", "q105_cluster_cohesion", "q106_pii_scrub",
    "q107_semantic_dedup", "q109_boilerplate_strip", "q110_bigram_score",
    "q111_semantic_dedup_scaled", "q113_retention_cohorts",
    "q114_media_phash_dedup", "q115_repeated_spans", "q116_temperature_mix",
    "q117_bm25_topk", "q118_quality_classifier", "q119_sequence_pack",
    "q120_dup_graph_rank", "q121_heavy_hitters", "q122_weighted_sample",
    "q123_char_entropy", "q124_hard_negatives", "q125_hybrid_retrieval",
    "q126_pattern_scan", "q127_tag_cooccurrence", "q128_kmv_distinct",
    "q130_kmv_overlap", "q131_triangles", "q135_hist_quantiles",
    "q128b_kmv_distinct_sketch", "q130b_kmv_overlap_sketch",
    "q137_consensus_dedup", "q138_mad_outliers_hist", "q139_chunk_windows",
    "q140_ann_index_probe", "q141_ppm_decode", "q142_ppm_resize",
    "q143_embedding_neardup_r11", "q144_ann_index_build",
    "q145_consensus_dedup_r11", "q146_embedding_neardup_r14",
    "q147_semantic_dedup_1k",
    "q148_embedding_neardup_wide11", "q149_embedding_neardup_wide14",
    "q150_semantic_dedup_hier", "q151_embedding_neardup_wide14_mp",
    "q152_embedding_neardup_recall", "q153_consensus_dedup_wide14",
    "q154_ann_pq_adc", "q155_ann_ivf_pq", "q156_ann_ivfpq_residual",
    "q157_embedding_neardup_wide17", "q158_consensus_dedup_wide17",
    "q159_ann_pq8", "q160_ann_pq8_hier", "q161_ann_pq8_hier_beam",
    "q162_decontaminate_bloom", "q163_ann_pq_index_build",
    "q164_ann_pq_index_probe", "q165_ann_pq8_lloyd",
    "q166_embedding_neardup_wide17_mp", "q167_embedding_neardup_recall17",
    "q168_embedding_neardup_wide20", "q169_embedding_neardup_recall20",
    "q170_consensus_dedup_wide20")

  private val portable: Seq[String] =
    (SparkEntry.oracleSql.keySet -- duckOnly).toSeq.sorted

  test("the portable surface stays broad (>= 40 queries round-trip through spark.sql)") {
    assert(portable.size >= 40, s"portable SQL surface shrank to ${portable.size}: $portable")
    // Exclusions must name real queries — a renamed query must not silently
    // fall out of the proof.
    val stale = duckOnly -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"exclusion list names unknown queries: $stale")
  }

  portable.foreach { name =>
    test(s"$name: spark.sql(oracle text) == DataFrame result") {
      graft.sources.Tables.registerViews(spark, sfDir)
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sfDir)
      assert(viaSql.schema.fieldNames.toSeq == viaDf.schema.fieldNames.toSeq)
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a == b, s"$name SQL/DataFrame divergence: ${a.take(2)} vs ${b.take(2)}")
    }
  }
}
