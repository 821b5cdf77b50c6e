package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the operator modules' query registries. Every SQL-expressible
  * query has a DuckDB oracle in [[oracleSql]]; non-SQL-expressible ops
  * (iterative graph algorithms, ML training, seeded randomness) are
  * registered in [[queries]] only → driver records a rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PriceHistogram2d(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ graph.GraphQueries.queries ++
      graph.FacadeQueries.queries ++
      operators.TextOps.queries ++ operators.Dedup.queries ++
      operators.Similarity.queries ++ ml.FraudML.queries ++
      sinks.MartPipeline.queries ++ sinks.Bucketing.queries ++
      sources.Ingest.queries ++
      operators.Multimodal.queries ++ operators.WindowOps.queries ++
      operators.JsonOps.queries ++ operators.SkewOps.queries ++
      operators.RelationalExt.queries ++ operators.Analytics.queries ++
      operators.Corpus.queries ++ operators.ZOrder.queries ++
      operators.LmOps.queries ++ operators.DriftOps.queries ++
      plans.GroupedTopK.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ graph.GraphQueries.oracles ++
      graph.FacadeQueries.oracles ++
      operators.TextOps.oracles ++ operators.Dedup.oracles ++
      operators.Similarity.oracles ++ ml.FraudML.oracles ++
      sinks.MartPipeline.oracles ++ sinks.Bucketing.oracles ++
      sources.Ingest.oracles ++
      operators.Multimodal.oracles ++ operators.WindowOps.oracles ++
      operators.JsonOps.oracles ++ operators.SkewOps.oracles ++
      operators.RelationalExt.oracles ++ operators.Analytics.oracles ++
      operators.Corpus.oracles ++ operators.ZOrder.oracles ++
      operators.LmOps.oracles ++ operators.DriftOps.oracles ++
      plans.GroupedTopK.oracles

  /** Alternate oracle spellings needing check_oracle.py's --alt mode
    * (Python-UDF-backed SQL, e.g. xxh64). NOT part of the driver gate —
    * [[oracleSql]] stays vanilla-DuckDB; these power the sf≥1
    * certification sweeps where the vanilla spellings are documented
    * approximations (d06/d12 id-dependence).
    */
  def altOracleSql: Map[String, String] = operators.Dedup.altOracles

  /** Staged DuckDB oracle programs (check_oracle.py --staged): per-round
    * temp-table spellings of the iterative-graph mirrors whose monolithic
    * recursive/unrolled CTEs time out at sf≥1. Values are raw JSON
    * program objects — see [[graph.StagedOracles]].
    */
  def stagedOracleJson: Map[String, String] = graph.StagedOracles.programs

  /** Subset run by [[Bench]] per round (headline queries).
    *
    * SELECTION RULE (also in SCALE.md "Headline selection"): a registered
    * query is headlined iff it is (a) a §2 reference-parity core operator
    * (the g01–g05 graph chain, the q-core, the mart pipeline's q14), OR
    * (b) the cheapest representative of a training-data-pipeline family
    * whose plan shape differs from anything already in-list, OR (c) a
    * scale twin whose uncapped sibling is in-list (the Xb pairs measure
    * the cap's cost every round). Excluded, with the reason recorded
    * here: q20 (native recursive CTEs — feature certification, cost is
    * chain-length-bound, not a scale-path operator), g27 (exact
    * neighborhood function — definitional Σ|B(u,r)| pair table; its
    * bounded-state twin g27b IS in-list), d02's ground-truth arm (d03,
    * the banded form, represents the family), and display-only /
    * fixture-bound ops (show, golden-CSV, JDBC round-trip — spec-timed,
    * not bench-timed). d10 and g20 — exhaustive arms with sampled/capped
    * twins (d10b, g20b) — stay IN the list deliberately: both are
    * affordable at sf0.1 and pricing the exhaustive arm next to its twin
    * every round is what measures the cap's value (the Xb-pair rule (c)
    * read in both directions). Everything else registered is correctness-gated
    * but intentionally not benched: timing 222 queries per round would
    * dilute the signal the round-over-round diff reads. */
  def headline: Seq[String] = Seq(
    "g01_cooccurrence_edges", "g02_degrees", "g03_connected_components",
    "g04_component_stats", "g05_weighted_edges",
    "q02_class_distribution", "q04_null_audit",
    "q01_price_histogram_2d", "q03_multi_agg_stats", "q05_conditional_agg",
    "q06_top_fraud_amounts", "q09_distinct_parts",
    "q10_join_revenue_per_nation", "q11_left_join_coalesce",
    "q12_hourly_events", "q13_global_event_stats", "q14_grafana_mart",
    "g06_pagerank_loop",
    "t04_fingerprint", "t05_token_freq",
    "d03_minhash_lsh", "d06_minhash_xxhash_scale",
    "d04b_simhash_banded", "d08_neardup_after_dedup", "d12_arrival_dedup",
    "v01_cosine_topk", "d05_embedding_neardup",
    "d05b_embedding_neardup_lsh", "d05c_embedding_neardup_capped",
    "w01_top_per_group", "w03_running_total", "w04_asof_join",
    "j01_json_extract",
    "a02_local_supplier_volume", "a03_pricing_summary", "e03_rollup",
    "t09_pii_redact", "e10_quantile_rollup",
    "t10_line_dedup", "v05_ann_pq",
    "g14_label_propagation", "r01_record_linkage", "c06_temperature_mix",
    "t13_bpe_pairs", "v06_kmeans_lloyd",
    "w07_interval_join", "g15_kcore", "c07_curriculum_shards",
    "t14_char_diversity", "e12_heavy_hitters", "g16_personalized_pagerank",
    "v07_ann_ivfpq", "e13_cube", "t15_novelty_rate", "t16_bpe_merges",
    "v08_ann_binary", "v09_ann_sq", "w09_gap_fill", "a06_cooccurrence_lift",
    "c08_domain_cap", "g17_fraud_cost_distance", "t17_span_dedup",
    "f01_tvd_drift", "f02_ks_drift", "e19_mad_outliers",
    "w11_cumulative_distinct", "g20_clustering_coeff", "a07_rfm_segments",
    "w13_grouped_topk", "w14_topk_rewrite", "w15_rank_topk",
    "f05_cusum_changepoint",
    "g21_assortativity", "a08_gini_concentration", "p04_calendar_dim",
    "t18_zipf_check", "g22_capped_neighbor_features",
    "d09_embedding_neardup_canonical",
    "f06_chi2_drift", "t19_chunk_overlap", "r02_jaro_linkage",
    "v10_two_stage_rerank", "w16_session_window", "mm04_perceptual_neardup",
    "g23_scc", "x04_poisson_bootstrap", "p05_cdc_apply", "w17_interval_overlap", "v11_matryoshka_rerank", "g24_pingpong", "c09_leakage_safe_split",
    "x05_group_reservoir",
    "c10_sequence_packing", "c11_epoch_upsample", "f07_mann_whitney",
    "f08_two_proportion", "v12_ann_filtered", "v13_ann_recall",
    "t20_vocab_growth", "p06_incremental_agg", "w18_asof_nearest",
    "w19_asof_tolerance", "d10_lsh_evaluation", "d11_semdedup",
    "t21_fuzzy_decontam", "a09_seasonal_anomalies", "x06_temporal_embargo",
    "c12_corpus_datasheet", "w20_max_drawdown", "g25_reciprocity",
    "g26_degree_distribution", "t23_lang_confusion", "f09_runs_test",
    "e22_weighted_quantiles",
    "g20b_capped_clustering_coeff", "d10b_lsh_evaluation_sampled",
    "mm04b_capped_neardup", "c13_corpus_job",
    "v14_ann_frontier",
    "g06b_pagerank_capped", "g16b_ppr_capped", "g08b_graphx_capped",
    "d05d_embedding_arrival_dedup", "f10_binned_ks",
    // g27 (exact NF) is registered + oracle-checked but, like the d10/g20
    // definitional quadratics, not headlined: its pair table is Σ|B(u,r)|
    // by construction — g27b, its bounded-state twin, IS in-list
    "g27b_hyperball", "g28_landmark_harmonic", "g29_modularity",
    "c14_leakage_audit", "v15_hard_negatives",
    "g14b_lpa_capped", "g29b_modularity_capped",
    "g15b_kcore_capped", "g17b_cost_distance_capped",
    "g26b_degree_distribution_capped", "g21b_assortativity_capped",
    "g30_ktruss", "g30b_ktruss_fanout",
    "g31_landmark_betweenness", "g31b_betweenness_fanout",
    "c15_corpus_overlap", "c15b_corpus_overlap_kmv",
    "g32_hash_walks", "g32b_hash_walks_fanout", "g33_skipgram_pairs",
    // round-12: capped façade arms — rule (c), scale twins of the in-list
    // façade surface (gf05 OOM'd at sf1 over the raw relation)
    "gf03b_facade_motif_capped", "gf05b_facade_triangles_capped",
    // round-12: incremental dedup — rule (b), the daily-ingest plan shape
    // (band join with a shrunken new side) nothing else in-list has
    "d13_incremental_arrival_dedup",
    // rule (b): persisted-index probe — a plan shape nothing else has
    // (parquet index scans + broadcast band probe, zero corpus text work)
    "d14_indexed_incremental_dedup",
    // round-13: d05's fixed-K sampled certificate — rule (c), the scale
    // twin that makes d05's machinery oracle-checkable at sf>=1 (cost is
    // K²-frozen, corpus-independent)
    "d05e_embedding_neardup_sampled"
  ).filter(queries.contains)
}
