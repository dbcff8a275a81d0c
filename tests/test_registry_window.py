"""Registration-order invariants for the driver's checked window.

The verification driver oracle-checks only the first 50 registered
queries; these tests pin that the curated window stays first, stays
complete, and never silently loses an operator family.
"""

from __future__ import annotations

from salesdata_engineering_spark.registry import CHECKED_WINDOW, QUERIES

#: One representative per SURVEY §2 row / LLM-pipeline component that must
#: always be inside the checked window.
REQUIRED_IN_WINDOW = {
    # marts (J/A/W flagships), core agg, filters, distinct
    "sales_team_mart",
    "customer_mart",
    "pricing_summary",
    "distinct_pairs",
    # grouping variants + stats + pivot
    "agg_grouping_variants",
    # r13: TWAP (total-order tie-breaks + DECIMAL(38) numerator,
    # extreme/dupnullmix-changed) replaces the time-capped funnel
    # (driver-green r11+r12, in the tail)
    "events_twap_value",
    # r13: business-day latency (extreme-axis floor-div/pmod sign fix)
    # replaces triangle cliques (green r9-r12); graph_bfs_levels keeps
    # the graph rep
    "orders_business_day_latency",
    # join family (full-outer + anti reps live in the tail since r6;
    # semi/q3 cover the §2 row inside the window; q13 to the tail r13)
    "join_semi_customers_with_orders",
    # r10: q5 (6-table star) replaces q3 (green r5-r9, in the tail)
    "q5_local_supplier_volume",
    # sorts / topk / windows (frames rep in the tail since r6; global
    # top-k and the analytics-suite umbrella in the tail since r7 —
    # topk_suppliers covers the O/W rows in the window)
    "topk_suppliers_per_nation",
    "window_ignore_nulls_family",
    # set ops (multiset rep in the tail since r6)
    "setop_union_compat",
    # scalar families / subqueries / UDFs / skew
    "scalar_string_functions",
    "date_null_predicates",
    # r11: CDC chunking (try_divide readouts changed r10) replaces the
    # BPE merge trainer (driver-green r10, in the tail)
    "text_cdc_chunking",
    "json_functions",
    # modern-SQL rep since r7 (subqueries_combined in the tail)
    "sql_recursive_month_spine",
    "udf_surface",
    # skew rep since r7: salted JOIN (salted-sum agg in the tail)
    "join_skew_salted",
    # r11: two-proportion z (conditional-aggregate rewrite r10) replaces
    # Welch (driver-green r10 incl. the identical rewrite, in the tail)
    "stats_two_proportion_z",
    # events + streaming + temporal joins. r9 rotation: the streaming
    # reps are the two surfaces the r8 bug fixes changed (session
    # windows — directory-layout source; stream-stream LEFT OUTER join —
    # staged base consolidation); alert flapping (0/0 guard changed r8)
    # and mix-shift decomposition (first check) take the analytics
    # slots; tumbling/stateful/asof/transition-matrix (all green >=2
    # rounds) are in the tail
    "events_tumbling_counts",
    "interval_join_click_error",
    # r12: null-safe SCD2 maintenance replaces the PIT join built on it
    "scd2_customer_segments",
    # r13: nearest as-of join (r12 struct-carry payload fix + O(n)
    # frame rewrite) gets its first post-change driver check
    "asof_nearest_click_purchase",
    # r13: hourly gap-fill interpolation (sanity-domain intake +
    # descending-prefix frame rewrite) replaces the dynamic-gap
    # sessionizer (green r10-r12, in the tail)
    "events_hourly_interpolate",
    "stream_sliding_counts",
    # r12: CUSUM changepoint (flaky NULL-hour oracle fixed in the
    # nullmix sweep) + BFS levels return; DAU/MAU + Shapley (green
    # r8-r11) to the tail
    "events_cusum_changepoint",
    "graph_bfs_levels",
    # r11: robust-z anomalies + DQ rule engine (both try_divide-changed
    # r10) replace hourly ACF (green r10) and mix-shift (green r9+r10)
    "events_hourly_robust_z",
    "dq_rule_engine",
    "cdc_apply_changes",
    # stats second rep; r12: trimmed mean (NULL-is-not-a-sample rank
    # statistic) replaces the KMV sketch (green r8-r11)
    "stats_ks_two_sample",
    "stats_trimmed_mean",
    # LLM-pipeline extensions (winnow/doc_chunking/substring-spans/SCD2
    # rotated to the tail r8; families keep reps per registry comment)
    "text_profile",
    "text_pii_scrub",
    "text_repetition_score",
    # r13: winnowing fingerprint returns (r12 bigdoc O(len^2) explode
    # fix + 64 KiB prefix cap, driver-unchecked since)
    "text_winnow_fingerprint",
    "pack_training_sequences",
    "dedup_exact",
    "dedup_cluster_components",
    "contamination_ngram_overlap",
    "dedup_containment",
    "sim_cosine_topk",
    # r12: blocklist screen (null-safe stratum join) replaces minhash
    # LSH (green r10+r11, keeps its bench rung)
    "text_blocklist_screen",
    # r11: the PCA power iteration (zero-norm renormalize changed r10)
    # replaces IVF+quantized (green r9+r10, sf1/sf3 hash-verified, in
    # the tail); the persisted-index serve + append lifecycle stays
    "embedding_pca_top_component",
    # r12: auto-rekeyed IVF-PQ serving (the round's headline surface)
    # replaces the index append (green r9-r11; same oracle as serve)
    "sim_ivf_pq_rekeyed_topk",
    "sim_ivf_pq_index_serve",
    "multimodal_featurize",
    "sample_deterministic",
    "corpus_curation_pipeline",
}


def test_window_is_first_50():
    assert len(CHECKED_WINDOW) == 50
    assert list(QUERIES)[:50] == list(CHECKED_WINDOW)


def test_window_covers_required_operators():
    missing = REQUIRED_IN_WINDOW - set(CHECKED_WINDOW)
    assert not missing, f"§2 operators fell out of the checked window: {missing}"


def test_window_queries_all_have_oracles():
    no_oracle = [n for n in CHECKED_WINDOW if QUERIES[n].oracle is None]
    assert not no_oracle, f"checked-window queries without a value oracle: {no_oracle}"


def test_umbrella_constituents_still_registered():
    """Umbrellas fold families; the originals must stay queryable."""
    for name in (
        # demoted from the window (family already represented there) —
        # must stay registered + pytest-oracle-checked in the tail
        # r11 rotation outs (all driver-green in r10):
        "events_funnel_conversion",
        "text_bpe_merge_steps",
        "stats_welch_ttest",
        "events_hourly_acf",
        "events_mix_shift_decomposition",
        "sim_ivf_quantized_topk",
        # r10 rotation outs (driver-green r9, some r5-r9):
        "q3_shipping_priority",
        "text_unigram_logprob",
        "stream_session_windows",
        "stream_stream_left_outer_join",
        "events_alert_flapping",
        "sim_embedding_clusters",
        "sample_kfold_stratified",
        # r9 rotation outs (all driver-green >=2 rounds):
        "graph_bfs_levels",
        "text_bigram_logprob",
        "sim_ivf_pq_topk",
        "stream_tumbling_counts",
        "stream_stateful_totals",
        "events_transition_matrix",
        "asof_click_purchase",
        # r8 rotation outs (driver-green r5/r6 + r7):
        "events_session_funnel",
        "customer_rfm_segments",
        "basket_brand_affinity",
        "dedup_substring_spans",
        "scd2_customer_segments",
        "text_winnow_fingerprint",
        "doc_chunking",
        "sim_embedding_near_dup",
        # earlier rotations:
        "graph_pagerank_bipartite",
        "global_topk_orders",
        "window_analytics_suite",
        "subqueries_combined",
        "skew_salted_sum",
        "sim_lsh_ann_topk",
        "join_anti_customers_without_orders",
        "window_frames_bounded",
        "setop_multiset_family",
        "events_session_windows",
        "stream_stream_join",
        "dedup_simhash",
        "approx_count_distinct",
        "join_full_outer_balance",
        "global_sort_prices",
        "events_sliding_avg",
        "dedup_ngram_jaccard",
        "rollup_qty",
        "cube_qty",
        "grouping_sets_qty",
        "setop_intersect_all",
        "setop_except_all",
        "union_positional",
        "window_moving_sum_3rows",
        "window_range_frame_price_band",
        "pandas_udf_price_bands",
        "aes_roundtrip",
        "percentile_stats",
        "stats_moments",
        "text_token_stats",
        "text_lang_id",
        "text_quality_score",
        "sample_hash_documents",
        "sample_stratified_by_lang",
        "subquery_exists_urgent",
        "subquery_above_avg_orders",
    ):
        assert name in QUERIES, name
