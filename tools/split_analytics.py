"""One-shot refactor script (VERDICT r4 task #5): split
pipelines/analytics.py (13 kLoC) into family modules behind an
unchanged facade, preserving every top-level name and byte-identical
behavior.  Kept in tools/ for review; safe to re-run only on the
pre-split file."""

from __future__ import annotations

import ast
import collections

SRC = "opps_feedcrawler_ray/pipelines/analytics.py"
PKG = "opps_feedcrawler_ray/pipelines"

SHARED = {
    "_t", "order_stat", "_event_value_hist", "_splitmix64",
    "_word_count_table", "_tdiv",
}

# family -> explicit member list (every non-shared top-level name must
# appear exactly once; the script asserts exhaustiveness)
FAMILIES: dict[str, list[str]] = {
    # core relational / joins / layout / maintenance over the TPC-H-ish tables
    "relational": [
        "source_stats", "filter_lang", "orders_by_segment",
        "lineitem_order_priority", "region_nations", "distinct_users",
        "events_daily", "json_extract_events", "pricing_summary",
        "supplier_topk", "embeddings_by_label", "url_canonicalize",
        "exact_dedup_docs", "topk_per_group", "supplier_nation_builtin",
        "orders_monthly", "part_type_stats", "customer_balance_buckets",
        "orders_yoy_growth", "events_segment_skew_join", "orders_rollup",
        "customer_no_big_order", "_SEGMENTS", "orders_pivot_month_segment",
        "customer_big_order_counts", "part_lineitem_full_outer",
        "supplier_names_by_nation", "lineitem_above_avg",
        "lineitem_bloom_join", "orders_cube_year_priority",
        "orders_upsert_latest", "part_fuzzy_name_match",
        "supplier_ship_overlap", "events_unpivot_props",
        "contacts_union_by_name", "orders_diff", "nation_region_cross",
        "nation_share_of_region", "orders_digest",
        "source_stats_incremental", "source_dup_factor",
        "_scd2_change_rows", "orders_scd2", "orders_pit_join",
        "referential_integrity_audit", "_zorder_interleave",
        "zorder_layout", "_morton_interleave16",
        "events_zorder_prune_stats", "orders_grouping_sets",
        "nation_balance_stats", "lineitem_qty_means",
        "revenue_monthly_sortmerge", "orders_ivm_agg",
        "data_quality_checks", "join_size_estimate",
        "part_name_similarity_join", "part_fd_discovery",
        "table_profile", "orders_profile", "_skyline", "part_pareto",
        "lineitem_exact_median_price", "lineitem_mode_quantity",
        "topk_chars",
    ],
    # windows / sessions / sequences / user-behavior over event streams
    "windows": [
        "user_event_seq", "events_lag_delta", "events_moving_sum3",
        "user_event_pattern_counts", "purchase_click_days_bag",
        "users_weekly_purchasers", "active_users_7d", "events_trailing_3d",
        "events_trailing_3d_max", "orders_rank_in_segment",
        "events_hopping_window", "orders_ntile", "events_first_last",
        "user_funnel_stage", "orders_percent_rank",
        "events_daily_distinct_users", "user_mode_event",
        "purchase_days_no_click", "events_daily_gapfill",
        "purchase_click_users", "events_running_total",
        "user_retention_cohorts", "user_day_streaks",
        "events_running_distinct", "purchase_click_days_except",
        "event_transition_matrix", "events_time_weighted_avg",
        "events_global_rank", "events_hash_sample", "events_cume_dist",
        "purchase_no_recent_click", "orders_gaps_islands", "_ntile4",
        "customer_rfm", "sequential_pattern_support", "cohort_ltv",
        "events_daily_dense", "purchase_attribution",
        "event_attribution_markov", "purchase_shapley_attribution",
        "user_activity_gini", "events_percentile_cont",
    ],
    # statistics / hypothesis tests / time series / sketches over values
    "stats": [
        "events_median_value", "events_quantiles", "order_statish",
        "segment_event_chi2", "events_mad_value",
        "events_value_quantile_sketch", "event_type_lift",
        "events_trimmed_mean", "events_ks_test", "orders_benford",
        "events_autocorr", "welch_ttest", "events_psi",
        "events_value_time_corr", "token_zipf_fit",
        "events_dow_seasonality", "events_anomaly_ids",
        "segment_event_mutual_info", "events_bootstrap_ci",
        "events_cusum_changepoint", "events_holt_forecast",
        "lineitem_weighted_median", "events_mannwhitney",
        "events_spearman_corr", "events_anova_f", "events_kruskal_wallis",
        "events_kendall_tau", "orders_benford_digits",
        "events_value_zscore", "events_psi_drift",
        "orders_theilsen_trend", "events_voptimal_histogram",
        "events_dgim_window", "_matrix_profile_kernel",
        "events_matrix_profile", "events_diff_in_diff", "events_ams_f2",
        "events_holtwinters_forecast", "events_kleinberg_bursts",
        "events_sinkhorn_ot", "purchase_survival_km", "purchase_cox_ph",
        "_cox_newton", "events_seasonal_decompose",
        "events_cuped_adjust", "user_overlap_sketch",
        "events_fdr_bh", "weighted_sample_docs", "sample_docs",
        "stratified_sample_docs",
    ],
    # text / tokens / retrieval / language analysis over documents
    "text": [
        "token_counts", "text_quality", "doc_md5", "doc_regex_count",
        "source_lang_entropy", "doc_token_counts", "heavy_hitter_tokens",
        "tfidf_top_terms", "doc_lm_perplexity", "doc_repetition_stats",
        "token_postings", "bm25_search", "_STOPWORDS",
        "top_tokens_per_lang", "docs_matching_all_terms", "doc_clean_md5",
        "langid_confusion", "doc_char_chunks", "source_vocab_jaccard",
        "doc_ngram_novelty", "doc_compression_ratio",
        "source_simpson_diversity", "nb_lang_predict", "token_cms_counts",
        "_textrank_edges", "textrank_keywords", "_ed1", "token_typo_pairs",
        "token_pmi_collocations", "doc_encoding_audit", "docs_phrase_search",
        "doc_readability", "vocab_richness", "token_ppmi_svd",
        "passage_dedup_docs",
    ],
    # training-data prep / ML / tokenizer training / privacy
    "training": [
        "embedding_centroids", "quality_score_model", "doc_split_assign",
        "pack_token_chunks", "decontaminate_ngrams", "pii_redact_docs",
        "_bpe_merges", "bpe_vocab", "dsir_resample", "split_contamination",
        "embedding_quantize_int8", "balanced_resample", "woe_iv",
        "doc_augment", "embedding_fisher", "lineitem_price_regression",
        "_BpeEncodeStage", "bpe_encode_docs", "orders_urgent_logreg",
        "doc_coverage_select", "customer_loo_encoding",
        "events_decision_stump", "events_gbm_stumps", "isotonic_fit",
        "events_isotonic_calibration", "events_type_regression",
        "events_hbos_outliers", "conformal_token_interval",
        "lang_temperature_sample", "_als_init_q", "user_type_als",
        "doc_blocklist_filter", "logreg_lambda_sweep",
        "events_kanonymity_audit", "events_synthesize",
        "events_ldiversity_audit", "events_tcloseness_audit",
        "events_dp_daily_release", "unigram_lm_vocab",
        "unigram_encode_docs", "_iforest_c", "_iforest_build",
        "_iforest_paths", "events_isolation_forest", "wordpiece_vocab",
        "wordpiece_encode_docs", "lineitem_huber_regression",
        "events_platt_calibration", "_platt_newton", "error_propensity_att",
    ],
}
FAMILIES["stats"].remove("order_statish")  # placeholder cleanup


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    body = tree.body
    # module docstring + import header span
    assert isinstance(body[0], ast.Expr)
    header_end = 0
    for node in body:
        if isinstance(node, (ast.Import, ast.ImportFrom)) or (
            isinstance(node, ast.Expr) and node is body[0]
        ):
            header_end = node.end_lineno
        else:
            break
    docstring_src = ast.get_source_segment(src, body[0]) + "\n"
    header_nodes = [n for n in body if isinstance(n, (ast.Import, ast.ImportFrom))
                    and n.end_lineno <= header_end]
    import_src = "".join(
        "".join(lines[n.lineno - 1: n.end_lineno]) for n in header_nodes
    )

    # carve the rest of the file into contiguous chunks, one per top-level
    # statement, leading comments attached to the following statement
    rest = [n for n in body if n.end_lineno > header_end]
    chunk_names, chunk_spans = [], []
    starts = [n.lineno for n in rest] + [len(lines) + 1]
    prev_end = header_end
    for i, n in enumerate(rest):
        if isinstance(n, (ast.FunctionDef, ast.ClassDef)):
            name = n.name
        elif isinstance(n, ast.Assign) and isinstance(n.targets[0], ast.Name):
            name = n.targets[0].id
        else:
            raise RuntimeError(f"unexpected top-level node at line {n.lineno}")
        # chunk = everything after the previous chunk up to this node's end
        chunk_names.append(name)
        chunk_spans.append((prev_end, n.end_lineno))
        prev_end = n.end_lineno
    trailing = "".join(lines[prev_end:])
    assert trailing.strip() == "", f"unassigned trailing content: {trailing[:200]}"

    # exhaustiveness check
    assigned = set(SHARED)
    for fam, names in FAMILIES.items():
        for nm in names:
            assert nm not in assigned, f"duplicate assignment: {nm}"
            assigned.add(nm)
    missing = [nm for nm in chunk_names if nm not in assigned]
    extra = sorted(assigned - set(chunk_names))
    assert not missing, f"unassigned defs: {missing}"
    assert not extra, f"mapped but not present: {extra}"

    chunks = {nm: "".join(lines[a:b]) for nm, (a, b) in zip(chunk_names, chunk_spans)}

    # reference graph (for per-family shared imports)
    topnames = set(chunk_names)
    refs: dict[str, set[str]] = collections.defaultdict(set)
    for n in rest:
        if not isinstance(n, (ast.FunctionDef, ast.ClassDef)):
            continue
        for sub in ast.walk(n):
            if isinstance(sub, ast.Name) and sub.id in topnames and sub.id != n.name:
                refs[n.name].add(sub.id)
    # constants: find names referenced inside defs
    fam_of = {nm: fam for fam, names in FAMILIES.items() for nm in names}
    for nm in SHARED:
        fam_of[nm] = "shared"

    # cross-family references must resolve to shared only
    for nm, used in refs.items():
        for u in used:
            if fam_of[u] != "shared" and fam_of[u] != fam_of.get(nm):
                raise RuntimeError(
                    f"cross-family ref {nm} ({fam_of.get(nm)}) -> {u} ({fam_of[u]})"
                )

    docsuffix = {
        "shared": "Shared table-path / order-statistic / hashing helpers.",
        "relational": "Core relational operators: joins, grouping sets, "
                      "pivots, SCD2/PIT, layout (Z-order), profiling, "
                      "maintenance (IVM/upsert/diff) over the TPC-H-ish "
                      "tables.",
        "windows": "Window / session / sequence / user-behavior operators "
                   "over the event stream.",
        "stats": "Statistics, hypothesis tests, time-series, sketches and "
                 "sampling over value columns.",
        "text": "Text, token, retrieval and language-analysis operators "
                "over the documents table.",
        "training": "Training-data preparation, ML fitting, tokenizer "
                    "training and privacy operators.",
    }

    order = {nm: i for i, nm in enumerate(chunk_names)}
    files: dict[str, str] = {}
    for fam in ["shared"] + list(FAMILIES):
        members = sorted(
            (nm for nm, f in fam_of.items() if f == fam), key=order.__getitem__
        )
        need_shared = sorted(
            {u for nm in members for u in refs.get(nm, ()) if fam_of[u] == "shared"}
        ) if fam != "shared" else []
        head = (
            f'"""{docsuffix[fam]}\n\nSplit from the original '
            f"``analytics.py`` (round 5, VERDICT r4 task #5); the\n"
            f"``analytics`` facade re-exports every name, so the registry "
            f"and oracle\nsurface are unchanged.\"\"\"\n\n"
        )
        body_src = import_src
        if need_shared:
            body_src += "\nfrom .analytics_shared import (  # noqa: F401\n"
            for u in need_shared:
                body_src += f"    {u},\n"
            body_src += ")\n"
        out = head + body_src + "".join(chunks[nm] for nm in members)
        fname = f"{PKG}/analytics_{fam}.py"
        files[fname] = out

    # facade
    facade = docstring_src + "\n"
    facade += (
        "# Round-5 split (VERDICT r4 task #5): the operator families live\n"
        "# in analytics_{shared,relational,windows,stats,text,training};\n"
        "# this facade re-exports every top-level name so the queries()\n"
        "# registry, the oracle surface, and all existing imports are\n"
        "# unchanged.  No logic lives here.\n"
    )
    for fam in ["shared"] + list(FAMILIES):
        members = sorted(
            (nm for nm, f in fam_of.items() if f == fam), key=order.__getitem__
        )
        facade += f"\nfrom .analytics_{fam} import (  # noqa: F401\n"
        for nm in members:
            facade += f"    {nm},\n"
        facade += ")\n"
    files[SRC] = facade

    for fname, content in files.items():
        with open(fname, "w") as f:
            f.write(content)
        print(fname, len(content.splitlines()), "lines")


if __name__ == "__main__":
    main()
