"""Branch falsifiability of the tagged multi-op catalog queries
(r5 consolidation: catalog ≤ 50 keys so the driver's 50-row budget
hash-checks every key every round).

Two invariants make a merged query a valid evidence channel:

* every ``op`` branch contributes >0 rows — an accidentally-empty
  branch would otherwise pass the oracle trivially (both sides empty);
* column-merged queries carry every former standalone column, so each
  absorbed query's values stay inside the hashed result.
"""

from __future__ import annotations

import pytest

from rq_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

# key -> set of op tags that must each contribute rows
TAGGED = {
    "distinct_sort_sample": {"distinct", "sort_limit", "sample", "stratified", "mixture", "mixture_budget", "mixture_temp", "mixture_unimax", "domain_cap"},
    "agg_groupby_distinct": {
        "groupby", "distinct", "topk_words", "copair", "copair_stats",
    },
    "agg_approx_distinct": {"hll", "hll_union", "cms_hh"},
    "agg_stats": {
        "corr", "percentile", "profile", "skew", "qhist", "mad", "dq",
        "drift", "joinsize",
    },
    "set_ops": {
        "union", "intersect", "except",
        "diff_added", "diff_removed", "diff_changed",
    },
    "rollup_cube_gsets": {"rollup", "cube", "gsets"},
    "join_outer_family": {"left", "right", "full"},
    "join_filtering": {"semi", "anti", "cross"},
    "join_range_price_band": {"band", "linkage", "interval"},
    "join_asof_event": {"backward", "forward", "nearest"},
    "window_ranking": {"rank_dense", "dist_rank"},
    "func_array": {"element", "agg"},
    "stream_agg_dedup": {"tumble", "dedup", "enrich"},
    "stream_stateful": {"first_seen", "interval_join", "running"},
    "explode_ops": {"posexplode", "explode_outer", "chunk"},
    "struct_ops": {"with_field", "flatten"},
    "udf_vectorized": {"pandas_udf", "map_in_pandas", "bpe"},
    "udf_grouped_table": {"apply_in_pandas", "udtf"},
    "sim_ann_topk": {"lsh", "ivf", "pq", "ivfpq", "ivfpq_join"},
    "sim_topk_cosine": {"cosine", "bm25"},
    "dedup_text": {
        "exact", "minhash_lsh", "ngram_jaccard", "span", "excise",
        "cdc", "cdc_dup",
    },
    "dedup_connected_groups": {"components", "pagerank", "triangles",
                               "inc_components", "evict_components",
                               "evict_delta"},
    "event_sessions_rate": {"session", "rate", "funnel", "retention"},
    "window_frames": {"running", "trailing_30d", "ewma"},
    "window_agg_time": {"tumble", "slide", "transition"},
    "dedup_incremental": {
        "ingest_probe", "decontam", "bloom_decontam", "bloom_stats",
        "sem_decontam", "blocklist",
    },
}

# key -> columns absorbed from former standalone queries (column-merge)
COLUMN_MERGED = {
    "text_metrics": {
        "n_chars_raw", "n_words", "n_tokens", "n_uniq_words",  # token stats
        "lang_guess",                                          # lang id
        "alpha_ratio", "uniq_ratio", "mean_word_len", "quality",  # quality
        "n_ws_tokens", "n_bpe_tokens",                         # BPE budget
        "fp",                                                  # fingerprint
        "dup_3gram_frac",                                      # repetition
        "n_pii_email", "n_pii_phone", "n_pii_ipv4", "n_pii_ssn",  # PII detect
        "redacted_fp",                                         # PII redact
        "g_frac_dup_lines", "g_frac_dup_chars", "g_symbol_ratio",
        "g_frac_bullet", "g_frac_ellipsis", "g_stop_hits",
        "gopher_keep",                                         # Gopher rules
        "c4_frac_kept", "c4_clean_fp",                         # C4 line filter
    },
    "mm_pipeline": {
        "size_bytes", "sha256", "mime",                        # binary meta
        "n_frames", "f0_sha", "f_last_sha", "frame_len_floor",  # frames
        "width", "height", "channels", "feat_sum",             # decode+feat
        "resized_len",                                         # resize
    },
    "func_math_map": {"abs_dev", "price_sqrt6", "qty_val", "keys_csv"},
    "func_date_cond": {"y", "month_end", "price_band", "status_np"},
    "func_json_variant": {"prop_k", "k_decade", "k_int", "k_missing"},
    "window_analytic": {"prev_value", "first_value", "mavg7"},
}


@pytest.mark.parametrize("key", sorted(TAGGED))
def test_every_tagged_branch_contributes_rows(spark, key):
    df = all_queries()[key](spark, SF)
    counts = {r["op"]: r["n"] for r in df.groupBy("op").count().withColumnRenamed("count", "n").collect()}
    missing = TAGGED[key] - {op for op, n in counts.items() if n > 0}
    assert not missing, f"{key}: empty/missing branches {missing} (got {counts})"
    unexpected = set(counts) - TAGGED[key]
    assert not unexpected, f"{key}: unknown op tags {unexpected}"


@pytest.mark.parametrize("key", sorted(COLUMN_MERGED))
def test_column_merged_queries_keep_absorbed_columns(spark, key):
    df = all_queries()[key](spark, SF)
    missing = COLUMN_MERGED[key] - set(df.columns)
    assert not missing, f"{key}: absorbed columns missing {missing}"


def test_catalog_within_driver_budget():
    """The driver records 50 correctness rows per round; every catalog
    key must get one, so the catalog must never exceed 50 keys."""
    assert len(all_queries()) <= 50


@pytest.mark.parametrize(
    "key",
    [
        "text_metrics",
        "func_math_map",
        "func_date_cond",
        "func_json_variant",
        "mm_pipeline",
        "mm_real_decode",
    ],
)
def test_column_merged_queries_scan_once(spark, key):
    """The point of a column-merge is reading the table ONCE — a
    regression to per-family scans would re-read the corpus 4-5× at
    100 TB."""
    df = all_queries()[key](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, f"{key} reads its table more than once"


def test_distinct_sort_sample_overlapped_build_is_deterministic(spark):
    """r15: distinct_sort_sample constructs its nine branch builders
    on a thread pool (guide §2.6 — the serial build was ~2-2.6 s of
    blocking Py4J chatter plus three idle-cores threshold collects).
    Thread scheduling must influence only the overlap, never the
    assembled plan: two independent builds must analyze to the same
    tree modulo expression IDs, branches in the fixed catalog order."""
    import re

    def canon(df):
        s = df._jdf.queryExecution().analyzed().toString()
        return re.sub(r"#\d+", "#", s)

    fn = all_queries()["distinct_sort_sample"]
    a, b = canon(fn(spark, SF)), canon(fn(spark, SF))
    assert a == b
    # union children in declared branch order (first tag per branch)
    tags = re.findall(r"Project \[(\w+) AS op#", a)
    assert tags == [
        "distinct", "sort_limit", "sample", "stratified", "mixture",
        "mixture_budget", "mixture_temp", "mixture_unimax", "domain_cap",
    ]
