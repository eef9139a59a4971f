"""Checkable operator inventory (SURVEY.md §2).

Each submodule defines two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  the Spark implementation of each operator, DataFrame-API first.
- ``ORACLE: dict[str, str]`` — the equivalent ANSI SQL for the
  DuckDB oracle (same column aliases; floats rounded on both sides;
  total orders under every LIMIT; SURVEY.md §5.3). Operators whose
  semantics DuckDB can't reproduce exactly (approximate, ML,
  streaming-only) appear in ``QUERIES`` but not ``ORACLE`` and get
  the driver's weaker rows-only check.

This package merges them; name collisions are a bug.
"""

from __future__ import annotations

from . import (
    aggregates,
    anomaly,
    ansi_safety,
    behavior,
    corpus,
    decontam,
    dedup,
    dq,
    graph,
    extras,
    formats,
    geo,
    incremental,
    integrity,
    joins,
    llmprep,
    multimodal_q,
    pandas_udfs,
    ref_parity,
    retrieval,
    sampling,
    scalar_fns,
    similarity,
    sketches,
    sortset,
    streaming_batch,
    text,
    timeseries,
    tpch,
    udtf_ops,
    webcorpus,
    windows,
)

# Module import order (alphabetical-ish; actual registry order is
# decided by _CERT_PREFIX below, not module position).
_MODULES = (
    ref_parity,
    scalar_fns,
    streaming_batch,
    text,
    dedup,
    similarity,
    multimodal_q,
    sampling,
    joins,
    aggregates,
    windows,
    sortset,
    behavior,
    decontam,
    corpus,
    incremental,
    sketches,
    extras,
    pandas_udfs,
    tpch,
    llmprep,
    timeseries,
    graph,
    dq,
    integrity,
    geo,
    retrieval,
    anomaly,
    formats,
    udtf_ops,
    ansi_safety,
    webcorpus,
)

# Registration order is a contract: the driver's correctness gate
# certifies exactly the FIRST 50 registry entries each round.
#
# ROTATION POLICY (the tuple is the source of truth; the arithmetic
# is pinned by tests/test_cli.py::test_cert_prefix_contract and
# test_cert_prefix_staleness_policy, so this comment states policy
# only — per-slot narratives drifted twice in r7/r8 and are gone):
#
#   1. Every query NEW in the current round MUST be in the prefix
#      (certs in its birth round; the contract test enforces
#      "certified in some past round OR queued").
#   2. Remaining slots go to the STALEST re-certs: names whose most
#      recent green driver row is oldest, oldest round first. New
#      ops displace the youngest fillers, never the stale cohort.
#   3. Rows-only names in the prefix must be allowlisted in
#      test_cert_prefix_all_oracle_backed::deliberate_rows_only.
#
# r10 prefix: slots 1-48 = the full r5-stale cohort (every name
# whose last green row is CORRECTNESS_r05; spot-re-verified green by
# the r9 judge, so rotation is zero-risk); slots 49-50 = r10-new
# ops, backfilled with the oldest r6 names while fewer than 2 exist.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- r5-stale cohort (last green row: CORRECTNESS_r05)
    "q_agg_bitmap_distinct",
    "q_agg_mergeable",
    "q_attribution_batch",
    "q_behavior_transitions",
    "q_cohort_retention",
    "q_dedup_cluster",
    "q_dedup_cluster_stats",
    "q_dedup_simhash_md5",
    "q_dq_checks",
    "q_er_fuzzy_blocked",
    "q_er_sorted_neighborhood",
    "q_fn_regression",
    "q_fn_unpivot",
    "q_funnel_conversion",
    "q_geo_cell_density",
    "q_graph_degree",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_nullsafe",
    "q_llm_curation",
    "q_merge_upsert",
    "q_multimodal_decode",
    "q_outliers_robust",
    "q_pack_sequences",
    "q_quality_gopher",
    "q_sample_leakage_safe",
    "q_sample_split",
    "q_sample_stratified",
    "q_scd2_history",
    "q_sessionize_batch",
    "q_sim_ann_ivf",
    "q_sim_centroid",
    "q_sim_maxsim",
    "q_sim_quantize",
    "q_skew_diagnose",
    "q_snapshot_diff",
    "q_source_csv",
    "q_source_orc",
    "q_table_fingerprint",
    # -- r10-new ops (q_text_bm25, q_text_chunk_overlap,
    # q_text_contamination,
    # q_text_corpus_stopwords, q_text_heavyhitters,
    # q_text_squeeze_runs + q_ts_gapfill/locf/resample_ohlc spill
    # to r11)
    "q_dedup_minhash_incremental",
    "q_dedup_substring_cut",
    "q_agg_theta_setops",
    "q_ts_sliding_distinct_kmv",
    "q_ts_holt_linear",
    "q_join_asof_tolerance",
    "q_agg_theta_matrix",
    "q_ts_changepoint",
    "q_dq_kanonymity",
    "q_dq_benford",
    "q_ts_xcorr_daily",
)

_BY_MODULE: dict = {}
ALL_ORACLES: dict = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in _BY_MODULE:
            raise RuntimeError(f"duplicate query name {_name!r} in {_m.__name__}")
        _BY_MODULE[_name] = _fn
    for _name, _sql in getattr(_m, "ORACLE", {}).items():
        if _name not in _m.QUERIES:
            raise RuntimeError(f"oracle {_name!r} in {_m.__name__} has no query")
        ALL_ORACLES[_name] = _sql

for _name in _CERT_PREFIX:
    if _name not in _BY_MODULE:
        raise RuntimeError(f"certification prefix names unknown query {_name!r}")

ALL_QUERIES: dict = {_n: _BY_MODULE[_n] for _n in _CERT_PREFIX}
for _name, _fn in _BY_MODULE.items():
    ALL_QUERIES.setdefault(_name, _fn)
