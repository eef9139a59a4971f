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
# certifies exactly the FIRST 50 registry entries each round, so the
# prefix is rotated deliberately per round to grow cumulative
# driver-certified coverage. Round history:
#   r01-r02: ref-parity + relational core (joins/aggs/windows/sortset)
#   r03:     ref-parity + scalar fns + streaming-batch + §2.6
#            text/dedup/similarity/multimodal/sampling
#   r04-r05: incremental/behavior/corpus/llmprep/timeseries/graph/
#            dq/integrity/geo/retrieval/anomaly families.
#   r06:     the 46 oracle-backed names with no driver row in any
#            prior round (all 21 remaining TPC-H, pandas-UDF/UDTF,
#            webcorpus, window/agg/join extras) + 4 re-cert slots.
#   r08 (suggested): 50 slots, priority order —
#     (a) ~29 first-cert slots: every oracle-backed name with NO
#         driver row in any CORRECTNESS file (the late-r7 waves):
#         q_dq_profile, q_text_ccnet_bucket, q_win_nth,
#         q_agg_grouping_id, q_agg_percentile_disc, q_agg_boolcount,
#         q_fn_variant, q_fn_sqludf, q_udtf_splitn, q_join_lateral,
#         q_agg_listagg, q_graph_jaccard, q_dedup_incremental,
#         q_text_bpe_pairs, q_agg_mode, q_fn_url,
#         q_dedup_url_canonical, q_behavior_entropy, q_ts_decay_sum,
#         q_agg_moments, q_behavior_streaks,
#         q_multimodal_shard_manifest, q_sql_recursive_bom,
#         q_ts_anomaly_window, q_sql_pipe, q_fn_xml,
#         q_behavior_rfm, q_geo_knn;
#     (b) 3 rows-only slots (driver rows>0 check):
#         q_agg_hll_distinct, q_agg_topk_sketch, q_ts_lttb;
#     (c) remaining ~18 slots: the stalest re-certs, oldest round
#         first — the 8 r2-certified names displaced from the r7
#         prefix (q_limit_topk, q_union_all, q_union_distinct,
#         q_intersect, q_except, q_sort_multi, q_join_cross,
#         q_join_right), then r3-stale scalar-fn/streaming-batch/
#         text/dedup/similarity/sampling names (latest green row =
#         CORRECTNESS_r03), plus a re-cert for anything r7 touched
#         (q_text_dsir persist, minhash triangle pair gen) and
#         q_agg_stats if its r7 row flaked.
#   r07 (this list): slots 1-5 = q_agg_stats (r6's one red, fixed:
#            corr/covar moved off the near-zero pair) + the 4
#            rows-only queries that have never appeared in any
#            CORRECTNESS file (driver's rows>0 check closes the
#            loop); slots 6-32 = r2-stale relational core
#            (joins/aggs/windows/sort — drift insurance); slots
#            33-40 = the 8 queries NEW in r7 (q_tpch_q15,
#            q_dedup_paragraph, q_join_interval, q_ts_ewma,
#            q_sim_kmeans rows-only, q_text_dsir, q_retrieval_rrf,
#            q_graph_cc_star); slots 41-50 = 10 r3-stale
#            reference-parity core queries (main.R flagship
#            behaviors).
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- slot 1: the r6 red, fixed this round (extras.py q_agg_stats)
    "q_agg_stats",
    # -- slots 2-5: rows-only queries never seen by the driver
    "q_agg_approx_percentile",
    "q_dedup_simhash_pairs",
    "q_pack_bestfit",
    "q_text_tfidf_mllib",
    # -- slots 6-40: r2-stale relational core (joins)
    "q_join_inner",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_theta",
    "q_join_selfasof",
    # -- (aggregates)
    "q_agg_global",
    "q_agg_groupby",
    "q_agg_distinct",
    "q_agg_multi_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_groupingsets",
    "q_agg_having",
    "q_agg_collect",
    # -- (windows)
    "q_win_rownumber",
    "q_win_rank",
    "q_win_ntile",
    "q_win_pctrank",
    "q_win_lag_lead",
    "q_win_running",
    "q_win_moving",
    "q_win_range_frame",
    "q_topk_pergroup",
    # -- (sort / set ops)
    # (q_sort_multi and q_join_cross displaced to the r8 re-cert
    #  batch by the two late-r7 additions below)
    # -- slots 34-40: NEW in r7 — certify this round (displacing the
    #    limit/union/intersect/except re-certs into the r8 batch): the
    #    missing TPC-H query, span-level corpus dedup, the bin-
    #    bucketed interval join, bounded EWMA, and k-means training
    #    (rows-only: iterative, gets the driver's rows>0 check)
    "q_tpch_q15",
    "q_dedup_paragraph",
    "q_join_interval",
    "q_ts_ewma",
    "q_sim_kmeans",
    "q_text_dsir",
    "q_retrieval_rrf",
    "q_graph_cc_star",
    # -- slots 41-50: r3-stale reference-parity core (main.R behaviors)
    "q_scan_parquet",
    "q_source_ndjson",
    "q_sink_append",
    "q_filter_conj",
    "q_project_rename",
    "q_mutate_multi",
    "q_dedup_keyed",
    "q_clean_pipeline",
    "q_flagship_transform",
    "q_dedup_exact_global",
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
