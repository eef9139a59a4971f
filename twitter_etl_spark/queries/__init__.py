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
    layout,
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
    layout,
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
# r10 prefix was 39 r5-stale names + the 11 r10-new ops (9 r5 names
# spilled to r11). r11 prefix: the 9 spilled r5 names + 41 oldest-r6
# names (r11-new ops, when added, displace the youngest r6 fillers
# from the tail — re-run tools/gen_cert_rotation.py 0 after adding).
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- r6-stale cohort (last green row: CORRECTNESS_r06); the 7
    #    TPC-H names were REWRITTEN by the r11 _money_fp sweep after
    #    their last driver cert — re-certifying the swept code is the
    #    round's top verdict item.
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_ts_interarrival",
    "q_udtf_runlength",
    "q_win_firstlast",
    "q_win_ntile_sharded",
    "q_win_rolling_median",
    # -- r7-stale cohort (last green row: CORRECTNESS_r07)
    "q_agg_approx_percentile",
    "q_agg_collect",
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_global",
    "q_agg_groupby",
    "q_agg_groupingsets",
    "q_agg_having",
    "q_agg_multi_distinct",
    "q_agg_rollup",
    "q_agg_stats",
    "q_clean_pipeline",
    "q_dedup_exact_global",
    "q_dedup_keyed",
    "q_dedup_paragraph",
    "q_dedup_simhash_pairs",
    "q_filter_conj",
    "q_flagship_transform",
    "q_graph_cc_star",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_full",
    "q_join_inner",
    "q_join_interval",
    "q_join_left",
    # -- r12-new ops (13 names; they displace the youngest r7 fillers
    #    from the tail: q_mutate_multi, q_pack_bestfit,
    #    q_project_rename, q_retrieval_rrf, q_scan_parquet,
    #    q_sim_kmeans, q_sink_append, q_join_theta, q_join_semi,
    #    q_join_multiway, q_join_selfasof spill to r13,
    #    joining the already-spilled q_source_ndjson and q_text_dsir)
    "q_dedup_semantic_incremental",
    "q_sim_ann_pq_trained",
    "q_drift_psi",
    "q_graph_labelprop",
    "q_layout_zorder",
    "q_stat_mann_whitney",
    "q_text_bpe_merge",
    "q_seq_pattern",
    "q_ts_mann_kendall",
    "q_drift_emd",
    "q_multimodal_phash_dedup",
    "q_graph_kcore",
    "q_graph_bfs",
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
