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
# r13 prefix was the 13 r13-new ops + the 37 stalest re-certs. r14
# prefix (this tuple): the r14-new ops + the stalest re-certs oldest
# green driver round first — the full 39-name r8 cohort plus the
# stalest r9 names (tools/gen_cert_rotation.py, hash-aware gate).
# Each new r14 op displaced the youngest r9 filler from the tail,
# never the stale cohort.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- r14-new ops (certs in their birth round, per policy #1)
    "q_sim_knn_clusters",
    "q_merge_cdc",
    "q_multimodal_align_score",
    "q_ts_periodogram",
    "q_dq_fd_check",
    "q_stream_late_batch",
    "q_multimodal_conflict",
    "q_attribution_position",
    "q_behavior_lifecycle",
    "q_dedup_token_sorted",
    "q_quality_rep_ngrams",
    "q_pack_epoch_shuffle",
    "q_text_kneser_ney",
    "q_behavior_markov_stationary",
    # -- r14 rotation: the stalest re-certs oldest-first (the full
    #    r8 cohort of 39 + the stalest r9 names;
    #    tools/gen_cert_rotation.py). New r14 ops displace the
    #    youngest r9 fillers from the tail as they land.
    "q_agg_moments",  # r8
    "q_agg_percentile_disc",  # r8
    "q_agg_topk_sketch",  # r8
    "q_behavior_dau_wau_mau",  # r8
    "q_behavior_entropy",  # r8
    "q_behavior_rfm",  # r8
    "q_behavior_streaks",  # r8
    "q_dedup_bloom",  # r8
    "q_dedup_containment",  # r8
    "q_dedup_exact_substring",  # r8
    "q_dedup_incremental",  # r8
    "q_dedup_minhash_est",  # r8
    "q_dedup_url_canonical",  # r8
    "q_dq_profile",  # r8
    "q_fn_sqludf",  # r8
    "q_fn_url",  # r8
    "q_fn_variant",  # r8
    "q_fn_xml",  # r8
    "q_funnel_strict",  # r8
    "q_geo_grid_join",  # r8
    "q_geo_knn",  # r8
    "q_graph_jaccard",  # r8
    "q_join_bloom",  # r8
    "q_join_lateral",  # r8
    "q_multimodal_shard_manifest",  # r8
    "q_sample_weighted",  # r8
    "q_sim_lsh_rhp",  # r8
    "q_sql_pipe",  # r8
    "q_sql_recursive_bom",  # r8
    "q_stat_ks_binned",  # r8
    "q_text_bigram_lm",  # r8
    "q_text_bpe_pairs",  # r8
    "q_text_ccnet_bucket",  # r8
    "q_ts_anomaly_window",  # r8
    "q_ts_cusum",  # r8
    "q_ts_decay_sum",  # r8
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
