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
# Provenance (regenerate the wording from tools/gen_cert_rotation.py
# output, don't hand-narrate — ADVICE r14): the r16 prefix was the
# tool's 44-name queue plus the r16-new ops and the q_drift_jsd
# re-cert. This r17 prefix (optimization round 2) front-loads the
# DELIBERATE RE-CERTS the r16 verdict demanded (item 2): every query
# path the r16 optimization commits rewrote that was NOT in the r16
# oracle sample, plus this round's own optimization targets
# (labelprop/kcore/dbscan/pq_trained) — their last driver certs
# predate the rewrites, so freshness-ordering does not apply (the
# deliberate_recerts set in tests/test_cli.py mirrors this list).
# Remaining 34 slots: the stalest re-certs, oldest green driver
# round first (r10 tail + r11 cohort head; boundary ties at r11).
_CERT_PREFIX = (
    # -- r16-rewritten paths (builder-certified only; driver must
    #    re-certify — VERDICT r16 "Next round" item 2)
    "q_er_cluster",  # r15 cert, rewritten r16 (star core)
    "q_sim_knn_clusters",  # r14 cert, rewritten r16 (star core)
    "q_multimodal_dedup_cluster",  # r15 cert, rewritten r16 (star core)
    "q_graph_cc_star",  # r12 cert, rewritten r16 (star core)
    "q_graph_ppr",  # r13 cert, rewritten r16 (loop-invariant ckpts)
    "q_graph_hits",  # r13 cert, rewritten r16 (per-round ckpts)
    "q_graph_bfs",  # r12 cert, rewritten r16 (ckpt removal)
    "q_dedup_minhash_banded",  # r11 cert, touched r16 (_spread)
    "q_dedup_minhash_est",  # r14 cert, rewritten r16 (shared frames)
    "q_dedup_minhash_recall",  # r15 cert, recomposed r16
    "q_llm_curation_semantic",  # r15 cert, inherits star core
    "q_dedup_ngram_jaccard",  # r11 cert, param-only r16
    # -- r17 optimization targets (touched this round)
    "q_graph_labelprop",  # r12 cert
    "q_graph_kcore",  # r12 cert
    "q_geo_dbscan",  # r11 cert
    "q_sim_ann_pq_trained",  # r12 rows>0; rows-only (allowlisted)
    # -- r17 rotation fillers: stalest re-certs oldest-first
    #    (tools/gen_cert_rotation.py output with the 16 slots above
    #    reserved; r10 tail then r11 cohort, ties at r11 arbitrary)
    "q_sample_leakage_safe",  # r10
    "q_sample_split",  # r10
    "q_sample_stratified",  # r10
    "q_scd2_history",  # r10
    "q_sessionize_batch",  # r10
    "q_sim_ann_ivf",  # r10
    "q_sim_centroid",  # r10
    "q_sim_maxsim",  # r10
    "q_sim_quantize",  # r10
    "q_skew_diagnose",  # r10
    "q_snapshot_diff",  # r10
    "q_source_csv",  # r10
    "q_source_orc",  # r10
    "q_table_fingerprint",  # r10
    "q_ts_changepoint",  # r10
    "q_ts_holt_linear",  # r10
    "q_ts_sliding_distinct_kmv",  # r10
    "q_ts_xcorr_daily",  # r10
    "q_agg_argmax",  # r11
    "q_agg_histogram",  # r11
    "q_agg_percentile",  # r11
    "q_agg_pivot",  # r11
    "q_agg_quantile_bottomk",  # r11
    "q_agg_salted_sum",  # r11
    "q_dedup_semantic",  # r11
    "q_fn_posexplode",  # r11
    "q_fn_try_arith",  # r11
    "q_join_rangedate",  # r11
    "q_join_salted",  # r11
    "q_join_size_cm",  # r11
    "q_mix_weights",  # r11
    "q_pandas_asof_cogroup",  # r11
    "q_pandas_gmean",  # r11
    "q_pandas_zscore",  # r11
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
