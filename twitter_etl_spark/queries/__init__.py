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
#   r07:     q_agg_stats (the r6 red, fixed) + 4 never-certified
#            rows-only + r2-stale relational core + the 8 queries
#            new in r7 + r3-stale reference-parity core.
#   r08 (this list): slots 1-29 = every oracle-backed name with NO
#            driver row in any CORRECTNESS file (the late-r7 wave)
#            plus q_funnel_strict (new in r8); slots 30-32 = the 3
#            rows-only names never seen by the driver
#            (q_agg_hll_distinct, q_agg_topk_sketch, q_ts_lttb);
#            slot 33 = q_geo_grid_join re-cert (its lon-ring
#            widening changed semantics in r8); slots 34-42 = the 9
#            r2-stale names displaced from the r7 prefix; slot 43 =
#            q_dedup_exact_substring (new in r8); slot 44 =
#            q_sample_weighted (new in r8); slot 45 =
#            q_behavior_dau_wau_mau (new in r8); slot 46 =
#            q_dedup_containment (new in r8); slots 38-50 = the
#            thirteen ops new in late r8 (q_agg_countmin,
#            q_dedup_bloom, q_sim_lsh_rhp, q_dedup_minhash_est,
#            q_text_bigram_lm, q_agg_linear_count,
#            q_agg_histo_percentile, q_agg_ams_f2, q_agg_lc_setops,
#            q_ts_cusum, q_agg_hll_md5, q_join_bloom,
#            q_stat_ks_binned — every new op certs in its birth
#            round), so the displaced re-certs
#            (q_agg_approx_distinct rows-only, q_dedup_normalized,
#            q_fn_array, q_fn_case, q_fn_cast, q_join_cross,
#            q_join_right, q_except, q_sort_multi, q_intersect,
#            q_union_distinct, q_union_all, q_limit_topk) join
#            q_fn_date, q_fn_json, q_fn_map and q_fn_math in the
#            r9 queue (17 names).
#            tests/test_cli.py::test_cert_prefix_contract pins the
#            arithmetic (exactly 50, rows-only allowlisted, every
#            registry name certified-or-queued) so this comment can
#            no longer drift from the tuple.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- slots 1-29: oracle-backed first-certs (no driver row yet)
    "q_join_lateral",
    "q_agg_listagg",
    "q_agg_mode",
    "q_fn_url",
    "q_dq_profile",
    "q_fn_variant",
    "q_fn_sqludf",
    "q_fn_xml",
    "q_text_bpe_pairs",
    "q_text_ccnet_bucket",
    "q_dedup_incremental",
    "q_dedup_url_canonical",
    "q_multimodal_shard_manifest",
    "q_agg_grouping_id",
    "q_agg_percentile_disc",
    "q_agg_boolcount",
    "q_agg_moments",
    "q_win_nth",
    "q_behavior_entropy",
    "q_behavior_streaks",
    "q_behavior_rfm",
    "q_funnel_strict",
    "q_sql_recursive_bom",
    "q_sql_pipe",
    "q_ts_decay_sum",
    "q_ts_anomaly_window",
    "q_graph_jaccard",
    "q_geo_knn",
    "q_udtf_splitn",
    # -- slots 30-32: rows-only names never seen by the driver
    "q_agg_hll_distinct",
    "q_agg_topk_sketch",
    "q_ts_lttb",
    # -- slot 33: semantics changed in r8 (lat-adaptive lon ring)
    "q_geo_grid_join",
    # (slots 34-42 of the early-r8 plan were r2-stale re-certs; all
    # nine were displaced one by one as the late-r8 ops landed)
    # -- slot 43: new in r8 (Lee-et-al-style exact-substring dedup)
    "q_dedup_exact_substring",
    # -- slot 44: new in r8 (Efraimidis-Spirakis weighted sampling)
    "q_sample_weighted",
    # -- slot 45: new in r8 (DAU/WAU/MAU engagement triple)
    "q_behavior_dau_wau_mau",
    # -- slot 46: new in r8 (asymmetric shingle containment)
    "q_dedup_containment",
    # -- slots 46-50: new in late r8 (certifiable sketch/membership/
    #    LSH/estimator/LM — the deterministic-md5/integer-literal
    #    trick upgrades traditionally rows-only families to hash
    #    certs)
    "q_agg_countmin",
    "q_dedup_bloom",
    "q_sim_lsh_rhp",
    "q_dedup_minhash_est",
    "q_text_bigram_lm",
    "q_agg_linear_count",
    "q_agg_histo_percentile",
    "q_agg_ams_f2",
    "q_agg_lc_setops",
    "q_ts_cusum",
    "q_agg_hll_md5",
    "q_join_bloom",
    "q_stat_ks_binned",
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
