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
# r10 prefix was 39 r5-stale names + the 11 r10-new ops (9 r5 names
# spilled to r11). r11 prefix: the 9 spilled r5 names + 41 oldest-r6
# names (r11-new ops, when added, displace the youngest r6 fillers
# from the tail — re-run tools/gen_cert_rotation.py 0 after adding).
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- r5-stale spill from the r10 rotation (last green row: r05)
    "q_text_bm25",
    "q_text_chunk_overlap",
    "q_text_contamination",
    "q_text_corpus_stopwords",
    "q_text_heavyhitters",
    "q_text_squeeze_runs",
    "q_ts_gapfill",
    "q_ts_locf",
    "q_ts_resample_ohlc",
    # -- r6-stale cohort (last green row: CORRECTNESS_r06)
    "q_agg_argmax",
    "q_agg_histogram",
    "q_agg_percentile",
    "q_agg_pivot",
    "q_agg_salted_sum",
    "q_dedup_minhash_banded",
    "q_dedup_ngram_jaccard",
    "q_dedup_semantic",
    "q_fn_posexplode",
    "q_fn_try_arith",
    "q_join_rangedate",
    "q_join_salted",
    "q_mix_weights",
    "q_pandas_asof_cogroup",
    "q_pandas_gmean",
    "q_pandas_zscore",
    "q_session_window_batch",
    "q_subquery_correlated",
    "q_text_domain_stats",
    "q_text_pii_scrub",
    "q_text_tfidf",
    "q_text_unigram_logprob",
    "q_text_zipf",
    "q_tpch_q1",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q2",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    # -- r11-new ops (displace the youngest r6 fillers from the tail)
    "q_sim_ann_ivfpq",
    "q_geo_dbscan",
    "q_agg_quantile_bottomk",
    "q_join_size_cm",
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
