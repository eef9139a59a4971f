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
#   r06 (this list): the 46 oracle-backed names with no driver row in
#            any prior round (all 21 remaining TPC-H, pandas-UDF/UDTF,
#            webcorpus, window/agg/join extras), computed as
#            ALL_ORACLES minus union(CORRECTNESS_r01..r05 keys), plus
#            4 re-cert slots for queries touched this round.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- TPC-H (q15 was certified r5 via local run; these 21 never were)
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",      # oracle GROUP BY + partsupp-broadcast fixed this round
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    # -- pandas UDF / UDTF surface (§2.7)
    "q_pandas_zscore",
    "q_pandas_asof_cogroup",
    "q_pandas_gmean",
    "q_udtf_runlength",
    # -- webcorpus / text extras
    "q_text_pii_scrub",
    "q_text_domain_stats",
    "q_text_unigram_logprob",
    "q_text_zipf",
    "q_mix_weights",
    # -- window / agg / join / misc extras
    "q_win_ntile_sharded",
    "q_win_firstlast",
    "q_win_rolling_median",
    "q_ts_interarrival",
    "q_agg_histogram",
    "q_agg_argmax",
    "q_agg_percentile",
    "q_agg_pivot",
    "q_agg_salted_sum",
    "q_agg_stats",
    "q_fn_posexplode",
    "q_fn_try_arith",
    "q_join_rangedate",
    "q_join_salted",
    "q_session_window_batch",
    "q_subquery_correlated",
    # -- queries new or touched in round 6
    "q_dedup_semantic",        # new r6 (SemDeDup survivor resolution)
    "q_dedup_minhash_banded",  # r6: sliced-digest bands + single shuffle
    "q_dedup_ngram_jaccard",   # r6: digest_keys flag
    "q_text_tfidf",            # r6: df via count window (plan rewrite)
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
