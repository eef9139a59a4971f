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
# r9 prefix: slots 1-45 = the full r2/r3-stale cohort (every name
# whose last green row predates r5; re-verified green at sf0.01 by
# the r8 judge, so rotation is zero-risk); slots 46-50 = r9-new ops,
# backfilled with the oldest r5 names while fewer than 5 exist.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    # -- r2-stale cohort (last green row: CORRECTNESS_r02)
    "q_agg_approx_distinct",  # rows-only
    "q_except",
    "q_intersect",
    "q_join_cross",
    "q_join_right",
    "q_limit_topk",
    "q_sort_multi",
    "q_union_all",
    "q_union_distinct",
    # -- r3-stale cohort (last green row: CORRECTNESS_r03)
    "q_dedup_minhash",  # rows-only
    "q_dedup_normalized",
    "q_dedup_simhash",  # rows-only
    "q_fn_array",
    "q_fn_case",
    "q_fn_cast",
    "q_fn_date",
    "q_fn_json",
    "q_fn_map",
    "q_fn_math",
    "q_fn_string2",
    "q_multimodal_framesample",
    "q_multimodal_meta",
    "q_sample_hash",
    "q_sim_ann_lsh",  # rows-only
    "q_sim_cosine_topk",
    "q_sim_embedding_neardup",
    "q_str_lower",
    "q_str_squish",
    "q_str_stopwords",
    "q_str_strip_mentions",
    "q_str_strip_urls",
    "q_stream_sliding_batch",
    "q_stream_tumbling_batch",
    "q_text_fingerprint",
    "q_text_hashtags",
    "q_text_langid",
    "q_text_lengthhist",
    "q_text_lexicon_join",
    "q_text_ngrams",
    "q_text_quality",
    "q_text_repetition",
    "q_text_scrub",
    "q_text_tokencount",
    "q_text_tokenize",
    "q_text_wordcount",
    # -- r9-new ops + oldest-r5 backfill
    "q_stat_chi2_binned",
    "q_sim_lsh_rhp_strict",
    "q_agg_kmv_distinct",
    "q_graph_adamic_adar",
    "q_ts_seasonal_decompose",
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
