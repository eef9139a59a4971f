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
#   r04 (this list): the oracle-backed names with no driver row in any
#            prior round — the two r03-red rows (now fixed) first,
#            then incremental/behavior/corpus/llmprep/timeseries/
#            graph/dq/integrity/geo/retrieval/anomaly families.
# Names NOT in the prefix keep their module-order position after it.
_CERT_PREFIX = (
    "q_sessionize_batch",      # r03 FAIL: oracle HUGEINT cast — fixed
    "q_multimodal_decode",     # r03 ERR: ArrayType column — now scalar + oracled
    "q_merge_upsert",
    "q_agg_mergeable",
    "q_fn_unpivot",
    "q_join_nullsafe",
    "q_source_csv",
    "q_sample_split",
    "q_sample_stratified",
    "q_sim_centroid",
    "q_funnel_conversion",
    "q_cohort_retention",
    "q_attribution_batch",
    "q_behavior_transitions",
    "q_text_contamination",
    "q_dedup_cluster",
    "q_dedup_cluster_stats",
    "q_text_corpus_stopwords",
    "q_dedup_minhash_banded",
    "q_sim_quantize",
    "q_sim_ann_ivf",
    "q_sample_leakage_safe",
    "q_dedup_simhash_md5",
    "q_llm_curation",
    "q_text_heavyhitters",
    "q_agg_bitmap_distinct",
    "q_pack_sequences",
    "q_text_squeeze_runs",
    "q_text_chunk_overlap",
    "q_text_bm25",
    "q_quality_gopher",
    "q_scd2_history",
    "q_skew_diagnose",
    "q_ts_gapfill",
    "q_ts_locf",
    "q_ts_resample_ohlc",
    "q_graph_degree",
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_dq_checks",
    "q_er_fuzzy_blocked",
    "q_er_sorted_neighborhood",
    "q_snapshot_diff",
    "q_table_fingerprint",
    "q_geo_grid_join",
    "q_geo_cell_density",
    "q_sim_maxsim",
    "q_fn_regression",
    "q_outliers_robust",
    "q_source_orc",
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
