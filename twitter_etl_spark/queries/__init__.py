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
    windows,
)

# Registration order is a contract: the driver's correctness gate
# certifies a bounded prefix of this registry, so SURVEY.md §2
# *canonical* operator names must register first (ref-parity chain,
# scalar function families, streaming batch stand-ins, and the §2.6
# text/dedup/similarity/multimodal surface = 48 names), followed by
# the §2.4 relational core, with beyond-survey extras last.
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
)

ALL_QUERIES: dict = {}
ALL_ORACLES: dict = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise RuntimeError(f"duplicate query name {_name!r} in {_m.__name__}")
        ALL_QUERIES[_name] = _fn
    for _name, _sql in getattr(_m, "ORACLE", {}).items():
        if _name not in _m.QUERIES:
            raise RuntimeError(f"oracle {_name!r} in {_m.__name__} has no query")
        ALL_ORACLES[_name] = _sql
