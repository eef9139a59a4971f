"""Rounding-boundary flake guard (the r6 `q_agg_stats` red class).

A rounded float whose MAGNITUDE is near its rounding ULP usually means
a statistic of near-cancelling sums (covar/corr/r2 of independent
columns): cross-engine accumulation noise can flip the rounded digit
and hash-mismatch a driver cert even though both engines are
"correct". This test sweeps every oracle's DuckDB output at the
driver's sf and fails on any new near-ULP value, so the class can't
re-enter the registry silently.

Allowlisted hits were measured safe in r7 (Spark-vs-DuckDB
disagreement stressed across merge orders ≤ 1.2e-15, boundary margins
≥ 2e-7 — ≥8 orders of headroom):

- ``q_fn_regression.r2``: ratio statistic; noise cancels relatively.
- ``q_pandas_zscore.zscore``: per-row value near its group mean —
  noise is per-row (~1e-15), not cancellation-amplified.
- ``q_sim_centroid.c``: mean of ~200 bounded values, noise ~1e-15.
"""

from __future__ import annotations

import pytest

import importlib.util
import os

from twitter_etl_spark.harness import duckdb_connect
from twitter_etl_spark.queries import ALL_ORACLES

from conftest import SF_ORACLE

_ALLOWED = {
    ("q_fn_regression", "r2"),
    ("q_pandas_zscore", "zscore"),
    ("q_sim_centroid", "c"),
    # r7: a doc whose mean weight is ~-1e-4 sits at the 4-decimal ULP,
    # but the per-doc reduction is EXACT integer math (fixed-point
    # bucket weights, the unigram_logprob trick) — both engines sum
    # identical BIGINTs and divide by identical counts, so the
    # pre-round doubles are bit-identical; the only float divergence
    # source (1-ulp libm log differences in the 1024 bucket weights)
    # is absorbed by round(...,6) three decimal orders above its ULP.
    ("q_text_dsir", "dsir_logweight"),
}


def _boundary_risk():
    spec = importlib.util.spec_from_file_location(
        "audit_rounding",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "audit_rounding.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.boundary_risk


@pytest.mark.slow
def test_no_near_ulp_rounded_values_in_oracles():
    boundary_risk = _boundary_risk()
    con = duckdb_connect(SF_ORACLE)
    offenders = []
    for name, sql in sorted(ALL_ORACLES.items()):
        rel = con.execute(sql)
        cols = [c[0] for c in rel.description]
        seen = set()
        for row in rel.fetchall():
            for c, v in zip(cols, row):
                if (name, c) in seen or (name, c) in _ALLOWED:
                    continue
                if isinstance(v, float) and boundary_risk(v):
                    seen.add((name, c))
                    offenders.append((name, c, v))
    assert not offenders, offenders
