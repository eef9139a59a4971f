"""Semantic + plan tests for MaxSim and grouped regression."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_etl_spark.queries import retrieval
from twitter_etl_spark.tables import table

from conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_maxsim_bounds_and_self_match(spark):
    rows = retrieval.q_sim_maxsim(spark, SF_ORACLE).collect()
    n_labels = (
        table(spark, SF_ORACLE, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == n_labels
    # each of the Q per-token maxes is a cosine in [-1, 1]
    assert all(-retrieval.MAXSIM_Q <= r.maxsim <= retrieval.MAXSIM_Q for r in rows)
    # the labels that CONTAIN the query vectors score a perfect 1.0
    # on their own token (self-cosine), so the global top label must
    # score >= 1.0 + (Q-1) * min-cosine > 0 for this fixture
    assert rows[0].maxsim > 0


def test_maxsim_query_side_broadcast(spark):
    p = _plan(retrieval.q_sim_maxsim(spark, SF_SMOKE))
    assert "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_regression_matches_closed_form(spark):
    import numpy as np

    out = {
        r.event_type: r
        for r in retrieval.q_fn_regression(spark, SF_ORACLE).collect()
    }
    e = (
        table(spark, SF_ORACLE, "events")
        .select(
            "event_type",
            (F.unix_micros("ts") / 86_400_000_000.0).alias("t"),
            "value",
        )
        .collect()
    )
    by_type = {}
    for r in e:
        by_type.setdefault(r.event_type, []).append((r.t, r.value))
    for et, pts in by_type.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(out[et].slope - slope) < 1e-4
        assert abs(out[et].intercept - intercept) < 1e-2
        assert out[et].n == len(pts)
        assert 0.0 <= out[et].r2 <= 1.0
