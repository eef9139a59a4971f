"""Semantic tests for the strict (exact-sequence) funnel and the RFM
approx-percentile scale path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twitter_etl_spark.queries import behavior

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, m), u, t, 1.0, "{}")
            for i, (u, t, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_strict_vs_min_approximation(spark, tmp_path):
    """user 1's first click precedes its first view, so the min-based
    funnel drops it; the strict funnel finds the later qualifying
    click (and the purchase after it). user 2 behaves identically under
    both. Users 3/4 never complete the first/second step."""
    sf = _write_events(
        tmp_path,
        spark,
        [
            (1, "click", 1),
            (1, "view", 2),
            (1, "click", 3),
            (1, "purchase", 4),
            (2, "view", 1),
            (2, "purchase", 2),
            (2, "click", 3),
            (3, "view", 5),
            (4, "purchase", 5),
        ],
    )
    strict = behavior.q_funnel_strict(spark, sf).first()
    assert (
        strict.n_users,
        strict.n_view,
        strict.n_click_strict,
        strict.n_purchase_strict,
    ) == (4, 3, 2, 1)
    approx = behavior.q_funnel_conversion(spark, sf).first()
    # the documented under-count: user 1's qualifying click is invisible
    # to the min-based form
    assert (approx.n_click_after_view, approx.n_purchase_after_click) == (1, 0)


def test_funnel_strict_single_event_exchange(spark):
    """The three chained windows and the per-user roll-up share ONE
    hash exchange of the event log — no self-joins, no second
    shuffle."""
    p = _plan(behavior.q_funnel_strict(spark, SF_SMOKE))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_rfm_approx_path_matches_exact_on_smoke(spark):
    """exact=False (percentile_approx thresholds, the runnable
    100 TB path) must produce the same scores as the exact form on
    the smoke fixture — at accuracy 10000 over a few hundred users
    the t-digest is exact at the quintile boundaries."""
    exact = {
        r.user_id: (r.r_score, r.f_score, r.m_score)
        for r in behavior.q_behavior_rfm(spark, SF_SMOKE).collect()
    }
    approx = {
        r.user_id: (r.r_score, r.f_score, r.m_score)
        for r in behavior.q_behavior_rfm(
            spark, SF_SMOKE, exact=False
        ).collect()
    }
    assert set(exact) == set(approx)
    agree = sum(1 for u in exact if exact[u] == approx[u])
    assert agree >= 0.95 * len(exact)
    assert all(
        1 <= s <= 5 for scores in approx.values() for s in scores
    )
    # r8 verdict #5: the runnable path must aggregate thresholds with
    # the mergeable t-digest, not the buffer-every-value exact
    # percentile whose final reducer holds all user metrics at once
    plan = (
        behavior.q_behavior_rfm(spark, SF_SMOKE, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "percentile_approx" in plan
    assert "percentile(" not in plan.replace("percentile_approx(", "")


def test_dau_wau_mau_invariants(spark):
    """DAU <= WAU <= MAU per day; DAU equals the directly-computed
    per-day distinct-user count; WAU on day d equals distinct users
    over the trailing 7 calendar days."""
    import datetime as dt2

    from twitter_etl_spark.queries.behavior import q_behavior_dau_wau_mau
    from twitter_etl_spark.tables import table

    out = {r.day: r for r in q_behavior_dau_wau_mau(spark, SF_SMOKE).collect()}
    assert out
    assert all(r.dau <= r.wau <= r.mau for r in out.values())
    e = table(spark, SF_SMOKE, "events")
    ud = {
        (r.user_id, r.day)
        for r in e.select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .distinct()
        .collect()
    }
    by_day: dict = {}
    for u, d in ud:
        by_day.setdefault(d, set()).add(u)
    for day_s, r in out.items():
        d = dt2.date.fromisoformat(day_s)
        assert r.dau == len(by_day.get(d, set()))
        week = set()
        for k in range(7):
            week |= by_day.get(d - dt2.timedelta(days=k), set())
        assert r.wau == len(week)
