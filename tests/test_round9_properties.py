"""Property tests for the round-9 operators (SURVEY.md §5.2 model):
pure-Python replays on Hypothesis-generated inputs, reaching paths
the deterministic fixtures cannot — empty histogram buckets and
single-segment degeneracy for the chi-squared gate, the KMV
exact/estimator branch boundary, and calendar GAPS (zero-revenue
days) in the seasonal decomposition, which the gap-free fixture
never exercises."""

from __future__ import annotations

import pytest

import datetime as dt
import math
import os
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st


def _round_half_up(x, n):
    """Spark F.round / DuckDB round semantics (HALF_UP, ties away
    from zero) — same helper as test_round8_properties."""
    import decimal

    q = decimal.Decimal(1).scaleb(-n)
    return float(
        decimal.Decimal(repr(float(x))).quantize(
            q, rounding=decimal.ROUND_HALF_UP
        )
    )


_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ----------------------------------------------------------------
# chi-squared drift gate


def _chi2_reference(bal_a, bal_b):
    from twitter_etl_spark.queries.sketches import _HP_B, _HP_LO, _HP_W

    hist: dict = {}
    for seg, vals in (("a", bal_a), ("b", bal_b)):
        for x in vals:
            b = min(int(math.floor((x - _HP_LO) / _HP_W)), _HP_B - 1)
            ca, cb = hist.get(b, (0, 0))
            hist[b] = (ca + 1, cb) if seg == "a" else (ca, cb + 1)
    n_a, n_b = len(bal_a), len(bal_b)
    s = 0
    for ca, cb in hist.values():
        d = ca * n_b - cb * n_a
        t = ca + cb
        s += math.floor(float(d * d) / float(t) * 1e6 + 0.5)
    chi2 = s / 1e6 / (n_a * n_b)
    return (
        n_a,
        n_b,
        len(hist),
        _round_half_up(chi2, 6),
        _round_half_up(math.sqrt(chi2 / (n_a + n_b)), 6),
    )


@given(
    st.lists(st.integers(-999, 9999), min_size=1, max_size=80),
    st.lists(st.integers(-999, 9999), min_size=1, max_size=80),
)
@settings(**_SETTINGS)
def test_chi2_binned_matches_python_reference(spark, bal_a, bal_b):
    from twitter_etl_spark.queries.sketches import q_stat_chi2_binned

    d = tempfile.mkdtemp()
    rows = [(i, "AUTOMOBILE", float(v)) for i, v in enumerate(bal_a)] + [
        (10_000 + i, "MACHINERY", float(v)) for i, v in enumerate(bal_b)
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    r = q_stat_chi2_binned(spark, d).collect()[0]
    assert (
        r["n_a"],
        r["n_b"],
        r["n_bins"],
        r["chi2"],
        r["cramers_v"],
    ) == _chi2_reference(bal_a, bal_b)


# ----------------------------------------------------------------
# KMV distinct sketch


def _kmv_reference(user_ids):
    import hashlib

    from twitter_etl_spark.queries.sketches import _KMV_K

    hs = sorted(
        {
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in user_ids
        }
    )
    n = len(hs)
    if n < _KMV_K:
        est = float(n)
    else:
        est = float(_KMV_K - 1) * (float(1 << 60) / hs[_KMV_K - 1])
    est_r = _round_half_up(est, 4)
    return n, est_r, _round_half_up(abs(est_r - n) / n, 4)


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200))
@settings(**_SETTINGS)
def test_kmv_matches_python_reference(spark, user_ids):
    """Sizes straddle k=64, so Hypothesis walks BOTH the exact
    short-circuit and the estimator branch — including the n == k
    boundary the fixtures never hit."""
    from twitter_etl_spark.queries.sketches import q_agg_kmv_distinct

    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=i), u, "click", 1.0)
            for i, u in enumerate(user_ids)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = q_agg_kmv_distinct(spark, d).collect()
    assert len(r) == 1
    got = (r[0]["n_exact"], r[0]["kmv_est"], r[0]["rel_err"])
    assert got == _kmv_reference(user_ids)


# ----------------------------------------------------------------
# seasonal decomposition (with calendar gaps)


def _seasonal_reference(day_dollars):
    """Replay of q_ts_seasonal_decompose in integer cents over the
    ZERO-FILLED calendar."""
    from collections import defaultdict

    cents = defaultdict(int)
    for off, dollars in day_dollars:
        cents[off] += dollars * 100
    offs = sorted(cents)
    d0, d1 = offs[0], offs[-1]
    cal = list(range(d0, d1 + 1))
    rev = [cents.get(k, 0) for k in cal]
    n = len(cal)
    out = {}
    base = dt.date(2024, 1, 1)
    interior = [k for k in range(n) if 3 <= k <= n - 4]
    if not interior:
        return out
    t7 = {k: sum(rev[k - 3 : k + 4]) for k in interior}
    detr = {k: 7 * rev[k] - t7[k] for k in interior}
    by_dow = defaultdict(list)
    for k in interior:
        by_dow[(base + dt.timedelta(days=cal[k])).weekday()].append(detr[k])
    s_fp = {
        dw: math.floor(sum(v) * 100.0 / (7.0 * len(v)) + 0.5)
        for dw, v in by_dow.items()
    }
    m_fp = math.floor(sum(s_fp.values()) / 7.0 + 0.5)
    for k in interior:
        day = (base + dt.timedelta(days=cal[k])).isoformat()
        trend_fp = math.floor(t7[k] * 100.0 / 7.0 + 0.5)
        sea_fp = s_fp[(base + dt.timedelta(days=cal[k])).weekday()] - m_fp
        out[day] = (
            _round_half_up(rev[k] / 100.0, 2),
            _round_half_up(trend_fp / 1e4, 4),
            _round_half_up(sea_fp / 1e4, 4),
            _round_half_up((rev[k] * 100 - trend_fp - sea_fp) / 1e4, 4),
        )
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_seasonal_decompose_matches_reference_with_gaps(spark, day_dollars):
    """Random sparse day coverage: missing days must be zero-filled
    into the MA window (the fixture is gap-free, so only Hypothesis
    reaches this path); series shorter than 7 days yield no rows."""
    from twitter_etl_spark.queries.timeseries import q_ts_seasonal_decompose

    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 1, 1, 12)
    spark.createDataFrame(
        [
            (i, base + dt.timedelta(days=off, minutes=i), 1, "click", float(v))
            for i, (off, v) in enumerate(day_dollars)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["day"]: (r["revenue"], r["trend"], r["seasonal"], r["remainder"])
        for r in q_ts_seasonal_decompose(spark, d).collect()
    }
    assert got == _seasonal_reference(day_dollars)


# ----------------------------------------------------------------
# Adamic-Adar / Resource Allocation


def _aa_reference(edges, topk=50):
    from collections import defaultdict

    from twitter_etl_spark.queries.graph import AA_SCALE, JACCARD_MAX_PIVOT

    by_cust = defaultdict(set)
    for c, s in set(edges):
        by_cust[c].add(s)
    acc: dict = defaultdict(lambda: [0, 0, 0])
    for c, supps in by_cust.items():
        cd = len(supps)
        if cd > JACCARD_MAX_PIVOT or cd < 2:
            continue
        waa = math.floor(AA_SCALE / math.log(cd) + 0.5)
        wra = math.floor(AA_SCALE / cd + 0.5)
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                e = acc[(ss[i], ss[j])]
                e[0] += 1
                e[1] += waa
                e[2] += wra
    scored = {
        k: (
            v[0],
            _round_half_up(v[1] / AA_SCALE, 6),
            _round_half_up(v[2] / AA_SCALE, 6),
        )
        for k, v in acc.items()
    }
    order = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:topk]
    return dict(order)


@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 10)),  # (cust, supp)
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_adamic_adar_matches_python_reference(spark, edges):
    """Random bipartite purchase graphs (dup edges on purpose —
    the DISTINCT in the query must collapse them) vs brute force."""
    from twitter_etl_spark.queries.graph import q_graph_adamic_adar

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(edges)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(edges)],
        "l_orderkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        (r["s1"], r["s2"]): (r["n_common"], r["aa_score"], r["ra_score"])
        for r in q_graph_adamic_adar(spark, d).collect()
    }
    assert got == _aa_reference(edges)
