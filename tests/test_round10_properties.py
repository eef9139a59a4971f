"""Property tests for the round-10 operators (SURVEY.md §5.2 model):
pure-Python replays on Hypothesis-generated inputs, reaching paths
the deterministic fixtures cannot — the n == k theta boundary and
one-sided/empty sets for the theta algebra, sparse calendars with
OBSERVED-DAY gaps for the sliding KMV (the fixture's day axis is
dense), revenue gaps for the Holt recursion, and overlapping /
within-doc duplicate spans for the substring cut."""

from __future__ import annotations

import pytest

import datetime as dt
import hashlib
import os
import tempfile

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _round_half_up(x, n):
    import decimal

    q = decimal.Decimal(1).scaleb(-n)
    return float(
        decimal.Decimal(repr(float(x))).quantize(
            q, rounding=decimal.ROUND_HALF_UP
        )
    )


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ----------------------------------------------------------------
# theta set algebra


def _theta_reference(a_users, b_users):
    from twitter_etl_spark.queries.sketches import _KMV_M, _THETA_K

    a = sorted({_h60(str(u)) for u in a_users})
    b = sorted({_h60(str(u)) for u in b_users})
    m_int = 1 << 60
    th = min(
        a[_THETA_K - 1] if len(a) >= _THETA_K else m_int,
        b[_THETA_K - 1] if len(b) >= _THETA_K else m_int,
    )
    fa = {h for h in a[:_THETA_K] if h < th}
    fb = {h for h in b[:_THETA_K] if h < th}
    scale = _KMV_M / float(th)
    sa, sb = set(a), set(b)
    n_union, n_inter = len(sa | sb), len(sa & sb)
    tu = _round_half_up(len(fa | fb) * scale, 4)
    ti = _round_half_up(len(fa & fb) * scale, 4)
    td = _round_half_up(len(fa - fb) * scale, 4)
    return (
        len(a),
        len(b),
        n_union,
        n_inter,
        len(a) - n_inter,
        tu,
        ti,
        td,
        _round_half_up(abs(tu - n_union) / n_union, 4),
        _round_half_up(abs(ti - n_inter) / max(n_inter, 1), 4),
    )


@given(
    st.lists(st.integers(0, 300), max_size=150),
    st.lists(st.integers(0, 300), max_size=150),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_theta_setops_matches_python_reference(spark, a_users, b_users):
    """Membership sizes straddle k=64 (including one-sided empties
    and the n == k boundary), so Hypothesis walks the exact branch,
    the estimator branch, and mixed-theta frames the fixture never
    produces."""
    from twitter_etl_spark.queries.sketches import q_agg_theta_setops

    assume(a_users or b_users)
    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), u, "purchase", 99.0)
        for i, u in enumerate(a_users)
    ] + [
        (10_000 + i, base + dt.timedelta(minutes=i), u, "error", 99.0)
        for i, u in enumerate(b_users)
    ]
    # decoys below the value cut must not enter either set
    rows += [(50_000, base, 9_999, "purchase", 10.0)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = q_agg_theta_setops(spark, d).first()
    got = (
        r["n_a"],
        r["n_b"],
        r["n_union"],
        r["n_inter"],
        r["n_diff"],
        r["theta_union"],
        r["theta_inter"],
        r["theta_diff"],
        r["rel_err_union"],
        r["rel_err_inter"],
    )
    assert got == _theta_reference(a_users, b_users)


# ----------------------------------------------------------------
# sliding KMV distinct


def test_kmin_pane_merge_is_lossless():
    """The algebraic core, pure Python: for ANY partition of a hash
    multiset into panes, the k smallest of (union of per-pane k-min
    lists) equal the k smallest of the full union — the reason the
    window estimator is identical to the one-shot sketch."""
    import itertools
    import random

    rng = random.Random(10)
    k = 8
    for _ in range(200):
        hashes = [rng.randrange(1_000) for _ in range(rng.randrange(1, 60))]
        n_panes = rng.randrange(1, 6)
        panes = [[] for _ in range(n_panes)]
        for h in hashes:
            panes[rng.randrange(n_panes)].append(h)
        merged = sorted(
            set(
                itertools.chain.from_iterable(
                    sorted(set(p))[:k] for p in panes
                )
            )
        )[:k]
        assert merged == sorted(set(hashes))[:k]


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )
)
@settings(**_SETTINGS)
def test_sliding_kmv_matches_python_reference(spark, day_user):
    """Sparse (day, user) incidence with calendar gaps: anchors are
    only OBSERVED days, lookback crosses unobserved days, and small
    panes keep the exact branch while stacked windows can cross
    k — paths the dense fixture never exercises."""
    from twitter_etl_spark.queries.sketches import _KMV_K, _KMV_M
    from twitter_etl_spark.queries.timeseries import (
        q_ts_sliding_distinct_kmv,
    )

    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(days=day, hours=2), u, "click", 1.0)
        for i, (day, u) in enumerate(day_user)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["day"]: (r["n_exact"], r["kmv_est"], r["rel_err"])
        for r in q_ts_sliding_distinct_kmv(spark, d).collect()
    }
    by_day: dict = {}
    for day, u in day_user:
        by_day.setdefault(day, set()).add(u)
    for anchor, _ in by_day.items():
        users = set()
        for back in range(7):
            users |= by_day.get(anchor - back, set())
        hs = sorted({_h60(str(u)) for u in users})
        if len(hs) < _KMV_K:
            est = float(len(hs))
        else:
            est = float(_KMV_K - 1) * (_KMV_M / hs[_KMV_K - 1])
        est_r = _round_half_up(est, 4)
        key = (base + dt.timedelta(days=anchor)).strftime("%Y-%m-%d")
        assert got.pop(key) == (
            len(users),
            est_r,
            _round_half_up(abs(est_r - len(users)) / len(users), 4),
        )
    assert not got


# ----------------------------------------------------------------
# Holt linear


@given(
    st.dictionaries(
        st.integers(0, 25),
        st.integers(0, 500_000),
        min_size=2,
        max_size=26,
    )
)
@settings(**_SETTINGS)
def test_holt_linear_matches_python_reference(spark, day_cents):
    """Generated daily revenue with CALENDAR GAPS (zero-filled days
    the dense fixture never has) replayed through the identical
    recursion in Python."""
    from twitter_etl_spark.queries.timeseries import q_ts_holt_linear

    assume(len(day_cents) >= 2)
    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 5, 1)
    rows = [
        (i, base + dt.timedelta(days=day, hours=1), 1, "purchase", c / 100.0)
        for i, (day, c) in enumerate(sorted(day_cents.items()))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    days = sorted(day_cents)
    d0, d1 = days[0], days[-1]
    # the engine's DECIMAL(18,2) cast of the double value recovers
    # the integer cents exactly, so the replica uses them directly
    ys = [day_cents.get(day, 0) for day in range(d0, d1 + 1)]
    level, b = float(ys[0]), float(ys[1] - ys[0])
    for y in ys[1:]:
        l_new = 0.5 * y + 0.5 * (level + b)
        b = 0.5 * (l_new - level) + 0.5 * b
        level = l_new
    rows_out = q_ts_holt_linear(spark, d).collect()
    assert len(rows_out) == 7
    last = base + dt.timedelta(days=d1)
    for r in sorted(rows_out, key=lambda r: r["h"]):
        h = r["h"]
        assert r["day"] == (last + dt.timedelta(days=h)).strftime("%Y-%m-%d")
        assert r["level"] == _round_half_up(level / 100.0, 4)
        assert r["trend"] == _round_half_up(b / 100.0, 4)
        assert r["yhat"] == _round_half_up((level + h * b) / 100.0, 4)


# ----------------------------------------------------------------
# exact-substring cut


def _substring_cut_reference(texts):
    from twitter_etl_spark.queries.dedup import _SUBSTR_TOKENS as w

    toks = {i: t.strip().split() for i, t in enumerate(texts)}
    occ: dict = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - w + 1):
            occ.setdefault(" ".join(ts[p : p + w]), []).append((i, p + 1))
    cut_pos: dict = {i: set() for i in toks}
    for _, places in occ.items():
        if len(places) < 2:
            continue
        for doc, pos in places[1:]:  # everything but the global first
            cut_pos[doc].update(range(pos, pos + w))
    out = {}
    for i, ts in toks.items():
        kept = [t for j, t in enumerate(ts, start=1) if j not in cut_pos[i]]
        out[i] = (
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
            len(ts) - len(kept),
            len(kept),
        )
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from("the cat sat on a mat dog ran big red".split()),
            min_size=1,
            max_size=30,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_substring_cut_matches_python_reference(spark, texts):
    """Tiny vocabulary forces heavy window collisions: overlapping
    duplicated spans, WITHIN-doc repeats, and whole-doc wipeouts —
    replayed against a literal Python implementation of the
    first-occurrence-survives policy. Conservation (cut + kept ==
    total) holds by construction of the replay and is asserted on
    the engine output too."""
    from twitter_etl_spark.queries.dedup import q_dedup_substring_cut

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    want = _substring_cut_reference(texts)
    rows = q_dedup_substring_cut(spark, d).collect()
    assert len(rows) == len(texts)
    for r in rows:
        md5_w, cut_w, kept_w = want[r["doc_id"]]
        assert (r["text_cut_md5"], r["cut_tokens"], r["kept_tokens"]) == (
            md5_w,
            cut_w,
            kept_w,
        )
        ntoks = len(texts[r["doc_id"]].strip().split())
        assert r["cut_tokens"] + r["kept_tokens"] == ntoks


# ----------------------------------------------------------------
# change-point


@given(
    st.dictionaries(
        st.integers(0, 30),
        st.integers(0, 4),  # tiny value range forces score TIES
        min_size=1,
        max_size=31,
    )
)
@settings(**_SETTINGS)
def test_changepoint_matches_python_reference(spark, day_cents):
    """Near-constant generated series force score ties (the
    earliest-day tie-break the fixture never exercises) and short
    spans force the empty-result branch (< 2*_CP_MIN_SEG days)."""
    from twitter_etl_spark.queries.timeseries import (
        _CP_MIN_SEG,
        q_ts_changepoint,
    )

    d = tempfile.mkdtemp()
    base = dt.datetime(2024, 7, 1)
    rows = [
        (i, base + dt.timedelta(days=day, hours=3), 1, "purchase", c / 100.0)
        for i, (day, c) in enumerate(sorted(day_cents.items()))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    days = sorted(day_cents)
    d0, d1 = days[0], days[-1]
    ys = [day_cents.get(day, 0) for day in range(d0, d1 + 1)]
    n = len(ys)
    best = None
    cum = 0
    for t in range(1, n + 1):
        cum += ys[t - 1]
        if t < _CP_MIN_SEG or t > n - _CP_MIN_SEG:
            continue
        import math

        ml = math.floor(cum * 100.0 / t + 0.5)
        mr = math.floor((sum(ys) - cum) * 100.0 / (n - t) + 0.5)
        key = (abs(ml - mr), -t)  # max score, then EARLIEST day
        if best is None or key > best[0]:
            best = (key, t, ml, mr)
    got = q_ts_changepoint(spark, d).collect()
    if best is None:
        assert got == []
        return
    assert len(got) == 1
    r = got[0]
    _, t, ml, mr = best
    want_day = (base + dt.timedelta(days=d0 + t - 1)).strftime("%Y-%m-%d")
    assert r["split_day"] == want_day
    assert (r["n_left"], r["n_right"]) == (t, n - t)
    assert r["mean_before"] == _round_half_up(ml / 1e4, 4)
    assert r["mean_after"] == _round_half_up(mr / 1e4, 4)
    assert r["delta"] == _round_half_up((mr - ml) / 1e4, 4)
