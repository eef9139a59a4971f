"""Mergeable-agg algebra and the bounded-memory heavy hitters."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_mergeable_agg_equals_direct(spark):
    """merge(agg(half0), agg(half1)) must equal agg(whole) — the
    incremental-rollup invariant."""
    from twitter_etl_spark.queries.sketches import q_agg_mergeable
    from twitter_etl_spark.tables import table

    merged = {r["lang"]: r for r in q_agg_mergeable(spark, SF_SMOKE).collect()}
    direct = {
        r["lang"]: r
        for r in table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for lang, r in direct.items():
        m = merged[lang]
        assert (m["n_docs"], m["sum_chars"], m["min_chars"], m["max_chars"]) == (
            r["n_docs"], r["sum_chars"], r["min_chars"], r["max_chars"],
        )


def test_heavy_hitters_exact_on_skewed_fixture(spark):
    """A token planted above the N/k threshold must come back with
    its EXACT count; tokens below must not appear — the sketch
    bounds memory, never the answer."""
    from twitter_etl_spark.queries.sketches import q_text_heavyhitters

    # 300 docs: every doc says 'hot'; unique cold tokens elsewhere.
    # N = 300*4 = 1200 tokens; threshold N/100 = 12; count(hot)=300,
    # count(warm)=10 (below), all others unique.
    rows = []
    for i in range(300):
        filler = f"u{i}a u{i}b" if i >= 10 else "warm warmx"
        rows.append((i, f"hot {filler} hotend{i % 7}", "en", "s", 1))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["token"]: r["n"] for r in q_text_heavyhitters(spark, d).collect()}
    assert out["hot"] == 300
    assert "warm" not in out  # 10 <= 12 threshold
    # hotend0..6 appear 42-43x each (> 12): present with exact counts
    for j in range(7):
        expected = sum(1 for i in range(300) if i % 7 == j)
        assert out[f"hotend{j}"] == expected


def test_bitmap_distinct_partials_merge(spark):
    """The bitmap partial state must merge associatively: computing
    per-bucket bitmaps over two disjoint halves and OR-merging gives
    the same distinct count as one pass (the incremental-view
    property that count(DISTINCT) lacks)."""
    from pyspark.sql import functions as F

    from twitter_etl_spark.queries.sketches import q_agg_bitmap_distinct
    from twitter_etl_spark.tables import table

    from conftest import SF_ORACLE

    one_pass = {
        r.l_returnflag: r.n_distinct_supp
        for r in q_agg_bitmap_distinct(spark, SF_ORACLE).collect()
    }
    li = table(spark, SF_ORACLE, "lineitem")
    halves = [
        li.where(F.col("l_orderkey") % 2 == i).groupBy(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_suppkey)").alias("bucket"),
        ).agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(l_suppkey))"
            ).alias("bm")
        )
        for i in (0, 1)
    ]
    merged = (
        halves[0]
        .unionByName(halves[1])
        .groupBy("l_returnflag", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("l_returnflag")
        .agg(F.expr("sum(bitmap_count(bm))").alias("n"))
    )
    assert {r.l_returnflag: r.n for r in merged.collect()} == one_pass


def test_bitmap_distinct_incremental_maintenance(spark):
    """The 100 TB claim made concrete: maintain the per-(group,
    bucket) bitmap summary across arriving batches (read state, OR
    in the batch, write state) and read exact distinct counts off
    the summary — no rescan of history, matching the one-pass
    answer."""
    import tempfile

    from pyspark.sql import functions as F

    from twitter_etl_spark.queries.sketches import q_agg_bitmap_distinct
    from twitter_etl_spark.tables import table

    from conftest import SF_ORACLE

    li = table(spark, SF_ORACLE, "lineitem")

    def batch_bitmaps(df):
        return df.groupBy(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_suppkey)").alias("bucket"),
        ).agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(l_suppkey))"
            ).alias("bm")
        )

    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/summary"
        for i in range(3):  # three arriving micro-batches
            batch = li.where(F.col("l_orderkey") % 3 == i)
            bms = batch_bitmaps(batch)
            try:
                prev = spark.read.parquet(state)
                bms = (
                    prev.unionByName(bms)
                    .groupBy("l_returnflag", "bucket")
                    .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
                )
            except Exception:
                pass  # first batch: no state yet
            bms.cache().count()  # materialize before overwriting source
            bms.write.mode("overwrite").parquet(state)
            bms.unpersist()
        final = (
            spark.read.parquet(state)
            .groupBy("l_returnflag")
            .agg(F.expr("sum(bitmap_count(bm))").alias("n"))
        )
        got = {r.l_returnflag: r.n for r in final.collect()}
    want = {
        r.l_returnflag: r.n_distinct_supp
        for r in q_agg_bitmap_distinct(spark, SF_ORACLE).collect()
    }
    assert got == want


def test_topk_sketch_exact_in_regime(spark):
    """approx_top_k with distinct-cardinality far under the tracked
    budget must equal the exact top-3 counts (both fixture scales)."""
    from pyspark.sql import functions as F

    from twitter_etl_spark.queries.sketches import q_agg_topk_sketch
    from twitter_etl_spark.tables import table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {
            (r["item"], r["count"])
            for r in q_agg_topk_sketch(spark, sf).collect()
        }
        exact = (
            table(spark, sf, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "o_orderpriority")
            .limit(3)
            .collect()
        )
        want = {(r["o_orderpriority"], r["n"]) for r in exact}
        assert got == want, (sf, got, want)


def test_countmin_one_sided_error_with_real_collisions(spark):
    """Count-min estimates never undercount (min over depth rows of
    hashed cells >= true count), and the deliberately-narrow width
    (16 < vocab 31) forces at least one REAL collision overcount —
    the sketch's error model actually exercises at fixture scale."""
    from twitter_etl_spark.queries.sketches import q_agg_countmin

    rows = q_agg_countmin(spark, SF_SMOKE).collect()
    assert rows, "probe set must be non-empty"
    assert all(r["cm_est"] >= r["n_true"] for r in rows)
    assert all(r["overcount"] == r["cm_est"] - r["n_true"] for r in rows)
    assert any(r["overcount"] > 0 for r in rows), (
        "width below vocab must produce at least one collision"
    )


def test_linear_count_tracks_exact_within_regime(spark):
    """Linear counting at fill ~0.3 or below: the estimate must sit
    within 5% of the exact distinct count, the bitmap can never hold
    more positions than there are distinct values (or bits), and the
    estimator is monotone >= filled (collision correction only adds)."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.sketches import _LC_M, q_agg_linear_count

    rows = q_agg_linear_count(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["filled"] <= min(_LC_M, r["n_exact"])
        assert r["lc_est"] >= r["filled"]
        assert abs(r["lc_est"] - r["n_exact"]) <= 0.05 * r["n_exact"], r


def test_histo_percentile_error_bounded_by_bucket_width(spark):
    """The histogram interpolation can miss the exact percentile by
    at most ~one bucket width (the value is pinned INSIDE the
    cumulative-crossing bucket); both probe points and all segments
    must be present."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.sketches import (
        _HP_W,
        q_agg_histo_percentile,
    )

    rows = q_agg_histo_percentile(spark, SF_ORACLE).collect()
    segs = {r["c_mktsegment"] for r in rows}
    assert len(rows) == 2 * len(segs)
    assert {r["p"] for r in rows} == {0.5, 0.9}
    assert all(r["abs_err"] <= _HP_W for r in rows)


def test_ams_f2_median_of_means_unbiased_regime(spark):
    """AMS F2 with 6x8 median-of-means must land within 20% of the
    exact second moment on every language (raw-median form measured
    ~45-57% low — the bias the geometry comment documents)."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.sketches import q_agg_ams_f2

    rows = q_agg_ams_f2(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["f2_exact"] > 0
        assert r["rel_err"] <= 0.2, r


def test_lc_setops_algebra_consistent(spark):
    """LC set algebra: the union estimate can never exceed the sum
    of the parts, inclusion-exclusion reproduces each exact count
    within 5% at the fixture fill, and the fixture split is
    genuinely non-degenerate (A != B != A∩B)."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.sketches import q_agg_lc_setops

    r = q_agg_lc_setops(spark, SF_ORACLE).collect()[0]
    assert r["n_inter"] < min(r["n_a"], r["n_b"])  # non-degenerate
    assert r["lc_union"] <= r["lc_a"] + r["lc_b"] + 1e-9
    for est, exact in (
        (r["lc_a"], r["n_a"]),
        (r["lc_b"], r["n_b"]),
        (r["lc_inter"], r["n_inter"]),
    ):
        assert abs(est - exact) <= 0.05 * exact, (est, exact)


def test_hll_md5_tracks_exact_and_agrees_with_datasketches_class(spark):
    """The certifiable HLL must track the exact distinct count
    within 3 standard errors (1.04/sqrt(256) ~ 6.5% per the paper)
    at both checked scales — one scale lands in the linear-counting
    small-range branch (n=150 <= 2.5m=640), the smoke fixture too —
    and the register rank can never exceed 53."""
    from tests.conftest import SF_ORACLE, SF_SMOKE
    from twitter_etl_spark.queries.sketches import q_agg_hll_md5

    for sf in (SF_SMOKE, SF_ORACLE):
        rows = q_agg_hll_md5(spark, sf).collect()
        assert rows
        for r in rows:
            assert r["rel_err"] <= 3 * 1.04 / (256 ** 0.5), r


def test_chi2_binned_matches_textbook_formula(spark):
    """q_stat_chi2_binned's D²/t identity must equal the textbook
    Σ (O−E)²/E over the same binned table, computed independently
    in Python from the raw balances (fixed-point granularity 1e-6
    bounds the divergence of the two spellings)."""
    import math

    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.sketches import (
        _HP_B,
        _HP_LO,
        _HP_W,
        q_stat_chi2_binned,
    )
    from twitter_etl_spark.tables import table

    r = q_stat_chi2_binned(spark, SF_ORACLE).collect()[0]
    rows = (
        table(spark, SF_ORACLE, "customer")
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    hist: dict = {}
    for row in rows:
        b = min(int(math.floor((row["c_acctbal"] - _HP_LO) / _HP_W)), _HP_B - 1)
        ca, cb = hist.get(b, (0, 0))
        if row["c_mktsegment"] == "AUTOMOBILE":
            hist[b] = (ca + 1, cb)
        else:
            hist[b] = (ca, cb + 1)
    n_a = sum(v[0] for v in hist.values())
    n_b = sum(v[1] for v in hist.values())
    n = n_a + n_b
    chi2 = 0.0
    for ca, cb in hist.values():
        t = ca + cb
        ea = n_a * t / n
        eb = n_b * t / n
        chi2 += (ca - ea) ** 2 / ea + (cb - eb) ** 2 / eb
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert abs(r["chi2"] - chi2) < 1e-4
    assert abs(r["cramers_v"] - math.sqrt(chi2 / n)) < 1e-4
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_kmv_exercises_both_branches_and_tracks_exact(spark):
    """KMV: the smoke fixture (15 distinct users < k=64) must take
    the exact short-circuit (rel_err == 0); sf0.01 (150 distinct)
    must take the estimator branch and land within 4 sigma
    (n/sqrt(k-2) ~ 12.7%)."""
    from tests.conftest import SF_ORACLE, SF_SMOKE
    from twitter_etl_spark.queries.sketches import _KMV_K, q_agg_kmv_distinct

    smoke = q_agg_kmv_distinct(spark, SF_SMOKE).collect()
    assert smoke and all(r["rel_err"] == 0.0 for r in smoke)
    assert all(r["n_exact"] < _KMV_K for r in smoke)
    big = q_agg_kmv_distinct(spark, SF_ORACLE).collect()
    assert big and all(r["n_exact"] >= _KMV_K for r in big)
    sigma = 1.0 / (_KMV_K - 2) ** 0.5
    assert all(r["rel_err"] <= 4 * sigma for r in big), big
    # estimator branch genuinely estimates (not the trivial equality)
    assert any(r["kmv_est"] != r["n_exact"] for r in big)


def test_adamic_adar_matches_bruteforce(spark):
    """q_graph_adamic_adar vs brute-force Python over the capped
    pivot relation: identical pair ordering and scores to 1e-5
    (the fixed-point weights quantize at 1e-12 per pivot)."""
    import math
    from collections import defaultdict

    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.graph import (
        AA_SCALE,
        JACCARD_MAX_PIVOT,
        q_graph_adamic_adar,
    )
    from twitter_etl_spark.tables import table

    o = table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_suppkey")
    cs = {
        (r["o_custkey"], r["l_suppkey"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    by_cust = defaultdict(set)
    for c, s in cs:
        by_cust[c].add(s)
    scores: dict = defaultdict(lambda: [0, 0, 0])
    for c, supps in by_cust.items():
        cd = len(supps)
        if cd > JACCARD_MAX_PIVOT or cd < 2:
            continue
        waa = math.floor(AA_SCALE / math.log(cd) + 0.5)
        wra = math.floor(AA_SCALE / cd + 0.5)
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                e = scores[(ss[i], ss[j])]
                e[0] += 1
                e[1] += waa
                e[2] += wra
    got = q_graph_adamic_adar(spark, SF_ORACLE).collect()
    assert got
    for r in got:
        n, saa, sra = scores[(r["s1"], r["s2"])]
        assert r["n_common"] == n
        assert abs(r["aa_score"] - saa / AA_SCALE) < 1e-5
        assert abs(r["ra_score"] - sra / AA_SCALE) < 1e-5
    # the emitted top-50 must be the true RA top-50 cut
    want = sorted(
        ((v[2], k) for k, v in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    assert {(k[0], k[1]) for _, k in want} == {(r["s1"], r["s2"]) for r in got}


def test_seasonal_decompose_matches_python_reference(spark):
    """q_ts_seasonal_decompose vs an independent Python replay of
    the classical additive decomposition (centered 7-day MA,
    mean-centered dow effect) on the collected daily series; also
    pins the additive identity trend + seasonal + remainder ==
    revenue (exact at the shared fixed-point grid, so tolerance is
    only the three 1e-4 output roundings)."""
    import math
    from collections import defaultdict

    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.timeseries import q_ts_seasonal_decompose
    from twitter_etl_spark.tables import table

    got = {r["day"]: r for r in q_ts_seasonal_decompose(spark, SF_ORACLE).collect()}
    assert got
    # collect raw and reduce in Python to stay engine-independent
    import datetime as dt

    raw = (
        table(spark, SF_ORACLE, "events")
        .selectExpr("to_date(ts) AS day", "CAST(value AS DECIMAL(18,2)) AS v")
        .collect()
    )
    cents = defaultdict(int)
    for r in raw:
        cents[r["day"]] += int(r["v"] * 100)
    days = sorted(cents)
    d0, d1 = days[0], days[-1]
    cal = [d0 + dt.timedelta(days=k) for k in range((d1 - d0).days + 1)]
    rev = [cents.get(d, 0) for d in cal]
    n = len(cal)
    interior = range(3, n - 3)
    t7 = {k: sum(rev[k - 3 : k + 4]) for k in interior}
    detr = {k: 7 * rev[k] - t7[k] for k in interior}
    by_dow = defaultdict(list)
    for k in interior:
        by_dow[cal[k].weekday()].append(detr[k])
    s_fp = {
        dw: math.floor(sum(v) * 100.0 / (7.0 * len(v)) + 0.5)
        for dw, v in by_dow.items()
    }
    m_fp = math.floor(sum(s_fp.values()) / 7.0 + 0.5)
    assert len(got) == len(list(interior))
    for k in interior:
        day = cal[k].isoformat()
        r = got[day]
        trend_fp = math.floor(t7[k] * 100.0 / 7.0 + 0.5)
        sea_fp = s_fp[cal[k].weekday()] - m_fp
        assert abs(r["revenue"] - rev[k] / 100.0) < 1e-9, day
        assert abs(r["trend"] - round(trend_fp / 1e4, 4)) < 1e-9, day
        assert abs(r["seasonal"] - round(sea_fp / 1e4, 4)) < 1e-9, day
        assert (
            abs(r["trend"] + r["seasonal"] + r["remainder"] - r["revenue"])
            < 3e-4
        ), day


def _md5_h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_theta_setops_branches_and_python_replica(spark):
    """Theta set algebra: smoke fixture (< k members per set) takes
    the exact branch (estimates == exact, errors 0); sf0.01 takes
    the estimator branch. The whole frame must equal a pure-Python
    theta replay over the same per-user flag relation."""
    import duckdb

    from tests.conftest import SF_ORACLE, SF_SMOKE
    from twitter_etl_spark.queries.sketches import (
        _KMV_M,
        _THETA_K,
        q_agg_theta_setops,
    )

    smoke = q_agg_theta_setops(spark, SF_SMOKE).first()
    assert smoke["rel_err_union"] == 0.0 and smoke["rel_err_inter"] == 0.0
    assert smoke["theta_union"] == float(smoke["n_union"])
    assert smoke["n_a"] < _THETA_K and smoke["n_b"] < _THETA_K

    r = q_agg_theta_setops(spark, SF_ORACLE).first()
    assert r["n_a"] >= _THETA_K  # estimator branch genuinely exercised
    assert r["theta_union"] != float(r["n_union"])

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, max((event_type='purchase')::INT) ia, "
        "max((event_type='error')::INT) ib FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet') "
        "WHERE event_type IN ('purchase','error') AND value > 80 "
        "GROUP BY user_id"
    ).fetchall()
    a = sorted(_md5_h60(str(u)) for u, ia, _ in rows if ia)
    b = sorted(_md5_h60(str(u)) for u, _, ib in rows if ib)
    ka, kb = a[:_THETA_K], b[:_THETA_K]
    m_int = 1 << 60
    th = min(
        ka[_THETA_K - 1] if len(ka) >= _THETA_K else m_int,
        kb[_THETA_K - 1] if len(kb) >= _THETA_K else m_int,
    )
    fa = {h for h in ka if h < th}
    fb = {h for h in kb if h < th}
    scale = _KMV_M / float(th)
    n_a, n_b = len(a), len(b)
    n_inter = len(set(a) & set(b))
    n_union = len(set(a) | set(b))
    assert (r["n_a"], r["n_b"], r["n_union"], r["n_inter"]) == (
        n_a,
        n_b,
        n_union,
        n_inter,
    )
    assert r["theta_union"] == round(len(fa | fb) * scale, 4)
    assert r["theta_inter"] == round(len(fa & fb) * scale, 4)
    assert r["theta_diff"] == round(len(fa - fb) * scale, 4)


def test_sliding_kmv_equals_oneshot_window_sketch(spark):
    """The pane-merge pin: per-day k-min panes merged over each
    7-day window must yield EXACTLY the estimate a one-shot KMV
    over the window's full distinct-user set gives (lossless k-min
    merge — the reason rolling distinct becomes decomposable), and
    the smoke fixture must take the exact branch everywhere."""
    import duckdb
    from collections import defaultdict

    from tests.conftest import SF_ORACLE, SF_SMOKE
    from twitter_etl_spark.queries.sketches import _KMV_K, _KMV_M
    from twitter_etl_spark.queries.timeseries import (
        q_ts_sliding_distinct_kmv,
    )

    smoke = q_ts_sliding_distinct_kmv(spark, SF_SMOKE).collect()
    assert smoke and all(r["rel_err"] == 0.0 for r in smoke)

    got = {
        r["day"]: (r["n_exact"], r["kmv_est"], r["rel_err"])
        for r in q_ts_sliding_distinct_kmv(spark, SF_ORACLE).collect()
    }
    assert got
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) d, user_id "
        f"FROM read_parquet('{SF_ORACLE}/events.parquet')"
    ).fetchall()
    by_day = defaultdict(set)
    for d, u in rows:
        by_day[d].add(str(u))
    days = sorted(by_day)
    import datetime

    n_est_branch = 0
    for anchor in days:
        users = set()
        for back in range(7):
            users |= by_day.get(anchor - datetime.timedelta(days=back), set())
        hs = sorted(_md5_h60(u) for u in users)
        if len(hs) < _KMV_K:
            est = float(len(hs))
        else:
            est = (_KMV_K - 1) * (_KMV_M / hs[_KMV_K - 1])
            n_est_branch += 1
        key = anchor.strftime("%Y-%m-%d")
        n_exact, kmv_est, rel_err = got.pop(key)
        assert n_exact == len(users), key
        assert kmv_est == round(est, 4), key
        assert rel_err == round(abs(round(est, 4) - len(users)) / len(users), 4)
    assert not got  # every emitted anchor is an observed day
    assert n_est_branch > 0  # sf0.01 exercises the estimator branch


def test_holt_linear_matches_python_recursion(spark):
    """q_ts_holt_linear vs the textbook recursion replayed in
    Python over the identical integer-cents daily series (zero-
    filled calendar): level/trend/forecast must match to the last
    rounded digit at both fixture scales."""
    import datetime

    import duckdb

    from tests.conftest import SF_ORACLE, SF_SMOKE
    from twitter_etl_spark.queries.timeseries import q_ts_holt_linear

    for sf in (SF_SMOKE, SF_ORACLE):
        con = duckdb.connect()
        daily = dict(
            con.execute(
                "SELECT ts::DATE d, (sum(CAST(value AS DECIMAL(18,2))) "
                f"* 100)::BIGINT FROM read_parquet('{sf}/events.parquet') "
                "GROUP BY 1"
            ).fetchall()
        )
        d0, d1 = min(daily), max(daily)
        ys = []
        d = d0
        while d <= d1:
            ys.append(daily.get(d, 0))
            d += datetime.timedelta(days=1)
        l, b = float(ys[0]), float(ys[1] - ys[0])
        for y in ys[1:]:
            l_new = 0.5 * y + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        rows = q_ts_holt_linear(spark, sf).collect()
        assert len(rows) == 7
        for r in sorted(rows, key=lambda r: r["h"]):
            h = r["h"]
            want_day = (d1 + datetime.timedelta(days=h)).strftime("%Y-%m-%d")
            assert r["day"] == want_day
            assert r["level"] == round(l / 100.0, 4)
            assert r["trend"] == round(b / 100.0, 4)
            assert r["yhat"] == round((l + h * b) / 100.0, 4)


def test_join_size_cm_one_sided_and_bounded(spark):
    """CM inner-product join-size estimate: one-sided (overcount >=
    0 always — collision cross terms only ADD) and usefully tight at
    _JS_WIDTH=256 on the fixture (blowup < 2x; width 64 measured
    3.2x and was widened in r11). Also cross-checks the exact side
    against a literal join count."""
    from twitter_etl_spark.queries.sketches import q_join_size_cm
    from twitter_etl_spark.tables import table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    row = q_join_size_cm(spark, sf).first()
    assert row["overcount"] >= 0
    assert row["join_size_est"] >= row["join_size"]
    assert row["blowup"] < 2.0
    e = table(spark, sf, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2")
    )
    true_join = a.join(b, a["user_id"] == b["u2"]).count()
    assert row["join_size"] == true_join
