"""Semantic + plan tests for the integrity and geo families."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_etl_spark.queries import geo, integrity
from twitter_etl_spark.tables import table

from conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_diff_counts_reconcile(spark):
    o = table(spark, SF_ORACLE, "orders")
    n1 = o.count()
    out = {
        r.change_type: r.n
        for r in integrity.q_snapshot_diff(spark, SF_ORACLE).collect()
    }
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    # every v1 key is removed, changed, or unchanged
    assert out["removed"] + out["changed"] + out["unchanged"] == n1
    # derivation rules: inserts are key%200==0; removals key%97==0
    assert out["added"] == o.where(F.col("o_orderkey") % 200 == 0).count()
    assert out["removed"] == o.where(F.col("o_orderkey") % 97 == 0).count()


def test_snapshot_diff_single_join(spark):
    p = _plan(integrity.q_snapshot_diff(spark, SF_SMOKE))
    # one full-outer join, not anti+anti+inner (three scans)
    assert p.count("FullOuter") == 1


def test_fingerprint_is_order_independent_and_sensitive(spark):
    fp1 = {
        r.table_name: r.fingerprint
        for r in integrity.q_table_fingerprint(spark, SF_ORACLE).collect()
    }
    # recompute with the orders table reversed + repartitioned: the
    # xor accumulator must not care
    o = table(spark, SF_ORACLE, "orders").orderBy(
        F.desc("o_orderkey")
    ).repartition(7)
    canon = F.concat_ws(
        "|",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    again = o.select(h.alias("h")).agg(F.expr("bit_xor(h)")).first()[0]
    assert again == fp1["orders"]
    # and a single-row mutation flips it
    mutated = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 1, F.col("o_custkey") + 1).otherwise(
            F.col("o_custkey")
        ),
    )
    h2 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    "o_orderkey",
                    "o_custkey",
                    "o_orderstatus",
                    F.round(F.col("o_totalprice") * 100).cast("bigint"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    diff = mutated.select(h2.alias("h")).agg(F.expr("bit_xor(h)")).first()[0]
    assert diff != fp1["orders"]


def test_geo_join_is_grid_blocked(spark):
    out = geo.q_geo_grid_join(spark, SF_SMOKE)
    p = _plan(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    rows = out.collect()
    assert all(r.dist_km <= geo.RADIUS_KM for r in rows)


def test_geo_grid_never_misses_within_radius(spark):
    # brute-force all pairs on the small fixture and compare to the
    # blocked join: within ~111 km nothing may fall outside the 3x3
    # neighborhood (1 degree >= 111 km of latitude everywhere)
    st = geo._stores(spark, SF_ORACLE)
    wh = geo._warehouses(spark, SF_ORACLE).select(
        "wh_id", F.col("lat").alias("wlat"), F.col("lon").alias("wlon")
    )
    d = geo._haversine_km(
        F.col("lat"), F.col("lon"), F.col("wlat"), F.col("wlon")
    )
    brute = (
        st.crossJoin(wh)
        .select("store_id", "wh_id", F.round(d, 4).alias("dist_km"))
        .where(F.col("dist_km") <= geo.RADIUS_KM)
    )
    blocked = geo.q_geo_grid_join(spark, SF_ORACLE)
    b = {(r.store_id, r.wh_id) for r in brute.collect()}
    g = {(r.store_id, r.wh_id) for r in blocked.collect()}
    assert b == g
    assert g  # fixture produces at least one match


def test_geo_density_topk_plan(spark):
    p = _plan(geo.q_geo_cell_density(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p


def test_geo_lon_halfwidth_is_one_at_equator_and_grows(spark):
    rows = (
        spark.range(1)
        .select(
            *[
                geo._lon_halfwidth(F.lit(lat)).alias(f"w{i}")
                for i, lat in enumerate([0.0, 45.0, 66.0, 79.5, 85.0])
            ]
        )
        .first()
    )
    # equator stays the classic ±1 ring; the ring widens only where
    # 1° of longitude shrinks below the search radius
    assert rows.w0 == 1
    assert rows.w1 == 2
    assert 1 <= rows.w2 <= 3
    assert rows.w3 >= 5
    assert rows.w4 >= 10


def _write_highlat_fixture(tmp_path, spark):
    """Synthetic customer/supplier keys whose LCG-derived coords put
    a store at 79.47°N with a warehouse 94.3 km away but TWO lon
    cells east — invisible to a fixed ±1 ring, caught by the
    lat-adaptive widening. Low-lat keys ride along so the W=1 path
    is exercised in the same run."""
    import pandas as pd

    cust = pd.DataFrame({"c_custkey": [50, 100, 150, 300, 850, 1000]})
    supp = pd.DataFrame({"s_suppkey": [1, 2, 3, 2230, 20632, 21672, 2930]})
    spark.createDataFrame(cust).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(supp).write.mode("overwrite").parquet(
        str(tmp_path / "supplier.parquet")
    )
    return str(tmp_path)


def test_geo_grid_catches_highlat_wide_pair(spark, tmp_path):
    sf = _write_highlat_fixture(tmp_path, spark)
    got = {
        (r.store_id, r.wh_id)
        for r in geo.q_geo_grid_join(spark, sf).collect()
    }
    # the engineered pair: store 150 (79.47, -46.05) / warehouse 2230
    # (80.27, -44.45) — dist 94.3 km, lon cells -47 vs -45 (Δ=2)
    assert (150, 2230) in got
    # brute force equality on the same fixture: the widened band
    # misses nothing within radius
    st = geo._stores(spark, sf)
    wh = geo._warehouses(spark, sf).select(
        "wh_id", F.col("lat").alias("wlat"), F.col("lon").alias("wlon")
    )
    d = geo._haversine_km(
        F.col("lat"), F.col("lon"), F.col("wlat"), F.col("wlon")
    )
    brute = {
        (r.store_id, r.wh_id)
        for r in st.crossJoin(wh)
        .select("store_id", "wh_id", F.round(d, 4).alias("dist_km"))
        .where(F.col("dist_km") <= geo.RADIUS_KM)
        .collect()
    }
    assert got == brute


def test_geo_oracle_parity_on_highlat_fixture(spark, tmp_path):
    """Both engines implement the SAME widened semantics: run the
    DuckDB oracle against the synthetic high-lat fixture in-process
    and compare pair sets for the grid join and the kNN."""
    import duckdb

    sf = _write_highlat_fixture(tmp_path, spark)
    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    for qname in ("q_geo_grid_join", "q_geo_knn"):
        spark_rows = {
            tuple(r) for r in geo.QUERIES[qname](spark, sf).collect()
        }
        oracle_rows = {
            tuple(r) for r in con.execute(geo.ORACLE[qname]).fetchall()
        }
        assert spark_rows == oracle_rows, qname


def test_geo_dbscan_matches_numpy_reference(spark):
    """q_geo_dbscan vs a classic O(n^2) NumPy DBSCAN (Ester et al.
    1996, self-inclusive minPts) over the SAME derived points:
    roles and canonical (min core id) cluster labels must be
    identical — the grid blocking and min-label propagation are
    pure optimizations, never semantics."""
    import numpy as np

    from twitter_etl_spark.queries.geo import (
        DBSCAN_EPS,
        DBSCAN_MINPTS,
        _dbscan_points,
        q_geo_dbscan,
    )

    sf = "/root/testdata/sf0.001"
    pts = _dbscan_points(spark, sf).collect()
    ids = np.array([r["vec_id"] for r in pts])
    xy = np.array([[r["x"], r["y"]] for r in pts])
    n = len(ids)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nb = d2 <= DBSCAN_EPS * DBSCAN_EPS  # self included on diagonal
    is_core = nb.sum(1) >= DBSCAN_MINPTS

    # components over core-core adjacency (union-find)
    parent = {int(i): int(i) for i in ids[is_core]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.where(is_core)[0]
    for a in ci:
        for b in ci:
            if nb[a, b]:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for k, i in enumerate(ids):
        i = int(i)
        if is_core[k]:
            want[i] = ("core", find(i))
        else:
            core_nb = [find(int(ids[j])) for j in ci if nb[k, j]]
            if core_nb:
                want[i] = ("border", min(core_nb))
            else:
                want[i] = ("noise", None)

    got = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in q_geo_dbscan(spark, sf).collect()
    }
    assert got == want
    roles = {}
    for role, _ in got.values():
        roles[role] = roles.get(role, 0) + 1
    # the probed substrate exercises every branch
    assert roles["core"] > 0 and roles["border"] > 0 and roles["noise"] > 0
    assert len({c for r, c in got.values() if c is not None}) == 5
