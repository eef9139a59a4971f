"""Property tests for the round-3 operator families (SURVEY.md §5.2).

- sequence packing never splits a document across packs, and agrees
  with a sequential Python reference on Hypothesis-generated shards;
- SCD2 intervals partition time per entity: versions are contiguous,
  consecutive, and exactly the last one is current/open-ended;
- the table fingerprint is invariant under repartition + row shuffle
  (bit_xor is commutative/associative — the plan cannot change it).
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"

_SETTINGS = dict(
    max_examples=10,
    deadline=None,  # Spark job latency is not a property failure
    suppress_health_check=[HealthCheck.too_slow],
)

# (source, n_tok) shards: token counts straddle the test ctx window,
# including empty docs and docs larger than the whole window.
_SHARD = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 40)),
    min_size=1,
    max_size=30,
)
_CTX = 16


def _pack_reference(rows):
    """Sequential concat-and-chunk: doc joins the pack holding its
    first token; never split."""
    out = {}
    cum = defaultdict(int)
    for i, (src, n) in enumerate(rows):
        out[i] = (src, cum[src] // _CTX)
        cum[src] += n
    return out


@given(_SHARD)
@settings(**_SETTINGS)
def test_pack_docs_matches_sequential_reference(spark, rows):
    from twitter_etl_spark.queries.llmprep import pack_docs

    df = spark.createDataFrame(
        [(src, i, n) for i, (src, n) in enumerate(rows)],
        ["source", "doc_id", "n_tok"],
    )
    got = {
        r["doc_id"]: (r["source"], r["pack_id"])
        for r in pack_docs(df, ctx=_CTX).collect()
    }
    assert got == _pack_reference(rows)


def test_pack_docs_never_splits_a_doc(spark):
    """Each doc appears exactly once with exactly one pack_id, and —
    when every doc fits in one window (n_tok <= ctx) — pack ids per
    shard are contiguous from 0. (A doc LONGER than ctx legitimately
    skips the windows its tail covers, so contiguity only holds under
    that bound; the Hypothesis test above covers oversized docs.)"""
    from twitter_etl_spark.queries.llmprep import pack_docs

    df = spark.createDataFrame(
        [("s", i, 1 + (i * 13) % _CTX) for i in range(100)],
        ["source", "doc_id", "n_tok"],
    )
    rows = pack_docs(df, ctx=_CTX).collect()
    assert len(rows) == 100
    assert len({r["doc_id"] for r in rows}) == 100
    packs = sorted({r["pack_id"] for r in rows})
    assert packs == list(range(len(packs)))


def test_scd2_intervals_partition_time_per_entity(spark):
    """Per user: versions 1..n with no gaps; interval k+1 starts
    exactly where interval k ends; exactly one open (is_current)
    interval, and it is the last."""
    from twitter_etl_spark.queries.llmprep import q_scd2_history

    rows = q_scd2_history(spark, SF_SMOKE).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to_us"] == nxt["valid_from_us"], user
            assert prev["is_current"] == 0
        last = ivs[-1]
        assert last["is_current"] == 1 and last["valid_to_us"] is None
        assert sum(r["is_current"] for r in ivs) == 1


def test_fingerprint_invariant_under_repartition_and_shuffle(spark):
    from twitter_etl_spark.queries.integrity import (
        fingerprint_tables,
        q_table_fingerprint,
    )
    from twitter_etl_spark.tables import table

    base = {
        r["table_name"]: (r["n_rows"], r["fingerprint"])
        for r in q_table_fingerprint(spark, SF_SMOKE).collect()
    }
    o = table(spark, SF_SMOKE, "orders").repartition(17).sortWithinPartitions(
        "o_totalprice"
    )
    li = table(spark, SF_SMOKE, "lineitem").repartition(3, "l_suppkey")
    c = table(spark, SF_SMOKE, "customer").coalesce(1).orderBy(F.desc("c_name"))
    shuffled = {
        r["table_name"]: (r["n_rows"], r["fingerprint"])
        for r in fingerprint_tables(o, li, c).collect()
    }
    assert shuffled == base


# random per-group integer samples for the exact-power-sum contracts
_MOMENT_GROUPS = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(1, 50),
    ),
    min_size=6,
    max_size=40,
)


@given(_MOMENT_GROUPS)
@settings(**_SETTINGS)
def test_power_sum_moments_match_duckdb_on_random_frames(spark, rows):
    """The q_agg_moments contract under fuzz: on ANY integer-valued
    frame, the exact-power-sum moment pipeline must produce
    bit-identical rounded statistics in Spark and DuckDB (the sums
    reduce as exact integers, the scalar formulas are identical
    expression trees). Groups with < 2 distinct values have zero
    variance; skip those (skew/kurt undefined)."""
    import duckdb

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["g", "x"])
    q = F.col("x").cast("double")
    g = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("bigint")).alias("s1"),
        F.sum((q * q).cast("bigint")).alias("s2"),
        F.sum((q * q * q).cast("bigint")).alias("s3"),
        F.sum((q * q * q * q).cast("bigint")).alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") * 1.0 / n
    m2 = F.col("s2") * 1.0 / n
    m3 = F.col("s3") * 1.0 / n
    var = m2 - m * m
    skew = F.when(
        var > 0, (m3 - 3 * m * m2 + 2 * m * m * m) / (var * F.sqrt(var))
    )
    got = {
        r["g"]: (r["mean_r"], r["var_r"], r["skew_r"])
        for r in g.select(
            "g",
            F.round(m, 6).alias("mean_r"),
            F.round(var, 6).alias("var_r"),
            F.round(skew, 6).alias("skew_r"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            "WITH s AS (SELECT g, count(*)::BIGINT AS n, sum(x) AS s1, "
            "sum(x*x) AS s2, sum(x*x*x) AS s3 FROM t GROUP BY g), "
            "m AS (SELECT g, n, s1 * 1.0 / n AS m1, s2 * 1.0 / n AS m2, "
            "s3 * 1.0 / n AS m3 FROM s), "
            "v AS (SELECT *, m2 - m1 * m1 AS var FROM m) "
            "SELECT g, round(m1, 6), round(var, 6), "
            "round(CASE WHEN var > 0 THEN "
            "  (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (var * sqrt(var)) END, 6) "
            "FROM v"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], (k, "mean")
        assert got[k][1] == want[k][1], (k, "var")
        assert got[k][2] == want[k][2], (k, "skew")  # None == None on zero var
