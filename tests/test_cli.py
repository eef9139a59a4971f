"""CLI entry paths (reference main.R:125-215 parity incl. the
initial_setup == force_stream gate, main.R:192)."""

from __future__ import annotations

import json
import os
import tempfile

from twitter_etl_spark.__main__ import main


def _args(base, **kw):
    a = [
        "--db-file", os.path.join(base, "sink"),
        "--raw-data-dir", os.path.join(base, "landing"),
        "--checkpoint-dir", os.path.join(base, "ckpt"),
        "--stream-chunks", "1",
    ]
    for flag in kw.get("flags", []):
        a.append(flag)
    if "keys" in kw:
        a += ["--keys", kw["keys"]]
    return a


def _land(base, rows):
    d = os.path.join(base, "landing")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "f.json"), "w") as f:
        for i, text in enumerate(rows):
            f.write(json.dumps({"doc_id": i, "text": text, "lang": "es",
                                "source": "s", "n_chars": len(text)}) + "\n")


def test_setup_only_does_ddl_not_stream(spark):
    base = tempfile.mkdtemp()
    _land(base, ["hola mundo"])
    assert main(_args(base, flags=["--initial-setup"])) == 0
    assert os.path.exists(os.path.join(base, "sink.schema"))  # DDL ran
    assert not os.path.exists(os.path.join(base, "sink"))  # stream did NOT


def test_plain_invocation_streams(spark):
    base = tempfile.mkdtemp()
    _land(base, ["hola mundo", "otra frase"])
    assert main(_args(base)) == 0
    assert spark.read.parquet(os.path.join(base, "sink")).count() == 2


def test_setup_plus_force_does_both_with_keys_filter(spark):
    base = tempfile.mkdtemp()
    _land(base, ["spark merge rapido", "sin terminos aqui"])
    assert main(_args(base, flags=["--initial-setup", "--force-stream"], keys="spark,scan")) == 0
    assert os.path.exists(os.path.join(base, "sink.schema"))
    out = spark.read.parquet(os.path.join(base, "sink"))
    assert out.count() == 1  # only the doc containing a tracked term


def test_doc_counts_match_registry():
    """README.md and COVERAGE.md advertise the registry size; pin them
    so the docs can't drift when queries are added (r5 verdict #4)."""
    import re

    from twitter_etl_spark.queries import ALL_ORACLES, ALL_QUERIES

    nq, no = len(ALL_QUERIES), len(ALL_ORACLES)
    root = os.path.join(os.path.dirname(__file__), "..")
    readme = open(os.path.join(root, "README.md")).read()
    cov = open(os.path.join(root, "COVERAGE.md")).read()
    assert f"{nq} queries, {no} with DuckDB oracles" in readme
    assert f"**{nq} queries; {no} oracle-checked.**" in cov
    # every registry entry has a COVERAGE row
    rows = set(re.findall(r"\| `(q_\w+)` \|", cov))
    assert rows == set(ALL_QUERIES), sorted(
        set(ALL_QUERIES) ^ rows
    )


def test_cert_prefix_all_oracle_backed():
    """The first 50 registry entries are what the driver certifies
    each round — a rows-only name there normally wastes a cert slot
    on the weaker check, so every prefix name must have an oracle
    UNLESS it is in the deliberate allowlist: the r9 prefix rotates
    the full r2/r3-stale cohort (r8 verdict #2), which includes the
    4 rows-only names whose last driver rows>0 check is r2/r3."""
    from twitter_etl_spark.queries import ALL_ORACLES, ALL_QUERIES

    # r17: q_sim_ann_pq_trained enters the prefix deliberately — its
    # codes/reconstruction path was rewritten to mapInArrow this
    # round, so the driver's rows>0 check (its strongest available
    # gate; the float-argmin fixpoint is oracle-exempt per SURVEY
    # §5.3) must re-run against the new code.
    deliberate_rows_only: set = {"q_sim_ann_pq_trained"}
    prefix = list(ALL_QUERIES)[:50]
    missing = [
        n for n in prefix if n not in ALL_ORACLES and n not in deliberate_rows_only
    ]
    assert not missing, missing


def test_cert_prefix_contract():
    """The machine check the r7 verdict asked for (#8): the prefix
    rotation math was hand-maintained and its comments drifted twice
    in r7's own history. Pin the invariants:

    - the prefix is EXACTLY 50 names (the driver certifies the first
      50 registry entries — shorter wastes cert slots, longer is a
      silent no-op);
    - no duplicates (a dup silently halves coverage);
    - every registry name has a driver CORRECTNESS row in some past
      round OR sits in the current prefix (nothing ships
      never-certified-and-not-queued)."""
    import glob
    import json

    from twitter_etl_spark.queries import ALL_QUERIES, _CERT_PREFIX

    assert len(_CERT_PREFIX) == 50
    assert len(set(_CERT_PREFIX)) == 50
    root = os.path.join(os.path.dirname(__file__), "..")
    seen = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            ok = (
                row.get("hash_match")
                or (
                    row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) > 0
                )
            )
            if ok:
                seen.add(name)
    unqueued = [
        n for n in ALL_QUERIES if n not in seen and n not in _CERT_PREFIX
    ]
    assert not unqueued, unqueued


def test_cert_prefix_staleness_policy():
    """r8 verdict #2: rotation must not silently skip the stalest
    re-certs. Policy: after reserving slots for never-certified (new)
    ops, every remaining slot goes to the names whose most recent
    green driver row is OLDEST. Tie-tolerant form: the newest cert
    round inside the prefix may not exceed the oldest cert round
    outside it (ties at the boundary round are broken arbitrarily).

    Intentional forcing function: when the driver lands the next
    CORRECTNESS_r{N}.json, this test goes red until the next round
    rotates the prefix — rotation debt can no longer accumulate
    silently the way the r2/r3 cohort did for five rounds."""
    import glob
    import json

    from twitter_etl_spark.queries import ALL_QUERIES, _CERT_PREFIX

    root = os.path.join(os.path.dirname(__file__), "..")
    last: dict = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            # hash_match is the driver's real gate for oracle-backed
            # names — rows_match alone counted the r12 groupingsets
            # hash-red as "green r12" and demanded it rotate OUT of
            # the prefix while failing (gen_cert_rotation.py carries
            # the same fix)
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("hash_match", True)
            ) or (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    # Deliberate re-certs: names whose IMPLEMENTATION (and oracle)
    # changed this round, taking a birth-round-style prefix slot even
    # though their last driver cert is fresh — the fresh cert
    # describes code that no longer exists, so freshness-ordering
    # does not apply to them. Keep this set tiny and per-round; it
    # must be emptied at the next rotation.
    deliberate_recerts = {
        # r17 (optimization round 2): every query path the r16
        # optimization commits rewrote outside the r16 oracle sample
        # (VERDICT r16 "Next round" item 2) plus this round's own
        # optimization targets — their fresh-looking certs describe
        # pre-rewrite code, so freshness-ordering does not apply.
        "q_er_cluster",
        "q_sim_knn_clusters",
        "q_multimodal_dedup_cluster",
        "q_graph_cc_star",
        "q_graph_ppr",
        "q_graph_hits",
        "q_graph_bfs",
        "q_dedup_minhash_banded",
        "q_dedup_minhash_est",
        "q_dedup_minhash_recall",
        "q_llm_curation_semantic",
        "q_dedup_ngram_jaccard",
        "q_graph_labelprop",
        "q_graph_kcore",
        "q_geo_dbscan",
        "q_sim_ann_pq_trained",
    }
    in_prefix = [
        last[n]
        for n in _CERT_PREFIX
        if n in last and n not in deliberate_recerts
    ]
    outside = [
        last[n] for n in ALL_QUERIES if n in last and n not in _CERT_PREFIX
    ]
    if in_prefix and outside:
        assert max(in_prefix) <= min(outside), (
            f"prefix holds a cert from r{max(in_prefix)} while a staler "
            f"r{min(outside)} name waits outside — rotate oldest-first"
        )


def test_bench_compact_line_fits_tail_window():
    """BENCH_r08 interface defect (r8 verdict #3): the driver
    tail-captures the last 2000 stdout chars and parses the JSON
    line it finds; the final bench line must therefore NEVER exceed
    that window, at the current suite size or any future one. Pin
    the degrade ladder with worst-case-width timing values."""
    import json

    import bench

    timings = {n: 123.456 for n in bench.HEADLINE}
    detail = {
        "metric": "headline_suite_seconds",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_runs": 3,
        "legacy18_seconds": 999.999,
        "tpch22_seconds": 999.999,
        "queries": timings,
    }
    line = bench.compact_line(detail)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 9999.999
    assert parsed["legacy18_seconds"] == 999.999
    # a pathologically wide suite still degrades below the window
    detail["queries"] = {f"q_{'x' * 40}_{i}": 123.456 for i in range(400)}
    line = bench.compact_line(detail)
    assert len(line) <= 1800
    assert json.loads(line)["n_headline"] == 400


def test_bench_delta_vs_prev_semantics():
    """r9 verdict #6: the r8→r9 driver comparison was polluted by
    host load because nothing paired per-query readings with error
    bars. delta_vs_prev flags a mover only when it is BOTH >2x in
    ratio (the judge's perf-weak bar) AND beyond a 0.25 s floor AND
    beyond 2x its current measured spread — and the compact driver
    line carries the summary without the per-query blobs."""
    import json

    import bench

    prev = {"q_a": 1.0, "q_b": 0.1, "q_c": 2.0, "q_gone": 5.0}
    cur = {"q_a": 2.6, "q_b": 0.3, "q_c": 2.1, "q_new": 9.9}
    spread = {"q_a": 0.2, "q_b": 0.0, "q_c": 3.0}
    d = bench.delta_vs_prev(cur, spread, 9, prev)
    assert d["prev_round"] == 9 and d["n_common"] == 3
    # q_a: 2.6x, |delta| 1.6 > max(0.25, 0.4) -> flagged
    # q_b: 3x but |delta| 0.2 < 0.25 floor -> host noise, not flagged
    # q_c: 1.05x -> not flagged
    assert set(d["flagged"]) == {"q_a"} and d["n_flagged"] == 1
    assert d["flagged"]["q_a"] == {
        "prev": 1.0,
        "cur": 2.6,
        "ratio_norm": 2.6,  # no anchor in this fixture -> k = 1.0
        "spread": 0.2,
    }
    assert d["median_ratio"] == round(sorted([2.6, 3.0, 1.05])[1], 3)
    assert d["total_ratio"] == round((2.6 + 0.3 + 2.1) / 3.1, 3)
    assert d["anchor_ratio"] == 1.0 and d["n_flagged_norm"] == 1

    # r11 verdict #7: anchor normalization. Uniform 3x host drift
    # moves the anchor too — raw flags fire, normalized do not...
    prev_a = {"q_x": 1.0, "q_tpch_q6": 1.0}
    drift = {"q_x": 3.0, "q_tpch_q6": 3.0}
    da = bench.delta_vs_prev(drift, {}, 11, prev_a)
    assert da["anchor_ratio"] == 3.0
    assert da["median_ratio_norm"] == 1.0 and da["total_ratio_norm"] == 1.0
    assert da["n_flagged"] == 2 and da["n_flagged_norm"] == 0
    # ...while a single-query regression against a flat anchor fires both
    real = {"q_x": 10.0, "q_tpch_q6": 1.0}
    dr = bench.delta_vs_prev(real, {}, 11, prev_a)
    assert dr["n_flagged_norm"] == 1 and "q_x" in dr["flagged"]

    detail = {
        "metric": "headline_suite_seconds",
        "value": 9.0,
        "unit": "sec",
        "sf": 0.1,
        "n_runs": 3,
        "legacy18_seconds": 9.0,
        "tpch22_seconds": 9.0,
        "queries": cur,
        "delta_vs_prev": d,
    }
    line = bench.compact_line(detail)
    assert len(line) <= 1800
    parsed = json.loads(line)["delta_vs_prev"]
    assert parsed["n_flagged"] == 1 and parsed["flagged"] == ["q_a"]
    assert "prev" not in str(parsed["flagged"])  # names only, no blobs


def test_bench_load_prev_round_reads_newest_parsed():
    """_load_prev_round picks the highest BENCH_r{N}.json whose
    compact line parsed with per-query timings (BENCH_r09 today)."""
    import bench

    got = bench._load_prev_round()
    assert got is not None
    rnd, queries = got
    assert rnd >= 9
    assert queries.get("q_tpch_q3", 0) > 0
