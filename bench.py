"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Output: a full-detail JSON line (also
written to BENCH_DETAIL.json), then a FINAL compact JSON line
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}`` sized to fit the driver's
2000-char tail-capture window (per-query timings degrade to the
legacy-18 subset, then to totals-only, before the line can outgrow
the window).

Each query is fully materialized via a noop sink (measures compute,
not driver collect). A small warmup primes the JVM/codegen so the
first timed query isn't charged Spark startup.

Since r10 the N reps run as N interleaved passes over the suite
(host-load bursts land on one pass of many queries, not all reps of
one query), and when a prior driver round's ``BENCH_r{N}.json``
parsed with per-query timings the output carries ``delta_vs_prev``
— a paired per-query comparison with flagging thresholds matched to
the judge's >2x perf-weak bar and this box's documented host noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_etl_spark.queries import ALL_QUERIES
from twitter_etl_spark.session import get_spark

HEADLINE = [
    "q_flagship_transform",
    "q_clean_pipeline",
    "q_agg_groupby",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_join_multiway",
    "q_join_selfasof",
    "q_win_running",
    "q_topk_pergroup",
    "q_limit_topk",
    "q_text_wordcount",
    "q_text_tfidf",
    "q_dedup_normalized",
    "q_dedup_ngram_jaccard",
    "q_sim_cosine_topk",
    "q_stream_tumbling_batch",
    "q_sessionize_batch",
    # LLM-pipeline north-star surface (r5 verdict #8): track the
    # end-to-end curation pipeline and the banded-MinHash dedup
    "q_llm_curation",
    "q_dedup_minhash_banded",
    # r6 verdict #5: SemDeDup (embedding-space semantic dedup)
    "q_dedup_semantic",
    # r7: the two new corpus-wide curation ops (span-level dedup and
    # DSIR importance weighting) join the tracked set
    "q_dedup_paragraph",
    "q_text_dsir",
    # r8 (r7 verdict #4): the late-wave LLM-pipeline ops with real
    # shuffle work join the tracked set
    "q_dedup_incremental",
    "q_graph_jaccard",
    "q_text_bpe_pairs",
    # new in r8 — tracked from birth so no round ever ships
    # unbenched shuffle work again
    "q_funnel_strict",
    "q_dedup_exact_substring",
    "q_dedup_containment",
    "q_sample_weighted",
    "q_behavior_dau_wau_mau",
    "q_agg_countmin",
    "q_dedup_bloom",
    "q_sim_lsh_rhp",
    "q_dedup_minhash_est",
    "q_text_bigram_lm",
    "q_agg_linear_count",
    "q_agg_histo_percentile",
    "q_agg_ams_f2",
    "q_agg_lc_setops",
    "q_ts_cusum",
    "q_agg_hll_md5",
    "q_join_bloom",
    "q_stat_ks_binned",
    # new in r9 — tracked from birth
    "q_stat_chi2_binned",
    "q_sim_lsh_rhp_strict",
    "q_agg_kmv_distinct",
    "q_graph_adamic_adar",
    "q_ts_seasonal_decompose",
    # new in r10 — tracked from birth
    "q_dedup_minhash_incremental",
    "q_dedup_substring_cut",
    "q_agg_theta_setops",
    "q_ts_sliding_distinct_kmv",
    "q_ts_holt_linear",
    "q_join_asof_tolerance",
    "q_agg_theta_matrix",
    "q_ts_changepoint",
    "q_dq_kanonymity",
    "q_dq_benford",
    "q_ts_xcorr_daily",
    # r11 additions
    "q_sim_ann_ivfpq",
    "q_geo_dbscan",
    "q_agg_quantile_bottomk",
    "q_join_size_cm",
    # r12 additions
    "q_dedup_semantic_incremental",
    "q_drift_psi",
    "q_graph_labelprop",
    "q_layout_zorder",
    "q_stat_mann_whitney",
    "q_seq_pattern",
    "q_ts_mann_kendall",
    "q_drift_emd",
    "q_multimodal_phash_dedup",
    "q_graph_kcore",
    "q_graph_bfs",
    # r13 additions — tracked from birth
    "q_dedup_semantic_adaptive",
    "q_dedup_soft_weights",
    "q_quality_c4_rules",
    "q_stat_welch_t",
    "q_ts_theilsen",
    "q_graph_ppr",
    "q_graph_hits",
    "q_mix_epochs_capped",
    "q_multimodal_pair_manifest",
    "q_sim_knn_graph",
    "q_behavior_topk_paths",
    "q_text_pmi",
    # r14 additions — tracked from birth
    "q_sim_knn_clusters",
    "q_merge_cdc",
    "q_multimodal_align_score",
    "q_ts_periodogram",
    "q_dq_fd_check",
    "q_stream_late_batch",
    "q_multimodal_conflict",
    "q_attribution_position",
    "q_behavior_lifecycle",
    "q_dedup_token_sorted",
    "q_quality_rep_ngrams",
    "q_pack_epoch_shuffle",
    "q_text_kneser_ney",
    "q_behavior_markov_stationary",
    # r15 additions
    "q_llm_curation_semantic",
    "q_quality_nb_score",
    "q_behavior_survival",
    "q_multimodal_dedup_cluster",
    "q_behavior_cohort_ltv",
    "q_drift_jsd",
    "q_pack_length_bucket",
    "q_sim_ivf_recall",
    "q_dedup_minhash_recall",
    "q_er_cluster",
    # r16 additions
    "q_llm_curation_neardup",
    "q_sim_pq_recall",
]

# Heavy-family retention set for the compact line (r16 verdict #5:
# "the scaling probe proves nothing" — every query that survived the
# compact line's degrade-to-legacy-18 step is sub-second at sf0.1,
# so the driver's c8-vs-c32 comparison measured job-launch overhead,
# not parallelism). These are the most expensive certified headline
# queries (3-7 s at sf0.1, real shuffle/compute); keeping them in the
# parsed `queries` dict through the first degrade step gives the
# low-core ratio queries where core count can matter. Additions-only
# to the bench contract: nothing is removed or renamed, and the
# headline total/methodology are unchanged.
HEAVY_PROBE = [
    "q_graph_labelprop",
    "q_llm_curation_neardup",
    "q_er_cluster",
    "q_graph_kcore",
    "q_dedup_minhash_recall",
    "q_geo_dbscan",
    "q_graph_ppr",
    "q_sim_knn_clusters",
    "q_graph_hits",
    "q_graph_bfs",
    "q_multimodal_dedup_cluster",
    "q_dedup_minhash_est",
]

# rows-only ops tracked for wall-time but kept OUT of `value` (no
# oracle; the headline total stays a correctness-certified suite).
SIDECAR = [
    "q_ts_lttb",
    "q_sim_ann_pq_trained",
    "q_text_bpe_merge",
    "q_text_bpe_encode",
    # r15 additions
    "q_text_unigram_tok",
    "q_text_unigram_encode",
]

#: per-query repetitions; the reported time is the minimum and the
#: max-min spread is reported alongside so cross-round comparisons
#: can tell plan regressions from host noise (r7 verdict #2/#3).
N_RUNS = 3


def _time_best(fn, spark, sf_dir, n=N_RUNS) -> tuple[float, float]:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3), round(max(runs) - min(runs), 3)


def _time_suite_interleaved(
    names: list[str], spark, sf_dir, n=N_RUNS
) -> tuple[dict[str, float], dict[str, float]]:
    """Best-of-n per query with the n repetitions taken as n
    INTERLEAVED passes over the whole suite (pass 0 absorbs each
    plan's compilation, exactly like rep 0 did sequentially). A
    transient host-load burst now lands on ONE pass of many queries
    instead of swallowing all n reps of whichever query was running
    — the r8→r9 driver comparison was unreadable for exactly that
    reason (r9 verdict #6; this box measures 25–90% noise). Minima
    stay comparable with the sequential-rep history: same rep
    count, same warm-plan property (validated against the SCALE.md
    r9 idle bands before landing)."""
    runs: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(n):
        for name in names:
            t0 = time.perf_counter()
            ALL_QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.perf_counter() - t0)
    return (
        {n_: round(min(r), 3) for n_, r in runs.items()},
        {n_: round(max(r) - min(r), 3) for n_, r in runs.items()},
    )


def _load_prev_round() -> tuple[int, dict[str, float]] | None:
    """(round, per-query seconds) from the newest driver-recorded
    ``BENCH_r{N}.json`` whose compact line parsed with per-query
    timings; None when absent (round 1 / degraded lines)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, dict[str, float]] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
        except (OSError, ValueError):
            continue
        queries = parsed.get("queries")
        if queries and (best is None or rnd > best[0]):
            best = (rnd, queries)
    return best


#: Anchor query for host-speed normalization: scan-bound, plan-stable
#: since r6, always inside the legacy-18 subset so it survives even a
#: tail-degraded prev-round parse. Dividing every ratio by the
#: anchor's own cur/prev ratio cancels uniform host drift (this box's
#: documented 25-90% run-to-run swing — SCALE.md) while leaving
#: genuine single-query plan regressions visible.
_ANCHOR = "q_tpch_q6"


def delta_vs_prev(
    timings: dict[str, float],
    spread: dict[str, float],
    prev_round: int,
    prev_q: dict[str, float],
) -> dict:
    """Per-query paired comparison against the previous round's
    driver-recorded timings, reported BOTH raw and anchor-normalized
    (each ratio divided by _ANCHOR's own cur/prev ratio — uniform
    host drift moves the anchor too, so it cancels; a real
    single-query regression does not). Error bars: a query is
    flagged only if it moved >2x in ratio (the judge's own perf-weak
    bar) AND the absolute move exceeds both a 0.25 s floor and 2x
    its measured current-run spread — sub-spread or sub-floor moves
    are indistinguishable from this box's documented 25–90% host
    noise (SCALE.md), so naming them would manufacture regressions.
    ``n_flagged_norm`` applies the same 2x+guards bar to the
    anchor-normalized ratios; a query flagged raw but not normalized
    is host drift, flagged in both is a real plan change."""
    common = sorted(
        n for n in timings if prev_q.get(n, 0) > 0 and timings[n] > 0
    )
    if not common:
        return {"prev_round": prev_round, "n_common": 0}
    ratios = sorted(timings[n] / prev_q[n] for n in common)
    anchor_k = (
        (timings[_ANCHOR] / prev_q[_ANCHOR]) if _ANCHOR in common else 1.0
    )

    def _guard(n: str) -> bool:
        return abs(timings[n] - prev_q[n]) > max(
            0.25, 2 * spread.get(n, 0.0)
        )

    flagged = [
        n
        for n in common
        if (timings[n] > 2 * prev_q[n] or timings[n] < 0.5 * prev_q[n])
        and _guard(n)
    ]
    norm = {n: (timings[n] / prev_q[n]) / anchor_k for n in common}
    flagged_norm = [
        n for n in common if (norm[n] > 2 or norm[n] < 0.5) and _guard(n)
    ]
    norm_sorted = sorted(norm.values())
    cur_total = sum(timings[n] for n in common)
    prev_total = sum(prev_q[n] for n in common)
    return {
        "prev_round": prev_round,
        "n_common": len(common),
        "total_ratio": round(cur_total / prev_total, 3),
        "median_ratio": round(ratios[len(ratios) // 2], 3),
        "anchor": _ANCHOR,
        "anchor_ratio": round(anchor_k, 3),
        "total_ratio_norm": round(cur_total / prev_total / anchor_k, 3),
        "median_ratio_norm": round(
            norm_sorted[len(norm_sorted) // 2], 3
        ),
        "n_flagged": len(flagged),
        "n_flagged_norm": len(flagged_norm),
        "flagged": {
            n: {
                "prev": prev_q[n],
                "cur": timings[n],
                "ratio_norm": round(norm[n], 3),
                "spread": spread.get(n, 0.0),
            }
            for n in sorted(set(flagged) | set(flagged_norm))
        },
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    # warmup: prime JVM, codegen, the vectorized parquet reader and
    # the regex engine so the first timed query isn't charged
    # process-level initialization
    from pyspark.sql import functions as F
    from twitter_etl_spark.tables import table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("documents", "lineitem", "events"):
        table(spark, sf_dir, t).limit(100).select(
            F.regexp_replace(F.lit("warm up"), r"\s+", " ")
        ).collect()
    # compile the flagship plan (incl. the large stopword-regex
    # codegen unit) against the tiny sf so the timed run measures
    # execution, not janino compilation
    ALL_QUERIES["q_flagship_transform"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # best-of-N (N_RUNS): the first pass absorbs plan compilation, and
    # the minimum resists transient host-load stalls (measured 25-70%
    # run-to-run swing on a noisy-neighbor VM with identical code);
    # the max-min spread rides along per query. Reps are interleaved
    # across the suite since r10 (see _time_suite_interleaved).
    timings, spread = _time_suite_interleaved(HEADLINE, spark, sf_dir)

    total = round(sum(timings.values()), 3)
    # the first 18 entries are the r2-r5 headline set; their subtotal
    # keeps cross-round suite comparisons apples-to-apples after the
    # r6 additions (q_llm_curation, q_dedup_minhash_banded)
    legacy = round(sum(timings[n] for n in HEADLINE[:18]), 3)

    # full TPC-H sweep (r7: all 22 queries exist) — reported as its
    # own subtotal, NOT in `value`, so the headline stays comparable
    # across rounds; best-of-N each since r8 (the r7 n=1 sweep left
    # its q5/q6 drift unattributable to noise vs plan)
    tpch_names = sorted(
        (n for n in ALL_QUERIES if n.startswith("q_tpch_q")),
        key=lambda n: int(n.rsplit("q", 1)[1]),
    )
    tpch, tpch_spread = _time_suite_interleaved(tpch_names, spark, sf_dir)

    sidecar: dict[str, float] = {}
    for name in SIDECAR:
        sidecar[name], _ = _time_best(ALL_QUERIES[name], spark, sf_dir)

    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_runs": N_RUNS,
        "spread": spread,
        "legacy18_seconds": legacy,
        "tpch22_seconds": round(sum(tpch.values()), 3),
        "tpch_queries": tpch,
        "tpch_spread": tpch_spread,
        "sidecar_rows_only": sidecar,
    }
    prev = _load_prev_round()
    if prev is not None:
        detail["delta_vs_prev"] = delta_vs_prev(
            timings, spread, prev[0], prev[1]
        )
    # The driver tail-captures the LAST 2000 chars of stdout and
    # parses the JSON line it finds there; by r8 the full-detail line
    # outgrew that window and BENCH_r08.json recorded parsed:null.
    # Contract since r9: full detail goes to a file AND a preceding
    # line; the FINAL line is a compact summary guaranteed to fit the
    # window (per-query timings included only while they fit).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
        "w",
    ) as fh:
        json.dump(detail, fh)
    print(json.dumps(detail))
    print(compact_line(detail))
    return 0


def compact_line(detail: dict) -> str:
    """The driver-parsed final line: degrade the queries dict (full
    -> legacy-18 -> absent) until the serialized line is under 1800
    chars, comfortably inside the 2000-char tail window. Pinned by
    tests/test_cli.py::test_bench_compact_line_fits_tail_window."""
    timings = detail["queries"]
    compact = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": detail["unit"],
        "sf": detail["sf"],
        "n_runs": detail["n_runs"],
        "legacy18_seconds": detail["legacy18_seconds"],
        "tpch22_seconds": detail["tpch22_seconds"],
        "n_headline": len(timings),
        "detail": "BENCH_DETAIL.json",
        "queries": timings,
    }
    dvp = detail.get("delta_vs_prev")
    if dvp:
        compact["delta_vs_prev"] = {
            k: dvp[k]
            for k in (
                "prev_round",
                "n_common",
                "total_ratio",
                "median_ratio",
                "anchor_ratio",
                "total_ratio_norm",
                "median_ratio_norm",
                "n_flagged",
                "n_flagged_norm",
            )
            if k in dvp
        }
        if dvp.get("flagged"):
            compact["delta_vs_prev"]["flagged"] = sorted(dvp["flagged"])[:5]
    if len(json.dumps(compact)) > 1800:
        # first degrade: legacy-18 PLUS the heavy scaling-probe set
        # (r16 verdict #5) — the driver's low-core comparison needs
        # per-query times for queries where parallelism matters
        compact["queries"] = {
            n: timings[n]
            for n in HEADLINE[:18] + HEAVY_PROBE
            if n in timings
        }
    if len(json.dumps(compact)) > 1800:
        compact["queries"] = {
            n: timings[n] for n in HEADLINE[:18] if n in timings
        }
    if len(json.dumps(compact)) > 1800:
        del compact["queries"]
    return json.dumps(compact)


if __name__ == "__main__":
    sys.exit(main())
