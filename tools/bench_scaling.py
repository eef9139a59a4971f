"""Per-query scaling-exponent measurement (r11 verdict #2).

The r11 sf1 drill proved CORRECTNESS at 10x volume; nothing yet
measured TIME at 10x. This tool times every headline + TPC-H query
at sf0.01, sf0.1 and sf1 (the deterministic decade-up fixtures from
tools/gen_sf_scale.py) and reports the per-query log-log slope

    slope = log10(t_hi / t_lo)   per decade step

slope ~ 1.0 is linear scaling, ~0.0 is fixed-cost dominated (startup,
broadcast, tiny dims), > 1.0 is superlinear. Flag bar: slope_0.1->1
> 1.30 — host noise on this box is 25-90% run-to-run (SCALE.md),
i.e. up to log10(1.9) = 0.28 of slope error at best-of-2, so a
flag means "grew more than ~2x faster than linear", which only a
real pair-enumeration blowup or a mis-set cap produces. The
pair-enumeration family (graph_jaccard, adamic_adar, minhash_est,
ngram_jaccard, dedup_semantic) carries documented within-bucket
quadratic terms with caps — the flag verifies the caps hold.

Usage: python tools/bench_scaling.py [--sf1 DIR] [--out FILE]
Writes SCALE_EXPONENTS.json at the repo root and prints a markdown
table for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import bench  # noqa: E402
from twitter_etl_spark.queries import ALL_QUERIES  # noqa: E402
from twitter_etl_spark.session import get_spark  # noqa: E402

SCALES = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf1", os.path.join(ROOT, ".sfscale", "sf1"), 1.0),
]
N_RUNS = 2  # best-of-2 per scale: one pass absorbs compilation
FLAG_SLOPE = 1.30


def names() -> list[str]:
    tpch = sorted(
        (n for n in ALL_QUERIES if n.startswith("q_tpch_q")),
        key=lambda n: int(n.rsplit("q", 1)[1]),
    )
    return bench.HEADLINE + [n for n in tpch if n not in bench.HEADLINE]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=SCALES[2][1])
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALE_EXPONENTS.json"))
    ap.add_argument(
        "--names",
        nargs="*",
        default=None,
        help="measure only these queries and MERGE their rows into "
        "an existing --out file (late-added ops get exponents "
        "without re-running the whole suite)",
    )
    ap.add_argument(
        "--cohort",
        type=int,
        default=0,
        help="rotating exponent cohort (r14 verdict #5): measure the "
        "N stalest-measured registry names — never-measured first "
        "(alphabetical), then oldest measured_round — and merge. "
        "Mirrors the cert-prefix rotation so every registry name "
        "gets decade exponents within a few rounds.",
    )
    args = ap.parse_args()
    if args.cohort:
        existing: dict = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                existing = {r["query"]: r for r in json.load(fh)["rows"]}
        never = sorted(n for n in ALL_QUERIES if n not in existing)
        stale = sorted(
            (n for n in ALL_QUERIES if n in existing),
            key=lambda n: (existing[n].get("measured_round", 0), n),
        )
        args.names = (never + stale)[: args.cohort]
        print(
            f"# cohort: {len(args.names)} names "
            f"({min(len(never), args.cohort)} never-measured; "
            f"{max(len(never) - args.cohort, 0)} never-measured remain "
            "for the next round's cohort)",
            file=sys.stderr,
        )
    scales = SCALES[:2] + [("sf1", args.sf1, 1.0)]
    for _, d, _ in scales:
        if not os.path.isdir(d):
            raise SystemExit(f"missing fixture dir {d} (run tools/gen_sf_scale.py)")

    spark = get_spark("bench-scaling")
    qnames = args.names if args.names else names()
    for n in qnames:
        if n not in ALL_QUERIES:
            raise SystemExit(f"unknown query {n}")
    per_scale: dict[str, dict[str, float]] = {}
    spreads: dict[str, dict[str, float]] = {}
    for label, d, _sf in scales:
        t, s = bench._time_suite_interleaved(qnames, spark, d, n=N_RUNS)
        per_scale[label], spreads[label] = t, s
        print(f"# {label}: total {round(sum(t.values()), 1)}s", file=sys.stderr)

    import glob

    cur_round = 1 + max(
        (
            int(f.rsplit("_r", 1)[1].split(".")[0])
            for f in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        ),
        default=0,
    )
    rows = []
    for n in qnames:
        t001, t01, t1 = (per_scale[s][n] for s in ("sf0.01", "sf0.1", "sf1"))
        s_lo = math.log10(t01 / t001) if t001 > 0 else float("nan")
        s_hi = math.log10(t1 / t01) if t01 > 0 else float("nan")
        rows.append(
            {
                "query": n,
                "t_sf001": t001,
                "t_sf01": t01,
                "t_sf1": t1,
                "slope_001_01": round(s_lo, 3),
                "slope_01_1": round(s_hi, 3),
                "flagged": bool(s_hi > FLAG_SLOPE),
                "measured_round": cur_round,
            }
        )

    if args.names and os.path.exists(args.out):
        # merge mode: replace/append just the measured rows
        with open(args.out) as fh:
            out = json.load(fh)
        by_name = {r["query"]: r for r in out["rows"]}
        by_name.update({r["query"]: r for r in rows})
        out["rows"] = list(by_name.values())
        out["flagged"] = [r["query"] for r in out["rows"] if r["flagged"]]
        out["n_runs"] = N_RUNS
        out["flag_slope"] = FLAG_SLOPE
    else:
        out = {
            "n_runs": N_RUNS,
            "flag_slope": FLAG_SLOPE,
            "rows": rows,
            "flagged": [r["query"] for r in rows if r["flagged"]],
        }
    # totals are ALWAYS recomputed from the merged rows so the file
    # stays self-consistent after cohort merges (r15 advice: carrying
    # the old full-run totals over described a run that no longer
    # matches the rows); rows carry measured_round, so the sums mix
    # rounds by construction — named accordingly.
    out["totals"] = {
        "note": "sum of per-row times across rows (mixed measured_round)",
        "sf0.01": round(sum(r["t_sf001"] for r in out["rows"]), 3),
        "sf0.1": round(sum(r["t_sf01"] for r in out["rows"]), 3),
        "sf1": round(sum(r["t_sf1"] for r in out["rows"]), 3),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)

    print("| query | sf0.01 s | sf0.1 s | sf1 s | slope .01→.1 | slope .1→1 |")
    print("|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -r["slope_01_1"]):
        mark = " **FLAG**" if r["flagged"] else ""
        print(
            f"| `{r['query']}` | {r['t_sf001']} | {r['t_sf01']} | {r['t_sf1']} "
            f"| {r['slope_001_01']} | {r['slope_01_1']}{mark} |"
        )
    print(f"\ntotals: {out['totals']}  flagged: {out['flagged']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
