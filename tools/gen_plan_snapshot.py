"""Generate PLAN_SNAPSHOT.json: a canonicalized physical-plan
fingerprint for every registered query.

Motivation (r7→r8): when bench numbers drift, the first question is
"did any plan change shape, or is it host noise?" — r7 spent a
verdict cycle on exactly that. This snapshot answers it mechanically:
each query maps to the COUNTS of the physical operators that decide
its scale behavior (join strategies, exchanges, windows, sorts,
Python/Arrow stages, generators). A silent regression — a broadcast
decaying to sort-merge, an extra shuffle, a cartesian appearing, a
codegen stage splitting — shows up as a diff in a committed file,
not as an unexplained wall-time delta three rounds later.

Usage: ``python tools/gen_plan_snapshot.py`` (from the repo root),
then commit the regenerated file with the code change that moved it.
``tests/test_plans.py::test_plan_snapshot_matches`` pins HEAD to the
committed snapshot.

Fingerprints are taken against the sf0.001 fixture (plan SHAPE is
SF-independent for these queries: strategy choices at real scale are
AQE's job at runtime; the snapshot pins the static plan Catalyst
emits). Counted operators are matched as substrings of the
executedPlan string — the same convention as test_plans.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_SNAPSHOT.json",
)

#: operator markers that decide scale behavior; counted per query.
MARKERS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange hashpartitioning",
    "Exchange SinglePartition",
    "Exchange rangepartitioning",
    "Window",
    "TakeOrderedAndProject",
    "Generate",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    # Spark 4.x renders the Arrow map node as "MapInArrow" (3.x said
    # "PythonMapInArrow"); the short form matches both.
    "MapInArrow",
)

#: queries whose plan is not statically snapshottable (MLlib fit()
#: or driver-side iteration happens at plan-build time with
#: run-dependent internals).
SKIP = {"q_dedup_minhash", "q_sim_ann_lsh"}


def fingerprint(plan: str) -> dict[str, int]:
    fp = {m: plan.count(m) for m in MARKERS}
    return {k: v for k, v in fp.items() if v}


def main() -> int:
    from twitter_etl_spark.queries import ALL_QUERIES
    from twitter_etl_spark.session import get_spark

    from twitter_etl_spark import cacheutil

    spark = get_spark("plan-snapshot")
    # incremental mode: names on argv update just those entries in
    # the committed snapshot (full regen takes ~5 min; per-op regen
    # after each registration keeps the gate green mid-round)
    only = set(sys.argv[1:])
    snap: dict[str, dict[str, int]] = {}
    if only:
        with open(OUT) as f:
            snap = json.load(f)
    for name in sorted(ALL_QUERIES):
        if name in SKIP:
            continue
        if only and name not in only:
            continue
        # cold-form fingerprints: a warm cache slot swaps a query's
        # subtree for InMemoryRelation and changes the counts with
        # session history (see cacheutil.clear_slots)
        cacheutil.clear_slots()
        spark.catalog.clearCache()
        plan = (
            ALL_QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        snap[name] = fingerprint(plan)
    with open(OUT, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(snap)} plan fingerprints")
    return 0


if __name__ == "__main__":
    sys.exit(main())
