"""Dump ``.explain("formatted")`` for named queries to text files.

Optimization-round evidence tool: the judge checks plan claims in
OPTIMIZATION_r{N}.md against committed ``plans/r{N}/<query>_{tag}.txt``
files. Usage::

    python tools/explain_dump.py --out plans/r16 --tag before name [name ...]
    python tools/explain_dump.py --out plans/r16 --tag after  name [name ...]

Plans are captured against sf0.001 (plan SHAPE is SF-independent —
same convention as gen_plan_snapshot.py) with slot caches cleared so
the dump shows the cache-independent cold form.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from twitter_etl_spark.cacheutil import clear_slots
    from twitter_etl_spark.queries import ALL_QUERIES
    from twitter_etl_spark.session import get_spark

    spark = get_spark("explain-dump")
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        if name not in ALL_QUERIES:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            return 1
        clear_slots()
        spark.catalog.clearCache()
        df = ALL_QUERIES[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
