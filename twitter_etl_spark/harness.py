"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in Spark AND its ``oracle_sql()`` SQL
in DuckDB over the same parquet fixtures, then compares row count,
column-name set, and an order-insensitive multiset of normalized
values. This is how we keep CORRECTNESS_r{N}.json green *before* the
driver runs.

Usage::

    python -m twitter_etl_spark.harness [--sf DIR] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
from collections import Counter

import duckdb

from .tables import TABLES


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 6 significant-ish decimals; queries pre-round aggregates
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:  # decimal.Decimal and numpy scalars
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str):
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = [f.lower() for f in sdf.columns]
    res = con.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    problems = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
    if not problems:
        ms, md = _rows_to_multiset(scols, srows), _rows_to_multiset(dcols, drows)
        if ms != md:
            only_s = list((ms - md).items())[:3]
            only_d = list((md - ms).items())[:3]
            problems.append(f"values: spark-only={only_s} duckdb-only={only_d}")
    return problems


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.01"
    names = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    from .queries import ALL_ORACLES, ALL_QUERIES
    from .session import get_spark

    spark = get_spark("parity-harness")
    con = duckdb_connect(sf_dir)
    todo = names or list(ALL_ORACLES)
    failed = []
    for name in todo:
        if name not in ALL_ORACLES:
            print(f"{name}: SKIP (rows-only)")
            rows = ALL_QUERIES[name](spark, sf_dir).count()
            print(f"{name}: rows={rows}")
            continue
        try:
            problems = compare_query(
                spark, con, name, ALL_QUERIES[name], ALL_ORACLES[name], sf_dir
            )
        except Exception as e:  # noqa: BLE001
            problems = [f"EXception: {type(e).__name__}: {str(e)[:300]}"]
        if problems:
            failed.append(name)
            print(f"{name}: FAIL  {problems}")
        else:
            print(f"{name}: OK")
    print(f"\n{len(todo) - len(failed)}/{len(todo)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
