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
import decimal
import math
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from .tables import TABLES


def _norm(v):
    """Canonicalize a pandas cell for cross-engine comparison.

    Mirrors the driver's canonicalization, which materializes BOTH
    sides as pandas frames before hashing. Two consequences we must
    reproduce (learned the hard way in CORRECTNESS_r03):

    - **dtype-sensitive**: a DuckDB window ``sum(INTEGER)`` returns
      HUGEINT, which pandas stores as float64 — so the driver hashes
      ``3.0`` against Spark's bigint ``3`` and mismatches. Values are
      therefore type-tagged here: int 3 != float 3.0.
    - **unhashable cells crash**: list/dict/ndarray cells raise in
      the driver's hash even on the rows-only path, so they raise
      here too (complex output columns must be projected to scalars
      or JSON strings before registration).
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        # pandas stores SQL NULL as NaN in float columns, so NULL and
        # NaN are indistinguishable on the driver's path — conflate.
        return None if math.isnan(f) else ("f", round(f, 6))
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return ("t", v.isoformat())
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, decimal.Decimal):
        # Distinct tag, NOT ("f", ...): the driver's pandas hash sees
        # Decimal('1251869314.00') != 1251869314.0, so conflating them
        # here made the local gate strictly weaker than the driver's —
        # exactly how the r11 q_agg_groupingsets DECIMAL regression sat
        # green locally and red at the driver (VERDICT r12 §wrong #2).
        return ("dec", v)
    if isinstance(v, (_dt.timedelta, np.timedelta64)):
        td = pd.Timedelta(v)
        return ("f", round(td.total_seconds(), 6))
    # list / dict / ndarray / anything exotic: the driver's pandas
    # hash would crash on these — fail loudly instead of papering over
    raise TypeError(f"driver-unhashable cell type {type(v).__name__}: {v!r}")


def _frame_to_multiset(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    arr = pdf[cols].to_numpy(dtype=object)
    return Counter(tuple(_norm(x) for x in row) for row in arr)


def _unhashable_columns(sdf) -> list[str]:
    """Column names whose Spark type the driver's pandas canonicalizer
    cannot hash (array/map/struct) — checked even for rows-only
    queries, because the driver canonicalizes those too."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _decimal_columns(sdf) -> list[str]:
    """Column names with DecimalType — always a latent hash hazard: no
    DuckDB oracle expression we use (round/sum/avg over parquet DOUBLE)
    produces DECIMAL, so a Spark-side DecimalType output can only ever
    hash-mismatch at the driver. Treated as an automatic failure."""
    from pyspark.sql import types as T

    return [f.name for f in sdf.schema.fields if isinstance(f.dataType, T.DecimalType)]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Spill outside the repo: DuckDB's default temp_directory is the cwd,
    # and a big oracle (the r12 k-core sf1 drill) once spilled 7.9 GB of
    # duckdb_temp_storage-*.tmp into the working tree (ADVICE r12, high).
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str):
    sdf = fn(spark, sf_dir)
    problems = []
    bad_cols = _unhashable_columns(sdf)
    if bad_cols:
        problems.append(f"driver-unhashable output columns {bad_cols}")
        return problems
    dec_cols = _decimal_columns(sdf)
    if dec_cols:
        problems.append(f"DecimalType output columns {dec_cols} (driver hash hazard)")
        return problems
    spdf = sdf.toPandas()
    spdf.columns = [c.lower() for c in spdf.columns]
    dpdf = con.execute(sql).df()
    dpdf.columns = [c.lower() for c in dpdf.columns]
    if len(spdf) != len(dpdf):
        problems.append(f"rowcount spark={len(spdf)} duckdb={len(dpdf)}")
    if sorted(spdf.columns) != sorted(dpdf.columns):
        problems.append(
            f"columns spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
        )
    if not problems:
        ms, md = _frame_to_multiset(spdf), _frame_to_multiset(dpdf)
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
            sdf = ALL_QUERIES[name](spark, sf_dir)
            bad = _unhashable_columns(sdf)
            if bad:
                failed.append(name)
                print(f"{name}: FAIL  rows-only but driver-unhashable columns {bad}")
                continue
            dec = _decimal_columns(sdf)
            if dec:
                failed.append(name)
                print(f"{name}: FAIL  rows-only but DecimalType columns {dec}")
                continue
            rows = sdf.count()
            print(f"{name}: rows-only OK rows={rows}")
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
