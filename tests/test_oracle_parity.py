"""The correctness gate, as a test: every oracle-backed query must
hash-match DuckDB on the same parquet (sf0.001 for speed; the
harness CLI runs the identical check at sf0.01, the driver's scale).
"""

from __future__ import annotations

import pytest

from twitter_etl_spark.harness import compare_query, duckdb_connect
from twitter_etl_spark.queries import ALL_ORACLES, ALL_QUERIES

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_parity(spark, con, name):
    problems = compare_query(
        spark, con, name, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE
    )
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
