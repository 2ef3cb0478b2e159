"""The full driver-t2 replica as a pytest: every registered query with
an oracle must hash-match DuckDB at sf0.01 (TESTDATA.md scale for t2)."""

from __future__ import annotations

import pytest

from tsengine.registry import all_queries
from tsengine.testing import compare, duck_connect

_QUERIES = sorted(all_queries().items())


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connect(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, q in _QUERIES if q.oracle])
def test_oracle_match(name, spark, oracle_sf_dir, duck):
    q = all_queries()[name]
    df = q.fn(spark, oracle_sf_dir)
    res = compare(name, df, q.oracle, duck)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", [n for n, q in _QUERIES if not q.oracle])
def test_rows_only_runs(name, spark, oracle_sf_dir):
    q = all_queries()[name]
    assert q.fn(spark, oracle_sf_dir).count() >= 0
