"""Registry-wide oracle dtype lint: no DuckDB oracle may emit a
HUGEINT/UHUGEINT column.

DuckDB 1.x widens SUM(BIGINT), list_sum, and windowed SUM to int128
(HUGEINT), which pandas renders as float64 while Spark emits int64 —
the driver's stringified value hash then mismatches ("1234.0" vs
"1234") even when values are equal.  CORRECTNESS_r04 lost four rows to
exactly this (token_count, doc_fingerprint, session_window_agg,
pipeline_corpus); every such aggregate must be CAST(... AS BIGINT) in
the oracle SQL.  This test binds every registered oracle against the
sf0.001 views (plan-time type inference only — nothing executes) and
fails on any 128-bit integer result column, so the class can't recur.
"""

from __future__ import annotations

import pytest

from tsengine.registry import all_queries
from tsengine.testing import duck_connect

_BANNED = {"HUGEINT", "UHUGEINT"}

_ORACLES = sorted((n, q.oracle) for n, q in all_queries().items() if q.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name,oracle", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_oracle_has_no_hugeint_columns(name, oracle, duck):
    rel = duck.sql(oracle)
    bad = [
        f"{col}:{dtype}"
        for col, dtype in zip(rel.columns, rel.types)
        if str(dtype).upper() in _BANNED
    ]
    assert not bad, (
        f"oracle for {name!r} emits 128-bit integer columns {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) so the driver's "
        "dtype-strict hash matches Spark's int64"
    )
