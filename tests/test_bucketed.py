"""Bucketed co-located join: both fact tables bucketed on the join key
must join with ZERO exchanges, and the result must equal the plain
parquet join."""

from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def bucketed_pair(spark, oracle_sf_dir):
    from tsengine.sources.bucketed import write_bucketed

    li = write_bucketed(spark, oracle_sf_dir, "lineitem", "l_orderkey", "t_li_b")
    o = write_bucketed(spark, oracle_sf_dir, "orders", "o_orderkey", "t_o_b")
    yield li, o
    for t in (li, o):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_zero_exchange(spark, oracle_sf_dir, bucketed_pair):
    from pyspark.sql import functions as F

    from tsengine.sources.bucketed import bucketed_join
    from tsengine.sources.tables import load_table

    li_b, o_b = bucketed_pair
    joined = bucketed_join(
        spark, li_b, o_b, F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Exchange (?:hash|range)partitioning", plan), (
        "bucketed join must not shuffle either side"
    )

    # and semantics equal the plain parquet join
    n_bucketed = joined.count()
    li = load_table(spark, oracle_sf_dir, "lineitem")
    o = load_table(spark, oracle_sf_dir, "orders")
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain > 0


def test_ensure_bucketed_recovers_partial_write(spark, oracle_sf_dir, tmp_path):
    """An interrupted bucketed write (no _SUCCESS marker) must never be
    silently reused: ensure_bucketed clears the partial directory and
    rewrites, and a committed copy is re-declared (not rewritten) to a
    fresh catalog."""
    import os

    from tsengine.sources.bucketed import ensure_bucketed

    # mirror the production contract: `location` is the managed location
    # saveAsTable will use, i.e. <db LOCATION>/<table>
    db = "tsengine_buckets_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}'")
    loc = str(tmp_path / "nation_b")
    os.makedirs(loc)
    # fake partial write: files but no _SUCCESS
    with open(os.path.join(loc, "part-00000_00000.c000.snappy.parquet"), "w") as f:
        f.write("garbage")
    name = f"{db}.nation_b"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    ensure_bucketed(spark, oracle_sf_dir, "nation", "n_nationkey", name, loc)
    n = spark.table(name).count()
    assert n == 25
    assert os.path.isfile(os.path.join(loc, "_SUCCESS"))

    # committed copy + empty catalog -> re-declare path (no rewrite).
    # In production the in-memory catalog simply forgets at session end
    # with the files intact; DROP TABLE on a managed table would DELETE
    # them, so save/restore the directory around the drop to simulate a
    # fresh session.
    import shutil

    saved = str(tmp_path / "saved")
    shutil.copytree(loc, saved, copy_function=shutil.copy2)
    spark.sql(f"DROP TABLE {name}")
    shutil.move(saved, loc)
    before = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    ensure_bucketed(spark, oracle_sf_dir, "nation", "n_nationkey", name, loc)
    after = {f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)}
    assert spark.table(name).count() == 25
    assert after == before, "committed copy must be re-declared, not rewritten"
    spark.sql(f"DROP TABLE {name}")
