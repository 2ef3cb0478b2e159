"""Wearable-window derivation: Spark vs DuckDB oracle parity, shape
invariants (the reference's shape smoke test analog — SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsengine.sources.wearable import SEQ_LEN, wearable_long, wearable_long_sql, wearable_wide
from tsengine.testing import assert_match


def test_long_matches_oracle(spark, oracle_sf_dir):
    df = wearable_long(spark, oracle_sf_dir)
    sql = f"WITH {wearable_long_sql()} SELECT * FROM wearable_long"
    assert_match("wearable_long", df, sql, oracle_sf_dir)


def test_windows_are_complete(spark, sf_dir):
    df = wearable_long(spark, sf_dir)
    sizes = df.groupBy("window_id").count().select("count").distinct().collect()
    assert [r["count"] for r in sizes] == [SEQ_LEN]


def test_wide_shape(spark, sf_dir):
    w = wearable_wide(spark, sf_dir)
    row = w.select(
        F.size("ibi").alias("li"), F.size("acc").alias("la")
    ).distinct().collect()
    assert [(r["li"], r["la"]) for r in row] == [(SEQ_LEN, SEQ_LEN)]
    # acc in 0..15, ibi in 600..1499
    bad = w.select(
        F.exists("acc", lambda a: (a < 0) | (a > 15)).alias("bad_acc"),
        F.exists("ibi", lambda x: (x < 600) | (x > 1499)).alias("bad_ibi"),
    ).filter("bad_acc OR bad_ibi")
    assert bad.count() == 0
