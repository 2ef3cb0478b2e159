"""ML data-prep operators: behavior + the structural scale contracts
claimed in tsengine/operators/mlprep.py docstrings."""

from __future__ import annotations

import re

from tsengine.operators.mlprep import (
    _K_FOLDS,
    kfold_assign,
    quantile_bucketize,
    target_encode,
)

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", _plan(df)))


def test_kfold_assign_zero_shuffles_and_deterministic(spark):
    df = kfold_assign(spark, SF)
    assert _n_exchanges(df) == 0  # pure projection over the scan
    rows = {r.doc_id: r.fold for r in df.collect()}
    assert set(rows.values()) <= set(range(_K_FOLDS))
    # every fold populated, and the split is balanced within 3x of even
    from collections import Counter

    counts = Counter(rows.values())
    assert len(counts) == _K_FOLDS
    assert max(counts.values()) < 3 * min(counts.values())
    # deterministic: a rebuilt plan deals the identical folds
    again = {r.doc_id: r.fold for r in kfold_assign(spark, SF).collect()}
    assert again == rows


def test_quantile_bucketize_no_wide_shuffle(spark):
    # the assignment pass is a literal codegen CASE over one scan:
    # zero exchanges, no join, no window — corpus rows never shuffle
    # (the boundary histogram is a separate domain-bounded agg job)
    df = quantile_bucketize(spark, SF)
    plan = _plan(df)
    assert _n_exchanges(df) == 0
    assert "Join" not in plan and "Window" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1


def test_quantile_bucketize_quartiles_balanced(spark):
    rows = quantile_bucketize(spark, SF).collect()
    assert {r.bucket for r in rows} == {1, 2, 3, 4}
    from collections import Counter

    by_type: dict[str, Counter] = {}
    for r in rows:
        by_type.setdefault(r.event_type, Counter())[r.bucket] += 1
    for counts in by_type.values():
        n = sum(counts.values())
        for b in (1, 2, 3, 4):
            # exact quartile boundaries with <= ties: each bin holds
            # 25% up to tie mass; value has 2dp resolution so ties are
            # bounded — allow [15%, 35%]
            assert 0.15 * n <= counts[b] <= 0.35 * n


def test_target_encode_broadcast_only(spark):
    df = target_encode(spark, SF)
    plan = _plan(df)
    # the corpus-sized side never shuffles: both joins broadcast; the
    # only exchange is the |categories|-row partial-agg reduction
    # inside a BroadcastExchange subtree
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert _n_exchanges(df) <= 1
    assert plan.count("BroadcastHashJoin") >= 1
    assert plan.count("BroadcastNestedLoopJoin") >= 1


def test_target_encode_shrinks_toward_global_mean(spark):
    from pyspark.sql import functions as F

    from tsengine.operators.mlprep import _TE_LEN_THRESHOLD
    from tsengine.sources.tables import load_table

    rows = target_encode(spark, SF).collect()
    assert all(r.enc is not None and 0.0 <= r.enc <= 1.0 for r in rows)
    docs = load_table(spark, SF, "documents")
    y = F.when(F.col("n_chars") >= _TE_LEN_THRESHOLD, 1.0).otherwise(0.0)
    gmean = docs.agg(F.avg(y)).first()[0]
    raw = {
        r.source: r.m
        for r in docs.groupBy("source").agg(F.avg(y).alias("m")).collect()
    }
    # shrinkage: each category's encoding lies strictly between its raw
    # mean and the global mean (or equals both when they coincide)
    for src, enc in {r.source: r.enc for r in rows}.items():
        lo, hi = sorted((raw[src], gmean))
        assert lo - 1e-6 <= enc <= hi + 1e-6
