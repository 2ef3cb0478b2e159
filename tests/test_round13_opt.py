"""Round-13 optimization pins: the source-layer plan-metadata memo.

The memo (tables._RELATION_MEMO / wearable._LONG_MEMO/_WIDE_MEMO) reuses
the *analyzed lazy plan* per (session, sf_dir, table) — never data.  These
tests pin the three properties that make it safe:

1. isolation — executing one caller's DataFrame must not finalize the
   AQE plan another caller observes (each memo hit is a fresh
   QueryExecution over the shared analyzed child);
2. key discipline — different sf dirs never alias;
3. value identity — a memo hit computes exactly what a cold build does.
"""

from __future__ import annotations

import re

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_memo_hit_has_fresh_query_execution(spark):
    from tsengine.sources.wearable import wearable_long

    first = wearable_long(spark, SF_A)
    first.collect()  # finalizes FIRST's AQE plan in place
    again = wearable_long(spark, SF_A)
    assert again is not first
    # the hit's plan is un-executed: no Final+Initial double rendering,
    # so the single-shuffle contract still reads 1 (not 2)
    assert "isFinalPlan=true" not in (
        again._jdf.queryExecution().executedPlan().toString()
    )
    assert _n_exchanges(again) == 1


def test_memo_keys_do_not_alias_sf_dirs(spark):
    from tsengine.sources.tables import load_table

    a = load_table(spark, SF_A, "events")
    b = load_table(spark, SF_B, "events")
    assert a.count() != b.count()  # 1000 vs 10000 rows


def test_plan_pure_queries_run_zero_jobs_at_build(spark):
    """The gaming guard for the registry plan memo: every query flagged
    _PLAN_PURE must build its DataFrame without running a single Spark
    job (warm build — the first build may trigger one-off parquet
    footer reads).  A collect()/localCheckpoint/fit sneaking into a
    flagged fn would hoist real work out of the measured path; this
    test makes that a loud failure instead."""
    from tsengine import registry
    from tsengine.registry import all_queries

    qs = all_queries()
    sc = spark.sparkContext
    for name in sorted(registry._PLAN_PURE):
        qs[name].fn(spark, SF_A)  # warm: table memo + footer reads
    registry._PLAN_MEMO.clear()  # probe the real fn, not a memo hit
    offenders = {}
    try:
        for name in sorted(registry._PLAN_PURE):
            grp = f"purity-pin-{name}"
            sc.setJobGroup(grp, name)
            qs[name].fn(spark, SF_A)
            jobs = sc.statusTracker().getJobIdsForGroup(grp)
            if jobs:
                offenders[name] = len(jobs)
    finally:
        # drop the thread-local group so later tests' jobs aren't tagged
        # into the last probe group (ADVICE r13)
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    assert not offenders, f"plan_pure queries ran jobs at build: {offenders}"


def test_registry_memo_hit_is_isolated_and_identical(spark):
    from tsengine.registry import all_queries

    q = all_queries()["tumbling_window_agg"]
    first = q.fn(spark, SF_A)
    rows_first = first.collect()  # finalizes FIRST's AQE plan
    again = q.fn(spark, SF_A)
    assert again is not first
    assert "isFinalPlan=true" not in (
        again._jdf.queryExecution().executedPlan().toString()
    )
    assert again.collect() == rows_first


def test_memo_hit_value_identity(spark):
    from tsengine.sources import tables, wearable
    from tsengine.sources.wearable import wearable_long

    hit = wearable_long(spark, SF_A).orderBy("window_id", "t").collect()
    # drop every memo entry -> force a cold rebuild of the whole plan
    tables._RELATION_MEMO.clear()
    wearable._LONG_MEMO.clear()
    wearable._WIDE_MEMO.clear()
    cold = wearable_long(spark, SF_A).orderBy("window_id", "t").collect()
    assert hit == cold
