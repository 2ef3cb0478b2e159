"""Semantic sanity for the round-5 operators — properties the oracle
hash can't express (monotonicity, clustering effectiveness, conservation
laws), at sf0.001 for speed.  Oracle parity itself is covered by
tests/test_oracle_all.py + the per-round sweeps."""

from __future__ import annotations

import pytest

from tsengine.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return all_queries()[name].fn(spark, SF).toPandas()

    return run


def test_pr_curve_properties(q):
    df = q("pr_curve").sort_values("threshold").reset_index(drop=True)
    # recall is non-increasing as the threshold rises
    assert (df["rec"].diff().dropna() <= 1e-12).all()
    # at the lowest threshold every row is predicted positive:
    # recall = 1 and precision = prevalence
    assert df.iloc[0]["rec"] == pytest.approx(1.0)
    assert 0 < df.iloc[0]["prec"] < 1
    # precision can be exactly 0 at thresholds above every positive score
    assert ((df["prec"] >= 0) & (df["prec"] <= 1)).all()


def test_pr_auc_bounds(q):
    ap = q("pr_auc")["ap"].iloc[0]
    curve = q("pr_curve")
    # AP is a recall-weighted mean of precisions: inside the hull
    assert 0 <= ap <= curve["prec"].max() + 1e-9


def test_scd2_intervals_conservation(q, spark):
    import pandas as pd

    from tsengine.sources.tables import load_table

    df = q("scd2_intervals")
    ev = load_table(spark, SF, "events")
    # every event lands in exactly one interval
    assert df["n_events"].sum() == ev.count()
    # versions are 1..max contiguous per user and intervals don't overlap
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        assert (g["valid_from"] <= g["valid_to"]).all()
        assert (g["valid_from"].iloc[1:].values >= g["valid_to"].iloc[:-1].values).all()


def test_table_profile_invariants(q, spark):
    from tsengine.sources.tables import load_table

    df = q("table_profile").set_index("col_name")
    n = load_table(spark, SF, "orders").count()
    assert (df["n_nulls"] == 0).all()
    assert df.loc["o_orderkey", "n_distinct"] == n  # primary key
    assert df.loc["o_orderstatus", "n_distinct"] <= 3


def test_zorder_layout_clusters(q, spark):
    from tsengine.sources.tables import load_table

    df = q("zorder_layout")
    n = load_table(spark, SF, "orders").count()
    assert df["n_rows"].sum() == n
    assert len(df) > 1
    # data-skipping effectiveness: the summed per-file bounding AREA is
    # far below n_files x the global area (which is what a random,
    # unclustered assignment would give every file)
    gc = df["max_cust"].max() - df["min_cust"].min() + 1
    gd = df["max_day"].max() - df["min_day"].min() + 1
    areas = (df["max_cust"] - df["min_cust"] + 1) * (df["max_day"] - df["min_day"] + 1)
    assert areas.sum() < 0.5 * len(df) * gc * gd


def test_cumulative_distinct_users_monotone(q, spark):
    from tsengine.sources.tables import load_table

    df = q("cumulative_distinct_users").sort_values("day").reset_index(drop=True)
    total = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert df["cum_users"].iloc[-1] == total
    assert (df["cum_users"].diff().dropna() >= 0).all()
    assert (df["n_new"] <= df["n_active"]).all()
    assert df["n_new"].sum() == total


def test_attribution_conservation(q, spark):
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    df = q("attribution_last_touch")
    purchases = (
        load_table(spark, SF, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert 0 < df["n_conversions"].sum() <= purchases
    assert df["channel"].between(0, 6).all()


def test_bucketed_join_agg_matches_plain_join(q, spark):
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    df = q("bucketed_join_agg").set_index("o_orderpriority")
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert df["n_items"].to_dict() == plain["n_items"].to_dict()
