"""Semantic sanity tests for the round-6 statistics operators
(tsengine/operators/stats.py).  Oracle parity is covered by
test_oracle_all.py; these pin the MATH — properties the DuckDB twin
would faithfully replicate even if both engines computed the wrong
thing."""

from __future__ import annotations

import math

import pytest

from tsengine.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


def test_acf_lags_bounded_and_iid_small(spark, sf_dir):
    """ACF is a normalized autocovariance: |acf_k| <= 1 always; the
    driver events are i.i.d. draws per user, so lag correlations
    should hover near zero (well inside +-0.5 at n~66)."""
    rows = _q("acf_lags", spark, sf_dir).collect()
    assert rows
    for r in rows:
        for k in (1, 2, 3):
            v = r[f"acf{k}"]
            assert v is not None and abs(v) <= 1.0
    mean_abs = sum(abs(r["acf1"]) for r in rows) / len(rows)
    assert mean_abs < 0.5


def test_metric_correlations_full_matrix(spark, sf_dir):
    """All C(5,2)=10 unordered type pairs, each |corr| <= 1, and the
    pair labels are lexicographically ordered (upper triangle)."""
    rows = _q("metric_correlations", spark, sf_dir).collect()
    pairs = {(r["m1"], r["m2"]) for r in rows}
    assert len(pairs) == 10
    for m1, m2 in pairs:
        assert m1 < m2
    for r in rows:
        assert r["corr"] is None or abs(r["corr"]) <= 1.0


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    """resid = y - trend - seasonal on every grid cell (up to the 6dp
    output rounding), and each day's trend is constant across hours."""
    rows = _q("seasonal_decompose", spark, sf_dir).collect()
    assert rows
    trend_by_day = {}
    for r in rows:
        assert r["resid"] == pytest.approx(
            r["y"] - r["trend"] - r["seasonal"], abs=2e-6
        )
        trend_by_day.setdefault(r["d"], set()).add(r["trend"])
    assert all(len(v) == 1 for v in trend_by_day.values())


def test_mad_outliers_subset_and_threshold(spark, sf_dir):
    """Every flagged row exceeds the 3.5 modified-z threshold, and the
    flagged set is a strict subset of the events."""
    from tsengine.sources.tables import load_table

    out = _q("mad_outliers", spark, sf_dir)
    rows = out.collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert 0 < len(rows) < n_events
    assert all(abs(r["rz"]) > 3.5 - 1e-4 for r in rows)


def test_mad_outliers_breakdown_robustness(spark, sf_dir):
    """The property that motivates MAD over z-score: a user whose
    history contains one enormous spike still flags it (the spike
    cannot mask itself by inflating the scale estimate, unlike the
    mean/std rule where a big enough single point can)."""
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # the globally largest value is, for its user, a >3.5 MAD outlier
    top = ev.orderBy(F.desc("value")).first()
    flagged = {
        (r["event_id"], r["user_id"])
        for r in _q("mad_outliers", spark, sf_dir).collect()
    }
    assert (top["event_id"], top["user_id"]) in flagged


def test_cusum_recurrence_matches_python(spark, sf_dir):
    """Replay Page's recurrence in plain Python for one flagged user
    and require the engine's S_t to be bit-close at every flagged t."""
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    out = _q("cusum_changepoint", spark, sf_dir).collect()
    assert out  # detector fires somewhere on driver data
    uid = out[0]["user_id"]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("value")
        .collect()
    )
    xs = [r["value"] for r in ev]
    mu = sum(xs) / len(xs)
    var = sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)
    sd = math.sqrt(var)
    s, series = 0.0, []
    for x in xs:
        z = round((x - mu) / sd, 6)
        s = max(0.0, s + z - 0.5)
        series.append(s)
    got = {r["t"]: r["s"] for r in out if r["user_id"] == uid}
    for t, s_engine in got.items():
        assert s_engine == pytest.approx(series[t], rel=1e-9)
        assert s_engine > 4.0
    # and no t with S_t > 4 is missing
    expect_ts = {t for t, s in enumerate(series) if s > 4.0}
    assert set(got) == expect_ts


def test_length_histogram_partitions_corpus(spark, sf_dir):
    """Bucket counts sum to the corpus size and bucket bounds respect
    the 64-char width."""
    from tsengine.sources.tables import load_table

    rows = _q("length_histogram", spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["bucket"] * 64 <= r["min_chars"] <= r["max_chars"] < (r["bucket"] + 1) * 64


def test_mad_outliers_flags_spike_in_constant_history(spark):
    """ADVICE r6 guard: a user whose history is >=50% one value has
    MAD = 0 — the modified z-score is undefined, but a spike must
    still be flagged (rz NULL, row present), and equal-to-median
    values must not be."""
    import datetime as dt

    from pyspark.sql import functions as F

    from tsengine.operators.stats import mad_outliers
    from tsengine.sources import tables

    rows = []
    t0 = dt.datetime(2025, 1, 1)
    # user 1: constant 5.0 except one 400.0 spike -> med=5, MAD=0
    for i in range(20):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "m",
                     400.0 if i == 7 else 5.0))
    # user 2: normal spread, no outlier
    for i in range(20):
        rows.append((100 + i, t0 + dt.timedelta(minutes=i), 2, "m",
                     float(i)))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double"
    )
    import unittest.mock as mock

    with mock.patch.object(tables, "load_table", return_value=df), \
         mock.patch(
             "tsengine.operators.stats.load_table", return_value=df
         ):
        got = mad_outliers(spark, "ignored").collect()
    flagged = {(r.user_id, r.event_id): r.rz for r in got}
    assert (1, 7) in flagged          # the spike IS flagged
    assert flagged[(1, 7)] is None    # rz undefined at MAD=0, not inf
    assert all(uid != 1 or eid == 7 for (uid, eid) in flagged)
    assert all(uid != 2 for (uid, eid) in flagged)  # spread user clean


def test_metric_correlations_degenerate_yields_null_not_nan(spark):
    """ADVICE r6: zero-variance metric profiles must yield NULL (as
    DuckDB does), never NaN."""
    import datetime as dt

    from tsengine.operators import stats as S

    t0 = dt.datetime(2025, 1, 1)
    rows = []
    # every user has constant value for every type -> zero variance
    for uid in range(5):
        for j, ty in enumerate(S._EVENT_TYPES):
            rows.append((uid * 10 + j, t0, uid, ty, 1.0))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double"
    )
    import unittest.mock as mock

    with mock.patch("tsengine.operators.stats.load_table",
                    return_value=df):
        got = S.metric_correlations(spark, "ignored").collect()
    assert len(got) == 10
    for r in got:
        assert r.corr is None  # NULL, not NaN
        assert r.corr is None or not math.isnan(r.corr)
