"""Property checks from SURVEY.md §5: mathematical invariants that the
DuckDB oracle can't express (or that deserve an independent witness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tsengine.registry import all_queries
from tsengine.sources.wearable import SEQ_LEN, wearable_long


def _q(name):
    return all_queries()[name].fn


def test_parseval_fft(spark, sf_dir):
    """Σ|x|² == Σ|X|²/L — ties the pandas_udf rfft path to the raw data."""
    wl = wearable_long(spark, sf_dir)
    energy = (
        wl.groupBy("window_id")
        .agg(F.sum(F.col("ibi").cast("double") * F.col("ibi")).alias("e_time"))
        .toPandas()
        .set_index("window_id")
    )
    fft = _q("fft_mag")(spark, sf_dir).toPandas()
    # rfft bins: double all but DC (and Nyquist for even L)
    fft["w"] = np.where((fft.k == 0) | (fft.k == SEQ_LEN // 2), 1.0, 2.0)
    e_freq = (
        fft.assign(e=lambda d: d.w * d.mag**2)
        .groupby("window_id")
        .e.sum()
        / SEQ_LEN
    )
    joined = energy.join(e_freq.rename("e_freq"))
    assert np.allclose(joined.e_time, joined.e_freq, rtol=1e-4)


def test_ema_closed_form_equals_recurrence(spark, sf_dir):
    from tsengine.operators.timeseries import ema_recurrence_np

    ema = _q("ema_smooth")(spark, sf_dir).toPandas()
    wl = wearable_long(spark, sf_dir).select("window_id", "t", "ibi").toPandas()
    for wid, grp in wl.groupby("window_id"):
        series = grp.sort_values("t")["ibi"].astype(float)
        rec = ema_recurrence_np(series)
        got = ema[ema.window_id == wid].sort_values("t")["ema"].to_numpy()
        assert np.allclose(got, rec, atol=2e-6), f"window {wid}"


def test_roc_auc_matches_mllib(spark, sf_dir):
    from tsengine.operators.metrics import window_preds
    from tsengine.operators.ml import roc_auc_mllib

    sql_auc = _q("roc_auc")(spark, sf_dir).collect()[0]["auc"]
    mllib_auc = roc_auc_mllib(window_preds(spark, sf_dir))
    assert abs(sql_auc - mllib_auc) < 1e-6


def test_conv1d_impulse_response(spark):
    """A unit impulse at t0 must reproduce the (flipped) kernel at
    t0-1..t0+1 — checked through the same join-form plan the query uses."""
    from tsengine.operators.timeseries import conv_weights_df

    rows = [(0, t, c, 1.0 if (t == 5 and c == 3) else 0.0) for t in range(10) for c in range(16)]
    fused = spark.createDataFrame(rows, ["window_id", "t", "c", "x"])
    w = conv_weights_df(spark)
    out = (
        fused.join(F.broadcast(w), "c")
        .select("window_id", (F.col("t") - F.col("d")).alias("t"), "oc", (F.col("w") * F.col("x")).alias("wx"))
        .filter((F.col("t") >= 0) & (F.col("t") <= 9))
        .groupBy("window_id", "t", "oc")
        .agg(F.sum("wx").alias("y"))
    ).toPandas()
    wp = w.toPandas()
    for oc in (0, 3, 7):
        for d in (-1, 0, 1):
            expect = wp[(wp.oc == oc) & (wp.c == 3) & (wp.d == d)].w.iloc[0]
            got = out[(out.oc == oc) & (out.t == 5 - d)].y.iloc[0]
            assert abs(got - expect) < 1e-12
    # everywhere else: zero
    nz = out[(out.t < 4) | (out.t > 6)]
    assert (nz.y.abs() < 1e-12).all()


def test_gru_determinism_and_shape(spark, sf_dir):
    """Engine analog of the reference's shape smoke test (`test_cpc()`,
    SURVEY.md §5.1): stable schema, one context per window, identical
    across runs."""
    from tsengine.operators.recurrence import HIDDEN

    a = _q("gru_context")(spark, sf_dir).toPandas().sort_values("window_id").reset_index(drop=True)
    b = _q("gru_context")(spark, sf_dir).toPandas().sort_values("window_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["window_id", "t"] + [f"h{i}" for i in range(HIDDEN)]
    n_windows = wearable_long(spark, sf_dir).select("window_id").distinct().count()
    assert len(a) == n_windows
    # recurrence sanity: bounded activations
    assert a[[f"h{i}" for i in range(HIDDEN)]].abs().max().max() <= 1.0


def test_gru_matches_numpy_reference(spark, sf_dir):
    """Cross-check the distributed grouped-map path against a pure
    numpy evaluation of one window."""
    from tsengine.operators.recurrence import gru_sequence, gru_weights

    wl = wearable_long(spark, sf_dir).filter(F.col("window_id") == 0).orderBy("t").toPandas()
    if len(wl) == 0:
        import pytest

        pytest.skip("window 0 absent at this sf")
    x = np.stack([wl.ibi.to_numpy() / 1000.0, wl.acc.to_numpy() / 16.0], axis=1)
    expect = gru_sequence(x, gru_weights(n_in=2))[-1]
    got_df = _q("gru_context")(spark, sf_dir).filter(F.col("window_id") == 0).toPandas()
    got = got_df[[f"h{i}" for i in range(len(expect))]].iloc[0].to_numpy()
    assert np.allclose(got, np.round(expect, 6), atol=1e-9)


def test_hll_error_bound(spark, sf_dir):
    """The HLL sketch twin must stay within its configured relative
    error (rsd=0.02; assert 3x slack) of the exact distinct counts."""
    from tsengine.registry import all_queries

    exact = {
        r["event_type"]: r["n_users"]
        for r in all_queries()["distinct_counts"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in all_queries()["distinct_counts_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.06 * n), (k, n, approx[k])
