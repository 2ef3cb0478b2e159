"""Semantic sanity tests for the round-8 forecasting / drift operators
(tsengine/operators/forecast.py, drift.py, mlprep.lag_features).
Oracle parity is covered by test_oracle_all.py; these pin the MATH
against independent implementations — properties the DuckDB twin would
faithfully replicate even if both engines computed the wrong thing."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from tsengine.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].fn(spark, sf_dir)


def _daily(sf_dir, user_id=None):
    where = f"WHERE user_id = {user_id}" if user_id is not None else ""
    return duckdb.sql(f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS y
          FROM '{sf_dir}/events.parquet' {where} GROUP BY 1, 2
        ) SELECT user_id, y FROM daily ORDER BY user_id, d
    """).fetchall()


def _holt_py(ys, a=0.5, b=0.3):
    out = []
    l, t = ys[0], 0.0
    out.append((l, t))
    for y in ys[1:]:
        ln = a * y + (1 - a) * (l + t)
        t = b * (ln - l) + (1 - b) * t
        l = ln
        out.append((l, t))
    return out


def test_holt_linear_matches_independent_recursion(spark, sf_dir):
    """The fold must equal the plain sequential recursion exactly —
    same doubles, not just approximately (the bit-identical-fold
    contract ema_smooth established)."""
    rows = _q("holt_linear", spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ys_by_user = {}
    for uid, y in _daily(sf_dir):
        ys_by_user.setdefault(uid, []).append(y)
    assert set(by_user) == set(ys_by_user)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["t"])
        exp = _holt_py(ys_by_user[uid])
        assert len(rs) == len(exp)
        for r, (l, t) in zip(rs, exp):
            assert r["level"] == l and r["trend"] == t
            assert r["yhat_next"] == l + t


def test_holt_duckdb_list_accumulator_quirk():
    """Regression pin for the DuckDB 1.0 list_reduce quirk the oracle
    works around: a STRUCT accumulator's fields update in place
    sequentially (the 'b' expression sees the step's NEW 'l'), so the
    oracle must fold a 2-element LIST.  If DuckDB changes either
    behavior, this test localizes the break before the oracle sweep
    turns red."""
    lst = duckdb.sql("""
      SELECT list_reduce(
        list_prepend([CAST(10.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                     list_transform([20.0::DOUBLE, 30.0::DOUBLE],
                                    x -> [x, CAST(NULL AS DOUBLE)])),
        (acc, x) -> [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                     0.3 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                     + 0.7 * acc[2]])
    """).fetchone()[0]
    exp = _holt_py([10.0, 20.0, 30.0])[-1]
    assert lst == [exp[0], exp[1]]


def test_ohlc_resample_bar_semantics(spark, sf_dir):
    """open/close are the first/last reading by (ts, event_id) within
    the bar; high/low bound every reading including open/close."""
    bars = {
        (r["user_id"], r["d"]): r
        for r in _q("ohlc_resample", spark, sf_dir).collect()
    }
    raw = duckdb.sql(f"""
        SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, value
        FROM '{sf_dir}/events.parquet' ORDER BY user_id, d, ts, event_id
    """).fetchall()
    by_bar = {}
    for uid, d, ts, eid, v in raw:
        by_bar.setdefault((uid, d), []).append(v)
    assert set(bars) == set(by_bar)
    for key, vals in by_bar.items():
        b = bars[key]
        assert b["open_value"] == vals[0]
        assert b["close_value"] == vals[-1]
        assert b["high_value"] == max(vals)
        assert b["low_value"] == min(vals)
        assert b["n_events"] == len(vals)
        assert b["low_value"] <= b["open_value"] <= b["high_value"]
        assert b["low_value"] <= b["close_value"] <= b["high_value"]


def test_cross_corr_lags_shape_and_bounds(spark, sf_dir):
    """All C(5,2) ordered pairs x lags 0..3; |xcorr| <= 1; matched-hour
    count shrinks (weakly) as the lag grows."""
    rows = _q("cross_corr_lags", spark, sf_dir).collect()
    seen = {(r["m1"], r["m2"], r["lag"]) for r in rows}
    assert len(seen) == len(rows)
    for r in rows:
        assert r["m1"] < r["m2"]
        assert 0 <= r["lag"] <= 3
        if r["xcorr"] is not None:
            assert abs(r["xcorr"]) <= 1.0 + 1e-9
    by_pair = {}
    for r in rows:
        assert r["n_hours"] >= 1
        by_pair.setdefault((r["m1"], r["m2"]), set()).add(r["lag"])
    # every pair present at every lag (the hourly grids overlap at
    # test scale; matched-hour COUNTS are not monotone in lag on a
    # sparse grid, so only presence is pinned)
    assert all(lags == {0, 1, 2, 3} for lags in by_pair.values())
    assert len(by_pair) == 10


def _dtw_py(x, ref, band=7):
    """Independent banded DTW written straight from the recurrence."""
    n, m = len(x), len(ref)
    r = max(band, abs(n - m))
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        ctr = i * m / n
        for j in range(1, m + 1):
            if j < ctr - r or j > ctr + r:
                continue
            D[i, j] = abs(x[i - 1] - ref[j - 1]) + min(
                D[i - 1, j], D[i - 1, j - 1], D[i, j - 1]
            )
    return round(float(D[n, m]), 6)


def test_dtw_distance_matches_independent_dp(spark, sf_dir):
    rows = {r["user_id"]: r for r in _q("dtw_distance", spark, sf_dir).collect()}
    ref = [
        r[0]
        for r in duckdb.sql(f"""
          SELECT ROUND(AVG(value), 6) AS y FROM '{sf_dir}/events.parquet'
          GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)
        """).fetchall()
    ]
    ys_by_user = {}
    for uid, y in _daily(sf_dir):
        ys_by_user.setdefault(uid, []).append(y)
    assert set(rows) == set(ys_by_user)
    for uid, ys in ys_by_user.items():
        exp = _dtw_py(np.asarray(ys), np.asarray(ref))
        assert rows[uid]["dtw"] == pytest.approx(exp, abs=1e-6)
        assert rows[uid]["n_days"] == len(ys)
        assert rows[uid]["dtw"] >= 0.0


def test_dtw_zero_on_identical_series():
    x = np.array([1.0, 2.0, 3.0, 2.0])
    assert _dtw_py(x, x) == 0.0
    # elasticity: a time-shifted copy is closer under DTW than the
    # raw L1 sum at aligned indices
    a = np.array([0.0, 0.0, 5.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 0.0, 0.0, 5.0, 0.0, 0.0])
    aligned = float(np.abs(a - b).sum())
    assert _dtw_py(a, b) < aligned


def _halves_counts(sf_dir):
    return duckdb.sql(f"""
      WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        FROM '{sf_dir}/events.parquet'
      )
      SELECT event_type, value,
             CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS half
      FROM '{sf_dir}/events.parquet' CROSS JOIN bounds
    """).fetchall()


def test_psi_drift_matches_independent_computation(spark, sf_dir):
    """PSI recomputed in plain python from the raw halves; PSI >= 0
    always (it is a symmetrized KL divergence: every term
    (p-q)*ln(p/q) is non-negative)."""
    rows = {r["event_type"]: r for r in _q("psi_drift", spark, sf_dir).collect()}
    counts = {}
    for et, v, half in _halves_counts(sf_dir):
        b = min(max(int(v // 50.0), 0), 9)
        key = (et, half)
        counts.setdefault(key, [0] * 10)[b] += 1
    for et, r in rows.items():
        ref = counts.get((et, 0), [0] * 10)
        cur = counts.get((et, 1), [0] * 10)
        nr, nc = sum(ref), sum(cur)
        assert r["n_ref"] == nr and r["n_cur"] == nc
        psi = sum(
            ((ri + 0.5) / (nr + 5.0) - (ci + 0.5) / (nc + 5.0))
            * math.log(((ri + 0.5) / (nr + 5.0)) / ((ci + 0.5) / (nc + 5.0)))
            for ri, ci in zip(ref, cur)
        )
        assert r["psi"] == pytest.approx(psi, abs=1e-6)
        assert r["psi"] >= 0.0


def test_ks_drift_matches_independent_ecdf(spark, sf_dir):
    rows = {r["event_type"]: r for r in _q("ks_drift", spark, sf_dir).collect()}
    samples = {}
    for et, v, half in _halves_counts(sf_dir):
        samples.setdefault((et, half), []).append(v)
    for et, r in rows.items():
        a = np.sort(np.asarray(samples[(et, 0)]))
        b = np.sort(np.asarray(samples[(et, 1)]))
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        d = float(np.abs(fa - fb).max())
        assert r["ks"] == pytest.approx(d, abs=1e-6)
        assert 0.0 <= r["ks"] <= 1.0
        assert r["n_ref"] == len(a) and r["n_cur"] == len(b)


def test_lag_features_manual_shift(spark, sf_dir):
    """For one user: lag columns equal the manual shift of the
    (ts, event_id)-ordered series; warm-up rows are NULL; gap is the
    exact microsecond difference."""
    df = _q("lag_features", spark, sf_dir)
    uid = df.select("user_id").first()["user_id"]
    rows = sorted(
        df.filter(f"user_id = {uid}").collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    vals = [r["value"] for r in rows]
    for i, r in enumerate(rows):
        for k in (1, 2, 3):
            exp = vals[i - k] if i >= k else None
            assert r[f"lag{k}"] == exp
        if i == 0:
            assert r["gap_us"] is None and r["delta1"] is None
        else:
            assert r["delta1"] == vals[i] - vals[i - 1]
            assert r["gap_us"] > 0
        if i < 5:
            assert r["roll_mean5"] is None and r["roll_std5"] is None
        else:
            window = vals[i - 5 : i]
            m = sum(window) / 5.0
            assert r["roll_mean5"] == pytest.approx(m, abs=1e-12)
            var = sum((v - m) ** 2 for v in window) / 4.0
            assert r["roll_std5"] == pytest.approx(math.sqrt(var), abs=1e-12)


def test_theil_sen_matches_independent(spark, sf_dir):
    """Slope/intercept vs plain python: all pairwise slopes, DISCRETE
    lower median (value at 1-based rank (n+1)//2 — the r9 rank-
    selection rule; interpolation was dropped because it is not
    bit-reproducible across engines, see _theil_finish)."""
    rows = {r["user_id"]: r for r in _q("theil_sen_trend", spark, sf_dir).collect()}
    pts = duckdb.sql(f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS y
          FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        ) SELECT user_id, date_diff('day', DATE '1970-01-01', d) AS x, y
        FROM daily ORDER BY user_id, d
    """).fetchall()
    series = {}
    for uid, x, y in pts:
        series.setdefault(uid, []).append((x, y))
    for uid, sxy in series.items():
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(sxy)
            for (x2, y2) in sxy[i + 1 :]
        ]
        if not slopes:
            assert uid not in rows
            continue
        lower_med = lambda v: sorted(v)[(len(v) + 1) // 2 - 1]  # noqa: E731
        slope = lower_med(slopes)
        resid = [y - slope * x for x, y in sxy]
        intercept = lower_med(resid)
        r = rows[uid]
        assert r["n_pairs"] == len(slopes)
        assert r["slope"] == slope  # rank selection: exact, not approx
        assert r["intercept"] == intercept


def test_winsorize_matches_independent(spark, sf_dir):
    rows = _q("winsorize", spark, sf_dir).collect()
    vals = {}
    for r in rows:
        vals.setdefault(r["event_type"], []).append(r["value"])
    bounds = {
        t: (float(np.percentile(v, 5)), float(np.percentile(v, 95)))
        for t, v in vals.items()
    }
    n_clipped = 0
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        exp = min(max(r["value"], lo), hi)
        assert r["winsorized"] == pytest.approx(exp, abs=1e-9)
        exp_clip = 1 if (r["value"] < lo or r["value"] > hi) else 0
        assert r["is_clipped"] == exp_clip
        n_clipped += exp_clip
    # ~10% of rows clip at P5/P95 (ties can only reduce it)
    assert 0 < n_clipped <= 0.11 * len(rows) + 5


def test_grouping_sets_marginals(spark, sf_dir):
    rows = _q("grouping_sets_agg", spark, sf_dir).collect()
    # three sets: rf marginal (g_ls=1), ls marginal (g_rf=1), full cross
    rf = [r for r in rows if r["g_rf"] == 0 and r["g_ls"] == 1]
    ls = [r for r in rows if r["g_rf"] == 1 and r["g_ls"] == 0]
    xx = [r for r in rows if r["g_rf"] == 0 and r["g_ls"] == 0]
    assert len(rf) + len(ls) + len(xx) == len(rows)  # no grand total set
    assert rf and ls and xx
    # each marginal's n equals the sum of its cross cells
    for m in rf:
        cells = [r for r in xx if r["l_returnflag"] == m["l_returnflag"]]
        assert m["n"] == sum(r["n"] for r in cells)
    assert sum(r["n"] for r in rf) == sum(r["n"] for r in ls)


def test_stream_psi_matches_independent(spark, sf_dir):
    """Streaming kernel output vs an independent batch recomputation in
    plain python (counts per (type, epoch-day) -> window-over-window
    PSI, open tail excluded)."""
    rows = {
        (r["event_type"], r["day"]): r
        for r in _q("stream_psi", spark, sf_dir).collect()
    }
    raw = duckdb.sql(f"""
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS INT), 0), 9) AS bin
        FROM '{sf_dir}/events.parquet'
    """).fetchall()
    counts = {}
    for et, day, b in raw:
        counts.setdefault(et, {}).setdefault(day, [0] * 10)[b] += 1
    expected = {}
    for et, days in counts.items():
        ordered = sorted(days)
        for prev_d, cur_d in zip(ordered, ordered[1:]):
            if cur_d == ordered[-1]:
                continue  # open tail: the stream can never close it
            prev, cur = days[prev_d], days[cur_d]
            nr, nc = sum(prev), sum(cur)
            psi = sum(
                ((ri + 0.5) / (nr + 5.0) - (ci + 0.5) / (nc + 5.0))
                * math.log(
                    ((ri + 0.5) / (nr + 5.0)) / ((ci + 0.5) / (nc + 5.0))
                )
                for ri, ci in zip(prev, cur)
            )
            expected[(et, cur_d)] = (nr, nc, psi)
    assert set(rows) == set(expected)
    for key, (nr, nc, psi) in expected.items():
        r = rows[key]
        assert r["n_prev"] == nr and r["n_cur"] == nc
        assert r["psi"] == pytest.approx(psi, abs=1e-6)
