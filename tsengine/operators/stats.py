"""Time-series statistics operators (round-6 engine extension).

The reference's analysis surface is fixed-length sensor windows fed to
contrastive encoders (`unsupervised.py`, `exercise provided.ipynb`);
what it never grew — and what any production time-series engine needs
next to those — is the classical diagnostics layer: autocorrelation,
seasonal decomposition, robust outlier detection, and sequential
changepoint detection.  All five are expressed as declarative DataFrame
plans over the driver's ``events`` table:

* ``acf_lags`` — per-user autocorrelation at lags 1..3.  Two window
  passes over one ``user_id`` shuffle (mean-centering, then LAG), then
  a map-side-combinable agg: a single-exchange plan whose per-row state
  is O(lags).
* ``metric_correlations`` — the per-user event-type profile (manual
  conditional pivot, one hash agg) reduced by Pearson ``corr`` for all
  type pairs; output cardinality is |type pairs|, never |users|.
* ``seasonal_decompose`` — additive trend/seasonal/residual split on
  the (day, hour) grid: three tiny aggs, the trend and seasonal sides
  broadcast back onto the 720-row grid.
* ``mad_outliers`` — median/MAD robust z-scores (the outlier rule that
  survives the heavy tails that break ``zscore_outliers``' moment
  estimates); exact interpolated percentiles on both engines.
* ``cusum_changepoint`` — one-sided standardized CUSUM drift detector,
  evaluated as a *sequential left fold over the time-ordered prefix*
  on BOTH engines (Spark ``aggregate``, DuckDB ``list_reduce`` — the
  bit-identical-recurrence technique proven by ``ema_smooth``).
* ``length_histogram`` — fixed-width document-length profile; pure
  integer bucketing, one map-side agg.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

# ---------------------------------------------------------------------------
# autocorrelation
# ---------------------------------------------------------------------------


@register(
    "acf_lags",
    """
WITH d AS (
  SELECT user_id, ts, event_id,
         value - AVG(value) OVER (PARTITION BY user_id) AS dev
  FROM events
), l AS (
  SELECT user_id, dev,
         LAG(dev, 1) OVER w AS d1,
         LAG(dev, 2) OVER w AS d2,
         LAG(dev, 3) OVER w AS d3
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       ROUND(SUM(dev * d1) / SUM(dev * dev), 6) AS acf1,
       ROUND(SUM(dev * d2) / SUM(dev * dev), 6) AS acf2,
       ROUND(SUM(dev * d3) / SUM(dev * dev), 6) AS acf3
FROM l GROUP BY 1
""",
)
def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation function at lags 1-3:
    ``acf_k = sum(dev_t * dev_{t-k}) / sum(dev_t^2)`` with the series
    mean-centered over the full history and ordered by (ts, event_id).

    Plan shape: ONE shuffle on user_id serves both window passes (the
    centering window and the LAG window share the partitioning; the
    second adds only an in-partition sort) and the final groupBy is
    partial-aggregated map-side.  Per-row state is O(lags) — at 100 TB
    the cost is the single user_id exchange, same as any per-entity
    feature.  SUM accumulation order is engine-dependent, hence the
    ROUND(,6) guard (repo float policy)."""
    ev = load_table(spark, sf_dir, "events")
    part = Window.partitionBy("user_id")
    seq = part.orderBy("ts", "event_id")
    dev = F.col("value") - F.avg("value").over(part)
    d = ev.select("user_id", "ts", "event_id", dev.alias("dev"))
    lagged = d.select(
        "user_id",
        "dev",
        *[F.lag("dev", k).over(seq).alias(f"d{k}") for k in (1, 2, 3)],
    )
    den = F.sum(F.col("dev") * F.col("dev"))
    return lagged.groupBy("user_id").agg(
        *[
            F.round(F.sum(F.col("dev") * F.col(f"d{k}")) / den, 6).alias(f"acf{k}")
            for k in (1, 2, 3)
        ]
    )


# ---------------------------------------------------------------------------
# cross-metric correlation matrix
# ---------------------------------------------------------------------------


@register(
    "metric_correlations",
    """
WITH p AS (
  SELECT user_id,
         AVG(value) FILTER (WHERE event_type = 'click') AS click,
         AVG(value) FILTER (WHERE event_type = 'error') AS error,
         AVG(value) FILTER (WHERE event_type = 'purchase') AS purchase,
         AVG(value) FILTER (WHERE event_type = 'signup') AS signup,
         AVG(value) FILTER (WHERE event_type = 'view') AS view
  FROM events GROUP BY 1
), c AS (
  SELECT """
    + ",\n         ".join(
        # mirror Spark's exact op sequence (covar_samp / (sx*sy) with a
        # NULLIF'd denominator) rather than CORR(): the quotients are
        # mathematically equal but not bit-identical, and a value on a
        # 6dp rounding boundary could flip (ADVICE r7) — identical
        # arithmetic in both engines removes the probabilistic risk.
        f"ROUND(COVAR_SAMP({a}, {b}) / "
        f"NULLIF(STDDEV_SAMP({a}) * STDDEV_SAMP({b}), 0), 6) AS {a}_{b}"
        for a, b in itertools.combinations(_EVENT_TYPES, 2)
    )
    + """
  FROM p
)
"""
    + "\nUNION ALL\n".join(
        f"SELECT '{a}' AS m1, '{b}' AS m2, {a}_{b} AS corr FROM c"
        for a, b in itertools.combinations(_EVENT_TYPES, 2)
    ),
)
def metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix across per-user metric profiles: one
    conditional-pivot hash agg to |users| rows x |types| columns, then a
    single global CORR agg per type pair, unpivoted to (m1, m2, corr)
    rows.

    Output cardinality is C(|types|, 2) = 10 — the reduce side is a
    constant-width single row regardless of data scale; the only
    shuffle is the user_id agg.  Engine-ordered co-moment accumulation
    => ROUND(,6)."""
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(
        *[
            F.avg(F.when(F.col("event_type") == t, F.col("value"))).alias(t)
            for t in _EVENT_TYPES
        ]
    )
    pairs = list(itertools.combinations(_EVENT_TYPES, 2))

    # Degenerate-input guard (ADVICE r6, hardened for ANSI): on a
    # zero-variance metric, F.corr's final ck/sqrt(xMk*yMk) divides by
    # zero — NaN in non-ANSI mode (vs DuckDB's NULL), and a hard
    # DIVIDE_BY_ZERO *error* under Spark 4's default ANSI session (the
    # driver's vanilla harness).  Rebuilding the same quotient from
    # covar_samp/stddev_samp with a NULLIF'd denominator yields NULL in
    # both engines and never divides by zero; the arithmetic is the
    # identical co-moment ratio (ck/(n-1)) / sqrt(xMk/(n-1) * yMk/(n-1))
    # so the 6dp-rounded values are unchanged on non-degenerate input.
    # The oracle mirrors the same COVAR_SAMP/STDDEV_SAMP/NULLIF
    # expression (not CORR) so both engines run the identical op
    # sequence — no ulp-at-the-rounding-boundary exposure (ADVICE r7).
    def _corr(a, b):
        den = F.nullif(
            F.stddev_samp(a) * F.stddev_samp(b), F.lit(0.0)
        )
        return F.covar_samp(a, b) / den

    wide = prof.agg(
        *[F.round(_corr(a, b), 6).alias(f"{a}_{b}") for a, b in pairs]
    )
    stack_args = ", ".join(f"'{a}', '{b}', {a}_{b}" for a, b in pairs)
    return wide.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (m1, m2, corr)")
    )


# ---------------------------------------------------------------------------
# seasonal decomposition
# ---------------------------------------------------------------------------


@register(
    "seasonal_decompose",
    """
WITH y AS (
  SELECT CAST(ts AS DATE) AS d, CAST(EXTRACT(hour FROM ts) AS INT) AS h,
         AVG(value) AS y
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT d, AVG(y) AS trend FROM y GROUP BY 1
), se AS (
  SELECT h, AVG(y.y - tr.trend) AS seasonal
  FROM y JOIN tr USING (d) GROUP BY 1
)
SELECT y.d, y.h, ROUND(y.y, 6) AS y, ROUND(tr.trend, 6) AS trend,
       ROUND(se.seasonal, 6) AS seasonal,
       ROUND(y.y - tr.trend - se.seasonal, 6) AS resid
FROM y JOIN tr USING (d) JOIN se USING (h)
""",
)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition on the (day, hour-of-day) grid:
    ``y = trend(day) + seasonal(hour) + resid``, with trend the daily
    mean and seasonal the cross-day mean of the detrended hourly series
    (the classical one-pass additive split; a moving-average trend is a
    windowed variant of the same plan).

    Scale shape: the raw events reduce IMMEDIATELY to the
    days x 24 grid (one hash agg with map-side combine — the only
    data-sized shuffle); trend (|days| rows) and seasonal (24 rows) are
    grid-sized aggregates that AQE broadcasts back onto the grid.  At
    100 TB the post-agg plan is constant-size regardless of input."""
    ev = load_table(spark, sf_dir, "events")
    y = ev.groupBy(
        F.to_date("ts").alias("d"), F.hour("ts").alias("h")
    ).agg(F.avg("value").alias("y"))
    tr = y.groupBy("d").agg(F.avg("y").alias("trend"))
    se = (
        y.join(tr, "d")
        .groupBy("h")
        .agg(F.avg(F.col("y") - F.col("trend")).alias("seasonal"))
    )
    return (
        y.join(tr, "d")
        .join(se, "h")
        .select(
            "d",
            "h",
            F.round("y", 6).alias("y"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("y") - F.col("trend") - F.col("seasonal"), 6
            ).alias("resid"),
        )
    )


# ---------------------------------------------------------------------------
# robust (median/MAD) outliers
# ---------------------------------------------------------------------------


@register(
    "mad_outliers",
    """
WITH s AS (
  SELECT event_id, user_id, value,
         quantile_disc(value, 0.5) OVER (PARTITION BY user_id) AS med
  FROM events
), m AS (
  SELECT *, quantile_disc(ABS(value - med), 0.5)
                OVER (PARTITION BY user_id) AS mad
  FROM s
)
SELECT event_id, user_id,
       (value - med) / (CAST('1.4826' AS DOUBLE) * NULLIF(mad, 0)) AS rz
FROM m
WHERE ABS((value - med) / (CAST('1.4826' AS DOUBLE) * NULLIF(mad, 0))) > 3.5
   OR (mad = 0 AND value <> med)
""",
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outliers: |value - median| / (1.4826 * MAD) >
    3.5 (Iglewicz-Hoaglin modified z-score with the DISCRETE lower
    median).  The moment-free sibling of ``zscore_outliers`` — a
    single 400x outlier inflates a user's mean AND std enough to mask
    itself from the z-rule; the median/MAD rule is 50%-breakdown
    robust.

    Bit-exactness (r9 — the last member of the interpolated-quantile
    exposure class, after winsorize/theil_sen/quantile_bucketize):
    both medians are RANK SELECTIONS (value at 1-based rank ceil(n/2),
    Spark window rank == DuckDB ``quantile_disc``) — actual elements
    of identical multisets, so med, mad, and therefore every rz
    (one subtract, one multiply by the strtod-parsed 1.4826 literal,
    one divide — identical single IEEE ops) are bit-identical across
    engines.  That makes the |rz| > 3.5 row-membership test
    deterministic and lets rz ship UNROUNDED: the interpolated+ROUND(4)
    form risked both a tied-rank ulp divergence (see ``_interp``) and
    the .5-boundary ROUND divergence.  (The oracle casts '1.4826'
    from a string: DuckDB binds bare numeric literals as DECIMAL,
    whose double conversion is not guaranteed to match strtod.)

    All four windows (two rank/count pairs + the med/mad selections)
    stack over the SAME user_id partitioning — ONE exchange, a single
    events scan, no joins (preserving the r7 rewrite's shape; the
    former agg-join-agg-join form re-scanned events three times and
    measured 9.1x at the 100x tier vs 4.1x).  At 100 TB the per-user
    rank is a sort-within-user bounded by per-user history; the
    registered approx twin family (``group_quantiles_approx``) is the
    sketch path for heavy groups.

    Degenerate-scale guard (ADVICE r6): when a user's MAD is 0 (>=50%
    of their values equal the median) the modified z-score is
    undefined — formally ANY deviation from the median is infinitely
    many MADs out.  Both engines emit rz = NULL (NULLIF'd divisor, no
    silent x/0 drop) and flag every value != median for that user, so
    a spike in a constant-history user is never silently swallowed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")

    def disc_median(df: DataFrame, col: str, out: str) -> DataFrame:
        # lower median as a windowed rank selection: rn over the value
        # order, n over the partition, then MAX(value at the target
        # rank) broadcast back to every row — three Window operators,
        # all sharing the one user_id exchange
        wo = Window.partitionBy("user_id").orderBy(col)
        return (
            df.withColumn("_rn", F.row_number().over(wo))
            .withColumn("_n", F.count(F.lit(1)).over(w))
            .withColumn(
                out,
                F.max(
                    F.when(
                        F.col("_rn") == F.expr("(_n + 1) div 2"), F.col(col)
                    )
                ).over(w),
            )
            .drop("_rn", "_n")
        )

    df = disc_median(
        ev.select("event_id", "user_id", "value"), "value", "med"
    )
    df = df.withColumn("_dev", F.abs(F.col("value") - F.col("med")))
    df = disc_median(df, "_dev", "mad")
    rz = (F.col("value") - F.col("med")) / (
        F.lit(1.4826) * F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        df.filter(
            (F.abs(rz) > 3.5)
            | ((F.col("mad") == 0.0) & (F.col("value") != F.col("med")))
        )
        .select("event_id", "user_id", rz.alias("rz"))
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

_CUSUM_K = 0.5  # slack (in sigma units) absorbed per step
_CUSUM_H = 4.0  # detection threshold


@register(
    "cusum_changepoint",
    f"""
WITH st AS (
  SELECT user_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY 1
), z AS (
  SELECT e.user_id, e.ts, e.event_id,
         ROUND((e.value - st.mu) / st.sigma, 6) AS z
  FROM events e JOIN st USING (user_id)
), a AS (
  SELECT user_id, list(z ORDER BY ts, event_id) AS arr FROM z GROUP BY 1
)
SELECT * FROM (
  SELECT user_id, CAST(p - 1 AS INT) AS t,
         list_reduce(list_prepend(0.0, arr[1:p]),
                     (acc, x) -> GREATEST(0.0, acc + x - {_CUSUM_K})) AS s
  FROM a, UNNEST(range(1, len(arr) + 1)) AS u(p)
) WHERE s > {_CUSUM_H}
""",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided standardized CUSUM drift detector per user:
    ``S_t = max(0, S_{{t-1}} + z_t - k)``, flag when ``S_t > h``
    (Page's sequential test; k=0.5 sigma slack, h=4 threshold).

    The recurrence is evaluated as a *sequential left fold over the
    time-ordered prefix* on BOTH engines (Spark ``aggregate``, DuckDB
    ``list_reduce`` over the identical ``greatest(0, acc + z - k)``
    step), the bit-identical-recurrence technique proven by
    ``ema_smooth`` — so no final rounding is needed or wanted.  The z
    inputs ARE rounded (6dp) first: mu/sigma come from engine-ordered
    sums, and pinning the fold's inputs pins every downstream bit.
    O(L^2) per user is bounded by per-user history at test scale; the
    O(L) production form is a single ordered pass per user
    (`applyInPandas` or the streaming stateful path — cf.
    tsengine/streaming/stateful.py), same semantics."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = ev.join(st, "user_id").select(
        "user_id",
        "ts",
        "event_id",
        F.round(
            (F.col("value") - F.col("mu")) / F.col("sigma"), 6
        ).alias("z"),
    )
    a = z.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "z")))
        .getField("z")
        .alias("arr")
    )
    folds = F.transform(
        F.sequence(F.lit(1), F.size("arr")),
        lambda p: F.aggregate(
            F.slice("arr", F.lit(1), p),
            F.lit(0.0),
            lambda acc, x: F.greatest(F.lit(0.0), acc + x - F.lit(_CUSUM_K)),
        ),
    )
    return (
        a.select("user_id", F.posexplode(folds).alias("t", "s"))
        .filter(F.col("s") > _CUSUM_H)
        .select("user_id", F.col("t").cast("int").alias("t"), "s")
    )


# ---------------------------------------------------------------------------
# document length histogram
# ---------------------------------------------------------------------------


@register(
    "length_histogram",
    """
SELECT CAST(n_chars // 64 AS INT) AS bucket,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM documents GROUP BY 1
""",
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (64-char) document-length histogram — the corpus
    profile a data-curation pass reads before choosing chunking and
    packing parameters (cf. ``doc_chunk`` / ``pack_sequences``).

    Pure integer bucketing (no float log2 whose exact-power-of-two
    edges would be engine-fragile) over the two pushed-down columns;
    one map-side-combinable agg to ~|range|/64 rows."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.floor(F.col("n_chars") / 64).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
    )
