"""Event-time window aggregations and temporal joins over the
``events`` stream table (engine extension — the reference has no
explicit-time operators, its time is array position; SURVEY.md §2
Part B "Streaming" row, designed Spark-native).

Batch forms here (oracle-checked); the Structured Streaming twins
(readStream + watermark) live in :mod:`tsengine.streaming.windows`.

Portability: window boundaries are computed in *epoch-second integer
arithmetic* (truncating casts on both engines), never engine-specific
window structs, and emitted as epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_HOUR = 3600
_SLIDE = 1800  # 30 min
_GAP = 1800  # session gap 30 min


def _events_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + integer epoch seconds (truncated, matching DuckDB's
    FLOOR(epoch(ts)))."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("es", F.col("ts").cast("long"))


@register(
    "tumbling_window_agg",
    f"""
SELECT user_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) // {_HOUR} * {_HOUR} AS win_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per user — the batch twin of
    ``groupBy(window(ts, '1 hour'))`` (streaming version in
    tsengine.streaming).  One hash aggregation; window start is a pure
    projection so partial aggs apply."""
    ev = _events_es(spark, sf_dir)
    return ev.groupBy(
        "user_id",
        (F.floor(F.col("es") / _HOUR) * _HOUR).alias("win_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "sliding_window_agg",
    f"""
SELECT user_id,
       (CAST(FLOOR(epoch(ts)) AS BIGINT) // {_SLIDE} - k.k) * {_SLIDE} AS win_start,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value
FROM events CROSS JOIN (SELECT unnest(range(0, {_HOUR // _SLIDE})) AS k) k
GROUP BY 1, 2
""",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event expands
    to length/slide window memberships (the exact expansion Spark's
    ``window()`` performs), then one aggregation."""
    ev = _events_es(spark, sf_dir)
    k = spark.range(_HOUR // _SLIDE).select(F.col("id").alias("k"))
    return (
        ev.crossJoin(F.broadcast(k))
        .groupBy(
            "user_id",
            ((F.floor(F.col("es") / _SLIDE) - F.col("k")) * _SLIDE).alias("win_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "session_window_agg",
    f"""
WITH ordered AS (
  SELECT user_id, event_id, value, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
         LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > {_GAP} THEN 1 ELSE 0 END AS is_start
  FROM ordered
),
sessioned AS (
  SELECT *, CAST(SUM(is_start) OVER
    (PARTITION BY user_id ORDER BY es, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(es) AS session_start, MAX(es) AS session_end,
       ROUND(SUM(value), 6) AS sum_value
FROM sessioned GROUP BY 1, 2
""",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via gaps-and-islands:
    LAG marks session starts, a running SUM numbers sessions — the
    batch twin of ``session_window(ts, '30 minutes')`` / the streaming
    ``applyInPandasWithState`` sessionizer.  Two window passes over the
    same (user_id, time) partitioning — one shuffle."""
    ev = _events_es(spark, sf_dir)
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id", "event_id", "value", "es", F.lag("es").over(w_lag).alias("prev_es")
    ).withColumn(
        "is_start",
        F.when(
            F.col("prev_es").isNull() | (F.col("es") - F.col("prev_es") > _GAP), 1
        ).otherwise(0),
    )
    sessioned = marked.withColumn("session_id", F.sum("is_start").over(w_cum))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("es").alias("session_start"),
        F.max("es").alias("session_end"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "asof_join",
    """
WITH purchases AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value
  FROM events WHERE event_type = 'purchase'
),
errors AS (
  SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id,
       ROUND(MAX_BY(p.value, p.es * 100000000 + p.event_id), 6) AS last_purchase_value
FROM errors e LEFT JOIN purchases p
  ON e.user_id = p.user_id AND p.es <= e.es
GROUP BY e.event_id, e.user_id
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'error' event enriched with the most recent
    prior 'purchase' value of the same user (SURVEY.md §2 Part B: the
    standard TS capability the reference lacks).

    Spark has no ASOF JOIN operator; the scalable idiom is the
    union + conditional last_value(ignoreNulls) trick: union both
    streams, order by time within user, carry the last purchase value
    forward — ONE shuffle on user_id, no range join, no skew blowup
    (the DuckDB oracle uses its native ASOF JOIN as an independent
    implementation)."""
    ev = _events_es(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "es", F.col("event_id").alias("order_id"), "value",
        F.lit(0).alias("is_probe"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "es", F.col("event_id").alias("order_id"),
        F.lit(None).cast("double").alias("value"), F.lit(1).alias("is_probe"),
    )
    unioned = purchases.unionByName(errors)
    # at equal es: purchases sort before the probing error (inclusive
    # p.es <= e.es), and ties among purchases break on event_id — the
    # same deterministic rule the oracle's MAX_BY key encodes
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "is_probe", "order_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_purchase_value", F.last("value", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_probe") == 1).select(
        F.col("order_id").alias("event_id"),
        "user_id",
        F.round("last_purchase_value", 6).alias("last_purchase_value"),
    )


@register(
    "range_join",
    f"""
WITH es_events AS (
  SELECT event_id, user_id, event_type, value,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
  FROM events
)
SELECT e.event_id, e.user_id,
       CAST(COUNT(n.event_id) AS BIGINT) AS n_nearby,
       ROUND(COALESCE(SUM(n.value), 0.0), 6) AS nearby_value
FROM es_events e
LEFT JOIN es_events n
  ON e.user_id = n.user_id AND n.event_id <> e.event_id
 AND n.es BETWEEN e.es - 900 AND e.es + 900
WHERE e.event_type = 'error'
GROUP BY 1, 2
""",
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events of the same user within ±15 min of
    each 'error' event.  Equi-key on user_id keeps it a hash join with
    a range residual — never a cartesian; at scale add time-bucket
    blocking to bound the per-key fan-in."""
    ev = _events_es(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "es"
    )
    e = ev.filter(F.col("event_type") == "error").alias("e")
    n = ev.alias("n")
    joined = e.join(
        n,
        (F.col("e.user_id") == F.col("n.user_id"))
        & (F.col("n.event_id") != F.col("e.event_id"))
        & (F.col("n.es") >= F.col("e.es") - 900)
        & (F.col("n.es") <= F.col("e.es") + 900),
        "left",
    )
    return joined.groupBy(
        F.col("e.event_id").alias("event_id"), F.col("e.user_id").alias("user_id")
    ).agg(
        F.count(F.col("n.event_id")).alias("n_nearby"),
        F.round(F.coalesce(F.sum(F.col("n.value")), F.lit(0.0)), 6).alias(
            "nearby_value"
        ),
    )


@register(
    "gapfill_interpolate",
    f"""
WITH g AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // {_HOUR} AS hb,
         ROUND(AVG(value), 6) AS v
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(hb) AS mn, MAX(hb) AS mx FROM g GROUP BY 1),
fullg AS (SELECT user_id, unnest(range(mn, mx + 1)) AS hb FROM spans),
j AS (SELECT f.user_id, f.hb, g.v
      FROM fullg f LEFT JOIN g ON f.user_id = g.user_id AND f.hb = g.hb),
w AS (
  SELECT user_id, hb, v,
    last_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS) OVER back AS ph,
    last_value(CASE WHEN v IS NOT NULL THEN v  END IGNORE NULLS) OVER back AS pv,
    first_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS) OVER fwd AS nh,
    first_value(CASE WHEN v IS NOT NULL THEN v  END IGNORE NULLS) OVER fwd AS nv
  FROM j
  WINDOW back AS (PARTITION BY user_id ORDER BY hb
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY user_id ORDER BY hb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hb * {_HOUR} AS win_start,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + ((nv - pv) * (hb - ph)) / (nh - ph) END AS value,
       CAST(v IS NULL AS INT) AS is_gap
FROM w
""",
)
def gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling with linear interpolation (the
    TimescaleDB ``time_bucket_gapfill`` + ``interpolate`` shape): per
    user, hourly buckets of mean value over the full [min, max] bucket
    span, with missing buckets synthesized and linearly interpolated
    between the nearest observed neighbours.  Wearable streams have
    exactly these gaps (device off-wrist), so this is the engine-native
    repair step in front of the window derivation.

    Scale shape: one aggregation (user x hour — partial aggs apply),
    then ONE lead() window over the *observed* buckets only, and the
    gap grid is exploded per observation span with the interpolation
    computed inline.  The earlier formulation (left join of the
    observed buckets onto a pre-exploded full grid + two
    forward/backward fill windows) sorted and joined the full grid —
    ~10-100x more rows than the observations; measured 14.6s -> ~1s at
    sf0.1 with identical output.  Portability: bucket arithmetic is
    integer; bucket means ROUND to 6dp BEFORE interpolation; the
    interpolation formula is then identical double arithmetic on
    identical inputs in both engines (no output rounding needed)."""
    ev = _events_es(spark, sf_dir)
    g = ev.groupBy(
        "user_id", F.floor(F.col("es") / _HOUR).alias("hb")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    wlead = Window.partitionBy("user_id").orderBy("hb")
    g2 = g.withColumn("nh", F.lead("hb").over(wlead)).withColumn(
        "nv", F.lead("v").over(wlead)
    )
    # each observed bucket owns the half-open span [hb, next observed);
    # the last observation owns just itself — together exactly the
    # oracle's MIN..MAX full grid
    span_end = F.coalesce(F.col("nh") - 1, F.col("hb"))
    rows = g2.select(
        "user_id",
        "hb",
        "v",
        "nh",
        "nv",
        F.explode(F.sequence(F.col("hb"), span_end)).alias("k"),
    )
    is_gap = F.col("k") > F.col("hb")
    interp = F.col("v") + (
        (F.col("nv") - F.col("v")) * (F.col("k") - F.col("hb"))
    ) / (F.col("nh") - F.col("hb"))
    return rows.select(
        "user_id",
        (F.col("k") * _HOUR).alias("win_start"),
        F.when(is_gap, interp).otherwise(F.col("v")).alias("value"),
        is_gap.cast("int").alias("is_gap"),
    )


@register(
    "scd2_intervals",
    """
WITH ordered AS (
  SELECT user_id, event_type, value, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
         event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_type IS NULL OR event_type <> prev_type THEN 1 ELSE 0 END AS is_change
  FROM ordered
),
runs AS (
  SELECT *, CAST(SUM(is_change) OVER
    (PARTITION BY user_id ORDER BY es, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM marked
)
SELECT user_id, version, event_type,
       MIN(es) AS valid_from, MAX(es) AS valid_to,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM runs GROUP BY 1, 2, 3
""",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval builder: compress each user's event stream
    into maximal runs of unchanged ``event_type``, versioned in time
    order with [valid_from, valid_to] bounds — the standard
    dimension-history shape a training-data pipeline keeps for
    point-in-time-correct joins (pair with ``asof_join`` to read the
    attribute as-of any timestamp).

    Gaps-and-islands, like ``session_window_agg`` but change-driven
    rather than gap-driven: LAG marks attribute changes, a running SUM
    numbers versions, one grouped agg closes the intervals.  All three
    passes share the (user_id, time) partitioning — ONE shuffle, and
    user_id cardinality grows with the data so the windows stay
    balanced at 100 TB (no partition-less window anywhere)."""
    ev = _events_es(spark, sf_dir)
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "event_type",
        "value",
        "es",
        "event_id",
        F.lag("event_type").over(w_lag).alias("prev_type"),
    ).withColumn(
        "is_change",
        F.when(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type")),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn("version", F.sum("is_change").over(w_cum))
    return runs.groupBy("user_id", "version", "event_type").agg(
        F.min("es").alias("valid_from"),
        F.max("es").alias("valid_to"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
