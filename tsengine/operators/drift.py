"""Distribution-drift detection operators (round-8 engine extension).

A 100 TB training-data pipeline re-ingests continuously; the question
"did the data change under me?" is asked before every retrain.  Two
standard detectors over the ``events`` stream, comparing the earlier
half of the time range (reference window) against the later half
(current window) per event type:

* ``psi_drift`` — Population Stability Index over 10 fixed-width value
  bins with Laplace smoothing: ``sum_i (p_i - q_i) * ln(p_i / q_i)``
  (the credit-scoring drift metric; >0.2 is the conventional "shifted"
  threshold).
* ``ks_drift``  — two-sample Kolmogorov-Smirnov statistic
  ``D = max_v |F_ref(v) - F_cur(v)|`` evaluated exactly on the pooled
  empirical CDFs.

Engine-portability design (stricter than the ROUND(,6) convention):
both detectors aggregate INTEGER counts first — bin counts pivoted to
fixed columns (PSI), per-(type,value) half counts (KS) — so the only
float arithmetic is a fixed-shape scalar expression over exact
integers, textually identical in both engines (the
``metric_correlations`` mirrored-arithmetic rule, taken to the point
where no engine-ordered float SUM exists at all: PSI's 10 bin terms
add in explicit left-to-right literal order, and KS's max/abs/division
are order-independent).

Scale notes: PSI is ONE map-side-combinable hash agg over the scan
(constant 20-counter width per type), the ideal 100 TB shape.  KS's
ordered window runs over the per-(type, value) count table — bounded
by the VALUE DOMAIN (2dp readings => ~50k distinct per type), not by
event volume (the ``quantile_bucketize`` domain-bound argument); the
corpus-sized work is the (type, value) count agg.  The time-range
bounds are a 1-row broadcast agg in both detectors.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_PSI_BINS = 10
_PSI_WIDTH = 50.0
_PSI_EPS = 0.5  # Laplace smoothing: (n_i + eps) / (N + eps * bins)

_HALF_SQL = """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), e AS (
  SELECT event_type, value,
         CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS half
  FROM events CROSS JOIN bounds
)"""


def _halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + half flag: 0 = first half of the time range, 1 = second.
    epoch-microsecond integer arithmetic — exact and UTC both engines;
    the bounds are a 1-row broadcast agg."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        F.when(
            F.unix_micros("ts") * 2 <= F.col("lo") + F.col("hi"), 0
        )
        .otherwise(1)
        .alias("half"),
    )


def _psi_oracle() -> str:
    cnt = ",\n         ".join(
        f"CAST(SUM(CASE WHEN half = {h} AND bin = {i} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS {p}{i}"
        for h, p in ((0, "r"), (1, "c"))
        for i in range(_PSI_BINS)
    )
    n_ref = " + ".join(f"r{i}" for i in range(_PSI_BINS))
    n_cur = " + ".join(f"c{i}" for i in range(_PSI_BINS))
    denom = float(_PSI_EPS * _PSI_BINS)
    terms = " + ".join(
        f"(((r{i} + {_PSI_EPS}) / (n_ref + {denom})) - "
        f"((c{i} + {_PSI_EPS}) / (n_cur + {denom}))) "
        f"* ln(((r{i} + {_PSI_EPS}) / (n_ref + {denom})) / "
        f"((c{i} + {_PSI_EPS}) / (n_cur + {denom})))"
        for i in range(_PSI_BINS)
    )
    return f"""{_HALF_SQL}, binned AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(value / {_PSI_WIDTH}) AS INT), 0),
               {_PSI_BINS - 1}) AS bin,
         half
  FROM e
), c AS (
  SELECT event_type,
         {cnt}
  FROM binned GROUP BY 1
), t AS (
  SELECT *, {n_ref} AS n_ref, {n_cur} AS n_cur FROM c
)
SELECT event_type, n_ref, n_cur,
       ROUND({terms}, 6) AS psi
FROM t
"""


@register("psi_drift", _psi_oracle())
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first and
    second half of the time range: 10 fixed-width value bins (width 50,
    clamped to [0, 9] — ``length_histogram``'s fixed-width rule, never
    data-dependent edges), Laplace-smoothed proportions
    ``(n_i + 0.5) / (N + 5)`` so empty bins never hit ln(0).

    Value-exactness without ROUND-boundary risk: the agg produces 20
    INTEGER bin counters per type (one map-side-combinable hash agg —
    at 100 TB each task carries a constant 20-counter state per type,
    the best possible shape); the PSI itself is then a single scalar
    expression over those exact integers whose 10 terms add in literal
    left-to-right order in BOTH engines — no engine-ordered float
    accumulation anywhere."""
    e = _halves(spark, sf_dir)
    binned = e.select(
        "event_type",
        F.least(
            F.greatest(
                F.floor(F.col("value") / F.lit(_PSI_WIDTH)).cast("int"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        "half",
    )
    aggs = [
        F.sum(
            F.when((F.col("half") == h) & (F.col("bin") == i), 1).otherwise(0)
        ).alias(f"{p}{i}")
        for h, p in ((0, "r"), (1, "c"))
        for i in range(_PSI_BINS)
    ]
    c = binned.groupBy("event_type").agg(*aggs)
    t = c.withColumn(
        "n_ref", reduce(lambda x, y: x + y, [F.col(f"r{i}") for i in range(_PSI_BINS)])
    ).withColumn(
        "n_cur", reduce(lambda x, y: x + y, [F.col(f"c{i}") for i in range(_PSI_BINS)])
    )
    denom = float(_PSI_EPS * _PSI_BINS)

    def term(i: int):
        p = (F.col(f"r{i}") + F.lit(_PSI_EPS)) / (F.col("n_ref") + F.lit(denom))
        q = (F.col(f"c{i}") + F.lit(_PSI_EPS)) / (F.col("n_cur") + F.lit(denom))
        return (p - q) * F.log(p / q)

    psi = reduce(lambda x, y: x + y, [term(i) for i in range(_PSI_BINS)])
    return t.select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round(psi, 6).alias("psi"),
    )


_KS_ORACLE = f"""{_HALF_SQL}, c AS (
  SELECT event_type, value,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nc
  FROM e GROUP BY 1, 2
), cum AS (
  SELECT event_type, value,
         SUM(nr) OVER w AS cr,
         SUM(nc) OVER w AS cc,
         CAST(SUM(nr) OVER wp AS BIGINT) AS tot_ref,
         CAST(SUM(nc) OVER wp AS BIGINT) AS tot_cur
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY value),
         wp AS (PARTITION BY event_type)
)
SELECT event_type,
       ROUND(MAX(ABS(cr / NULLIF(CAST(tot_ref AS DOUBLE), 0.0)
                     - cc / NULLIF(CAST(tot_cur AS DOUBLE), 0.0))), 6)
         AS ks,
       tot_ref AS n_ref, tot_cur AS n_cur
FROM cum
GROUP BY event_type, tot_ref, tot_cur
"""


@register("ks_drift", _KS_ORACLE)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event type between
    the first and second half of the time range, evaluated EXACTLY on
    the pooled empirical CDFs: ``D = max_v |F_ref(v) - F_cur(v)|``
    with the sup taken at every observed value (the ordered-window
    default RANGE frame includes ties on both engines, which is
    precisely the CDF-at-v semantics).

    Engine-exactness: counts are integers; each CDF value is ONE
    division of exact bigints (identical op both engines); ABS and MAX
    are order-independent — so unlike a variance or a float SUM there
    is no engine-ordered accumulation to diverge.  NULLIF'd
    denominators return NULL (never an ANSI divide-by-zero error) when
    a half is empty for a type.

    Scale shape: the corpus-sized work is the per-(type, value) count
    agg (map-side combinable, one shuffle).  The ordered window then
    runs over the DOMAIN-bounded distinct-value table (2dp readings =>
    ~50k rows per type, the ``quantile_bucketize`` bound argument), so
    the |types|-partition parallelism collapse applies to a bounded
    input, not to raw events; the totals join broadcasts |types|
    rows."""
    e = _halves(spark, sf_dir)
    c = e.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nc"),
    )
    # per-type totals as a partition-only window STACKED on the ordered
    # window's exchange (the mad_outliers pattern) — a separate totals
    # agg + join would recompute c from the scan (Catalyst does not
    # reuse the agg subtree across the two consumers; verified: 4 scans
    # vs 2 with this form)
    w = Window.partitionBy("event_type").orderBy("value")
    wp = Window.partitionBy("event_type")
    cum = c.select(
        "event_type",
        "value",
        F.sum("nr").over(w).alias("cr"),
        F.sum("nc").over(w).alias("cc"),
        F.sum("nr").over(wp).alias("tot_ref"),
        F.sum("nc").over(wp).alias("tot_cur"),
    )
    d = F.abs(
        F.col("cr") / F.nullif(F.col("tot_ref").cast("double"), F.lit(0.0))
        - F.col("cc") / F.nullif(F.col("tot_cur").cast("double"), F.lit(0.0))
    )
    return (
        cum.groupBy("event_type", "tot_ref", "tot_cur")
        .agg(F.round(F.max(d), 6).alias("ks"))
        .select(
            "event_type",
            "ks",
            F.col("tot_ref").alias("n_ref"),
            F.col("tot_cur").alias("n_cur"),
        )
    )


@register(
    "embedding_drift",
    """
WITH x AS (
  SELECT vec_id % 2 AS half,
         CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
agg AS (
  SELECT dim,
         COUNT(CASE WHEN half = 0 THEN 1 END) AS nr,
         SUM(CASE WHEN half = 0 THEN x END) AS sr,
         SUM(CASE WHEN half = 0 THEN x * x END) AS qr,
         COUNT(CASE WHEN half = 1 THEN 1 END) AS nc,
         SUM(CASE WHEN half = 1 THEN x END) AS sc,
         SUM(CASE WHEN half = 1 THEN x * x END) AS qc
  FROM x GROUP BY dim
)
SELECT dim, nr AS n_ref, nc AS n_cur,
       ROUND(sr / nr, 6) AS mean_ref,
       ROUND(sc / nc, 6) AS mean_cur,
       ROUND(sc / nc - sr / nr, 6) AS shift,
       ROUND((sc / nc - sr / nr)
             / sqrt((qr - sr * sr / nr) / (nr - 1) / nr
                    + (qc - sc * sc / nc) / (nc - 1) / nc), 6) AS shift_z
FROM agg
""",
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean-shift drift between two embedding
    populations (reference = even vec_id, current = odd — the
    deterministic split a reader can reproduce; swap in "last ingest
    vs corpus" in production): for each of the 64 dimensions, the two
    means, the raw shift, and Welch's z = shift / sqrt(vr/nr + vc/nc)
    — the vector-space companion of ``psi_drift``/``ks_drift``
    (scalar detectors can't see an embedding model's drift; a
    re-embedded or fine-tuned encoder moves per-dimension means long
    before any scalar metric reacts).

    Scale shape: ONE posexplode projection -> ONE map-side-combinable
    hash agg to exactly 64 rows (six conditional aggregates per dim);
    nothing else.  The six sums are engine-order-dependent floats, so
    every emitted value is ROUND(,6)-canonicalized at the output
    boundary (the standing policy for order-dependent SUM/AVG;
    verified at sf0.01 AND sf0.1), and the z expression tree is
    textually identical in both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    half0 = F.col("half") == 0
    agg = emb.groupBy("dim").agg(
        F.sum(F.when(half0, 1).otherwise(0)).alias("nr"),
        F.sum(F.when(half0, F.col("x"))).alias("sr"),
        F.sum(F.when(half0, F.col("x") * F.col("x"))).alias("qr"),
        F.sum(F.when(~half0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(~half0, F.col("x"))).alias("sc"),
        F.sum(F.when(~half0, F.col("x") * F.col("x"))).alias("qc"),
    )
    mr = F.col("sr") / F.col("nr")
    mc = F.col("sc") / F.col("nc")
    vr = (F.col("qr") - F.col("sr") * F.col("sr") / F.col("nr")) / (
        F.col("nr") - 1
    )
    vc = (F.col("qc") - F.col("sc") * F.col("sc") / F.col("nc")) / (
        F.col("nc") - 1
    )
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("nr").alias("n_ref"),
        F.col("nc").alias("n_cur"),
        F.round(mr, 6).alias("mean_ref"),
        F.round(mc, 6).alias("mean_cur"),
        F.round(mc - mr, 6).alias("shift"),
        F.round(
            (mc - mr) / F.sqrt(vr / F.col("nr") + vc / F.col("nc")), 6
        ).alias("shift_z"),
    )
