"""Spectral features (SURVEY.md §2 A.2 `fft_mag`, `channel_concat`).

The reference computes |FFT(x)| along the time axis per channel
(`TS_CPC.py:70-71`, `S_CPC.py:69-70`) and concatenates temporal +
spectral channel sets (`TS_CPC.py:73`).

Production path: Arrow-vectorized pandas_udf over the wide form (numpy
rfft — one batch = thousands of windows, no shuffle).  Oracle path: at
bounded seq_len the naive DFT *is* SQL — sqrt(Σx·cos² + Σx·sin²)
grouped by frequency — so correctness is hash-checkable (SURVEY.md §2
A.2 fft_mag row).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tsengine.operators.fuse import FUSED_CTE, fused_nonzero
from tsengine.oracle.frags import with_ctes
from tsengine.registry import register
from tsengine.sources.wearable import SEQ_LEN, wearable_wide

_N_FREQ = SEQ_LEN // 2 + 1  # rfft bins


def _rfft_mag_fn(arr: pd.Series) -> pd.Series:
    """|rfft(x)| per row — numpy over Arrow batches (the 10-100x-over-
    row-UDF path; SURVEY.md §2 A.9)."""
    mat = np.stack(arr.values).astype(np.float64)
    mag = np.abs(np.fft.rfft(mat, axis=1))
    return pd.Series(list(mag))


_rfft_mag_udf = None


def _rfft_mag(col):
    # created lazily: pandas_udf type resolution needs an active session
    global _rfft_mag_udf
    if _rfft_mag_udf is None:
        _rfft_mag_udf = pandas_udf(_rfft_mag_fn, "array<double>")
    return _rfft_mag_udf(col)


@register(
    "fft_mag",
    with_ctes()
    + f"""
SELECT w.window_id, k.k,
       ROUND(SQRT(POW(SUM(w.ibi * COS(2 * PI() * k.k * w.t / {SEQ_LEN})), 2)
                + POW(SUM(w.ibi * SIN(2 * PI() * k.k * w.t / {SEQ_LEN})), 2)), 2) AS mag
FROM wearable_long w
CROSS JOIN (SELECT unnest(range(0, {_N_FREQ})) AS k) k
GROUP BY 1, 2
""",
)
def fft_mag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FFT magnitude of each window's ibi sequence.

    Spark side: numpy rfft in a pandas_udf (vectorized, Arrow);
    oracle side: O(L²) naive DFT in SQL.  Parseval parity between the
    two is additionally property-tested (tests/test_timeseries.py).
    Rounded to 2 decimals: magnitudes are O(1e4-1e5), so this still
    pins ~7 significant digits while absorbing libm/summation-order
    last-ulp differences."""
    wide = wearable_wide(spark, sf_dir)
    mags = wide.select(
        "window_id", _rfft_mag(F.col("ibi").cast("array<double>")).alias("mags")
    )
    return mags.select(
        "window_id", F.posexplode("mags").alias("k", "mag")
    ).select("window_id", F.col("k").cast("bigint"), F.round("mag", 2).alias("mag"))


# spectral magnitudes of the *fused sparse channels* — computed the same
# relational way on both sides (zero entries contribute nothing to the
# DFT sums, so only non-zero fused entries participate)
_SPEC_CTE = f"""
spec AS (
  SELECT f.window_id, CAST(k.k AS INT) AS t, f.c + 16 AS c,
         ROUND(SQRT(POW(SUM(f.x * COS(2 * PI() * k.k * f.t / {SEQ_LEN})), 2)
                  + POW(SUM(f.x * SIN(2 * PI() * k.k * f.t / {SEQ_LEN})), 2)), 2) AS x
  FROM fused f
  CROSS JOIN (SELECT unnest(range(0, {SEQ_LEN})) AS k) k
  WHERE f.x <> 0.0
  GROUP BY 1, 2, 3
)"""


@register(
    "channel_concat",
    with_ctes(FUSED_CTE, _SPEC_CTE)
    + """
SELECT window_id, t, c, ROUND(x, 2) AS x FROM fused WHERE x <> 0.0
UNION ALL
SELECT window_id, t, c, x FROM spec
""",
)
def channel_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate temporal (c 0-15) + spectral (c 16-31) channel sets
    (reference `TS_CPC.py:73`: torch.cat along the channel dim).
    Relationally: UNION ALL of the two channel families with an offset
    channel index."""
    fused = fused_nonzero(spark, sf_dir)
    temporal = fused.select(
        "window_id", "t", "c", F.round("x", 2).alias("x")
    )
    k = spark.range(SEQ_LEN).select(F.col("id").cast("int").alias("k"))
    two_pi_over_l = 2 * math.pi / SEQ_LEN
    ang = F.col("k") * F.col("t") * two_pi_over_l
    spectral = (
        fused.crossJoin(F.broadcast(k))
        .groupBy("window_id", F.col("k").alias("t2"), (F.col("c") + 16).alias("c"))
        .agg(
            F.round(
                F.sqrt(
                    F.pow(F.sum(F.col("x") * F.cos(ang)), 2)
                    + F.pow(F.sum(F.col("x") * F.sin(ang)), 2)
                ),
                2,
            ).alias("x")
        )
        .select("window_id", F.col("t2").alias("t"), "c", "x")
    )
    return temporal.unionByName(spectral)
