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
    channel index.

    The spectral branch runs numpy FFT per fused channel inside ONE
    mapInPandas pass over the wide form (the oracle's O(L²) relational
    DFT cross-join is the semantic spec, not the plan — swapping it for
    the FFT path cut this query ~4x).  Channels with no nonzero sample
    in a window emit no spectral rows, matching the oracle's
    group-from-nonzero-input semantics."""
    from tsengine.operators.fuse import N_CHANNELS

    temporal = fused_nonzero(spark, sf_dir).select(
        "window_id", "t", "c", F.round("x", 2).alias("x")
    )

    schema = "window_id long, t int, c int, x double"

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ibi = np.stack(pdf["ibi"].values).astype(np.float64)  # [bs, L]
            acc = np.stack(pdf["acc"].values)
            fused = np.stack(
                [ibi * (acc == c) for c in range(N_CHANNELS)], axis=1
            )  # [bs, C, L]
            mag = np.round(np.abs(np.fft.fft(fused, axis=2)), 2)  # [bs, C, L]
            present = fused.any(axis=2)  # [bs, C]
            b_idx, c_idx = np.nonzero(present)
            n_freq = mag.shape[2]
            yield pd.DataFrame(
                {
                    "window_id": np.repeat(
                        pdf["window_id"].to_numpy()[b_idx], n_freq
                    ),
                    "t": np.tile(np.arange(n_freq, dtype=np.int32), len(b_idx)),
                    "c": np.repeat((c_idx + 16).astype(np.int32), n_freq),
                    "x": mag[b_idx, c_idx].ravel(),
                }
            )

    spectral = (
        wearable_wide(spark, sf_dir)
        .select("window_id", "ibi", "acc")
        .mapInPandas(fn, schema=schema)
    )
    return temporal.unionByName(spectral)
