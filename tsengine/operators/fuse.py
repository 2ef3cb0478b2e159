"""Per-timestep feature transforms (SURVEY.md §2 A.2): one-hot channel
fusion, layout permutation, activation/normalization, dropout.

The reference fuses ``ibi × one_hot(acc)`` into a 16-channel tensor
(`unsupervised.py:52-55`); relationally that is a projection over the
long form — all whole-stage-codegen SQL, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.oracle.frags import with_ctes
from tsengine.registry import register
from tsengine.sources.wearable import SEQ_LEN, wearable_long, wearable_wide

N_CHANNELS = 16

# Shared CTE: exploded 16-channel fused representation
# x[c,t] = ibi[t] * 1[acc[t] = c]  (`unsupervised.py:54`)
FUSED_CTE = """
channels AS (SELECT unnest(range(0, 16)) AS c),
fused AS (
  SELECT window_id, t, CAST(c AS INT) AS c,
         CASE WHEN acc = c THEN CAST(ibi AS DOUBLE) ELSE 0.0 END AS x
  FROM wearable_long CROSS JOIN channels
)"""


def channels_df(spark: SparkSession) -> DataFrame:
    return spark.range(N_CHANNELS).select(F.col("id").cast("int").alias("c"))


def fused_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long fused form: one row per (window, t, channel)."""
    wl = wearable_long(spark, sf_dir)
    ch = channels_df(spark)
    return wl.crossJoin(F.broadcast(ch)).select(
        "window_id",
        "t",
        "c",
        F.when(F.col("acc") == F.col("c"), F.col("ibi").cast("double"))
        .otherwise(0.0)
        .alias("x"),
    )


def fused_nonzero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse fused form — row-identical to
    ``fused_long(...).filter(x != 0)`` but computed as a direct
    projection: ibi > 0 occupies exactly one channel (c = acc) per
    timestep, so the 16-channel cross join materializes 15 zeros per
    sample that every downstream consumer (conv, DFT) discards.  At
    100 TB this is a 16x cut in rows entering the conv/DFT shuffles."""
    wl = wearable_long(spark, sf_dir)
    return wl.select(
        "window_id",
        "t",
        F.col("acc").cast("int").alias("c"),
        F.col("ibi").cast("double").alias("x"),
    )


@register(
    "onehot_acc",
    with_ctes()
    + "\nSELECT window_id, t, acc,\n"
    + ",\n".join(
        f"       CASE WHEN acc = {c} THEN 1 ELSE 0 END AS c{c}" for c in range(16)
    )
    + "\nFROM wearable_long",
)
def onehot_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encode the 0-15 quality score into 16 channels
    (reference `unsupervised.py:52`: F.one_hot(acc, 16))."""
    wl = wearable_long(spark, sf_dir)
    cols = [
        F.when(F.col("acc") == c, 1).otherwise(0).alias(f"c{c}") for c in range(16)
    ]
    return wl.select("window_id", "t", "acc", *cols)


@register(
    "channel_fuse",
    with_ctes(FUSED_CTE) + "\nSELECT * FROM fused WHERE x <> 0.0",
)
def channel_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elementwise multiply ibi into its quality channel
    (reference `unsupervised.py:54`: x = ibi.unsqueeze(1) * onehot).
    Output keeps the sparse non-zero entries (one per (window, t))."""
    return fused_nonzero(spark, sf_dir)


@register(
    "permute_layout",
    with_ctes() + "\nSELECT window_id, t, ibi, acc FROM wearable_long",
)
def permute_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout permutation [bs,L,C] <-> [bs,C,L] (reference
    `unsupervised.py:55`).  Relationally: wide->long->wide is a no-op on
    values; verified by round-tripping through the wide form
    (collect_list ordered) and exploding back (posexplode)."""
    wide = wearable_wide(spark, sf_dir)
    return wide.select(
        "window_id",
        F.posexplode(F.arrays_zip("ibi", "acc")).alias("t", "z"),
    ).select(
        "window_id",
        F.col("t").cast("int"),
        F.col("z.ibi").alias("ibi"),
        F.col("z.acc").alias("acc"),
    )


@register(
    "relu_affine_norm",
    with_ctes(FUSED_CTE)
    + f"""
SELECT window_id, t, c,
       ROUND(GREATEST(0.0, (x - (500 + c * 10)) / 300.0 * (1 + c / 16.0) + c / 8.0), 6) AS y
FROM fused WHERE t < {SEQ_LEN}
""",
)
def relu_affine_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BatchNorm-at-inference (per-channel affine with frozen stats) +
    ReLU (reference `T_CPC.py:16-22`).  Frozen stats are deterministic
    per-channel constants: mu=500+10c, sigma=300, gamma=1+c/16, beta=c/8."""
    f = fused_long(spark, sf_dir)
    mu = F.lit(500) + F.col("c") * 10
    norm = (F.col("x") - mu) / 300.0 * (1 + F.col("c") / 16.0) + F.col("c") / 8.0
    return f.select(
        "window_id", "t", "c", F.round(F.greatest(F.lit(0.0), norm), 6).alias("y")
    )


@register(
    "dropout_augment",
    with_ctes()
    + f"""
SELECT window_id, t,
       CASE WHEN ((window_id * {SEQ_LEN} + t) * 2654435761) % 10 = 0
            THEN 0.0 ELSE ROUND(ibi / 0.9, 6) END AS x_dropped
FROM wearable_long
""",
)
def dropout_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dropout p=0.1 as a *pure function of (keys, seed)* — never
    engine rand() (reference `T_CPC.py:19`; determinism policy
    SURVEY.md §4.3).  Element (w,t) is zeroed iff
    hash(w*L+t) % 10 == 0; survivors scale by 1/0.9 (inverted dropout)."""
    wl = wearable_long(spark, sf_dir)
    key = (F.col("window_id") * SEQ_LEN + F.col("t")) * F.lit(2654435761)
    return wl.select(
        "window_id",
        "t",
        F.when(key % 10 == 0, F.lit(0.0))
        .otherwise(F.round(F.col("ibi") / 0.9, 6))
        .alias("x_dropped"),
    )
