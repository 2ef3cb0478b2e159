"""Contrastive (InfoNCE) scoring — batch-wide relational ops
(SURVEY.md §2 A.4).

The reference's InfoNCE loss (`T_CPC.py:69-76`) is, relationally, a
**within-batch self cross-join** producing a [bs,bs] score matrix,
**per-row softmax normalization** (a window aggregation over the anchor)
and a **diagonal filter** — the most interesting Spark mapping in the
reference.  Negatives are "the rest of the batch", so batch membership
is an explicit, hash-deterministic column (SURVEY.md §4.2.4), never an
artifact of physical partitioning.

Fixture: the driver's ``embeddings`` table stands in for the encoder
outputs c_t / z_{t+k} (FIXTURES.md §5), with the bilinear weight W
frozen to identity; the k-step-ahead positive z_{t+k}(i) is the
embedding at in-batch index (r_i + k) mod bs.

Scale: each batch's pair block is bs² rows (bs=64 → 4096); batches are
independent, so the whole computation is one broadcast-free
shuffle-join keyed on batch_id, embarrassingly parallel across batches
— at 1000 executors each holds its own batch blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

BS = 64
_N_VEC = 256  # 4 full batches from the embeddings table

_EMB_CTE = f"""
WITH emb AS (
  SELECT vec_id,
         CAST(FLOOR(vec_id / {BS}.0) AS BIGINT) AS batch_id,
         vec_id % {BS} AS r,
         embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id < {_N_VEC}
),
pairs AS (
  SELECT a.batch_id, a.vec_id AS i, b.vec_id AS j, a.r AS ri, b.r AS rj,
         ROUND(list_dot_product(a.e, b.e), 6) AS score
  FROM emb a JOIN emb b USING (batch_id)
),
mx AS (SELECT *, MAX(score) OVER (PARTITION BY i) AS m FROM pairs),
ls AS (
  SELECT *, score - (m + ln(SUM(exp(score - m)) OVER (PARTITION BY i))) AS lsm
  FROM mx
)"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _N_VEC)
        .select(
            "vec_id",
            F.floor(F.col("vec_id") / float(BS)).alias("batch_id"),
            (F.col("vec_id") % BS).alias("r"),
            F.col("embedding").cast("array<double>").alias("e"),
        )
    )


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[bs,bs] score blocks: within-batch self-join + JVM-side dot
    product (zip_with + aggregate — no UDF, no explode)."""
    e = _emb(spark, sf_dir)
    a = e.select(
        F.col("batch_id"),
        F.col("vec_id").alias("i"),
        F.col("r").alias("ri"),
        F.col("e").alias("ea"),
    )
    b = e.select(
        F.col("batch_id"),
        F.col("vec_id").alias("j"),
        F.col("r").alias("rj"),
        F.col("e").alias("eb"),
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return a.join(b, "batch_id").select(
        "batch_id", "i", "j", "ri", "rj", F.round(dot, 6).alias("score")
    )


def _log_softmax(pairs: DataFrame) -> DataFrame:
    """Per-anchor log-softmax: lsm(i,j) = s − (max_j s + ln Σ_j e^(s−max))
    — two window aggregations over the anchor partition (the max-shift
    is the standard overflow-stable form)."""
    w = Window.partitionBy("i")
    mx = pairs.withColumn("m", F.max("score").over(w))
    return mx.withColumn(
        "lsm",
        F.col("score")
        - (F.col("m") + F.log(F.sum(F.exp(F.col("score") - F.col("m"))).over(w))),
    )


@register(
    "bilinear_score",
    _EMB_CTE + "\nSELECT batch_id, i, j, score FROM pairs",
)
def bilinear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scores[i,j] = ⟨W·c(i), z(j)⟩ for all pairs in a batch (reference
    `T_CPC.py:72-73`: linear(c_t) @ z_tk.T, W frozen to identity)."""
    return _pairs(spark, sf_dir).select("batch_id", "i", "j", "score")


@register(
    "log_softmax_diag",
    _EMB_CTE + "\nSELECT batch_id, i, ROUND(lsm, 6) AS diag_lsm FROM ls WHERE i = j",
)
def log_softmax_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise log-softmax of the score matrix, diagonal entries
    (reference `T_CPC.py:74`: log_softmax(scores).diag())."""
    ls = _log_softmax(_pairs(spark, sf_dir))
    return ls.filter(F.col("i") == F.col("j")).select(
        "batch_id", "i", F.round("lsm", 6).alias("diag_lsm")
    )


@register(
    "nce_loss",
    _EMB_CTE
    + f"""
SELECT ROUND(-AVG(lsm), 6) AS nce
FROM ls JOIN (VALUES (1), (2), (3)) ks(k) ON ls.rj = (ls.ri + ks.k) % {BS}
""",
)
def nce_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfoNCE averaged over future offsets k ∈ {1,2,3} and the batch
    (reference `T_CPC.py:70-76`: nce / (−bs·K)); the k-step positive
    of anchor r is in-batch index (r+k) mod bs."""
    ls = _log_softmax(_pairs(spark, sf_dir))
    ks = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    picked = ls.join(
        F.broadcast(ks), F.col("rj") == (F.col("ri") + F.col("k")) % BS
    )
    return picked.agg(F.round(-F.avg("lsm"), 6).alias("nce"))


@register(
    "top1_match_acc",
    _EMB_CTE
    + f"""
, top1 AS (
  SELECT i, j, ROW_NUMBER() OVER (PARTITION BY i ORDER BY score DESC, j) AS rk
  FROM pairs
)
SELECT ROUND(AVG(CASE WHEN j = i THEN 1.0 ELSE 0.0 END), 6) AS top1_acc
FROM top1 WHERE rk = 1
""",
)
def top1_match_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of anchors whose argmax column equals their own index —
    the diagonal positive (reference `T_CPC.py:78-80`:
    scores.argmax(1).eq(arange(bs)).mean()) — a top-1-per-group via
    ROW_NUMBER, ranking the *rounded* scores with a deterministic j
    tie-break so both engines agree on near-ties."""
    pairs = _pairs(spark, sf_dir)
    w = Window.partitionBy("i").orderBy(F.col("score").desc(), "j")
    top1 = pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return top1.agg(
        F.round(F.avg(F.when(F.col("j") == F.col("i"), 1.0).otherwise(0.0)), 6).alias(
            "top1_acc"
        )
    )
