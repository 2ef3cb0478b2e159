"""Classifier metric aggregations (SURVEY.md §2 A.6/A.8): accuracy,
per-class precision/recall/F1, ROC-AUC (rank-sum), BCE loss,
softmax/argmax.

Predictions come from the frozen arithmetic classifier in
``window_preds`` (oracle/frags.py) so every metric is a pure function —
the reference's sklearn calls (`unsupervised.py:240-260`) become plain
aggregation expressions that Catalyst executes as partial+final aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsengine.oracle.frags import WINDOW_PREDS_CTE, with_ctes
from tsengine.registry import register
from tsengine.sources.wearable import wearable_long


def window_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window (label, pred, score) from a frozen threshold model —
    mirrors WINDOW_PREDS_CTE exactly."""
    wl = wearable_long(spark, sf_dir)
    return wl.groupBy("window_id").agg(
        F.max("label").alias("label"),
        F.when(F.avg(F.col("ibi").cast("double")) > 1050, 1).otherwise(0).alias("pred"),
        F.round(F.avg(F.col("ibi").cast("double")) / 1500, 6).alias("score"),
    )


@register(
    "accuracy_agg",
    with_ctes(WINDOW_PREDS_CTE)
    + "\nSELECT ROUND(AVG(CASE WHEN pred = label THEN 1.0 ELSE 0.0 END), 6) AS accuracy"
    "\nFROM window_preds",
)
def accuracy_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """accuracy_score = mean of prediction/label equality (reference
    `unsupervised.py:240`)."""
    return window_preds(spark, sf_dir).agg(
        F.round(
            F.avg(F.when(F.col("pred") == F.col("label"), 1.0).otherwise(0.0)), 6
        ).alias("accuracy")
    )


@register(
    "classification_report",
    with_ctes(WINDOW_PREDS_CTE)
    + """
SELECT c.c AS class,
       ROUND(CASE WHEN SUM(CASE WHEN pred = c.c THEN 1 ELSE 0 END) = 0 THEN 0.0
                  ELSE SUM(CASE WHEN pred = c.c AND label = c.c THEN 1 ELSE 0 END) * 1.0
                       / SUM(CASE WHEN pred = c.c THEN 1 ELSE 0 END) END, 6) AS precision,
       ROUND(CASE WHEN SUM(CASE WHEN label = c.c THEN 1 ELSE 0 END) = 0 THEN 0.0
                  ELSE SUM(CASE WHEN pred = c.c AND label = c.c THEN 1 ELSE 0 END) * 1.0
                       / SUM(CASE WHEN label = c.c THEN 1 ELSE 0 END) END, 6) AS recall,
       ROUND(CASE WHEN SUM(CASE WHEN pred = c.c THEN 1 ELSE 0 END)
                     + SUM(CASE WHEN label = c.c THEN 1 ELSE 0 END) = 0 THEN 0.0
                  ELSE 2.0 * SUM(CASE WHEN pred = c.c AND label = c.c THEN 1 ELSE 0 END)
                       / (SUM(CASE WHEN pred = c.c THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN label = c.c THEN 1 ELSE 0 END)) END, 6) AS f1,
       CAST(SUM(CASE WHEN label = c.c THEN 1 ELSE 0 END) AS BIGINT) AS support
FROM window_preds CROSS JOIN (VALUES (0), (1)) c(c)
GROUP BY c.c
""",
)
def classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 + support with sklearn
    zero-division->0 semantics (reference `unsupervised.py:244-255`).
    A grouped multi-agg — one shuffle, map-side partials.

    F1 computed as 2TP/(pred_pos + actual_pos) — algebraically
    2PR/(P+R), but avoids dividing by already-rounded intermediates."""
    wp = window_preds(spark, sf_dir)
    classes = spark.createDataFrame([(0,), (1,)], ["c"])
    j = wp.crossJoin(F.broadcast(classes))
    tp = F.sum(F.when((F.col("pred") == F.col("c")) & (F.col("label") == F.col("c")), 1).otherwise(0))
    pp = F.sum(F.when(F.col("pred") == F.col("c"), 1).otherwise(0))
    ap = F.sum(F.when(F.col("label") == F.col("c"), 1).otherwise(0))
    return j.groupBy(F.col("c").alias("class")).agg(
        F.round(F.when(pp == 0, 0.0).otherwise(tp * 1.0 / pp), 6).alias("precision"),
        F.round(F.when(ap == 0, 0.0).otherwise(tp * 1.0 / ap), 6).alias("recall"),
        F.round(F.when(pp + ap == 0, 0.0).otherwise(2.0 * tp / (pp + ap)), 6).alias("f1"),
        ap.alias("support"),
    )


@register(
    "roc_auc",
    with_ctes(WINDOW_PREDS_CTE)
    + """
, ranked AS (
  SELECT label,
         RANK() OVER (ORDER BY score) + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS r
  FROM window_preds
)
SELECT ROUND((SUM(CASE WHEN label = 1 THEN r ELSE 0 END)
              - SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
             / (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                * SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6) AS auc
FROM ranked
""",
)
def roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the Mann-Whitney rank-sum identity (reference
    sklearn roc_auc_score at `unsupervised.py:260`):
    AUC = (Σ_{positives} avg_rank − P(P+1)/2) / (P·N), with tied scores
    receiving their average rank (RANK + (ties-1)/2).

    Scale shape: NO global-order window (the naive form moves every
    scored row to one task — `WindowExec: No Partition Defined`).
    Scores are 6dp-rounded before ranking, so (1) pre-aggregate to
    distinct scores (map-side combinable groupBy — the only full-data
    shuffle), then (2) rank the distinct-score table with a
    range-bucketed two-phase cumulative count: per-bucket window
    partitioned by bucket + broadcast per-bucket offsets.  avg tied
    rank = (#rows below score) + (ties+1)/2, identical to
    RANK + (ties-1)/2, and all terms are exact multiples of 0.5 so the
    result is bit-identical to the row-level form.

    Parity with MLlib's BinaryClassificationEvaluator is asserted in
    tests/test_metrics.py."""
    wp = window_preds(spark, sf_dir)
    ranked = _avg_ranked_scores(wp)
    pos = F.sum("p")
    neg = F.sum("n")
    pos_rank_sum = F.sum(F.col("p") * F.col("r"))
    return ranked.agg(
        F.round((pos_rank_sum - pos * (pos + 1) / 2.0) / (pos * neg), 6).alias("auc")
    )


def _avg_ranked_scores(
    wp: DataFrame, n_buckets: int = 128, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(score, p, n, r) per distinct score (optionally per group):
    p/n = positive/negative row counts at that score, r = average tied
    rank of those rows under a global ascending sort by score.

    Two-phase rank: range-bucket the distinct scores (monotone in
    score), count rows per bucket, compute each bucket's starting
    offset with a broadcast lower-bucket self-join (|buckets|² tiny
    nested-loop), then a window PARTITIONED by bucket for the
    in-bucket cumulative count.  No partition-less window anywhere."""
    gc = list(group_cols)
    dist = wp.groupBy(*gc, "score").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("n"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # scores are bounded (avg ibi / 1500 ∈ (0, ~2)); floor is monotone
    # so bucket order == score order and ties share a bucket
    dist = dist.withColumn(
        "_b", F.least(F.floor(F.col("score") * n_buckets), F.lit(4 * n_buckets)).cast("long")
    )
    btot = dist.groupBy(*gc, "_b").agg(F.sum("cnt").alias("_bc"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    cond = F.col("lo._b") < F.col("hi._b")
    for g in gc:
        cond = cond & (F.col(f"lo.{g}") == F.col(f"hi.{g}"))
    off = (
        hi.join(F.broadcast(lo), cond, "left")
        .groupBy(*[F.col(f"hi.{g}").alias(g) for g in gc], F.col("hi._b").alias("_b"))
        .agg(F.coalesce(F.sum("lo._bc"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy(*gc, "_b").orderBy("score")
    return (
        dist.join(F.broadcast(off), gc + ["_b"])
        .withColumn("_below", F.col("_off") + F.sum("cnt").over(w) - F.col("cnt"))
        .select(
            *gc,
            "score",
            "p",
            "n",
            (F.col("_below") + (F.col("cnt") + 1) / 2.0).alias("r"),
        )
    )


@register(
    "bce_loss",
    with_ctes(WINDOW_PREDS_CTE)
    + """
SELECT ROUND(AVG(CASE WHEN logit >= 0
                      THEN (1 - label) * logit + ln(1 + exp(-logit))
                      ELSE -label * logit + ln(1 + exp(logit)) END), 6) AS bce
FROM (SELECT label, (score - 0.7) * 10 AS logit FROM window_preds)
""",
)
def bce_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary cross-entropy with logits, numerically-stable form
    (reference BCEWithLogitsLoss at `supervised.py:74, 370`):
    max(x,0) − x·y + log(1+exp(−|x|)) — an aggregate expression."""
    wp = window_preds(spark, sf_dir).select(
        "label", ((F.col("score") - 0.7) * 10).alias("logit")
    )
    x, y = F.col("logit"), F.col("label")
    stable = F.when(x >= 0, (1 - y) * x + F.log1p(F.exp(-x))).otherwise(
        -y * x + F.log1p(F.exp(x))
    )
    return wp.agg(F.round(F.avg(stable), 6).alias("bce"))


@register(
    "softmax_argmax",
    with_ctes(WINDOW_PREDS_CTE)
    + """
SELECT window_id,
       ROUND(exp(l1) / (exp(l0) + exp(l1)), 6) AS prob1,
       CASE WHEN l1 > l0 THEN 1 ELSE 0 END AS pred
FROM (SELECT window_id, (score - 0.7) * 10 AS l1, (0.7 - score) * 10 AS l0
      FROM window_preds)
""",
)
def softmax_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """probs = softmax(logits); pred = argmax (reference
    `unsupervised.py:233-234`) — 2-class case as a pure projection."""
    wp = window_preds(spark, sf_dir).select(
        "window_id",
        ((F.col("score") - 0.7) * 10).alias("l1"),
        ((F.lit(0.7) - F.col("score")) * 10).alias("l0"),
    )
    return wp.select(
        "window_id",
        F.round(F.exp("l1") / (F.exp("l0") + F.exp("l1")), 6).alias("prob1"),
        F.when(F.col("l1") > F.col("l0"), 1).otherwise(0).alias("pred"),
    )


def _desc_cum_scores(wp: DataFrame, n_buckets: int = 128) -> DataFrame:
    """(score, p, cnt, ctp, ccnt, tp) per distinct score: p/cnt = rows
    (positive / all) at that score, ctp/ccnt = cumulative counts over
    scores >= this one (i.e. the confusion-matrix row when the decision
    threshold is this score), tp = total positives.

    Same two-phase scale shape as ``_avg_ranked_scores``: pre-aggregate
    to distinct 6dp scores (the one full-data shuffle, map-side
    combinable), range-bucket the bounded score domain, broadcast the
    per-bucket prefix totals, window PARTITIONED by bucket — no
    partition-less window, so the descending cumsum never funnels the
    score table through one task."""
    dist = wp.groupBy("score").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("p"),
        F.count(F.lit(1)).alias("cnt"),
    )
    dist = dist.withColumn(
        "_b", F.least(F.floor(F.col("score") * n_buckets), F.lit(4 * n_buckets)).cast("long")
    )
    btot = dist.groupBy("_b").agg(F.sum("p").alias("_bp"), F.sum("cnt").alias("_bc"))
    lo, hi = btot.alias("lo"), btot.alias("hi")
    off = (
        hi.join(F.broadcast(lo), F.col("lo._b") < F.col("hi._b"), "left")
        .groupBy(F.col("hi._b").alias("_b"))
        .agg(
            F.coalesce(F.sum("lo._bp"), F.lit(0)).alias("_offp"),
            F.coalesce(F.sum("lo._bc"), F.lit(0)).alias("_offc"),
        )
    )
    w = Window.partitionBy("_b").orderBy("score")
    totals = dist.groupBy().agg(F.sum("p").alias("tp"), F.sum("cnt").alias("tc"))
    return (
        dist.join(F.broadcast(off), "_b")
        .withColumn("_pbelow", F.col("_offp") + F.sum("p").over(w) - F.col("p"))
        .withColumn("_cbelow", F.col("_offc") + F.sum("cnt").over(w) - F.col("cnt"))
        .crossJoin(F.broadcast(totals))
        .select(
            "score",
            "p",
            "cnt",
            (F.col("tp") - F.col("_pbelow")).alias("ctp"),
            (F.col("tc") - F.col("_cbelow")).alias("ccnt"),
            "tp",
        )
    )


_PR_CUM_CTE = """
pr_dist AS (
  SELECT score,
         CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
         COUNT(*) AS cnt
  FROM window_preds GROUP BY score
),
pr_cum AS (
  SELECT score, p, cnt,
         CAST(SUM(p) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ctp,
         CAST(SUM(cnt) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccnt,
         CAST(SUM(p) OVER () AS BIGINT) AS tp
  FROM pr_dist
)"""


@register(
    "pr_curve",
    with_ctes(WINDOW_PREDS_CTE, _PR_CUM_CTE)
    + """
SELECT score AS threshold,
       ROUND(ctp * 1.0 / ccnt, 6) AS prec,
       ROUND(ctp * 1.0 / tp, 6) AS rec
FROM pr_cum
""",
)
def pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve at every distinct decision threshold
    (sklearn ``precision_recall_curve`` operating points, descending
    score — the companion of the reference's roc_auc at
    `unsupervised.py:260`).  At threshold t: prec = TP(t)/#(score>=t),
    rec = TP(t)/P.  Built on the distinct-score descending cumsum
    (``_desc_cum_scores``) — one shuffle, bucketed windows only."""
    cum = _desc_cum_scores(window_preds(spark, sf_dir))
    return cum.select(
        F.col("score").alias("threshold"),
        F.round(F.col("ctp") * 1.0 / F.col("ccnt"), 6).alias("prec"),
        F.round(F.col("ctp") * 1.0 / F.col("tp"), 6).alias("rec"),
    )


@register(
    "pr_auc",
    with_ctes(WINDOW_PREDS_CTE, _PR_CUM_CTE)
    + """
SELECT ROUND(SUM(p * ctp * 1.0 / ccnt) / MAX(tp), 6) AS ap
FROM pr_cum
""",
)
def pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (sklearn ``average_precision_score``):
    AP = Σ_t (R_t − R_{t−1})·P_t over descending distinct thresholds
    = Σ_t (p_t / P) · (TP_t / #pred_t).  Same scale shape as
    ``pr_curve``; the final Σ is an order-dependent double sum, guarded
    by the repo-wide ROUND(,6) policy."""
    cum = _desc_cum_scores(window_preds(spark, sf_dir))
    return cum.agg(
        F.round(
            F.sum(F.col("p") * F.col("ctp") / F.col("ccnt")) / F.max("tp"), 6
        ).alias("ap")
    )
