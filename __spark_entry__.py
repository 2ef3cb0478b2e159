"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`tsengine.registry` — every operator module
registers a ``(name, builder, oracle_sql)`` triple; see SURVEY.md §2 for
the operator inventory and tsengine/* docstrings for reference
citations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the composed inference
    dataflow end-to-end — events -> fixed-length per-patient windows
    (the reference's windowed-sequence table) -> channel fusion ->
    conv1d encode -> ReLU -> mean-pool -> frozen logistic score
    (SURVEY.md §3.3, the `before training` slice) -> per-split class
    counts, prevalence (`exercise provided.ipynb` cells 6/7) and
    rank-sum ROC-AUC of the frozen scores (`unsupervised.py:260`).
    """
    from pyspark.sql import functions as F

    from tsengine.operators.metrics import _avg_ranked_scores
    from tsengine.pipelines import pipeline_frozen_inference
    from tsengine.session import ensure_runtime_env
    from tsengine.sources.wearable import wearable_wide

    ensure_runtime_env(spark)
    sf = "/root/testdata/sf0.001"
    scored = pipeline_frozen_inference(spark, sf)  # window_id, score, pred, label
    splits = wearable_wide(spark, sf).select("window_id", "split")
    sp = scored.join(splits, "window_id")

    # scale-safe rank-sum AUC per split: distinct-score pre-aggregation
    # + range-bucketed two-phase rank — no partition-less window (the
    # same helper roc_auc uses; see tsengine/operators/metrics.py)
    ranked = _avg_ranked_scores(sp, group_cols=("split",))
    pos = F.sum("p")
    neg = F.sum("n")
    cnt = F.sum(F.col("p") + F.col("n"))
    pos_rank_sum = F.sum(F.col("p") * F.col("r"))
    return ranked.groupBy("split").agg(
        cnt.alias("n_windows"),
        pos.alias("n_afib"),
        F.round(pos / cnt, 6).alias("prevalence"),
        F.round(
            F.when(
                (pos > 0) & (neg > 0),
                (pos_rank_sum - pos * (pos + 1) / 2.0) / (pos * neg),
            ),
            6,
        ).alias("frozen_auc"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Every callable is wrapped with :func:`tsengine.session.ensure_runtime_env`
    so it is self-sufficient on a vanilla SparkSession built by an
    external harness (runtime confs + worker package shipping).
    """
    from tsengine.registry import all_queries
    from tsengine.session import ensure_runtime_env

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_env(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible operator; rows-only
    operators (per SURVEY.md §2's Oracle column) are omitted."""
    from tsengine.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
