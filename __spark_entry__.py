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
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2 M0).

    Segments the events stream into fixed-length per-patient windows
    (the reference's windowed-sequence table), then computes per-split
    class counts and prevalence — the reference's cell-6/7 sanity query
    (`exercise provided.ipynb`, JSON lines 229/261).
    """
    from pyspark.sql import functions as F

    from tsengine.sources.wearable import wearable_long

    windows = (
        wearable_long(spark, "/root/testdata/sf0.001")
        .select("patient_id", "window_id", "label", "split")
        .distinct()
    )
    return windows.groupBy("split", "label").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("patient_id").alias("n_patients"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tsengine.registry import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible operator; rows-only
    operators (per SURVEY.md §2's Oracle column) are omitted."""
    from tsengine.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
