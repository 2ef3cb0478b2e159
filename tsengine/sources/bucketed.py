"""Bucketed storage for co-located joins (scale design, README §Scale).

A fact-fact join (lineitem ⋈ orders on orderkey) is the one join shape
that neither broadcasts nor salts away: both sides are large.  Bucketing
both tables on the join key at WRITE time pre-shuffles the data once —
every subsequent join reads bucket i against bucket i with NO exchange
on either side (plan-contract-tested).  At 100 TB this turns the
recurring cost of the pipeline's biggest shuffle into a one-time
storage layout decision, exactly how production warehouses co-locate
fact tables.

Bucketed tables are *managed* tables (``bucketBy`` requires
``saveAsTable``); the session pins the warehouse to a scratch dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tsengine.sources.tables import load_table

N_BUCKETS = 8


def write_bucketed(
    spark: SparkSession, sf_dir: str, table: str, key: str, name: str | None = None
) -> str:
    """Write one driver table bucketed+sorted by ``key``; returns the
    managed-table name.  Idempotent (overwrite)."""
    name = name or f"{table}_bucketed"
    df = load_table(spark, sf_dir, table)
    (
        df.write.mode("overwrite")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return name


def bucketed_join(spark: SparkSession, left: str, right: str, on) -> DataFrame:
    """Join two bucketed tables — Spark matches bucket specs and plans
    a zero-exchange sort-merge join."""
    return spark.table(left).join(spark.table(right), on)
