"""Parquet table loaders for the driver-generated test schema.

Mirrors the reference's scans (pickle/CSV at ``unsupervised.py:379-392``,
``:493``) onto Spark's parquet reader — the engine's primary columnar
source.  Filters and projections applied downstream reach the scan via
Catalyst pushdown (verified in tests/test_explain.py).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_scoped_dir(base: str, sf_dir: str, leaf: str) -> str:
    """Scratch-output path keyed by the scale-factor directory.

    Write-then-read-back queries (scan_csv/json/xml/orc round trips,
    compaction) must never share one output directory across scale
    factors: two sweeps racing on the same host (sf0.01 and sf0.1)
    would interleave overwrite-write and read-back and produce spurious
    oracle mismatches.  Same discipline as the streaming sinks'
    _SINK_IDS and sink_partitioned's md5 tag.
    """
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(base, f"{leaf}_{tag}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``scan_examples`` analog: columnar scan of one driver table.

    Reference: ``unsupervised.py:379-392`` loads the windowed-sequence
    table from pickle; here every source is parquet so Catalyst gets
    predicate pushdown + column pruning for free.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # self-sufficient on a vanilla session: nanos-parquet conf + worker
    # package shipping must not depend on who built the SparkSession
    from tsengine.session import ensure_runtime_env

    ensure_runtime_env(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP (instant, session tz pinned to UTC by
        # ensure_runtime_env) regardless of how the driver generated the
        # parquet: TIMESTAMP(NANOS) arrives as long ns under nanosAsLong,
        # naive timestamp[us] arrives as TIMESTAMP_NTZ.  Downstream
        # operators may cast ts -> long for epoch-second arithmetic,
        # which Spark 4 forbids on NTZ.
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: ns values (~1.7e18) exceed double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # naive wall-clock == UTC instant (engine semantics are UTC)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
