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


# Plan-metadata memo (r13 optimization, guide §5/§6): one DataFrame —
# i.e. one *lazy relation*, no materialized data — per (session, sf_dir,
# table).  Every spark.read.parquet() call pays ~80-120 ms of DRIVER-side
# file listing + footer schema read + analysis; the engine's query fns
# are re-invoked per bench pass / oracle check, so without the memo the
# same immutable fixture table was re-listed hundreds of times per run
# (measured: load_table(events) 116 ms/call -> ~0 warm).  This is the
# session-scoped listing reuse guide §6 describes for catalog tables,
# applied to path tables.  NOT result caching: a DataFrame is a plan;
# every action still scans the parquet files.  Keyed by applicationId so
# a stopped/rebuilt session can never serve stale JVM references, and by
# realpath so two sf dirs never alias.
#
# HARD INVARIANT (r14, VERDICT r13 item 8): fixture dirs are IMMUTABLE
# within a session — the memo freezes the driver-side file listing and
# schema per (session, sf_dir, table), so an operator that wrote into an
# ``sf_dir`` table mid-session would be served a stale listing.  Today
# no registered query writes under an sf_dir (every sink goes through
# sf_scoped_dir / the artifact publish protocol into scratch roots
# OUTSIDE the fixture tree — pinned by
# tests/test_round14_opt.py::test_no_registered_sink_writes_under_sf_dir).
# Code that must re-route or regenerate a source dir calls
# ``invalidate(sf_dir)`` (the REFRESH-equivalent) first.
_RELATION_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def invalidate(sf_dir: str) -> None:
    """Evict every memoized relation for ``sf_dir`` (all sessions, all
    tables) — the path-table equivalent of ``REFRESH TABLE``.  Required
    before serving reads after an in-session rewrite of a fixture dir;
    see the invariant note on ``_RELATION_MEMO``.  Downstream plan memos
    (wearable derivations, registry plan memo) are evicted too — they
    embed these relations."""
    rp = os.path.realpath(sf_dir)
    for k in [k for k in _RELATION_MEMO if k[1] == rp]:
        del _RELATION_MEMO[k]
    from tsengine.sources import wearable

    wearable._evict_sf_dir_memos(sf_dir)


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
    key = (spark.sparkContext.applicationId, os.path.realpath(sf_dir), name)
    hit = _RELATION_MEMO.get(key)
    if hit is not None:
        # cheap clone (~10 ms: reuses the analyzed relation, no listing):
        # callers must each get a FRESH QueryExecution — executing the
        # shared object in place would finalize its AQE plan and every
        # later explain() would render the Final+Initial double tree.
        # The extra Project collapses in the optimizer; physical plans
        # are identical (tests/test_plan_contracts.py passes unchanged).
        return hit.select("*")
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
    _RELATION_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
