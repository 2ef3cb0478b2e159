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

# sized to the local test box (32 cores -> 32-way join parallelism, one
# file per bucket); production sizes this so one bucket-file is a healthy
# parquet size (~1 GB), i.e. thousands of buckets at 100 TB
N_BUCKETS = 32


def write_bucketed(
    spark: SparkSession, sf_dir: str, table: str, key: str, name: str | None = None
) -> str:
    """Write one driver table bucketed+sorted by ``key``; returns the
    managed-table name.  Idempotent (overwrite)."""
    name = name or f"{table}_bucketed"
    df = load_table(spark, sf_dir, table)
    # one file per bucket (pre-cluster the write on the bucket key):
    # join parallelism == bucket count, and a single sorted run per
    # bucket keeps the join-side in-partition sorts cheap.
    (
        df.repartition(N_BUCKETS, key)
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    return name


def bucketed_join(spark: SparkSession, left: str, right: str, on) -> DataFrame:
    """Join two bucketed tables — Spark matches bucket specs and plans
    a zero-EXCHANGE sort-merge join (Spark 4 still inserts in-partition
    sorts: sorted-bucket ordering propagation was retired upstream, so
    the SORTED BY spec buys fast CPU-local sorts of pre-sorted runs
    rather than sort elision; the shuffle is what matters at 100 TB and
    that is gone).  The merge hint pins
    the 100 TB plan shape at test scale too: below the broadcast
    threshold Catalyst would otherwise broadcast one side, which is
    exactly the strategy a fact-fact join cannot use at the design
    point (and SMJ over matching sorted buckets needs no exchange and
    no sort, so the hint costs nothing here)."""
    return spark.table(left).hint("merge").join(spark.table(right), on)


def ensure_bucketed(
    spark: SparkSession, sf_dir: str, table: str, key: str, name: str, location: str
) -> str:
    """Idempotent cross-session bucketed copy: reuse the in-session
    catalog entry if present; re-declare a COMMITTED on-disk copy
    (_SUCCESS marker) to the session's in-memory catalog via
    ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` (the bucket spec
    lives in the catalog, the bucket-id file naming on disk — both
    survive re-declaration); otherwise clear any partial directory and
    write fresh.  An interrupted write is never silently reused."""
    import os
    import shutil

    if spark.catalog.tableExists(name):
        return name
    if os.path.isfile(os.path.join(location, "_SUCCESS")):
        df = load_table(spark, sf_dir, table)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
            f"LOCATION '{location}'"
        )
        return name
    shutil.rmtree(location, ignore_errors=True)
    return write_bucketed(spark, sf_dir, table, key, name)
