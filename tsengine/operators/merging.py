"""Idempotent MERGE/upsert sink — the exactly-once write pattern every
production incremental pipeline needs (engine extension; the reference
persists results by overwriting whole pickles/CSVs,
`unsupervised.py:478-493`, which IS idempotent only because it is a
full rewrite — this module gives the partition-scoped form that stays
idempotent without rewriting the world).

Mechanics (plain parquet, no table-format dependency):

  1. the target table is laid out hive-partitioned on a bucket of the
     merge key (``p = key % N_PARTS``);
  2. a merge computes the refreshed rows for the keys in the update
     batch, reads back ONLY the affected partitions (partition-pruned
     scan), anti-joins the stale rows out, unions the update rows in,
     and rewrites JUST those partitions via dynamic partition overwrite
     (``spark.sql.sources.partitionOverwriteMode=dynamic``);
  3. untouched partitions are never read or written.

Idempotence: re-running the same merge recomputes byte-identical
partition contents and overwrites them in place — a retry after a
half-failed run converges to the same table.  The registered query
PROVES this by applying the merge twice and hash-checking the read-back
against a single-application oracle; the pytest twin
(tests/test_idempotent_merge.py) additionally pins run-to-run collect
equality and the untouched-partition no-rewrite property via file
mtimes.

At 100 TB: the partition count is the knob — merge cost is
O(|touched partitions| * partition size + |update|), independent of
table size; this is exactly the MERGE execution model of
Delta/Iceberg/Hudi re-expressed over vanilla partitioned parquet.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsengine.registry import register
from tsengine.sources.tables import load_table

_MERGE_DIR = os.environ.get("TSENGINE_MERGE_DIR", "/tmp/tsengine_merge")
_N_PARTS = 8
_SPLIT_DATE = "1999-01-01"
_OVR_CONF = "spark.sql.sources.partitionOverwriteMode"


def _rollup(orders: DataFrame) -> DataFrame:
    """Per-customer order rollup — the merge target's row shape."""
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        F.max(F.to_date("o_orderdate")).alias("last_orderdate"),
    )


def merge_upsert(
    spark: SparkSession, target: str, updates: DataFrame, key: str
) -> None:
    """MERGE ``updates`` into the partitioned parquet ``target``:
    matched keys are replaced, new keys inserted, and ONLY the
    partitions containing update keys are rewritten (dynamic partition
    overwrite).  ``updates`` must carry the partition column ``p``.
    Deterministic input => byte-deterministic partition contents =>
    idempotent under re-run."""
    upd = updates.localCheckpoint(eager=True)  # pin: read target AND
    # overwrite it below — an un-materialized update plan re-reading the
    # target mid-overwrite would race its own input
    parts = [r.p for r in upd.select("p").distinct().collect()]
    cur = spark.read.parquet(target).filter(F.col("p").isin(parts))
    merged = cur.join(
        upd.select(key), key, "left_anti"
    ).unionByName(upd).localCheckpoint(eager=True)
    old = spark.conf.get(_OVR_CONF, None)
    spark.conf.set(_OVR_CONF, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("p").parquet(target)
    finally:
        if old is None:
            spark.conf.unset(_OVR_CONF)
        else:
            spark.conf.set(_OVR_CONF, old)


@register(
    "idempotent_write_merge",
    """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 6) AS sum_price,
       CAST(MAX(o_orderdate) AS DATE) AS last_orderdate
FROM orders
GROUP BY o_custkey
""",
)
def idempotent_write_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MERGE round trip, applied TWICE to prove
    idempotence under the driver's value check:

      * base load: per-customer rollup of orders BEFORE 1999-01-01;
      * update batch: refreshed full-history rollups for exactly the
        customers with orders ON/AFTER 1999-01-01 (the standard
        recompute-changed-keys incremental pattern);
      * merge #1: upsert the update batch (replace matched, insert
        new), rewriting only affected key-bucket partitions;
      * merge #2: the SAME batch again — the retry — which must leave
        every byte unchanged.

    The returned read-back equals the full-history rollup for every
    customer (touched customers got refreshed rows; untouched
    customers' base rows already equal their full history), so the
    oracle is the plain GROUP BY over orders — a hash match proves
    both the merge algebra and its idempotence in one check."""
    orders = load_table(spark, sf_dir, "orders")
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    target = os.path.join(_MERGE_DIR, f"cust_rollup_{tag}")

    with_p = lambda df: df.withColumn(  # noqa: E731
        "p", (F.col("o_custkey") % _N_PARTS).cast("int")
    )
    cutoff = F.to_date(F.lit(_SPLIT_DATE))
    base = _rollup(orders.filter(F.to_date("o_orderdate") < cutoff))
    # full rebuild of the base table every invocation: the registered
    # query must be deterministic per call, never accrete across runs
    with_p(base).write.mode("overwrite").partitionBy("p").parquet(target)

    touched = (
        orders.filter(F.to_date("o_orderdate") >= cutoff)
        .select("o_custkey")
        .distinct()
    )
    updates = with_p(_rollup(orders.join(touched, "o_custkey")))
    merge_upsert(spark, target, updates, "o_custkey")
    merge_upsert(spark, target, updates, "o_custkey")  # the retry

    return spark.read.parquet(target).select(
        "o_custkey", "n_orders", "sum_price", "last_orderdate"
    )


_COMPACT_DIR = os.environ.get("TSENGINE_COMPACT_DIR", "/tmp/tsengine_compact")
_COMPACT_TARGET_FILES = 4
_COMPACT_FRAGMENTS = 64


@register(
    "compact_small_files",
    """
SELECT event_id, ts, user_id, event_type, value, props FROM events
""",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every 100 TB
    lake runs continuously: streaming/incremental writers leave
    thousands of KB-sized files per partition, and scan cost becomes
    file-open-bound instead of byte-bound (the classic "small files
    problem"; Delta OPTIMIZE / Iceberg rewrite_data_files re-expressed
    over plain parquet).

    The registered query BUILDS the pathology (the events table
    scattered across 64 fragment files), compacts it — one
    ``repartitionByRange`` on the natural sort key (ts, event_id) down
    to the target file count, so each output file covers a contiguous
    time range and min/max footer stats stay selective for time-range
    scans (compaction that ignores sort order destroys data-skipping)
    — and returns the read-back.  The oracle recomputes the table from
    the source directly, so the hash match proves compaction is
    LOSSLESS row-for-row; the pytest twin pins the operational
    contract (file count collapses 64 -> <= target, sizes balanced
    within a band, time-disjoint files).

    At 100 TB compaction is per-partition-scoped maintenance (compose
    with the hive layout of ``idempotent_write_merge``): each
    partition compacts independently — the range shuffle is bounded by
    one partition's data, never the table."""
    frag = os.path.join(_COMPACT_DIR, "fragments")
    out = os.path.join(_COMPACT_DIR, "compacted")
    ev = load_table(spark, sf_dir, "events")
    # pathological layout: 64 round-robin fragments (what a chatty
    # incremental writer leaves behind)
    ev.repartition(_COMPACT_FRAGMENTS).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    (
        frag_df.repartitionByRange(
            _COMPACT_TARGET_FILES, F.col("ts"), F.col("event_id")
        )
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
