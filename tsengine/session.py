"""SparkSession factory tuned for the engine's workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores);
the config block is written for a real multi-executor cluster at ~100 TB:
AQE handles runtime partition coalescing and skew-join splitting, Arrow
is on for every pandas_udf edge, and shuffle partitions default to a
small-local value that production deployments override via
``spark.sql.shuffle.partitions`` (rule of thumb: ~2-3x total cores, or
let AQE coalesce from a high initial count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tsengine", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    All settings below are semantics-preserving performance knobs; the
    engine never depends on a specific partitioning for correctness
    (SURVEY.md §4.2: stochastic ops are pure functions of keys+seed,
    never of physical layout).
    """
    # make the package importable on python workers even when the
    # driver script added it via sys.path (workers only see PYTHONPATH)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{pp}" if pp else repo_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("TSENGINE_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- determinism ---
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores TIMESTAMP(NANOS) which Spark 4 refuses;
        # read as long ns and convert at the scan (tables.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: runtime coalescing + skew-join handling ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing (override on a real cluster) ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Arrow for every pandas_udf / toPandas edge ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scans: keep splits big enough to amortize task overhead ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- broadcast joins for small dims (driver tables region/nation/...) ---
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("TSENGINE_DRIVER_MEM", "8g"))
        # managed-table storage (bucketed tables) outside the repo; the
        # embedded derby metastore follows via derby.system.home
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("TSENGINE_WAREHOUSE", "/tmp/tsengine-warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/tsengine-derby",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
