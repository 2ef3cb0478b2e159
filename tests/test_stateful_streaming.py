"""Custom stateful streaming operator (applyInPandasWithState):
multi-micro-batch window assembly must equal the batch derivation.

The events fixture is split into three ts-ordered parquet files and
streamed one file per trigger, so per-user partial windows genuinely
cross micro-batch boundaries and live in the state store between
triggers — the property the operator exists for.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def split_events_dir(tmp_path_factory, sf_dir):
    """Three sequential parquet files, globally ts-ordered, so arrival
    order per user matches event-time order (the operator's ordering
    contract)."""
    src = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    src = src.sort_values(["ts", "event_id"]).reset_index(drop=True)
    out = tmp_path_factory.mktemp("events_stream")
    n = len(src)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = out / f"part-{i:02d}.parquet"
        src.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        # file source orders by (mtime, path): make mtimes increasing
        ts = time.time() - 300 + i * 60
        os.utime(p, (ts, ts))
    return str(out)


def test_stateful_assembler_matches_batch(spark, sf_dir, split_events_dir):
    from pyspark.sql import functions as F

    from tsengine.sources.wearable import wearable_long
    from tsengine.streaming.stateful import window_assembler_stream

    raw_schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    ts_type = dict((f.name, f.dataType.simpleString()) for f in raw_schema.fields)["ts"]
    if ts_type == "bigint":  # same ns->us conversion as the batch loader
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    out = window_assembler_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("assembled_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM assembled_windows").toPandas()
    batch = wearable_long(spark, sf_dir).toPandas()

    cols = sorted(batch.columns)
    a = streamed[cols].sort_values(["window_id", "t"]).reset_index(drop=True)
    b = batch[cols].sort_values(["window_id", "t"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
