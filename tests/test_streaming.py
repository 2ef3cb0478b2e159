"""Structured Streaming twins: parity with the batch window operators
(the correctness argument for ops the DuckDB harness can't run)."""

from __future__ import annotations

import pandas as pd

from tsengine.registry import all_queries
from tsengine.streaming.windows import (
    metrics_log_sink,
    read_events_stream,
    run_available_now,
    tumbling_stream,
)


def _canon(df):
    p = df.toPandas()
    return p[sorted(p.columns)].sort_values(by=sorted(p.columns)).reset_index(drop=True)


def test_tumbling_stream_matches_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    streamed = run_available_now(tumbling_stream(ev), "t_tumbling")
    batch = all_queries()["tumbling_window_agg"].fn(spark, sf_dir)
    pd.testing.assert_frame_equal(
        _canon(streamed), _canon(batch), check_dtype=False
    )


def test_metrics_log_sink_collects(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    log: list = []
    metrics_log_sink(tumbling_stream(ev), log)
    # trailing micro-batches may be empty in update mode; at least one
    # batch must have emitted aggregate rows
    assert len(log) >= 1 and any(n > 0 for _, n in log)
