"""M5 pipeline properties (SURVEY.md §5 engine test plan): frozen-weight
determinism, variant separation, and score sanity of the composed CPC
inference DAGs."""

from __future__ import annotations

import numpy as np
import pytest

from tsengine.pipelines import (
    VARIANTS,
    _conv_relu,
    _gru_batch,
    cpc_contexts,
    encoder_weights,
)
from tsengine.sources.wearable import wearable_wide


@pytest.fixture(scope="module")
def wide(spark, sf_dir):
    return wearable_wide(spark, sf_dir).cache()


def _ctx_map(df):
    rows = df.collect()
    return {r["window_id"]: tuple(r[f"c{i}"] for i in range(8)) for r in rows}


def test_contexts_deterministic(wide):
    a = _ctx_map(cpc_contexts(wide, "T_CPC"))
    b = _ctx_map(cpc_contexts(wide, "T_CPC"))
    assert a == b and len(a) > 0


def test_variants_differ(wide):
    maps = {v: _ctx_map(cpc_contexts(wide, v)) for v in VARIANTS}
    wid = next(iter(maps["T_CPC"]))
    vals = {maps[v][wid] for v in VARIANTS}
    assert len(vals) == 3, "the three encoder variants must disagree"


def test_seed_changes_contexts(wide):
    a = _ctx_map(cpc_contexts(wide, "T_CPC", seed=42))
    b = _ctx_map(cpc_contexts(wide, "T_CPC", seed=43))
    assert a != b


def test_conv_relu_impulse():
    # impulse response recovers the kernel column (conv correctness)
    w = encoder_weights("T_CPC")["conv1"]
    x = np.zeros((1, w.shape[1], 9))
    x[0, 2, 4] = 1.0  # impulse on channel 2 at t=4
    out = _conv_relu(x, w)
    for d in (-1, 0, 1):
        # cross-correlation (PyTorch Conv1d): out[t] = sum_k x[t+k-1] w[k]
        expect = np.maximum(w[:, 2, 1 - d], 0.0)
        np.testing.assert_allclose(out[0, :, 4 + d], expect, atol=1e-12)


def test_gru_batch_matches_sequential():
    # batched GRU == the per-sequence reference recurrence
    from tsengine.operators.recurrence import gru_sequence, gru_weights

    rng = np.random.default_rng(0)
    w = gru_weights(n_in=4, hidden=8, seed=1)
    x = rng.normal(size=(3, 11, 4))
    batched = _gru_batch(x, w)
    for b in range(3):
        seq = gru_sequence(x[b], w)
        np.testing.assert_allclose(batched[b], seq[-1], atol=1e-10)


def test_frozen_inference_scores(spark, sf_dir):
    from tsengine.pipelines import pipeline_frozen_inference

    rows = pipeline_frozen_inference(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # unscaled ibi magnitudes saturate the sigmoid; 0/1 are legal
        assert 0.0 <= r["score"] <= 1.0
        if abs(r["score"] - 0.5) > 1e-6:  # rounded score vs unrounded pred
            assert r["pred"] == (1 if r["score"] >= 0.5 else 0)
        assert r["label"] in (0, 1)
