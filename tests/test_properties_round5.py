"""Property-based checks for round-5 kernels: invariants that justify
the distributed formulations, checked against independent
reimplementations on random inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _interleave(x: int, y: int) -> int:
    """Python mirror of the zorder_layout bit interleave (x even bits,
    y odd bits)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for i in range(16):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(st.integers(0, 65535), st.integers(0, 65535))
def test_morton_interleave_bijective(x, y):
    z = _interleave(x, y)
    assert 0 <= z < 2**32
    assert _deinterleave(z) == (x, y)


@given(st.integers(0, 65535), st.integers(0, 65535), st.integers(0, 65535), st.integers(0, 65535))
def test_morton_distinct_pairs_distinct_z(x1, y1, x2, y2):
    if (x1, y1) != (x2, y2):
        assert _interleave(x1, y1) != _interleave(x2, y2)


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(0, 100, allow_nan=False), st.integers(0, 10**6)),
        min_size=0,
        max_size=40,
    ),
    st.integers(1, 5),
)
def test_topk_merge_split_invariant(pairs, n_splits):
    """The streaming top-K is batch-split invariant: folding the input
    through _topk_merge in ANY partitioning gives the same final state
    as one merge over everything — the property that makes per-batch
    emission + MAX-reduction exact."""
    from tsengine.streaming.stateful import _TOPK_K, _topk_merge

    def pdf(chunk):
        return pd.DataFrame({"value": [p[0] for p in chunk], "event_id": [p[1] for p in chunk]})

    whole = _topk_merge([], [pdf(pairs)])
    state = []
    k = max(1, len(pairs) // n_splits + 1)
    for i in range(0, max(len(pairs), 1), k):
        state = _topk_merge(state, [pdf(pairs[i : i + k])])
    assert state == whole
    assert len(whole) <= _TOPK_K


def _ap_reference(labels, scores):
    """Independent numpy average-precision (sklearn semantics)."""
    order = np.lexsort((np.arange(len(scores)), -np.asarray(scores)))
    s = np.asarray(scores)[order]
    l = np.asarray(labels)[order]
    # group by distinct score (descending)
    ap, tp, cnt = 0.0, 0, 0
    total_p = int(l.sum())
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        tp += int(l[i:j].sum())
        cnt += j - i
        ap += (int(l[i:j].sum()) / total_p) * (tp / cnt)
        i = j
    return ap


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_desc_cum_scores_matches_numpy_ap(spark, seed):
    rng = np.random.default_rng(seed)
    n = 200
    scores = np.round(rng.uniform(0, 2, n), 6)
    labels = (rng.uniform(0, 1, n) < 0.3).astype(int)
    if labels.sum() == 0:
        labels[0] = 1
    from pyspark.sql import functions as F

    from tsengine.operators.metrics import _desc_cum_scores

    wp = spark.createDataFrame(
        pd.DataFrame({"score": scores, "label": labels}), "score double, label int"
    )
    cum = _desc_cum_scores(wp)
    ap = (
        cum.agg(F.sum(F.col("p") * F.col("ctp") / F.col("ccnt")) / F.max("tp"))
        .collect()[0][0]
    )
    assert ap == pytest.approx(_ap_reference(labels, scores), abs=1e-9)
