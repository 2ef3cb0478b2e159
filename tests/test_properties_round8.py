"""Round-8 hardening property tests: the pure kernels behind the
forecasting/drift family — driver- or executor-side python code paths
hypothesis can hammer without a Spark session.

1. mlprep._interp (the shared exact-quantile-from-histogram rule used
   by quantile_bucketize and winsorize) must equal numpy's linear-
   interpolation percentile on the expanded multiset for ANY histogram
   and probe point — the property that makes the driver-side boundary
   plan a faithful stand-in for the percentile window it replaces.
2. stateful._psi_value is a symmetrized KL: non-negative for ANY pair
   of count vectors, zero on identical vectors, and equal to the plain
   textbook formula (independent reimplementation).
3. stateful._psi_update emits THE SAME rows and final state no matter
   how an in-order event stream is split into micro-batches — the
   invariant that makes the streaming kernel's output well-defined
   under AvailableNow's arbitrary batching.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from tsengine.operators.mlprep import _interp
from tsengine.streaming.stateful import _psi_update, _psi_value

# ---------------------------------------------------------------------------
# 1. exact interpolated quantile vs numpy on the expanded multiset
# ---------------------------------------------------------------------------

_hist = st.dictionaries(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=1, max_value=5),
    min_size=1,
    max_size=12,
)


@given(d=_hist, p=st.sampled_from([0.05, 0.25, 0.5, 0.75, 0.95]))
@settings(max_examples=300, deadline=None)
def test_interp_equals_numpy_linear_percentile(d, p):
    expanded = sorted(v for v, c in d.items() for _ in range(c))
    expected = float(np.percentile(expanded, p * 100))
    got = _interp(d, p)
    assert got == expected or abs(got - expected) <= 1e-9 * max(
        1.0, abs(expected)
    )


# ---------------------------------------------------------------------------
# 2. PSI kernel math
# ---------------------------------------------------------------------------

_bins = st.lists(st.integers(min_value=0, max_value=50), min_size=10, max_size=10)


def _psi_plain(prev, cur):
    nr, nc = sum(prev), sum(cur)
    return sum(
        ((ri + 0.5) / (nr + 5.0) - (ci + 0.5) / (nc + 5.0))
        * math.log(((ri + 0.5) / (nr + 5.0)) / ((ci + 0.5) / (nc + 5.0)))
        for ri, ci in zip(prev, cur)
    )


@given(prev=_bins, cur=_bins)
@settings(max_examples=300, deadline=None)
def test_psi_value_nonnegative_and_matches_formula(prev, cur):
    got = _psi_value(prev, cur)
    assert got >= 0.0
    exact = _psi_plain(prev, cur)
    assert abs(got - exact) <= 5e-7  # 6dp canonicalization only
    if prev == cur:
        assert got == 0.0


# ---------------------------------------------------------------------------
# 3. stream kernel: batch-split invariance
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


def _run(rows, splits):
    """Feed `rows` (list of (day, bin)) to _psi_update across the given
    split points; return (emitted rows, final state)."""
    state = _FakeState()
    out = []
    for chunk in splits:
        if not chunk:
            continue
        pdf = pd.DataFrame(
            {
                "event_type": "t",
                "ts": range(len(chunk)),
                "event_id": range(len(chunk)),
                "day": [d for d, _ in chunk],
                "bin": [b for _, b in chunk],
            }
        )
        for emitted in _psi_update(("t",), iter([pdf]), state):
            out.extend(map(tuple, emitted.itertuples(index=False)))
    return out, state._v


_stream = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.integers(0, 9)),
    min_size=0,
    max_size=40,
).map(lambda rows: sorted(rows, key=lambda r: r[0]))


@given(rows=_stream, cut=st.integers(min_value=0, max_value=40), data=st.data())
@settings(max_examples=200, deadline=None)
def test_psi_update_batch_split_invariant(rows, cut, data):
    one, state_one = _run(rows, [rows])
    cut = min(cut, len(rows))
    two, state_two = _run(rows, [rows[:cut], rows[cut:]])
    assert one == two
    assert state_one == state_two
    # three-way split at arbitrary points
    if rows:
        c2 = data.draw(st.integers(min_value=cut, max_value=len(rows)))
        three, state_three = _run(
            rows, [rows[:cut], rows[cut:c2], rows[c2:]]
        )
        assert one == three and state_one == state_three
    # every emitted day is closed (a strictly newer day exists) and has
    # a predecessor window
    days = sorted({d for d, _ in rows})
    emitted_days = [r[1] for r in one]
    assert emitted_days == days[1:-1]
