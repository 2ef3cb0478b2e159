"""Reference-shape run: the driver's events table only yields ~66
samples/user, so the engine tests at seq_len=50 — this fixture proves
the pipelines also run at the reference's TRUE window shape
(seq_len=200, `exercise provided.ipynb` cell 3: ibi[200], acc[200])."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

REF_LEN = 200


@pytest.fixture(scope="module")
def ref_len_dir(tmp_path_factory):
    """Synthetic events dir: 3 users x 450 events -> exactly 2 complete
    200-length windows each; values in the driver's events range."""
    out = tmp_path_factory.mktemp("ref_len")
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for uid in (101, 102, 110):
        for i in range(450):
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=30 * i), uid,
                 float(np.round(rng.uniform(0.03, 327.5), 2)))
            )
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(out / "events.parquet", index=False)
    return str(out)


def test_derivation_at_200(spark, ref_len_dir):
    from tsengine.sources.wearable import wearable_long, wearable_wide

    long = wearable_long(spark, ref_len_dir, seq_len=REF_LEN)
    assert long.count() == 3 * 2 * REF_LEN  # 2 complete windows per user
    wide = wearable_wide(spark, ref_len_dir, seq_len=REF_LEN)
    rows = wide.collect()
    assert len(rows) == 6
    assert all(len(r["ibi"]) == REF_LEN and len(r["acc"]) == REF_LEN for r in rows)


def test_cpc_pipelines_at_200(spark, ref_len_dir):
    from tsengine.pipelines import HIDDEN, VARIANTS, cpc_contexts
    from tsengine.sources.wearable import wearable_wide

    wide = wearable_wide(spark, ref_len_dir, seq_len=REF_LEN).cache()
    for variant in VARIANTS:
        ctx = cpc_contexts(wide, variant).collect()
        assert len(ctx) == 6
        vals = [r[f"c{i}"] for r in ctx for i in range(HIDDEN)]
        assert all(np.isfinite(v) for v in vals)
    # determinism at reference length
    a = sorted(map(tuple, cpc_contexts(wide, "TS_CPC").collect()))
    b = sorted(map(tuple, cpc_contexts(wide, "TS_CPC").collect()))
    assert a == b
    wide.unpersist()
