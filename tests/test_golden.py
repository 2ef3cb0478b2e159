"""Golden-output regression (SURVEY.md §5 practice #2: the reference
commits its result CSVs and regenerates them).  Fully deterministic
queries — pure arithmetic + fixed seeds, rounded at the boundary — are
regenerated at sf0.001 and compared row-for-row against committed
golden files.  Regenerate with:

    python tools/regen_golden.py
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# name -> builder over sf0.001
def _golden_cases():
    from tsengine.pipelines import cpc_contexts, pipeline_frozen_inference
    from tsengine.sources.wearable import wearable_wide

    return {
        "frozen_inference": lambda spark, sf: pipeline_frozen_inference(spark, sf),
        "tcpc_contexts": lambda spark, sf: cpc_contexts(wearable_wide(spark, sf), "T_CPC"),
        "scpc_contexts": lambda spark, sf: cpc_contexts(wearable_wide(spark, sf), "S_CPC"),
    }


@pytest.mark.parametrize("name", ["frozen_inference", "tcpc_contexts", "scpc_contexts"])
def test_golden(name, spark, sf_dir):
    path = os.path.join(GOLDEN_DIR, f"{name}.csv")
    assert os.path.exists(path), f"golden file missing — run tools/regen_golden.py"
    got = _golden_cases()[name](spark, sf_dir).toPandas()
    want = pd.read_csv(path)
    sort_cols = [c for c in ("window_id",) if c in got.columns]
    got = got.sort_values(sort_cols).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(sort_cols).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(
        got.astype({c: "float64" for c in got.select_dtypes("number").columns}),
        want.astype({c: "float64" for c in want.select_dtypes("number").columns}),
        check_dtype=False,
        check_exact=False,
        atol=1e-9,
    )
