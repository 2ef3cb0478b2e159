#!/usr/bin/env python
"""Regenerate the committed golden outputs (tests/golden/*.csv) at
sf0.001.  Only fully deterministic queries belong here (fixed seeds,
rounded boundaries) — see tests/test_golden.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tests.test_golden import GOLDEN_DIR, _golden_cases
    from tsengine.session import get_spark

    sf = os.environ.get("TSENGINE_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("regen-golden")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _golden_cases().items():
        pdf = fn(spark, sf).toPandas()
        sort_cols = [c for c in ("window_id",) if c in pdf.columns]
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        out = os.path.join(GOLDEN_DIR, f"{name}.csv")
        pdf.to_csv(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
