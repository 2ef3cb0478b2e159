#!/usr/bin/env python
"""10x scale probe — measured evidence that headline plans scale.

Materializes a synthetic "sf1" under /tmp by unioning ten key-offset
copies of the driver's sf0.1 tables (offsets keep primary keys unique
and foreign keys consistent, so join/group cardinalities scale
linearly — this probes OUR plans, it is not driver test data and is
never used for correctness checks).  Then times the headline suite at
sf0.1 and sf1 and writes SCALING.md with the wall-clock ratios.

A plan that is linear in input (single shuffle, broadcast joins,
partial aggs) should show a time ratio well under 10x on local[32]
(fixed per-query overheads amortize; CPU-bound kernels approach the
data ratio).  A super-linear ratio flags a plan that would not survive
the 100 TB target.

    python tools/scale_probe.py [--copies 10] [--rebuild]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/tsengine_scale_sf1"

# key columns to offset per copy, per table (FK-consistent: the same
# logical key gets the same offset everywhere it appears)
_OFFSETS = {
    "orders": {"o_orderkey": 10**9},
    "lineitem": {"l_orderkey": 10**9},
    "events": {"user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}
_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def build(spark, copies: int) -> None:
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    for name in _TABLES:
        out = os.path.join(DST, f"{name}.parquet")
        df = load_table(spark, SRC, name)
        offs = _OFFSETS.get(name)
        if not offs:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(copies):
            p = df
            for col, step in offs.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * step))
            if name == "documents" and i > 0:
                # perturb text per copy (rotate consonants) so copies are
                # NOT near-duplicates of each other — otherwise the dedup
                # queries legitimately find ~copies^2 pairs per doc and
                # the probe measures duplicate explosion, not scaling
                alpha = "bcdfghjklm"
                rot = alpha[i:] + alpha[:i]
                p = p.withColumn("text", F.translate("text", alpha, rot))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"built {name} x{copies}")


def time_suite(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """Steady-state timing: run twice, keep the second — scaling ratios
    should measure data-proportional work, not one-off plan compilation
    (bench.py measures the cold path; this tool measures the slope)."""
    from tsengine.registry import all_queries

    qs = all_queries()
    out = {}
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        print(f"  {sf_dir.split('/')[-1]} {name}: {out[name]}s")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE
    from tsengine.session import get_spark

    spark = get_spark("scale-probe")
    if args.rebuild or not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        build(spark, args.copies)

    spark.range(10**6).selectExpr("sum(id)").collect()
    t_small = time_suite(spark, SRC, HEADLINE)
    t_big = time_suite(spark, DST, HEADLINE)

    lines = [
        "# SCALING — measured 10x scale-up of the headline suite",
        "",
        f"`tools/scale_probe.py`: sf0.1 vs {args.copies} key-offset copies",
        "(~6M lineitem rows / ~2M events) on local[32].  Ratio well under",
        "10x = fixed overheads amortizing (plan scales); ~10x = compute-",
        "bound linear scaling; >10x would flag a plan that breaks at the",
        "100 TB target.  Probe data lives in /tmp, is generated from the",
        "driver tables, and is never used for correctness oracles.",
        "Methodology: per query, 1 warm-up run then min of 2 timed runs",
        "(steady state — bench.py measures the cold path instead); run",
        "the probe in a fresh process, not concurrently with the build.",
        "Document copies are consonant-rotated so the dedup family sees",
        "10x corpus, not 10x exact duplicates of every doc.",
        "",
        "| query | sf0.1 (s) | 10x (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name in HEADLINE:
        r = t_big[name] / t_small[name] if t_small[name] > 0 else float("nan")
        lines.append(f"| `{name}` | {t_small[name]} | {t_big[name]} | {r:.1f}x |")
    tot_s, tot_b = sum(t_small.values()), sum(t_big.values())
    lines.append(f"| **total** | {tot_s:.1f} | {tot_b:.1f} | {tot_b / tot_s:.1f}x |")
    lines.append("")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
