"""Round-6 hardening property tests.

1. The textrank accumulation fold is bit-identical across engines by
   construction: Spark ``aggregate(array_sort(...), 0.0, +)`` and
   DuckDB ``list_reduce(list_prepend(0.0, list(... ORDER BY k)), +)``
   run the same left-assoc fold over the same order — even on
   adversarial order-sensitive inputs where OTHER orders give visibly
   different sums (catastrophic cancellation), including values parked
   exactly on a 9dp half-rounding boundary.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

# order-sensitive by construction: k-sorted fold gives 3.7666...,
# value-ascending gives 2.0, value-descending gives 4.0 (the 1e16
# absorption/tie-to-even games) — a wrong association or order shows
# up at full magnitude, and two values sit on 9dp half boundaries
_ADVERSARIAL = [
    (0, 1e16),
    (1, 2.0),
    (2, 1.0),
    (3, -1e16),
    (4, 0.1000000005),  # exactly on a 9dp half boundary
    (5, -0.3333333333333333),
]


def _spark_fold(spark, pairs):
    df = spark.createDataFrame(pairs, "k int, c double")
    row = (
        df.select(F.struct("k", "c").alias("sc"))
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("sc")),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s")
        )
        .collect()[0]
    )
    return row.s


def _duck_fold(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, c DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    return con.execute(
        "SELECT list_reduce(list_prepend(0.0, list(c ORDER BY k)), (a, b) -> a + b) FROM t"
    ).fetchone()[0]


def test_fold_is_bit_identical_across_engines(spark):
    s = _spark_fold(spark, _ADVERSARIAL)
    d = _duck_fold(_ADVERSARIAL)
    assert s == d  # exact equality, not approx


def test_fold_order_actually_matters(spark):
    # sanity: the adversarial input IS order-sensitive — a descending
    # fold disagrees, proving the pinned order is doing real work
    asc = sorted(c for _, c in _ADVERSARIAL)
    desc = asc[::-1]

    def fold(xs):
        acc = 0.0
        for x in xs:
            acc += x
        return acc

    assert fold(asc) != fold(desc)
    assert _spark_fold(spark, _ADVERSARIAL) == fold(
        [c for _, c in sorted(_ADVERSARIAL)]
    )


def test_half_boundary_rounds_identically(spark):
    # the 9dp guard round applied to the identical fold result cannot
    # diverge: same input bits -> same BigDecimal HALF_UP in Spark and
    # the same double in DuckDB's ROUND after an identical sum
    pairs = [(0, 0.1000000005), (1, 0.2000000015)]
    s = _spark_fold(spark, pairs)
    d = _duck_fold(pairs)
    assert s == d
