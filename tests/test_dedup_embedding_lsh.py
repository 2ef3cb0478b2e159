"""Pins for the embedding near-dup twins (ADVICE r6 restructure):

* ``dedup_embedding`` — EXACT blocked-matmul all-pairs, value-checked
  against the all-pairs oracle; pinned here equal to numpy brute force
  on a planted corpus (the fixture's own result is empty, so the
  driver's value check alone cannot exercise qualifying pairs).
* ``dedup_embedding_lsh`` — sub-quadratic banded candidates + exact
  verify, rows-only registered; pinned for planted-dup recall 1.0 and
  for plan shape (no cartesian / no nested-loop join).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsengine.operators.dedup import (
    _COS_THRESHOLD,
    _embedding_allpairs_exact,
    _embedding_dup_pairs,
    dedup_embedding_lsh,
)

DIM = 64


def _planted_corpus():
    """60 random unit vectors + 15 planted near-dups (cos ~0.97)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:15] + 0.25 * rng.standard_normal((15, DIM)) / np.sqrt(DIM)
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    return np.vstack([base, dups])


def _brute_force_pairs(mat: np.ndarray) -> set[tuple[int, int]]:
    cos = mat @ mat.T / (
        np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    out = set()
    for i in range(len(mat)):
        for j in range(i + 1, len(mat)):
            if cos[i, j] >= _COS_THRESHOLD:
                out.add((i, j))
    return out


@pytest.fixture(scope="module")
def planted_df(spark):
    mat = _planted_corpus()
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id int, e array<double>")


def test_recall_is_one_on_planted_dups(spark, planted_df):
    mat = _planted_corpus()
    expect = _brute_force_pairs(mat)
    assert len(expect) >= 15  # the planted dups all qualify
    got = {
        (r.vec_a, r.vec_b)
        for r in _embedding_dup_pairs(planted_df, bits=12).collect()
    }
    # exact verify guarantees precision; this pins recall = 1.0
    assert got == expect


def test_verified_cosines_match_numpy(spark, planted_df):
    mat = _planted_corpus()
    for r in _embedding_dup_pairs(planted_df, bits=12).collect():
        c = float(
            mat[r.vec_a]
            @ mat[r.vec_b]
            / (np.linalg.norm(mat[r.vec_a]) * np.linalg.norm(mat[r.vec_b]))
        )
        assert abs(r.cos - round(c, 6)) < 1e-9


def test_no_cartesian_in_lsh_plan(spark, sf_dir):
    plan = (
        dedup_embedding_lsh(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_broadcast_in_exact_kernel_plan(spark, sf_dir):
    """The exact kernel's block-pair directory must be a generated-key
    equi-join, never a broadcast: its old ``abid <= bbid`` non-equi
    form planned BroadcastNestedLoopJoin and broadcast `packed` — the
    ENTIRE embedding corpus repacked into B struct rows (ADVICE r7).
    Every join of corpus-derived sides must shuffle."""
    from tsengine.operators.dedup import dedup_embedding

    plan = (
        dedup_embedding(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_exact_twin_matches_brute_force(spark, planted_df):
    """The value-checked ``dedup_embedding`` kernel is EXACT: on the
    planted corpus (30 qualifying pairs incl. cross-block ones under a
    forced multi-block split) it returns precisely the numpy all-pairs
    set with 6dp-identical cosines."""
    mat = _planted_corpus()
    expect = _brute_force_pairs(mat)
    # inflated n forces ~10 blocks so the cross-block emit path and the
    # same-block symmetric-grid dedup path BOTH execute
    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in _embedding_allpairs_exact(
            planted_df.withColumn("vec_id", F.col("vec_id").cast("bigint")),
            n=20480,
        ).collect()
    }
    assert set(got) == expect
    for (i, j), c in got.items():
        ref = float(
            mat[i] @ mat[j]
            / (np.linalg.norm(mat[i]) * np.linalg.norm(mat[j]))
        )
        assert abs(c - round(ref, 6)) < 1e-9


def test_exact_twin_empty_corpus(spark):
    df = spark.createDataFrame([], "vec_id bigint, e array<double>")
    assert _embedding_allpairs_exact(df, n=0).count() == 0


def test_empty_corpus_yields_empty_result(spark):
    df = spark.createDataFrame([], "vec_id int, e array<double>")
    assert _embedding_dup_pairs(df, bits=12).count() == 0


def test_exact_duplicates_always_collide(spark):
    # identical vectors share every band bucket — recall 1.0 at cos=1
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((20, DIM))
    rows = [(i, [float(x) for x in mat[i % 10]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, e array<double>")
    got = {
        (r.vec_a, r.vec_b)
        for r in _embedding_dup_pairs(df, bits=20).collect()
        if r.cos >= 0.999999
    }
    assert {(i, i + 10) for i in range(10)} <= got
