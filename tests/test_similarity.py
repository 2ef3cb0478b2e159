"""ANN quality properties: approximate methods must actually
approximate — each variant's top-5 is compared against the exact
brute-force top-5 (recall@5).  A bucket scheme that is oracle-correct
but finds none of the true neighbors (the original single-table LSH
measured 0.00) is a correctness bug in spirit, which is exactly what
these floors catch."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def topsets(spark, oracle_sf_dir):
    from tsengine.registry import all_queries

    qs = all_queries()
    out = {}
    for name in ("ann_cosine_topk", "ann_lsh", "ann_ivf"):
        out[name] = {
            (r.query_id, r.neighbor_id)
            for r in qs[name].fn(spark, oracle_sf_dir).collect()
        }
    return out


def test_ivf_recall_floor(topsets):
    exact = topsets["ann_cosine_topk"]
    recall = len(topsets["ann_ivf"] & exact) / len(exact)
    assert recall >= 0.7, f"IVF recall@5 degraded to {recall:.2f}"


def test_lsh_recall_floor(topsets):
    exact = topsets["ann_cosine_topk"]
    recall = len(topsets["ann_lsh"] & exact) / len(exact)
    assert recall >= 0.3, f"multi-band LSH recall@5 degraded to {recall:.2f}"


def test_all_return_full_topk(topsets):
    for name, s in topsets.items():
        assert len(s) == 50, f"{name} returned {len(s)} pairs, expected 10x5"


def test_band_signature_udf_matches_scalar_recompute(spark, sf_dir):
    """The Arrow-matmul signature kernel must agree bit-for-bit with a
    scalar Python recomputation of sign(<e, plane>) — guards the numpy
    vectorization against transposition/reshape/order bugs."""
    from pyspark.sql import functions as F

    from tsengine.operators.similarity import (
        N_BANDS,
        N_BITS,
        _band_signatures_udf,
        _PLANES,
    )
    from tsengine.sources.tables import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .limit(100)
    )
    rows = emb.select("vec_id", "e", _band_signatures_udf()(F.col("e")).alias("bands")).collect()
    assert rows
    for r in rows:
        for b in range(N_BANDS):
            expect = "".join(
                "1"
                if sum(x * w for x, w in zip(r.e, _PLANES[b * N_BITS + j])) >= 0
                else "0"
                for j in range(N_BITS)
            )
            assert r.bands[b] == expect, (r.vec_id, b)


def test_ivf_pq_recall_floor(spark, oracle_sf_dir):
    """Composed IVF+PQ (coarse prune -> ADC over codes -> exact
    rerank) must stay close to plain IVF's recall — the PQ compression
    step should cost little once the shortlist is exactly reranked
    (measured 0.88 vs IVF's 0.92 at HEAD; floor set to catch
    collapses, not noise)."""
    from tsengine.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_cosine_topk"].fn(spark, oracle_sf_dir).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in qs["ann_ivf_pq"].fn(spark, oracle_sf_dir).collect()
    }
    assert len(ivfpq) == 50
    recall = len(ivfpq & exact) / len(exact)
    assert recall >= 0.6, f"IVF+PQ recall@5 degraded to {recall:.2f}"
